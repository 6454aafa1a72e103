"""Morton (Z-order) codes: 3D bit interleaving, fully vectorized in jnp.

Foundation of the octree build and the spatial partitioner (SURVEY.md §7.6-7.7:
Morton-ordered level sweeps replace the upstream's recursive numba tree;
Morton-contiguous ranges give compact partitions).  30-bit codes (10 bits per
axis → 1024³ grid) in int32 — sufficient for the 10M-point configs and cheap
on the TPU vector unit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["BITS", "MAX_LEVEL", "CODE_SENTINEL", "quantize", "morton_encode",
           "morton_decode", "morton_encode_points"]

BITS = 10  # bits per axis
MAX_LEVEL = BITS
# padding value, sorts after all codes.  np (not jnp): a module-scope device
# array initializes the XLA backend at import, which breaks
# jax.distributed.initialize() in any process that imports the package first
# (multi-process bench_scaling runs)
CODE_SENTINEL = np.int32(2**31 - 1)


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits of x over 30 bits: bit i -> bit 3i (magic-mask method)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _part1by2: gather bits 0,3,6,... into the low 10 bits."""
    x = x & 0x09249249
    x = (x | (x >> 2)) & 0x030C30C3
    x = (x | (x >> 4)) & 0x0300F00F
    x = (x | (x >> 8)) & 0x030000FF
    x = (x | (x >> 16)) & 0x3FF
    return x


def quantize(
    points: jnp.ndarray, lo: Tuple[float, float, float], hi: Tuple[float, float, float]
) -> jnp.ndarray:
    """Map points in the [lo, hi] box to integer grid coords [0, 2^BITS)."""
    lo_a = jnp.asarray(lo, dtype=points.dtype)
    hi_a = jnp.asarray(hi, dtype=points.dtype)
    scale = (2**BITS) / (hi_a - lo_a)
    q = jnp.floor((points - lo_a) * scale).astype(jnp.int32)
    return jnp.clip(q, 0, 2**BITS - 1)


def _quantize_t(points, lo, hi):
    """[N, 3] points -> [3, N] grid coords: elementwise math runs with N on
    the 128-wide vector lanes instead of the 3-wide channel axis (3/128 lane
    occupancy made the straight [N, 3] form ~25x slower at 10M points)."""
    lo_a = jnp.asarray(lo, dtype=points.dtype)[:, None]
    hi_a = jnp.asarray(hi, dtype=points.dtype)[:, None]
    scale = (2**BITS) / (hi_a - lo_a)
    q = jnp.floor((points.T - lo_a) * scale).astype(jnp.int32)
    return jnp.clip(q, 0, 2**BITS - 1)


def morton_encode(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave integer grid coords [..., 3] -> 30-bit codes [...] (int32).

    Bit layout (MSB-first): (x₉y₉z₉)(x₈y₈z₈)... so code >> 3k is the cell id
    at octree level BITS-k.
    """
    x, y, z = q[..., 0], q[..., 1], q[..., 2]
    return (_part1by2(x) << 2) | (_part1by2(y) << 1) | _part1by2(z)


def morton_decode(code: jnp.ndarray) -> jnp.ndarray:
    """Codes -> integer grid coords [..., 3]."""
    x = _compact1by2(code >> 2)
    y = _compact1by2(code >> 1)
    z = _compact1by2(code)
    return jnp.stack([x, y, z], axis=-1)


def morton_encode_points(
    points: jnp.ndarray, lo: Tuple[float, float, float], hi: Tuple[float, float, float]
) -> jnp.ndarray:
    q = _quantize_t(points, lo, hi)  # [3, N]: lane-major bit math
    s = _part1by2(q)
    return (s[0] << 2) | (s[1] << 1) | s[2]
