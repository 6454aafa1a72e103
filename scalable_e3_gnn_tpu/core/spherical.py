"""Real spherical-harmonic embeddings of direction vectors.

The reference fixes its tensor product's second operand to the l<=1 spherical
harmonics of the edge direction (l1_tensor_prod.py:17: ``Irreps.spherical_
harmonics(1)``) — i.e. ``[1, sqrt(3)*(y, z, x)]`` under e3nn's component
normalization and (y,z,x) component order.  This module supplies that embedding
for arbitrary lmax, TPU-style: closed recursion with constant 3j tensors, all
static shapes, fully differentiable.

Basis consistency: higher-l harmonics are *derived* from the same real-basis
``wigner_3j`` tensors used by the tensor products (Y_{l+1} ∝ C_{l,1,l+1} · (Y_l
⊗ Y_1)), so sh outputs transform with exactly the D_l convention the CG
contractions assume — equivariance holds by construction, no cross-convention
phase bugs possible.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .irreps import Irreps
from .wigner import wigner_3j

__all__ = ["spherical_harmonics", "sh_irreps"]


def sh_irreps(lmax: int) -> Irreps:
    return Irreps.spherical_harmonics(lmax)


@functools.lru_cache(maxsize=None)
def _recursion_constants(lmax: int):
    """Per-level (w3j tensor, norm factor) so that ||Y_l(v)||^2 = 2l+1 on the sphere."""
    consts = []
    # float64 reference evaluation at a generic unit vector to fix each norm
    v = np.array([0.2731, -0.6214, 0.7344])
    v = v / np.linalg.norm(v)
    y_prev = np.sqrt(3.0) * np.array([v[1], v[2], v[0]])  # l=1, component norm
    y1 = y_prev.copy()
    for l in range(1, lmax):
        C = wigner_3j(l, 1, l + 1)
        raw = np.einsum("abc,a,b->c", C, y_prev, y1)
        n = np.sqrt(2 * (l + 1) + 1) / np.linalg.norm(raw)
        consts.append((C, float(n)))
        y_prev = n * raw
    return consts


def spherical_harmonics(
    lmax: int,
    vectors: jnp.ndarray,
    normalize: bool = True,
    normalization: str = "component",
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Concatenated real sh features ``[..., (lmax+1)^2]`` for ``vectors [..., 3]``.

    Component order within l=1 is (y, z, x) (matching the reference's in2
    layout expectations); l=0 is the constant 1.  ``normalize=True`` maps
    vectors to the unit sphere first (with a safe epsilon for zero padding
    vectors, which then embed to [1, 0, 0, ...]).

    normalization:
      - "component": E_v[Y_lm(v)^2] = 1 per component  (||Y_l|| = sqrt(2l+1))
      - "norm":      ||Y_l(v)|| = 1
      - "integral":  orthonormal w.r.t. the sphere measure (divide by sqrt(4π))
    """
    if vectors.shape[-1] != 3:
        raise ValueError(f"vectors must have trailing dim 3, got {vectors.shape}")
    v = vectors
    if normalize:
        n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
        v = v / jnp.maximum(n, eps)

    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    outs = [jnp.ones(v.shape[:-1] + (1,), dtype=v.dtype)]
    if lmax >= 1:
        y1 = jnp.sqrt(3.0) * jnp.stack([y, z, x], axis=-1)
        outs.append(y1)
        y_prev = y1
        for C, n in _recursion_constants(lmax):
            Cj = jnp.asarray(C * n, dtype=v.dtype)
            y_next = jnp.einsum("...a,...b,abc->...c", y_prev, y1, Cj)
            outs.append(y_next)
            y_prev = y_next

    out = jnp.concatenate(outs, axis=-1)
    if normalization == "component":
        return out
    if normalization == "norm":
        scales = np.concatenate(
            [np.full(2 * l + 1, 1.0 / np.sqrt(2 * l + 1)) for l in range(lmax + 1)]
        )
        return out * jnp.asarray(scales, dtype=out.dtype)
    if normalization == "integral":
        return out / np.sqrt(4.0 * np.pi)
    raise ValueError(f"unknown normalization {normalization!r}")
