"""Hierarchical octree over point clouds — level-by-level, padded, vectorized.

The TPU-native replacement for the upstream's recursive numba-jit tree build
(BASELINE.json:5 names this subsystem explicitly; the recursive code is not in
the v0 mount — SURVEY.md §0.1).  Design (SURVEY.md §7.6, Cornerstone-style):

1. quantize points into a 2^BITS³ grid, Morton-encode, one global sort;
2. because the sort orders points by code, every octree cell at every level is
   a *contiguous run* of the sorted array — the whole hierarchy is recovered
   with prefix-change flags + cumulative sums per level, no recursion, no
   data-dependent control flow;
3. all per-level arrays are padded to static caps (min(8^level, N)) so a
   single jit compilation covers any point distribution.

Build cost: one sort (O(N log N)) + num_levels × O(N) vector sweeps — this is
the "octree build time at 10M points" benchmark path (BASELINE.md).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .morton import BITS, CODE_SENTINEL, morton_encode_points

__all__ = ["Octree", "build_octree"]


class Octree(NamedTuple):
    """Padded level-by-level octree over a Morton-sorted point cloud.

    All "per level" fields are tuples of arrays, one per level 0..num_levels-1
    (level 0 = single root cell).  Cells at each level are dense-ranked in
    Morton order; padding entries carry count 0 and code CODE_SENTINEL.
    """

    points: jnp.ndarray  # [N, 3] sorted by Morton code
    order: jnp.ndarray  # [N] original index of sorted point i
    codes: jnp.ndarray  # [N] sorted Morton codes
    point_cell: Tuple[jnp.ndarray, ...]  # [L][N] dense cell rank per point
    cell_start: Tuple[jnp.ndarray, ...]  # [L][C_l] first sorted-point index
    cell_count: Tuple[jnp.ndarray, ...]  # [L][C_l] points in cell
    cell_code: Tuple[jnp.ndarray, ...]  # [L][C_l] Morton prefix (sorted; pad=SENTINEL)
    num_cells: Tuple[jnp.ndarray, ...]  # [L][] dynamic cell count
    leaf_level: jnp.ndarray  # [N] first level where the point's cell <= leaf_size

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_levels(self) -> int:
        # derived statically from the pytree structure (jit-safe)
        return len(self.point_cell)


def _level_cap(level: int, n: int) -> int:
    return int(min(8**level, n))


def build_octree(
    points: jnp.ndarray,
    lo: Tuple[float, float, float],
    hi: Tuple[float, float, float],
    num_levels: int = 6,
    leaf_size: int = 32,
) -> Octree:
    """Construct the padded octree (jit-compatible; static shapes throughout).

    ``lo``/``hi`` are static domain bounds; ``num_levels`` static depth
    (level l cells have side (hi-lo)/2^l); ``leaf_size`` sets ``leaf_level``:
    the first level at which a point's cell holds <= leaf_size points (capped
    at the deepest level).
    """
    if not (1 <= num_levels <= BITS + 1):
        raise ValueError(f"num_levels must be in [1, {BITS + 1}]")
    n = points.shape[0]
    codes = morton_encode_points(points, lo, hi)
    order = jnp.argsort(codes)
    codes_s = jnp.take(codes, order)
    pts_s = jnp.take(points, order, axis=0)

    point_cell: List[jnp.ndarray] = []
    cell_start: List[jnp.ndarray] = []
    cell_count: List[jnp.ndarray] = []
    cell_code: List[jnp.ndarray] = []
    num_cells: List[jnp.ndarray] = []
    counts_per_point: List[jnp.ndarray] = []

    pidx = jnp.arange(n, dtype=jnp.int32)
    # one XOR gives every level's run boundaries: adjacent sorted codes start
    # a new level-l cell iff they differ above bit 3*(BITS-l)
    d = codes_s[1:] ^ codes_s[:-1] if n > 1 else jnp.zeros((0,), codes_s.dtype)
    one = jnp.ones((1,), bool)

    for level in range(num_levels):
        shift = 3 * (BITS - level)
        flags = jnp.concatenate([one, (d >> shift) != 0])
        rank = jnp.cumsum(flags.astype(jnp.int32)) - 1
        cap = _level_cap(level, n)
        ncells = rank[-1] + 1
        # scatter run starts / codes into padded arrays (trash-row trick);
        # start pads with n so counts fall out of the start diffs below —
        # no 10M-wide segment_sum per level (2x faster build at 10M points)
        scatter_ids = jnp.where(flags, rank, cap + 1)
        start_full = jnp.full((cap + 2,), n, jnp.int32).at[scatter_ids].set(pidx)
        start = start_full[:cap]
        count = start_full[1 : cap + 1] - start
        code_arr = (
            jnp.full((cap + 1,), CODE_SENTINEL, jnp.int32)
            .at[jnp.where(flags, rank, cap)]
            .set((codes_s >> shift).astype(jnp.int32))[:cap]
        )
        point_cell.append(rank)
        cell_start.append(start)
        cell_count.append(count)
        cell_code.append(code_arr)
        num_cells.append(ncells)
        counts_per_point.append(jnp.take(count, rank))

    cpp = jnp.stack(counts_per_point)  # [L, N]
    small = cpp <= leaf_size
    # first level where the cell is small enough; argmax picks the first True
    leaf_level = jnp.where(
        small.any(axis=0), jnp.argmax(small, axis=0), num_levels - 1
    ).astype(jnp.int32)

    return Octree(
        points=pts_s,
        order=order.astype(jnp.int32),
        codes=codes_s,
        point_cell=tuple(point_cell),
        cell_start=tuple(cell_start),
        cell_count=tuple(cell_count),
        cell_code=tuple(cell_code),
        num_cells=tuple(num_cells),
        leaf_level=leaf_level,
    )
