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
    # carry the coordinates through the sort as payloads: the sort network
    # moves them with sequential access, ~2x faster than the random-row
    # jnp.take(points, order) a key-only sort would need afterwards
    codes_s, px, py, pz, order = jax.lax.sort(
        (codes, points[:, 0], points[:, 1], points[:, 2],
         jnp.arange(n, dtype=jnp.int32)),
        num_keys=1,
    )
    pts_s = jnp.stack([px, py, pz], axis=-1)

    one = jnp.ones((1,), bool)
    pidx = jnp.arange(n, dtype=jnp.int32)

    def _runs(vals, starts, flags, cap):
        """Compress flagged runs of ``vals``/``starts`` into padded cell
        arrays via the trash-row scatter trick; start pads with n so counts
        fall out of the start diffs (no wide segment_sum)."""
        rank = jnp.cumsum(flags.astype(jnp.int32)) - 1
        ids = jnp.where(flags, rank, cap + 1)
        start_full = jnp.full((cap + 2,), n, jnp.int32).at[ids].set(starts)
        start = start_full[:cap]
        count = start_full[1 : cap + 1] - start
        code_arr = (
            jnp.full((cap + 1,), CODE_SENTINEL, jnp.int32)
            .at[jnp.where(flags, rank, cap)]
            .set(vals)[:cap]
        )
        return rank, start, count, code_arr

    # one XOR gives every level's run boundaries: adjacent sorted codes start
    # a new level-l cell iff they differ above bit 3*(BITS-l)
    d = codes_s[1:] ^ codes_s[:-1] if n > 1 else jnp.zeros((0,), codes_s.dtype)

    # ---- per-point work, all levels: scans only (cumsum/cummax cost ~1/15
    # of a random [N] gather or scatter at 10M points — the whole design
    # keeps the [N] axis gather/scatter-free except the single deepest-level
    # cell compaction below)
    point_cell: List[jnp.ndarray] = []
    num_cells: List[jnp.ndarray] = []
    leaf_acc = jnp.zeros((n,), jnp.int32)
    for level in range(num_levels):
        shift = 3 * (BITS - level)
        flags = jnp.concatenate([one, (d >> shift) != 0])
        rank = jnp.cumsum(flags.astype(jnp.int32)) - 1
        point_cell.append(rank)
        num_cells.append(rank[-1] + 1)
        # count of the point's level cell = next run start - own run start,
        # both from scans (no cell-table gather)
        run_start = jax.lax.cummax(jnp.where(flags, pidx, -1))
        g = jnp.where(flags, pidx, n)
        next_start = jnp.concatenate(
            [jax.lax.cummin(g, reverse=True)[1:], jnp.full((1,), n, jnp.int32)]
        )
        # counts shrink with depth, so the first level with count<=leaf_size
        # equals the number of levels whose count exceeds it
        leaf_acc = leaf_acc + (next_start - run_start > leaf_size)
    leaf_level = jnp.minimum(leaf_acc, num_levels - 1).astype(jnp.int32)

    # ---- deepest-level cells: the only [N]-wide compaction.  Run starts
    # are compacted with one more sort instead of a scatter (XLA's TPU sort
    # is ~3x faster than a 10M-index scatter: 46 vs 124 ms measured), then
    # counts fall out of start diffs and codes from a cell-sized gather.
    deepest = num_levels - 1
    shift_L = 3 * (BITS - deepest)
    flags_L = jnp.concatenate([one, (d >> shift_L) != 0])
    cap_L = _level_cap(deepest, n)
    rank_L = point_cell[deepest]
    keys = jnp.where(flags_L, rank_L, jnp.int32(2**31 - 1))
    _, start_L = jax.lax.sort_key_val(keys, pidx)
    start_L = start_L[:cap_L]
    valid_L = jnp.arange(cap_L, dtype=jnp.int32) < num_cells[deepest]
    start_L = jnp.where(valid_L, start_L, n)
    nxt = jnp.concatenate([start_L[1:], jnp.full((1,), n, jnp.int32)])
    count_L = jnp.where(valid_L, nxt - start_L, 0)
    code_L = jnp.where(
        valid_L,
        (jnp.take(codes_s, jnp.minimum(start_L, n - 1)) >> shift_L).astype(
            jnp.int32
        ),
        CODE_SENTINEL,
    )

    # ---- coarser cells: derived level-by-level from the next-deeper
    # level's CELL arrays (length min(8^(l+1), N)) — never the [N] axis
    cell_start: List[jnp.ndarray] = [start_L]
    cell_count: List[jnp.ndarray] = [count_L]
    cell_code: List[jnp.ndarray] = [code_L]

    child_code, child_start = code_L, start_L
    for level in range(deepest - 1, -1, -1):
        shift = 3  # child is always the next-deeper level's cell array
        child_real = child_code != CODE_SENTINEL
        dc = (
            child_code[1:] ^ child_code[:-1]
            if child_code.shape[0] > 1
            else jnp.zeros((0,), jnp.int32)
        )
        flags_c = (
            jnp.concatenate([one[: min(1, child_code.shape[0])], (dc >> shift) != 0])
            & child_real
        )
        cap = _level_cap(level, n)
        _, start, count, code_arr = _runs(
            jnp.where(child_real, child_code >> shift, CODE_SENTINEL),
            child_start, flags_c, cap,
        )
        cell_start.insert(0, start)
        cell_count.insert(0, count)
        cell_code.insert(0, code_arr)
        child_code, child_start = code_arr, start

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
