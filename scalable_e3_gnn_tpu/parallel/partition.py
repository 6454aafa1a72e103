"""Edge-partitioned graph for multi-chip execution.

Morton-range partitioner (SURVEY.md §2.4, §5.7): the octree's Morton sort makes
contiguous node ranges spatially compact, so cutting the sorted node array into
P equal ranges yields partitions whose boundary (halo) is small.  Edges are
owned by the receiver's partition (owner-computes aggregation); senders living
on other partitions become *halo slots* filled by a boundary-feature exchange
each layer (all-to-all over ICI — see parallel/halo.py).

Host-side numpy: partitioning runs once per graph topology (BASELINE.json:5
"halo-exchange partitioner"); all outputs are static-shape device arrays
stacked over the partition axis, ready for shard_map.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = [
    "PartitionedGraph",
    "partition_graph",
    "DensePartitionedGraph",
    "partition_graph_dense",
]


class PartitionedGraph(NamedTuple):
    """Per-partition arrays, stacked on axis 0 (the mesh 'graph' axis).

    Index spaces (per partition p):
      - local node index: 0..n_per_part-1 (row in that partition's shard);
        padding rows have node_mask False;
      - extended index: 0..n_per_part+halo_cap-1 — local rows then halo slots;
        senders use this space;
      - pool index: 0..P*halo_cap-1 — position in the all-gathered boundary
        pool; halo_map[p, j] says which pool entry fills halo slot j.
    """

    num_parts: int
    n_per_part: int
    halo_cap: int
    nodes: np.ndarray  # [P, Np, F] features (Morton-sorted split)
    positions_ext: np.ndarray  # [P, Np + H, 3] local ‖ halo positions
    senders: np.ndarray  # [P, Ep] extended-space; pad = Np + H
    receivers: np.ndarray  # [P, Ep] local-space, sorted; pad = Np
    edge_mask: np.ndarray  # [P, Ep]
    node_mask: np.ndarray  # [P, Np]
    boundary_idx: np.ndarray  # [P, H] local idx of nodes this part exports; pad 0
    halo_map: np.ndarray  # [P, H] pool idx feeding each halo slot; pad 0
    global_ids: np.ndarray  # [P, Np] original sorted-space node id; pad -1
    # split edge lists for exchange/compute overlap (SURVEY.md §3.4): local
    # edges need no halo — their aggregation runs while the boundary-feature
    # exchange is in flight; remote edges run after.
    senders_loc: np.ndarray  # [P, El] local-space; pad = Np
    receivers_loc: np.ndarray  # [P, El] local-space, sorted; pad = Np
    mask_loc: np.ndarray  # [P, El]
    senders_rem: np.ndarray  # [P, Er] extended-space (halo slots); pad = Np+H
    receivers_rem: np.ndarray  # [P, Er] local-space, sorted; pad = Np
    mask_rem: np.ndarray  # [P, Er]


class DensePartitionedGraph(NamedTuple):
    """Fixed-degree (dense-K) partition arrays, stacked on axis 0.

    The TPU-fast distributed layout: each partition keeps [Np, K] neighbor
    slots, so the per-device layer runs the same fused Pallas message kernels
    as the single-chip bench (models/segnn.py apply_dense) — no COO
    segment-sum on the hot path.

    Within each partition, local rows are permuted so that *interior*
    receivers (all K senders local) occupy rows [0, NI) and *boundary*
    receivers (>=1 remote sender) occupy rows [NI, NI+NB): the interior
    aggregation has no data dependency on the halo exchange, so it overlaps
    with the boundary-feature collective (SURVEY.md §7 hard part 2).

    Index spaces (per partition):
      - local row: 0..NI+NB-1; padding rows have node_mask False;
      - extended: 0..NI+NB+H-1 — local rows then halo slots (boundary-block
        senders); pad slot = NI+NB+H (reads 0 via fill-mode gather);
      - interior-block senders are local rows; pad slot = NI+NB;
      - pool: 0..P*H-1 — position in the all-gathered boundary pool.
    ``global_ids`` maps local rows back to the input node order (pad -1);
    targets for a partitioned train step are ``target[global_ids]`` with
    pad rows masked.
    """

    num_parts: int
    n_interior: int  # NI
    n_boundary: int  # NB
    halo_cap: int
    k: int
    nodes: np.ndarray  # [P, NI+NB, F]
    positions_ext: np.ndarray  # [P, NI+NB+H, 3]
    node_mask: np.ndarray  # [P, NI+NB]
    senders_int: np.ndarray  # [P, NI, K] local rows; pad = NI+NB
    mask_int: np.ndarray  # [P, NI, K]
    senders_bnd: np.ndarray  # [P, NB, K] extended; pad = NI+NB+H
    mask_bnd: np.ndarray  # [P, NB, K]
    boundary_idx: np.ndarray  # [P, H] local row of exported nodes; pad 0
    halo_map: np.ndarray  # [P, H] pool idx per halo slot; pad 0
    global_ids: np.ndarray  # [P, NI+NB] input-order node id; pad -1
    # sender-transpose tables (scatter-free gradients, ops.take_dense_rev):
    # flat slot positions where each row appears as a sender
    rev_int: np.ndarray  # [P, NI+NB, Qi] interior slots+1; 0 = empty
    rev_ext: np.ndarray  # [P, NI+NB+H, Qb] boundary slots+1; 0 = empty

    @property
    def n_per_part(self) -> int:
        return self.n_interior + self.n_boundary


def partition_graph_dense(
    positions: np.ndarray,  # [N, 3] Morton-sorted
    features: np.ndarray,  # [N, F]
    senders: np.ndarray,  # [N, K] global ids
    edge_mask: np.ndarray,  # [N, K]
    num_parts: int,
    halo_cap: int | None = None,
    interior_cap: int | None = None,
    boundary_cap: int | None = None,
) -> DensePartitionedGraph:
    """Split a dense-K graph into P Morton-contiguous partitions (vectorized).

    Ownership is by receiver row range (owner-computes aggregation, matching
    ``partition_graph``); remote senders become halo slots filled by the
    per-layer boundary exchange (parallel/halo.py).
    """
    n, k = senders.shape
    f = features.shape[1]
    npp0 = -(-n // num_parts)  # input rows per partition range
    owner = lambda v: np.minimum(v // npp0, num_parts - 1)

    positions = np.asarray(positions)
    features = np.asarray(features)
    senders = np.asarray(senders)
    edge_mask = np.asarray(edge_mask, bool)

    # global precomputes (r5: the per-partition owner/where/fancy-index
    # passes were ~5 s of the real 10M/P=16 partition).  Native single
    # threaded pass when available (data/native_loader.sender_pass);
    # vectorized-numpy fallback otherwise.
    from ..data.native_loader import sender_pass, take_i32

    sp = sender_pass(senders, edge_mask, npp0, num_parts)
    if sp is not None:
        OWNER, REMOTE, ROW_REMOTE = sp
    else:
        SD0 = np.where(edge_mask, senders, 0)
        OWNER = np.minimum(SD0 // npp0, num_parts - 1)
        OWNER = np.where(edge_mask, OWNER, -1).astype(np.int8)
        row_own = np.minimum(
            np.arange(n) // npp0, num_parts - 1)[:, None]
        REMOTE = edge_mask & (OWNER != row_own)
        ROW_REMOTE = REMOTE.any(axis=1)

    halos, int_rows, bnd_rows = [], [], []
    for p in range(num_parts):
        lo, hi = p * npp0, min(n, (p + 1) * npp0)
        sd = senders[lo:hi]
        remote = REMOTE[lo:hi]
        halos.append(np.unique(sd[remote]))
        isb = ROW_REMOTE[lo:hi]
        int_rows.append(np.nonzero(~isb)[0] + lo)
        bnd_rows.append(np.nonzero(isb)[0] + lo)

    ni_need = max((len(r) for r in int_rows), default=0)
    nb_need = max((len(r) for r in bnd_rows), default=0)
    NI = interior_cap if interior_cap is not None else max(ni_need, 1)
    NB = boundary_cap if boundary_cap is not None else max(nb_need, 1)
    if NI < ni_need or NB < nb_need:
        raise ValueError(
            f"caps ({NI},{NB}) < needed ({ni_need},{nb_need})"
        )
    hmax = max((len(h) for h in halos), default=0)

    # exports + pool positions (same construction as partition_graph).
    # The auto cap must cover BOTH sides: a partition's export set (union of
    # every importer's needs from it) can exceed any single partition's halo
    # (import) count — e.g. a partition bordering two others.
    all_halo = np.concatenate(halos) if hmax else np.zeros(0, senders.dtype)
    halo_own = owner(all_halo)
    exports = [np.unique(all_halo[halo_own == p]) for p in range(num_parts)]
    emax = max((len(e) for e in exports), default=0)
    H = halo_cap if halo_cap is not None else max(hmax, emax, 1)
    if H < hmax:
        raise ValueError(f"halo_cap={H} < max needed {hmax}")
    if emax > H:
        raise ValueError(f"export count {emax} exceeds halo_cap {H}")
    npp = NI + NB
    pool_pos_of = np.full(n, -1, np.int64)
    for p, exp in enumerate(exports):
        pool_pos_of[exp] = p * H + np.arange(len(exp))

    # global local-index map: LOCAL_OF[g] = row of g within its own
    # partition's [interior | boundary] order; valid for every real node
    LOCAL_OF = np.zeros(n, np.int32)
    for p in range(num_parts):
        LOCAL_OF[int_rows[p]] = np.arange(len(int_rows[p]), dtype=np.int32)
        LOCAL_OF[bnd_rows[p]] = NI + np.arange(len(bnd_rows[p]),
                                               dtype=np.int32)
    SLOC = take_i32(LOCAL_OF, senders, edge_mask)
    if SLOC is None:
        SLOC = LOCAL_OF[np.where(edge_mask, senders, 0)]

    nodes = np.zeros((num_parts, npp, f), features.dtype)
    pos_ext = np.zeros((num_parts, npp + H, 3), positions.dtype)
    n_mask = np.zeros((num_parts, npp), bool)
    # np.empty + tail-only sentinel fill: remap() overwrites every real row
    # (all K columns), so only the pad rows [cnt:] need the trash index —
    # the full-array np.full fills were ~1.8 s of the real 10M/P=16
    # partition (cProfile; pad slots are also masked, m_* calloc zeros)
    s_int = np.empty((num_parts, NI, k), np.int32)
    m_int = np.zeros((num_parts, NI, k), bool)
    s_bnd = np.empty((num_parts, NB, k), np.int32)
    m_bnd = np.zeros((num_parts, NB, k), bool)
    boundary_idx = np.zeros((num_parts, H), np.int32)
    halo_map = np.zeros((num_parts, H), np.int32)
    gids = np.full((num_parts, npp), -1, np.int32)

    for p in range(num_parts):
        lo = p * npp0
        gi, gb, hp = int_rows[p], bnd_rows[p], halos[p]
        cnt_i, cnt_b = len(gi), len(gb)

        nodes[p, :cnt_i] = features[gi]
        nodes[p, NI : NI + cnt_b] = features[gb]
        pos_ext[p, :cnt_i] = positions[gi]
        pos_ext[p, NI : NI + cnt_b] = positions[gb]
        pos_ext[p, npp : npp + len(hp)] = positions[hp]
        n_mask[p, :cnt_i] = True
        n_mask[p, NI : NI + cnt_b] = True
        gids[p, :cnt_i] = gi
        gids[p, NI : NI + cnt_b] = gb

        halo_map[p, : len(hp)] = pool_pos_of[hp]
        exp = exports[p]
        boundary_idx[p, : len(exp)] = LOCAL_OF[exp]

        def remap(rows, pad_idx, allow_remote):
            # int32 throughout: searchsorted's int64 positions used to leak
            # into the np.where and force a full-copy .astype(int32) on the
            # [rows, K] result (~1.9 s of the real 10M/P=16 partition)
            sd, mk = senders[rows], edge_mask[rows]
            s_loc = SLOC[rows]
            if allow_remote:
                local = mk & (OWNER[rows] == p)
                slot = (
                    np.searchsorted(hp, sd).astype(np.int32)
                    if len(hp)
                    else np.zeros_like(sd, np.int32)
                )
                s_new = np.where(local, s_loc, np.int32(npp) + slot)
            else:
                s_new = s_loc
            out = np.where(mk, s_new, np.int32(pad_idx))
            return out.astype(np.int32, copy=False), mk

        if cnt_i:
            s_int[p, :cnt_i], m_int[p, :cnt_i] = remap(gi, npp, False)
        s_int[p, cnt_i:] = npp
        if cnt_b:
            s_bnd[p, :cnt_b], m_bnd[p, :cnt_b] = remap(gb, npp + H, True)
        s_bnd[p, cnt_b:] = npp + H

    # sender-transpose tables for scatter-free gradients: rev[m] lists the
    # flat block-slot positions where row m is the sender (take_dense_rev).
    # Native threaded counting-scatter when available (data/native_loader.py
    # rev_table — the numpy argsort+repeat construction was ~33 s of the
    # 40 s 10M/152M-edge partition, tools/exp_partition_native.py); numpy
    # fallback below keeps the package dependency-free.
    def rev_native(s_blk, m_blk, n_targets):
        from ..data.native_loader import (available, rev_counts,
                                          rev_table_multi)

        if not available():
            return None
        from ..data.native_loader import _as_u8

        tgt2 = np.ascontiguousarray(
            s_blk.reshape(num_parts, -1), np.int32)
        mk2 = _as_u8(m_blk.reshape(num_parts, -1))
        counts = [rev_counts(tgt2[p], mk2[p], n_targets)
                  for p in range(num_parts)]
        if any(c is None for c in counts):
            return None
        q = max(max((int(c.max()) for c in counts), default=0), 1)
        # +1 encoding (0 = empty) into calloc zero pages — see
        # take_dense_rev / rev_table_multi
        return rev_table_multi(tgt2, mk2, n_targets, q=q)

    def rev_lists(s_blk, m_blk, n_targets):
        out = []
        for p in range(num_parts):
            pos = np.nonzero(m_blk[p].ravel())[0]
            tgt = s_blk[p].ravel()[pos]
            order = np.argsort(tgt, kind="stable")
            tgt, pos = tgt[order], pos[order]
            starts = np.searchsorted(tgt, np.arange(n_targets))
            ends = np.searchsorted(tgt, np.arange(n_targets) + 1)
            out.append((pos, starts, ends))
        return out

    def rev_fill(lists, n_targets):
        q = max(
            (int((e - s).max()) if len(e) else 0 for _, s, e in lists),
            default=0,
        )
        q = max(q, 1)
        # +1 encoding, 0 = empty (matches rev_table_multi / take_dense_rev)
        rev = np.zeros((num_parts, n_targets, q), np.int32)
        for p, (pos, starts, ends) in enumerate(lists):
            cnt = ends - starts
            rows = np.repeat(np.arange(n_targets), cnt)
            within = np.arange(len(pos)) - np.repeat(starts, cnt)
            rev[p, rows, within] = pos.astype(np.int32) + 1
        return rev

    rev_int = rev_native(s_int, m_int, npp)
    if rev_int is None:
        rev_int = rev_fill(rev_lists(s_int, m_int, npp), npp)
    rev_ext = rev_native(s_bnd, m_bnd, npp + H)
    if rev_ext is None:
        rev_ext = rev_fill(rev_lists(s_bnd, m_bnd, npp + H), npp + H)

    return DensePartitionedGraph(
        rev_int=rev_int,
        rev_ext=rev_ext,
        num_parts=num_parts,
        n_interior=NI,
        n_boundary=NB,
        halo_cap=H,
        k=k,
        nodes=nodes,
        positions_ext=pos_ext,
        node_mask=n_mask,
        senders_int=s_int,
        mask_int=m_int,
        senders_bnd=s_bnd,
        mask_bnd=m_bnd,
        boundary_idx=boundary_idx,
        halo_map=halo_map,
        global_ids=gids,
    )


def partition_graph(
    positions: np.ndarray,  # [N, 3] Morton-sorted
    features: np.ndarray,  # [N, F]
    senders: np.ndarray,  # [E] sorted-space
    receivers: np.ndarray,  # [E] sorted-space, non-decreasing
    edge_mask: np.ndarray,  # [E]
    num_parts: int,
    halo_cap: int | None = None,
    edges_per_part: int | None = None,
    local_edges_per_part: int | None = None,
    remote_edges_per_part: int | None = None,
) -> PartitionedGraph:
    """Split a receiver-sorted graph into P Morton-contiguous partitions.

    Fully vectorized host path (no per-edge Python loops): a stable sort by
    receiver-owner groups the edge list into contiguous per-partition runs,
    halo/export sets come from ``np.unique`` per run, and sender remapping is
    a ``searchsorted`` into the sorted halo id array — a 160M-edge 10M-point
    graph partitions in seconds instead of hours.
    """
    n = positions.shape[0]
    f = features.shape[1]
    npp = -(-n // num_parts)  # nodes per partition (padded)
    owner = lambda v: np.minimum(v // npp, num_parts - 1)

    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask, bool)

    # --- per-partition edge runs (owner = receiver's range) ---
    # stable sort keeps the original edge order inside each partition
    ve_s = senders[edge_mask]
    ve_r = receivers[edge_mask]
    own_r = owner(ve_r)
    order = np.argsort(own_r, kind="stable")
    ve_s, ve_r, own_r = ve_s[order], ve_r[order], own_r[order]
    own_s = owner(ve_s)
    counts = np.bincount(own_r, minlength=num_parts)
    starts = np.concatenate([[0], np.cumsum(counts)])
    run = lambda a, p: a[starts[p] : starts[p + 1]]

    ep = int(counts.max()) if counts.size else 0
    if edges_per_part is not None:
        if edges_per_part < ep:
            raise ValueError(f"edges_per_part={edges_per_part} < max needed {ep}")
        ep = edges_per_part

    # --- halo discovery: remote senders per partition (sorted unique) ---
    halos = [
        np.unique(run(ve_s, p)[run(own_s, p) != p]) for p in range(num_parts)
    ]
    hmax = max((len(h) for h in halos), default=0)

    # --- exports: nodes each partition must contribute to the pool ---
    # export set of p = union over q of (halos[q] owned by p); halos only
    # hold off-partition senders, so q == p contributes nothing to itself.
    # The auto cap covers BOTH sides: an export set can exceed any single
    # partition's import count (partition bordering several others).
    all_halo = (
        np.concatenate(halos) if hmax else np.zeros(0, senders.dtype)
    )
    halo_own = owner(all_halo)
    exports = [np.unique(all_halo[halo_own == p]) for p in range(num_parts)]
    emax = max((len(e) for e in exports), default=0)
    if halo_cap is None:
        halo_cap = max(hmax, emax)
    elif halo_cap < hmax:
        raise ValueError(f"halo_cap={halo_cap} < max needed {hmax}")
    H = max(halo_cap, 1)
    if emax > H:
        raise ValueError(f"export count {emax} exceeds halo_cap {H}")
    # pool position of each exported gid: one vectorized fill per partition
    pool_pos_of = np.full(n, -1, np.int64)
    boundary_idx = np.zeros((num_parts, H), np.int32)
    for p, exp in enumerate(exports):
        boundary_idx[p, : len(exp)] = exp - p * npp  # local index on owner
        pool_pos_of[exp] = p * H + np.arange(len(exp))

    # --- per-partition packed arrays ---
    nodes = np.zeros((num_parts, npp, f), features.dtype)
    pos_ext = np.zeros((num_parts, npp + H, 3), positions.dtype)
    s_arr = np.full((num_parts, ep), npp + H, np.int32)
    r_arr = np.full((num_parts, ep), npp, np.int32)
    e_mask = np.zeros((num_parts, ep), bool)
    n_mask = np.zeros((num_parts, npp), bool)
    halo_map = np.zeros((num_parts, H), np.int32)
    gids = np.full((num_parts, npp), -1, np.int32)

    # split-edge arrays (padded to per-partition maxima)
    loc_counts = [int((run(own_s, p) == p).sum()) for p in range(num_parts)]
    el = max(loc_counts, default=0)
    er = max(
        (int(counts[p]) - loc_counts[p] for p in range(num_parts)), default=0
    )
    if local_edges_per_part is not None:
        if local_edges_per_part < el:
            raise ValueError(f"local_edges_per_part < needed {el}")
        el = local_edges_per_part
    if remote_edges_per_part is not None:
        if remote_edges_per_part < er:
            raise ValueError(f"remote_edges_per_part < needed {er}")
        er = remote_edges_per_part
    sl_arr = np.full((num_parts, max(el, 1)), npp, np.int32)
    rl_arr = np.full((num_parts, max(el, 1)), npp, np.int32)
    ml_arr = np.zeros((num_parts, max(el, 1)), bool)
    sr_arr = np.full((num_parts, max(er, 1)), npp + H, np.int32)
    rr_arr = np.full((num_parts, max(er, 1)), npp, np.int32)
    mr_arr = np.zeros((num_parts, max(er, 1)), bool)

    for p in range(num_parts):
        lo = p * npp
        cnt = max(0, min(npp, n - lo))
        nodes[p, :cnt] = features[lo : lo + cnt]
        pos_ext[p, :cnt] = positions[lo : lo + cnt]
        n_mask[p, :cnt] = True
        gids[p, :cnt] = np.arange(lo, lo + cnt)

        hp = halos[p]
        pos_ext[p, npp : npp + len(hp)] = positions[hp]
        halo_map[p, : len(hp)] = pool_pos_of[hp]

        s, r = run(ve_s, p), run(ve_r, p)
        k = len(s)
        so = run(own_s, p)
        is_loc = so == p
        # remote senders -> halo slot index: hp is sorted unique, so the slot
        # is the searchsorted position (values for local senders are computed
        # then discarded by the where)
        slot = np.searchsorted(hp, s).astype(np.int64) if len(hp) else np.zeros(k, np.int64)
        s_local = np.where(is_loc, s - lo, npp + slot)
        s_arr[p, :k] = s_local
        r_arr[p, :k] = r - lo
        e_mask[p, :k] = True

        kl = int(is_loc.sum())
        kr = k - kl
        sl_arr[p, :kl] = (s - lo)[is_loc]
        rl_arr[p, :kl] = (r - lo)[is_loc]
        ml_arr[p, :kl] = True
        sr_arr[p, :kr] = s_local[~is_loc]
        rr_arr[p, :kr] = (r - lo)[~is_loc]
        mr_arr[p, :kr] = True

    return PartitionedGraph(
        senders_loc=sl_arr,
        receivers_loc=rl_arr,
        mask_loc=ml_arr,
        senders_rem=sr_arr,
        receivers_rem=rr_arr,
        mask_rem=mr_arr,
        num_parts=num_parts,
        n_per_part=npp,
        halo_cap=H,
        nodes=nodes,
        positions_ext=pos_ext,
        senders=s_arr,
        receivers=r_arr,
        edge_mask=e_mask,
        node_mask=n_mask,
        boundary_idx=boundary_idx,
        halo_map=halo_map,
        global_ids=gids,
    )
