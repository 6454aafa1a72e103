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
    if halo_cap is None:
        halo_cap = hmax
    elif halo_cap < hmax:
        raise ValueError(f"halo_cap={halo_cap} < max needed {hmax}")
    H = halo_cap

    # --- exports: nodes each partition must contribute to the pool ---
    # export set of p = union over q of (halos[q] owned by p); halos only
    # hold off-partition senders, so q == p contributes nothing to itself
    all_halo = (
        np.concatenate(halos) if hmax else np.zeros(0, senders.dtype)
    )
    halo_own = owner(all_halo)
    exports = [np.unique(all_halo[halo_own == p]) for p in range(num_parts)]
    emax = max((len(e) for e in exports), default=0)
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
