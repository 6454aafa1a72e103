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

__all__ = ["PartitionedGraph", "partition_graph"]


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
    """Split a receiver-sorted graph into P Morton-contiguous partitions."""
    n = positions.shape[0]
    f = features.shape[1]
    npp = -(-n // num_parts)  # nodes per partition (padded)
    owner = lambda v: np.minimum(v // npp, num_parts - 1)

    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_mask = np.asarray(edge_mask, bool)

    # --- per-partition edge lists (owner = receiver's range) ---
    part_edges = []
    for p in range(num_parts):
        sel = edge_mask & (owner(receivers) == p)
        part_edges.append((senders[sel], receivers[sel]))
    ep = max(len(s) for s, _ in part_edges)
    if edges_per_part is not None:
        if edges_per_part < ep:
            raise ValueError(f"edges_per_part={edges_per_part} < max needed {ep}")
        ep = edges_per_part

    # --- halo discovery: remote senders per partition ---
    halos = []  # list of arrays of global sender ids (sorted unique)
    for p, (s, _) in enumerate(part_edges):
        remote = np.unique(s[owner(s) != p])
        halos.append(remote)
    hmax = max((len(h) for h in halos), default=0)
    if halo_cap is None:
        halo_cap = hmax
    elif halo_cap < hmax:
        raise ValueError(f"halo_cap={halo_cap} < max needed {hmax}")
    H = halo_cap

    # --- exports: nodes each partition must contribute to the pool ---
    # export set of p = union over q != p of (halos[q] owned by p)
    exports = [[] for _ in range(num_parts)]
    for q in range(num_parts):
        for gid in halos[q]:
            exports[int(owner(gid))].append(int(gid))
    exports = [sorted(set(e)) for e in exports]
    emax = max((len(e) for e in exports), default=0)
    if emax > H:
        raise ValueError(f"export count {emax} exceeds halo_cap {H}")
    # pool position of each exported gid
    pool_pos = {}
    boundary_idx = np.zeros((num_parts, H), np.int32)
    for p, exp in enumerate(exports):
        for j, gid in enumerate(exp):
            boundary_idx[p, j] = gid - p * npp  # local index on owner
            pool_pos[gid] = p * H + j

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
    el = max(
        (int((owner(s) == p).sum()) for p, (s, _) in enumerate(part_edges)),
        default=0,
    )
    er = max(
        (int((owner(s) != p).sum()) for p, (s, _) in enumerate(part_edges)),
        default=0,
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

        halo_slot = {int(g): j for j, g in enumerate(halos[p])}
        for j, g in enumerate(halos[p]):
            pos_ext[p, npp + j] = positions[g]
            halo_map[p, j] = pool_pos[int(g)]

        s, r = part_edges[p]
        k = len(s)
        so = owner(s)
        s_local = np.where(
            so == p,
            s - lo,
            npp + np.array([halo_slot.get(int(g), 0) for g in s], np.int32),
        )
        s_arr[p, :k] = s_local
        r_arr[p, :k] = r - lo
        e_mask[p, :k] = True

        is_loc = so == p
        kl, kr = int(is_loc.sum()), int((~is_loc).sum())
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
