"""Vectorized partition_graph vs a straight-line per-edge loop oracle.

The production partitioner (parallel/partition.py) must produce bit-identical
arrays to the obvious O(E)-Python-loop construction — same edge order inside
each partition, same halo slot numbering, same pool positions — so the two
are compared field by field on random graphs.
"""

import numpy as np
import pytest

from scalable_e3_gnn_tpu.parallel.partition import partition_graph


def _oracle(positions, features, senders, receivers, edge_mask, num_parts):
    """Per-edge Python-loop construction of the partition arrays (the round-1
    implementation, kept as the correctness oracle for the vectorized one)."""
    n = positions.shape[0]
    npp = -(-n // num_parts)
    owner = lambda v: min(int(v) // npp, num_parts - 1)

    part_edges = [[] for _ in range(num_parts)]
    for e in range(len(senders)):
        if edge_mask[e]:
            part_edges[owner(receivers[e])].append((int(senders[e]), int(receivers[e])))

    halos = []
    for p in range(num_parts):
        halos.append(
            sorted({s for s, _ in part_edges[p] if owner(s) != p})
        )
    H = max((len(h) for h in halos), default=0)

    exports = [[] for _ in range(num_parts)]
    for q in range(num_parts):
        for gid in halos[q]:
            exports[owner(gid)].append(gid)
    exports = [sorted(set(e)) for e in exports]
    pool_pos = {}
    boundary_idx = np.zeros((num_parts, H), np.int32)
    for p, exp in enumerate(exports):
        for j, gid in enumerate(exp):
            boundary_idx[p, j] = gid - p * npp
            pool_pos[gid] = p * H + j

    ep = max((len(pe) for pe in part_edges), default=0)
    s_arr = np.full((num_parts, ep), npp + H, np.int32)
    r_arr = np.full((num_parts, ep), npp, np.int32)
    e_mask = np.zeros((num_parts, ep), bool)
    halo_map = np.zeros((num_parts, H), np.int32)
    pos_ext = np.zeros((num_parts, npp + H, 3), positions.dtype)
    for p in range(num_parts):
        lo = p * npp
        cnt = max(0, min(npp, n - lo))
        pos_ext[p, :cnt] = positions[lo : lo + cnt]
        slot = {g: j for j, g in enumerate(halos[p])}
        for j, g in enumerate(halos[p]):
            pos_ext[p, npp + j] = positions[g]
            halo_map[p, j] = pool_pos[g]
        for i, (s, r) in enumerate(part_edges[p]):
            s_arr[p, i] = s - lo if owner(s) == p else npp + slot[s]
            r_arr[p, i] = r - lo
            e_mask[p, i] = True
    return dict(
        senders=s_arr, receivers=r_arr, edge_mask=e_mask,
        boundary_idx=boundary_idx, halo_map=halo_map, positions_ext=pos_ext,
        halo_cap=H,
    )


@pytest.mark.parametrize("num_parts", [2, 4, 8])
@pytest.mark.parametrize("seed", [0, 1])
def test_vectorized_matches_loop_oracle(num_parts, seed):
    rng = np.random.default_rng(seed)
    n, e = 97, 600  # n deliberately not a multiple of num_parts
    positions = rng.standard_normal((n, 3)).astype(np.float32)
    features = rng.standard_normal((n, 5)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    # receivers non-decreasing (the partitioner contract)
    receivers = np.sort(rng.integers(0, n, e).astype(np.int32))
    edge_mask = rng.random(e) > 0.1

    part = partition_graph(positions, features, senders, receivers, edge_mask, num_parts)
    ref = _oracle(positions, features, senders, receivers, edge_mask, num_parts)

    assert part.halo_cap == ref["halo_cap"]
    for name in ("senders", "receivers", "edge_mask", "boundary_idx", "halo_map"):
        np.testing.assert_array_equal(
            getattr(part, name), ref[name], err_msg=name
        )
    np.testing.assert_array_equal(part.positions_ext, ref["positions_ext"])
    # split lists recombine to the full list (same per-partition edge order:
    # locals and remotes each preserve order and the masks partition the run)
    for p in range(num_parts):
        got = set()
        for sa, ra, ma in ((part.senders_loc, part.receivers_loc, part.mask_loc),
                           (part.senders_rem, part.receivers_rem, part.mask_rem)):
            got |= {(int(s), int(r)) for s, r, m in zip(sa[p], ra[p], ma[p]) if m}
        want = {
            (int(s), int(r))
            for s, r, m in zip(part.senders[p], part.receivers[p], part.edge_mask[p])
            if m
        }
        assert got == want


def test_partition_speed_100k():
    """1.6M edges / 100k nodes must partition in well under a second of host
    time (the 10M/160M case extrapolates to seconds, not hours)."""
    import time

    rng = np.random.default_rng(3)
    n, e = 100_000, 1_600_000
    positions = rng.standard_normal((n, 3)).astype(np.float32)
    features = rng.standard_normal((n, 4)).astype(np.float32)
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = np.sort(rng.integers(0, n, e).astype(np.int32))
    edge_mask = np.ones(e, bool)
    t0 = time.perf_counter()
    partition_graph(positions, features, senders, receivers, edge_mask, 8)
    dt = time.perf_counter() - t0
    assert dt < 10.0, f"partition_graph took {dt:.1f}s at 100k/1.6M"
