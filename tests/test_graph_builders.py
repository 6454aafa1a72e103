"""Unit/property tests: Morton codes, octree invariants, radius graphs
(SURVEY.md §4.3: octree invariants on tiny clouds, radius graph vs O(N²)
brute force, determinism under point shuffling)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scalable_e3_gnn_tpu.graph.morton import (
    BITS,
    morton_decode,
    morton_encode,
    morton_encode_points,
    quantize,
)
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_brute,
    radius_graph_cell,
    search_level_for_radius,
)

LO, HI = (-4.0, -4.0, -4.0), (4.0, 4.0, 4.0)


def _cloud(n=400, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)


def test_morton_roundtrip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(0, 2**BITS, (256, 3)), jnp.int32)
    np.testing.assert_array_equal(np.array(morton_decode(morton_encode(q))), np.array(q))


def test_morton_locality():
    """Adjacent codes differ in low bits: same octant shares high bits."""
    q = jnp.asarray([[0, 0, 0], [1, 1, 1], [512, 512, 512]], jnp.int32)
    c = np.array(morton_encode(q))
    assert c[0] == 0
    assert c[1] == 7  # low 3 bits
    assert c[2] == 7 << 27  # top octant bit triplet


def test_quantize_clips():
    pts = jnp.asarray([[-100.0, 0.0, 100.0]])
    q = np.array(quantize(pts, LO, HI))
    assert q[0, 0] == 0 and q[0, 2] == 2**BITS - 1


def test_octree_level_partition():
    """Every level partitions all points; counts sum to N."""
    pts = _cloud()
    tree = build_octree(pts, LO, HI, num_levels=4, leaf_size=16)
    for l in range(4):
        assert int(np.array(tree.cell_count[l]).sum()) == pts.shape[0]
        nc = int(tree.num_cells[l])
        assert nc <= min(8**l, pts.shape[0])
        # cell codes strictly increasing among real cells
        codes = np.array(tree.cell_code[l])[:nc]
        assert (np.diff(codes) > 0).all()


def test_octree_parent_child_containment():
    pts = _cloud(seed=2)
    tree = build_octree(pts, LO, HI, num_levels=5, leaf_size=8)
    for l in range(4):
        coarse, fine = np.array(tree.point_cell[l]), np.array(tree.point_cell[l + 1])
        mapping = {}
        for f, c in zip(fine, coarse):
            assert mapping.setdefault(f, c) == c, "fine cell split across parents"


def test_octree_deterministic_under_shuffle():
    pts = np.asarray(_cloud(seed=3))
    tree1 = build_octree(jnp.asarray(pts), LO, HI, num_levels=4)
    perm = np.random.default_rng(4).permutation(pts.shape[0])
    tree2 = build_octree(jnp.asarray(pts[perm]), LO, HI, num_levels=4)
    # sorted point sets identical (up to equal-code tie order): compare sorted rows
    a = np.array(tree1.points)
    b = np.array(tree2.points)
    np.testing.assert_allclose(np.sort(a, axis=0), np.sort(b, axis=0), atol=0)
    for l in range(4):
        assert int(tree1.num_cells[l]) == int(tree2.num_cells[l])
        np.testing.assert_array_equal(
            np.array(tree1.cell_count[l]), np.array(tree2.cell_count[l])
        )


def test_octree_leaf_level_monotone():
    pts = _cloud(seed=5)
    tree = build_octree(pts, LO, HI, num_levels=5, leaf_size=10)
    lv = np.array(tree.leaf_level)
    for i, l in enumerate(lv):
        cnt = int(np.array(tree.cell_count[l])[np.array(tree.point_cell[l])[i]])
        assert cnt <= 10 or l == 4


def _edge_set(e):
    s, r, m = np.array(e.senders), np.array(e.receivers), np.array(e.mask)
    return set(zip(s[m].tolist(), r[m].tolist()))


def _numpy_radius_edges(pts, radius):
    p = np.array(pts)
    d = np.linalg.norm(p[:, None, :] - p[None, :, :], axis=-1)
    n = p.shape[0]
    return {(j, i) for i in range(n) for j in range(n) if i != j and d[i, j] <= radius}


@pytest.mark.parametrize("radius", [0.3, 0.6])
def test_radius_brute_vs_numpy(radius):
    pts = _cloud(n=300, seed=6)
    e = radius_graph_brute(pts, radius, max_neighbors=64)
    assert _edge_set(e) == _numpy_radius_edges(pts, radius)


def test_radius_cell_vs_brute():
    pts = _cloud(n=400, seed=7)
    tree = build_octree(pts, LO, HI, num_levels=5)
    r = 0.5
    eb = radius_graph_brute(tree.points, r, max_neighbors=48)
    ec = radius_graph_cell(tree, r, LO, HI, max_neighbors=48, cell_capacity=64)
    assert _edge_set(eb) == _edge_set(ec)


def test_radius_cell_approx_selection():
    """selection='approx' (lax.approx_min_k, the TPU PartialReduce top-k):
    on small candidate sets at high recall it must recover the full edge set
    within radius; K-slot assignment may reorder ties, so compare edge sets
    restricted to rows where K does not truncate."""
    pts = _cloud(n=400, seed=7)
    tree = build_octree(pts, LO, HI, num_levels=5)
    r = 0.5
    k = 48  # large enough that no row truncates (max degree ~30 here)
    es = radius_graph_cell(tree, r, LO, HI, max_neighbors=k, cell_capacity=64)
    ea = radius_graph_cell(
        tree, r, LO, HI, max_neighbors=k, cell_capacity=64,
        selection="approx", approx_recall=0.99,
    )
    assert _edge_set(es) == _edge_set(ea)
    with pytest.raises(ValueError):
        radius_graph_cell(
            tree, r, LO, HI, max_neighbors=k, cell_capacity=64,
            selection="bogus",
        )


def test_radius_cell_major_vs_row_major_segments():
    """Cell-major (default) and segmented row-major paths emit the same
    edge set; the segmented build covers the cloud in two row ranges."""
    pts = _cloud(n=384, seed=9)
    tree = build_octree(pts, LO, HI, num_levels=5)
    r = 0.45
    ec = radius_graph_cell(tree, r, LO, HI, max_neighbors=32, cell_capacity=64)
    parts = [
        radius_graph_cell(
            tree, r, LO, HI, max_neighbors=32, cell_capacity=64,
            row_range=(s, 192), block_size=64,
        )
        for s in (0, 192)
    ]
    seg_edges = set().union(*[_edge_set(p) for p in parts])
    assert _edge_set(ec) == seg_edges
    # per-row truncation decisions must agree too (same candidate ordering)
    s_cell = np.array(ec.senders).reshape(384, 32)
    s_seg = np.concatenate(
        [np.array(p.senders).reshape(192, 32) for p in parts]
    )
    assert (s_cell == s_seg).all()


def test_radius_receiver_sorted_and_trash_padding():
    pts = _cloud(n=100, seed=8)
    e = radius_graph_brute(pts, 0.4, max_neighbors=16)
    r = np.array(e.receivers)
    assert (np.diff(r) >= 0).all()
    s, m = np.array(e.senders), np.array(e.mask)
    assert (s[~m] == pts.shape[0]).all()


def test_max_neighbors_truncates_to_nearest():
    """With a small K cap, the kept neighbors are the nearest ones."""
    pts = jnp.asarray(
        [[0.0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [0.3, 0, 0], [5, 5, 5]], jnp.float32
    )
    e = radius_graph_brute(pts, 1.0, max_neighbors=2)
    s, r, m = np.array(e.senders), np.array(e.receivers), np.array(e.mask)
    got = sorted((sj, ri) for sj, ri, mi in zip(s, r, m) if mi and ri == 0)
    assert got == [(1, 0), (2, 0)]  # nearest two to node 0


def test_search_level():
    assert search_level_for_radius(8.0, LO, HI) == 0
    assert search_level_for_radius(4.0, LO, HI) == 1
    assert search_level_for_radius(0.5, LO, HI) == 4
    assert search_level_for_radius(1e-9, LO, HI) == BITS


def test_radius_cell_segments_match_full():
    """Cell-segmented build == single cell-major build, row for row."""
    from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell_segments

    pts = _cloud(n=500, seed=11)
    tree = build_octree(pts, LO, HI, num_levels=5)
    r = 0.45
    full = radius_graph_cell(tree, r, LO, HI, max_neighbors=24,
                             cell_capacity=64, block_size=128)
    seg = radius_graph_cell_segments(tree, r, LO, HI, max_neighbors=24,
                                     cell_capacity=64, block_size=128,
                                     num_segments=3)
    assert (np.array(full.senders) == np.array(seg.senders)).all()
    assert (np.array(full.mask) == np.array(seg.mask)).all()


def test_cell_selection_approx2_recall():
    """approx2 (celltab + recentered-bf16 d2 + approx_min_k): the edge set
    must cover >=99% of the exact builder's edges on a uniform cloud, and
    every emitted edge must satisfy the radius predicate (no false
    positives beyond bf16 rounding at the cutoff)."""
    import numpy as np

    from scalable_e3_gnn_tpu.graph.octree import build_octree
    from scalable_e3_gnn_tpu.graph.radius import (
        radius_graph_cell, suggest_cell_capacity)

    lo, hi = (0.0,) * 3, (1.0,) * 3
    rng = np.random.default_rng(11)
    n, k, r = 20_000, 12, 0.04
    pts = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    tree = build_octree(pts, lo, hi, num_levels=6)
    cap = suggest_cell_capacity(tree, r, lo, hi)
    exact = radius_graph_cell(tree, r, lo, hi, max_neighbors=k,
                              cell_capacity=cap)
    ap2 = radius_graph_cell(tree, r, lo, hi, max_neighbors=k,
                            cell_capacity=cap, selection="approx2",
                            approx_recall=0.85)
    se, me = np.array(exact.senders), np.array(exact.mask)
    sa, ma = np.array(ap2.senders), np.array(ap2.mask)
    recv = np.repeat(np.arange(n), k)
    E = set(zip(recv[me].tolist(), se[me].tolist()))
    A = set(zip(recv[ma].tolist(), sa[ma].tolist()))
    recall = len(E & A) / max(len(E), 1)
    assert recall >= 0.99, recall
    # all approx2 edges respect the radius (allow bf16 slack at the cutoff)
    p = np.array(tree.points)
    d = np.linalg.norm(p[recv[ma]] - p[sa[ma]], axis=-1)
    assert (d <= r * 1.02).all(), d.max()
