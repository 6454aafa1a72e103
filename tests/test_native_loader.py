"""Native host ingest (C++ Morton encode + radix sort) vs the jnp reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from scalable_e3_gnn_tpu.data import native_loader
from scalable_e3_gnn_tpu.graph.morton import morton_encode_points


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(0)
    return rng.random((50_000, 3)).astype(np.float32)


def test_native_builds():
    assert native_loader.available(), "g++ build of native/loader.cpp failed"


def test_encode_matches_jnp(cloud):
    lo, hi = (0.0,) * 3, (1.0,) * 3
    pts_s, codes_s, order = native_loader.morton_encode_sort(cloud, lo, hi)
    ref = np.asarray(morton_encode_points(jnp.asarray(cloud), lo, hi)).astype(
        np.uint32
    )
    np.testing.assert_array_equal(codes_s, ref[order])
    assert (np.diff(codes_s.astype(np.int64)) >= 0).all()  # sorted
    np.testing.assert_array_equal(pts_s, cloud[order])
    # order is a permutation
    assert np.unique(order).size == cloud.shape[0]


def test_sort_stability(cloud):
    """Equal codes keep input order (stable radix)."""
    lo, hi = (0.0,) * 3, (1.0,) * 3
    # quantize coarsely by duplicating points -> guaranteed equal codes
    pts = np.repeat(cloud[:1000], 4, axis=0)
    _, codes_s, order = native_loader.morton_encode_sort(pts, lo, hi)
    ref = native_loader._np_encode(pts, lo, hi)
    order_ref = np.argsort(ref, kind="stable")
    np.testing.assert_array_equal(order, order_ref.astype(np.int32))


def test_gather_rows(cloud):
    feats = np.random.default_rng(1).standard_normal((cloud.shape[0], 7)).astype(
        np.float32
    )
    order = np.random.default_rng(2).permutation(cloud.shape[0]).astype(np.int32)
    np.testing.assert_array_equal(native_loader.gather_rows(feats, order), feats[order])


def test_load_points_bin(tmp_path):
    pts = np.random.default_rng(3).random((100, 3)).astype(np.float32)
    p = tmp_path / "pts.bin"
    pts.tofile(p)
    loaded = native_loader.load_points_bin(str(p))
    np.testing.assert_array_equal(np.asarray(loaded), pts)


def test_rev_table_matches_numpy():
    """Native counting-scatter rev table == the numpy sort-based reference
    (row contents as sets; padding sentinel beyond each row's count)."""
    if not native_loader.available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    S, T = 20000, 700
    tgt = rng.integers(0, T + 5, S).astype(np.int32)  # includes out-of-range
    mask = rng.random(S) < 0.8
    counts = native_loader.rev_counts(tgt, mask, T)
    ref_counts = np.bincount(tgt[mask & (tgt < T)], minlength=T)
    np.testing.assert_array_equal(counts, ref_counts)
    q = int(counts.max()) + 2  # wider than needed: tail must be sentinel
    rev = native_loader.rev_table(tgt, mask, T, sentinel=S, q=q)
    assert rev.shape == (T, q)
    for t in range(0, T, 37):
        row = rev[t]
        got = np.sort(row[row < S])
        want = np.nonzero((tgt == t) & mask)[0]
        np.testing.assert_array_equal(got, want)
        assert (row[len(want):] == S).all()


def test_partition_dense_native_matches_numpy_rev(monkeypatch):
    """partition_graph_dense produces equivalent rev tables with and without
    the native path (row contents as sets; q may differ only by ordering)."""
    from scalable_e3_gnn_tpu.parallel import partition as P
    from scalable_e3_gnn_tpu.data import native_loader as NL

    rng = np.random.default_rng(3)
    n, k = 512, 8
    offs = rng.integers(-20, 21, size=(n, k))
    senders = ((np.arange(n)[:, None] + offs) % n).astype(np.int32)
    mask = rng.random((n, k)) < 0.9
    feats = rng.standard_normal((n, 4)).astype(np.float32)
    pos = rng.random((n, 3)).astype(np.float32)

    part_nat = P.partition_graph_dense(pos, feats, senders, mask, num_parts=4)
    monkeypatch.setattr(NL, "available", lambda: False)
    part_np = P.partition_graph_dense(pos, feats, senders, mask, num_parts=4)

    for a, b in ((part_nat.rev_int, part_np.rev_int),
                 (part_nat.rev_ext, part_np.rev_ext)):
        assert a.shape == b.shape, (a.shape, b.shape)
        sent = a.max()
        for p in range(a.shape[0]):
            np.testing.assert_array_equal(np.sort(a[p], axis=1),
                                          np.sort(b[p], axis=1))


def test_rev_table_multi_matches_per_partition():
    """Batched e3_rev_scatter1 (+1 encoding, 0 = empty) == per-partition
    rev_table (sentinel encoding) after translating both to slot sets."""
    from scalable_e3_gnn_tpu.data.native_loader import (
        available, rev_counts, rev_table, rev_table_multi)

    if not available():
        import pytest
        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(7)
    P, R, K, nt = 4, 200, 8, 210
    tgt = rng.integers(0, nt + 20, (P, R * K)).astype(np.int32)  # some OOR
    mask = (rng.random((P, R * K)) < 0.9).astype(np.uint8)
    q = max(int(rev_counts(tgt[p], mask[p], nt).max()) for p in range(P))
    sent = R * K
    multi = rev_table_multi(tgt, mask, nt, q=q)
    assert multi is not None and multi.shape == (P, nt, q)
    for p in range(P):
        single = rev_table(tgt[p], mask[p], nt, sent, q=q)
        for row in range(nt):
            got = sorted(v - 1 for v in multi[p, row] if v > 0)
            want = sorted(v for v in single[row] if v < sent)
            assert got == want, (p, row)
