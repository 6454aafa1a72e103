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
