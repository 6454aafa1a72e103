"""Dense fixed-K edge layout: must match the COO segment-sum path exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph, SteerableGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
from scalable_e3_gnn_tpu.models.segnn import SEGNN

LO, HI = (-4.0,) * 3, (4.0,) * 3


def _problem(n=300, seed=0, k=16):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=4)
    e = radius_graph_brute(tree.points, 0.7, max_neighbors=k)
    feats = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    return tree, e, feats


@pytest.mark.parametrize("layout", ["mul", "cm"])
def test_dense_equals_coo(layout):
    tree, e, feats = _problem()
    n = feats.shape[0]
    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"),
        num_layers=2, layout=layout,
    )
    params = model.init(jax.random.key(0))
    g_coo = SteerableGraph(
        feats, tree.points, e.senders, e.receivers,
        jnp.zeros(n, jnp.int32), jnp.ones(n, bool), e.mask, 1,
    )
    g_dense = DenseEdgeGraph.from_radius_edges(feats, tree.points, e)
    np.testing.assert_allclose(
        np.array(model(params, g_coo)), np.array(model(params, g_dense)), atol=2e-5
    )


def test_dense_remat_matches():
    tree, e, feats = _problem(seed=1)
    m1 = SEGNN(Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"), num_layers=2)
    m2 = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"), num_layers=2,
        remat=True,
    )
    params = m1.init(jax.random.key(1))
    g = DenseEdgeGraph.from_radius_edges(feats, tree.points, e)

    def loss(model):
        return lambda p: (model(p, g) ** 2).sum()

    np.testing.assert_allclose(
        float(loss(m1)(params)), float(loss(m2)(params)), rtol=1e-6
    )
    g1 = jax.grad(loss(m1))(params)
    g2 = jax.grad(loss(m2))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4, atol=1e-5)


def test_dense_rel_positions_masked():
    tree, e, feats = _problem(seed=2)
    g = DenseEdgeGraph.from_radius_edges(feats, tree.points, e)
    rel = np.array(g.rel_positions())
    mask = np.array(g.edge_mask)
    assert (rel[~mask] == 0).all()
    # valid slots: |rel| <= radius
    norms = np.linalg.norm(rel[mask], axis=-1)
    assert (norms <= 0.7 + 1e-5).all()
    assert (norms > 0).all()


@pytest.mark.parametrize("lmax", [1, 2])
def test_chunked_attrs_match_one_shot(lmax):
    """compute_attributes_dense_chunked ≡ compute_attributes_dense on the
    streams it emits (node_attr + packed geo), for both sh orders."""
    tree, e, feats = _problem(seed=3, n=320)
    g = DenseEdgeGraph.from_radius_edges(feats, tree.points, e)
    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"),
        num_layers=2, lmax_attr=lmax,
    )
    _, na, _, geo = jax.jit(model.compute_attributes_dense)(g)
    out = jax.jit(
        lambda pos, snd, msk: model.compute_attributes_dense_chunked(
            pos, snd, msk, nchunk=4, dtype=jnp.float32
        )
    )(g.positions, g.senders, g.edge_mask)
    assert out[0] is None and out[2] is None
    np.testing.assert_allclose(np.array(out[1]), np.array(na), atol=1e-6)
    np.testing.assert_allclose(np.array(out[3]), np.array(geo), atol=1e-6)


@pytest.mark.parametrize("chunks", [1, 4])
def test_geo_only_attrs_lmax1(chunks):
    """The geo-only 4-tuple (config-5 protocol) must work — and match full
    attrs — on the lmax=1 path too (jnp fallback here; the Pallas dispatch
    shares the same pre-dispatch unpack)."""
    tree, e, feats = _problem(seed=4, n=320)
    g = DenseEdgeGraph.from_radius_edges(feats, tree.points, e)
    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"),
        num_layers=2, lmax_attr=1, edge_chunks=chunks,
    )
    params = model.init(jax.random.key(0))
    full = jax.jit(model.compute_attributes_dense)(g)
    geo_only = (None, full[1], None, full[3])
    ref = np.array(model(params, g, attrs=full))
    out = np.array(model(params, g, attrs=geo_only))
    np.testing.assert_allclose(out, ref, atol=2e-5)
