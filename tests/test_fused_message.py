"""Fused Pallas message kernel vs the jnp path (interpreter mode on CPU).

Covers forward equality, the hand-written backward (input + weight grads),
non-multiple-of-tile N padding, and masked-slot handling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
from scalable_e3_gnn_tpu.models.segnn import SEGNN

LO, HI = (-4.0,) * 3, (4.0,) * 3


def _models(n_layers=2, hidden="16x0e+8x1o"):
    kw = dict(num_layers=n_layers, layout="cm")
    a = SEGNN(Irreps("2x0e+1x1o"), Irreps(hidden), Irreps("1x1o"), **kw)
    b = SEGNN(
        Irreps("2x0e+1x1o"), Irreps(hidden), Irreps("1x1o"), use_pallas=True, **kw
    )
    assert b.layers[0].use_pallas
    return a, b


def _graph(n, seed=0, k=8):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=4)
    e = radius_graph_brute(tree.points, 0.7, max_neighbors=k)
    feats = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    return DenseEdgeGraph.from_radius_edges(feats, tree.points, e)


@pytest.mark.parametrize("n", [128, 200])  # 200: not a multiple of the tile
def test_fused_forward_matches(n):
    m_ref, m_pal = _models()
    g = _graph(n)
    params = m_ref.init(jax.random.key(0))
    ref = np.array(m_ref(params, g))
    with pltpu.force_tpu_interpret_mode():
        pal = np.array(m_pal(params, g))
    np.testing.assert_allclose(pal, ref, atol=2e-5)


def test_fused_gradients_match():
    m_ref, m_pal = _models()
    g = _graph(128, seed=1)
    params = m_ref.init(jax.random.key(1))
    tgt = jnp.asarray(np.random.default_rng(2).standard_normal((128, 3)), jnp.float32)

    def loss(model):
        return lambda p: ((model(p, g) - tgt) ** 2).mean()

    g_ref = jax.grad(loss(m_ref))(params)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss(m_pal))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5)


def test_fused_respects_mask():
    """Invalid neighbor slots must not contribute (compare vs fewer edges)."""
    m_ref, m_pal = _models(n_layers=1)
    g = _graph(128, seed=3)
    params = m_ref.init(jax.random.key(2))
    # zero out half the valid slots in both paths -> outputs must still agree
    mask2 = np.array(g.edge_mask)
    mask2[:, ::2] = False
    g2 = g._replace(edge_mask=jnp.asarray(mask2))
    ref = np.array(m_ref(params, g2))
    with pltpu.force_tpu_interpret_mode():
        pal = np.array(m_pal(params, g2))
    np.testing.assert_allclose(pal, ref, atol=2e-5)


@pytest.mark.parametrize("pack", [2, 4])
def test_pack_forward_and_grads_match(pack):
    """pack>1 (v3 lane packing) must reproduce pack=1 exactly: forward and
    all gradients, including masked slots and the padded-N tail tile."""
    kw = dict(num_layers=2, layout="cm", use_pallas=True)
    m1 = SEGNN(Irreps("2x0e+1x1o"), Irreps("16x0e+8x1o"), Irreps("1x1o"), **kw)
    mp = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("16x0e+8x1o"), Irreps("1x1o"), pack=pack, **kw
    )
    assert m1.layers[0].use_pallas and mp.layers[0].use_pallas
    n = 200  # not a multiple of the tile -> exercises the padded reshape
    g = _graph(n, seed=7)
    assert g.senders.shape[1] % pack == 0
    params = m1.init(jax.random.key(4))
    tgt = jnp.asarray(np.random.default_rng(8).standard_normal((n, 3)), jnp.float32)

    def loss(model):
        return lambda p: ((model(p, g) - tgt) ** 2).mean()

    with pltpu.force_tpu_interpret_mode():
        f1 = np.array(m1(params, g))
        fp = np.array(mp(params, g))
        g1 = jax.grad(loss(m1))(params)
        gp = jax.grad(loss(mp))(params)
    np.testing.assert_allclose(fp, f1, atol=2e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-6)


def test_pack_not_dividing_k_falls_back():
    """K=8 with pack=3: the dispatch must silently run unpacked."""
    m = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("16x0e+8x1o"), Irreps("1x1o"),
        num_layers=1, layout="cm", use_pallas=True, pack=3,
    )
    g = _graph(128, seed=9)
    params = m.init(jax.random.key(5))
    with pltpu.force_tpu_interpret_mode():
        out = np.array(m(params, g))
    assert np.isfinite(out).all()


def test_ineligible_configs_fall_back():
    m = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+4x1o+2x1e"), Irreps("1x1o"),
        num_layers=1, layout="mul", use_pallas=True,
    )
    assert not m.layers[0].use_pallas  # 1e in hidden + mul layout -> jnp path


def test_gather_tables_invariants():
    """with_gather_tables: every real slot's sender is at tab[tile, loc];
    masked slots point at U; rev lists exactly the flat tab positions."""
    g = _graph(200, seed=5).with_gather_tables(tile=32)
    loc = np.array(g.gather_loc)
    tab = np.array(g.gather_tab)
    rev = np.array(g.gather_rev)
    senders = np.array(g.senders)
    mask = np.array(g.edge_mask)
    n, k = senders.shape
    u = tab.shape[1]
    tiles = np.arange(n) // 32
    real = mask
    np.testing.assert_array_equal(
        tab[tiles[:, None].repeat(k, 1)[real], loc[:n][real]], senders[real]
    )
    assert (loc[:n][~real] == u).all()
    flat = tab.ravel()
    for v in range(0, n, 13):
        want = sorted(np.nonzero(flat == v)[0])
        got = sorted(p for p in rev[v] if p < flat.size)
        assert want == got


@pytest.mark.parametrize("n", [128, 200])  # 200: tail tile is partial
def test_tabled_forward_matches(n):
    m_ref, m_pal = _models()
    g = _graph(n)
    gt = g.with_gather_tables(tile=32)
    params = m_ref.init(jax.random.key(0))
    ref = np.array(m_ref(params, g))
    with pltpu.force_tpu_interpret_mode():
        pal = np.array(m_pal(params, gt))
    np.testing.assert_allclose(pal, ref, atol=2e-5)


def test_tabled_gradients_match():
    m_ref, m_pal = _models()
    g = _graph(128, seed=1)
    gt = g.with_gather_tables(tile=32)
    params = m_ref.init(jax.random.key(1))
    tgt = jnp.asarray(np.random.default_rng(2).standard_normal((128, 3)), jnp.float32)
    g_ref = jax.grad(lambda p: ((m_ref(p, g) - tgt) ** 2).mean())(params)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(lambda p: ((m_pal(p, gt) - tgt) ** 2).mean())(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5)


def test_km2_gemm_form_matches_stacked_lane():
    """GEMM-form (km2) vs stacked-lane km kernel: forward + all grads.

    gemm_form=True is the production dispatch (r4); this pins the dormant
    stacked-lane forward as its oracle so either regressing breaks CI."""
    import dataclasses

    from scalable_e3_gnn_tpu.kernels.fused_message import (
        MessageConfig, fused_message_aggregate_km)
    from scalable_e3_gnn_tpu.models.segnn import SEGNNLayer

    n, k, tile = 256, 8, 64
    layer = SEGNNLayer(Irreps("32x0e+16x1o"), Irreps.spherical_harmonics(1),
                       layout="cm", use_pallas=True)
    params = layer.init(jax.random.key(0))
    w = layer._folded_weights(params, jnp.float32)
    f = layer.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (n, f), jnp.float32)
    hs3 = jax.random.normal(jax.random.key(2), (k, n, f), jnp.float32)
    attr3 = jax.random.normal(jax.random.key(3), (n, k, 4), jnp.float32)
    d23 = jax.random.uniform(jax.random.key(4), (n, k), jnp.float32)
    mask3 = (jax.random.uniform(jax.random.key(5), (n, k)) > 0.2).astype(
        jnp.float32)
    geo2 = jnp.concatenate(
        [attr3, d23[..., None], mask3[..., None]], -1).reshape(n, k * 6)
    cfg2 = MessageConfig(hs=32, hv=16, k=k, tile=tile, bwd_tile=tile,
                         gemm_form=True)
    cfg1 = dataclasses.replace(cfg2, gemm_form=False)
    # gemm_form_bwd=True is opt-in (measured slower, PERF.md r4) but must
    # stay correct: without this config both cfg1/cfg2 run the identical km
    # backward and _bwd_kernel_km2 has zero coverage (r4 ADVICE.md)
    cfg3 = dataclasses.replace(cfg2, gemm_form_bwd=True)

    def loss(cfg):
        def fn(hs_, h_, *w_):
            out = fused_message_aggregate_km(cfg, hs_, h_, geo2, *w_)
            return (out.astype(jnp.float32) ** 2).sum()
        return fn

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.value_and_grad(loss(cfg1), argnums=(0, 1, 2, 3, 4, 5))(
            hs3, h, *w)
        g2 = jax.value_and_grad(loss(cfg2), argnums=(0, 1, 2, 3, 4, 5))(
            hs3, h, *w)
        g3 = jax.value_and_grad(loss(cfg3), argnums=(0, 1, 2, 3, 4, 5))(
            hs3, h, *w)
    np.testing.assert_allclose(g1[0], g2[0], rtol=3e-6)
    np.testing.assert_allclose(g1[0], g3[0], rtol=3e-6)
    for gv in (g2, g3):
        for a, b in zip(jax.tree.leaves(g1[1]), jax.tree.leaves(gv[1])):
            scale = float(jnp.abs(a).max()) or 1.0
            np.testing.assert_allclose(
                np.array(a) / scale, np.array(b) / scale, atol=3e-6)
