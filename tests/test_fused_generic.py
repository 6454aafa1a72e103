"""Generic fused message kernel (any-lmax) vs the jnp path — interpreter mode.

Mirrors tests/test_fused_message.py for the lmax=2 configuration (config 4):
forward equality, gradients through the in-kernel jax.vjp backward, and mask
handling.
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
HIDDEN = "8x0e+4x1o+2x2e"


def _models(n_layers=2):
    a = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
              num_layers=n_layers, layout="cm", lmax_attr=2)
    b = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
              num_layers=n_layers, layout="cm", lmax_attr=2, use_pallas=True)
    assert b.layers[0].use_pallas_generic
    assert not b.layers[0].use_pallas
    return a, b


def _graph(n, seed=0, k=8):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=4)
    e = radius_graph_brute(tree.points, 0.7, max_neighbors=k)
    feats = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    return DenseEdgeGraph.from_radius_edges(feats, tree.points, e,
                                            symmetrize=True)


@pytest.mark.parametrize("n", [128, 116])  # 116: no divisor -> pad path
def test_generic_forward_matches(n):
    m_ref, m_pal = _models()
    g = _graph(n)
    params = m_ref.init(jax.random.key(0))
    ref = np.array(m_ref(params, g))
    with pltpu.force_tpu_interpret_mode():
        pal = np.array(m_pal(params, g))
    np.testing.assert_allclose(pal, ref, atol=2e-5)


def test_generic_gradients_match():
    m_ref, m_pal = _models()
    g = _graph(128, seed=1)
    params = m_ref.init(jax.random.key(1))
    tgt = jnp.asarray(np.random.default_rng(2).standard_normal((128, 3)),
                      jnp.float32)

    def loss(model):
        return lambda p: ((model(p, g) - tgt) ** 2).mean()

    g_ref = jax.grad(loss(m_ref))(params)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss(m_pal))(params)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(g_pal), key=key),
    ):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=3e-5,
                                   err_msg=str(ka))


def test_generic_respects_mask():
    m_ref, m_pal = _models(n_layers=1)
    g = _graph(128, seed=3)
    params = m_ref.init(jax.random.key(2))
    mask2 = np.array(g.edge_mask)
    mask2[:, ::2] = False
    g2 = g._replace(edge_mask=jnp.asarray(mask2))
    ref = np.array(m_ref(params, g2))
    with pltpu.force_tpu_interpret_mode():
        pal = np.array(m_pal(params, g2))
    np.testing.assert_allclose(pal, ref, atol=2e-5)


def test_residual_bwd_matches_recompute_bwd():
    """The residual-saving backward (saved pre-gate TP outputs, hand-
    structured transpose) must reproduce the in-kernel-jax.vjp recompute
    backward exactly — same kernel, same operands, both modes."""
    from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
        FusedMessageGeneric)

    m_ref, m_pal = _models()
    layer = m_pal.layers[0]
    g = _graph(128, seed=4)
    n, k = g.senders.shape
    params = m_pal.init(jax.random.key(3))
    lp = params["layer_0"]
    attrs = m_pal.compute_attributes_dense(g)
    edge_geo = attrs[3]
    f = m_pal.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(4), (n, f), jnp.float32)
    # slot-major [K, N, F] sender operand; fill mode zeroes padded slots
    # (plain take would clamp/NaN them — ADVICE.md r2)
    hs = jnp.take(h, g.senders.T, axis=0, mode="fill", fill_value=0)
    geo2 = edge_geo.reshape(n, -1)
    ptuple = (lp["msg_0"], lp["msg_1"])

    kern_res = FusedMessageGeneric(layer.message_layers, k, tile=8,
                                   bwd_tile=8, residual_bwd=True)
    kern_rep = FusedMessageGeneric(layer.message_layers, k, tile=8,
                                   bwd_tile=8, residual_bwd=False)
    kern_rec = FusedMessageGeneric(layer.message_layers, k, tile=8,
                                   bwd_tile=8, residual_bwd=False,
                                   replay_bwd=False)
    assert kern_res.residual_bwd and not kern_rec.residual_bwd
    assert kern_rep.replay_bwd and not kern_rep.residual_bwd
    assert not kern_rec.replay_bwd  # the jax.vjp fallback keeps coverage

    def loss(kern):
        return lambda args: (
            kern.geo_call(args[0], args[1], args[2], geo2) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        o_res = np.array(kern_res.geo_call(ptuple, hs, h, geo2))
        o_rec = np.array(kern_rec.geo_call(ptuple, hs, h, geo2))
        g_res = jax.grad(loss(kern_res))((ptuple, hs, h))
        g_rep = jax.grad(loss(kern_rep))((ptuple, hs, h))
        g_rec = jax.grad(loss(kern_rec))((ptuple, hs, h))
    np.testing.assert_allclose(o_res, o_rec, atol=1e-6)
    for gv in (g_res, g_rep):
        for a, b in zip(jax.tree_util.tree_leaves(gv),
                        jax.tree_util.tree_leaves(g_rec)):
            np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-4,
                                       rtol=1e-4)


# NOTE: remat_kernel=True (the 1M-point memory mode) cannot be exercised in
# interpret mode — jax.checkpoint rejects the ordered-IO effects interpret-
# mode pallas_call carries.  Its numerical parity is jax.checkpoint's
# contract; the 1M-point config-4 run drives it on real hardware.


def test_geo_only_attrs_matches_full():
    """The packed geo stream alone (attrs = (None, node_attr, None, geo))
    must reproduce the full-attrs forward — the config-4/5 bench protocol
    drops the raw edge_attr/dist2 argument buffers entirely."""
    m_ref, m_pal = _models()
    g = _graph(128, seed=6)
    params = m_ref.init(jax.random.key(5))
    attrs = m_pal.compute_attributes_dense(g)
    with pltpu.force_tpu_interpret_mode():
        full = np.array(m_pal(params, g, attrs=attrs))
        geoonly = np.array(
            m_pal(params, g, attrs=(None, attrs[1], None, attrs[3])))
    np.testing.assert_allclose(geoonly, full, atol=1e-6)


def test_colpad_matches_unpadded():
    """colpad (lane-aligned saved-y residuals, the r4 model dispatch) vs the
    unpadded kernel: forward + weight grads through the residual backward."""
    from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
        FusedMessageGeneric)

    n, k = 128, 8
    m = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
              lmax_attr=2, num_layers=1, layout="cm", use_pallas=True)
    lay = m.layers[0]
    f = m.hidden_irreps.dim
    a = Irreps.spherical_harmonics(2).dim
    params = m.init(jax.random.key(0))["layer_0"]
    ptuple = (params["msg_0"], params["msg_1"])
    h = jax.random.normal(jax.random.key(1), (n, f), jnp.float32)
    hs = jax.random.normal(jax.random.key(2), (k, n, f), jnp.float32)
    attr = jax.random.normal(jax.random.key(3), (n * k, a), jnp.float32)
    d2 = jax.random.uniform(jax.random.key(4), (n * k, 1), jnp.float32)
    maskf = (jax.random.uniform(jax.random.key(5), (n * k, 1)) > 0.2).astype(
        jnp.float32)
    k0 = FusedMessageGeneric(lay.message_layers, k, tile=64, bwd_tile=64)
    k1 = FusedMessageGeneric(lay.message_layers, k, tile=64, bwd_tile=64,
                             colpad=True)
    assert k1.colpad and not k0.colpad

    def loss(kern):
        return lambda pt: (
            kern(pt, hs, h, d2, attr, maskf).astype(jnp.float32) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        l0, g0 = jax.value_and_grad(loss(k0))(ptuple)
        l1, g1 = jax.value_and_grad(loss(k1))(ptuple)
    np.testing.assert_allclose(float(l0), float(l1), rtol=3e-6)
    for x, y in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        scale = float(jnp.abs(x).max()) or 1.0
        np.testing.assert_allclose(np.array(x) / scale, np.array(y) / scale,
                                   atol=3e-6)


def test_kernel_constructed_inside_trace_does_not_leak():
    """The model builds FusedMessageGeneric lazily inside jit traces and
    caches it; any jnp array created in __init__ (the psel gate operands)
    is a tracer of that first trace and leaks into any LATER trace that
    reuses the cached kernel (UnexpectedTracerError at the 1M remat_kernel
    bench config, r4 — the remat backward is a second trace).  Regression:
    build the kernel inside one jitted grad trace, then trace a different
    jitted function with the same cached kernel."""
    _, m = _models(n_layers=1)
    g = _graph(128, seed=3)
    params = m.init(jax.random.key(3))
    tgt = jnp.asarray(
        np.random.default_rng(4).standard_normal((128, 3)), jnp.float32)

    def loss(p):
        return ((m(p, g) - tgt) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        jax.block_until_ready(jax.jit(jax.grad(loss))(params))  # builds kern
        # a second, different trace must not see the first trace's tracers
        jax.block_until_ready(jax.jit(lambda p: m(p, g) * 2.0)(params))


def test_sym_regather_entry_matches():
    """geo_call_sym (sender gather inside the custom_vjp, node-sized
    residuals, replay backward) must match geo_call + take_dense_symmetric_km
    in both forward and all gradients (r5: the remat_kernel 1M path)."""
    from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
        FusedMessageGeneric)
    from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric_km

    m_ref, m_pal = _models()
    layer = m_pal.layers[0]
    g = _graph(128, seed=5)
    n, k = g.senders.shape
    params = m_pal.init(jax.random.key(5))
    lp = params["layer_0"]
    attrs = m_pal.compute_attributes_dense(g)
    geo2 = attrs[3].reshape(n, -1)
    f = m_pal.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(6), (n, f), jnp.float32)
    ptuple = (lp["msg_0"], lp["msg_1"])
    kern = FusedMessageGeneric(layer.message_layers, k, tile=8, bwd_tile=8,
                               residual_bwd=False)
    assert kern.replay_bwd

    def loss_ref(args):
        p, h_ = args
        hs = take_dense_symmetric_km(h_, g.senders, g.reverse_slot,
                                     g.edge_mask)
        return (kern.geo_call(p, hs, h_, geo2) ** 2).sum()

    def loss_sym(args):
        p, h_ = args
        return (kern.geo_call_sym(p, h_, geo2, g.senders,
                                  g.reverse_slot) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        o_ref = np.array(kern.geo_call(
            ptuple, take_dense_symmetric_km(h, g.senders, g.reverse_slot,
                                            g.edge_mask), h, geo2))
        o_sym = np.array(kern.geo_call_sym(ptuple, h, geo2, g.senders,
                                           g.reverse_slot))
        g_ref = jax.grad(loss_ref)((ptuple, h))
        g_sym = jax.grad(loss_sym)((ptuple, h))
    np.testing.assert_allclose(o_sym, o_ref, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sym)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-4,
                                   rtol=1e-4)


def test_remat_kernel_sym_model_grads_match():
    """A remat_kernel model now takes the sym-regather path (no checkpoint,
    node-sized residuals) — its gradients must match the plain generic
    model's.  This also gives remat_kernel its first interpret-mode
    coverage (the old checkpoint path rejected interpret-mode effects)."""
    m_plain = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                    num_layers=2, layout="cm", lmax_attr=2, use_pallas=True)
    m_rk = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                 num_layers=2, layout="cm", lmax_attr=2, use_pallas=True,
                 remat=True, remat_kernel=True, residual_bwd=False)
    g = _graph(128, seed=7)
    assert m_rk.layers[0]._sym_regather_eligible(128, True)
    params = m_plain.init(jax.random.key(8))
    tgt = jnp.asarray(np.random.default_rng(9).standard_normal((128, 3)),
                      jnp.float32)

    def loss(model):
        return lambda p: ((model(p, g) - tgt) ** 2).mean()

    with pltpu.force_tpu_interpret_mode():
        g_a = jax.grad(loss(m_plain))(params)
        g_b = jax.grad(loss(m_rk))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-4,
                                   rtol=1e-4)


def test_tabled_entry_matches():
    """geo_call_tab (compact per-tile sender tables, in-kernel one-hot
    expand, split reverse-table sender gradients) must match geo_call +
    take_dense_symmetric_km in forward and all gradients — in both the
    residual and the replay backward modes (r5)."""
    from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
        FusedMessageGeneric)
    from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric_km

    m_ref, m_pal = _models()
    layer = m_pal.layers[0]
    g = _graph(128, seed=8).with_gather_tables(tile=8)
    n, k = g.senders.shape
    params = m_pal.init(jax.random.key(10))
    lp = params["layer_0"]
    attrs = m_pal.compute_attributes_dense(g)
    geo2 = attrs[3].reshape(n, -1)
    f = m_pal.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(11), (n, f), jnp.float32)
    ptuple = (lp["msg_0"], lp["msg_1"])
    tabargs = (g.gather_loc, g.gather_tab, g.gather_rev_dense,
               g.gather_rem_pos, g.gather_rem_node)

    def loss_ref(kern):
        def f_(args):
            p, h_ = args
            hs = take_dense_symmetric_km(h_, g.senders, g.reverse_slot,
                                         g.edge_mask)
            return (kern.geo_call(p, hs, h_, geo2) ** 2).sum()
        return f_

    def loss_tab(kern):
        def f_(args):
            p, h_ = args
            return (kern.geo_call_tab(p, h_, geo2, *tabargs) ** 2).sum()
        return f_

    for residual in (True, False):
        kern = FusedMessageGeneric(layer.message_layers, k, tile=8,
                                   bwd_tile=8, residual_bwd=residual)
        assert kern.residual_bwd == residual
        with pltpu.force_tpu_interpret_mode():
            o_ref = np.array(kern.geo_call(
                ptuple, take_dense_symmetric_km(
                    h, g.senders, g.reverse_slot, g.edge_mask), h, geo2))
            o_tab = np.array(kern.geo_call_tab(ptuple, h, geo2, *tabargs))
            g_ref = jax.grad(loss_ref(kern))((ptuple, h))
            g_tab = jax.grad(loss_tab(kern))((ptuple, h))
        np.testing.assert_allclose(o_tab, o_ref, atol=1e-6,
                                   err_msg=f"residual={residual}")
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_tab)):
            np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-4,
                                       rtol=1e-4,
                                       err_msg=f"residual={residual}")


def test_tabled_model_dispatch_grads_match():
    """A model fed a graph carrying matching-tile gather tables must take
    the tabled generic path (asserted via _tab_eligible) and reproduce the
    untabled model's gradients — for both the plain (residual) and the
    remat_kernel (replay, no checkpoint) configurations."""
    g0 = _graph(128, seed=12)
    m_ref = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                  num_layers=2, layout="cm", lmax_attr=2)
    m_plain = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                    num_layers=2, layout="cm", lmax_attr=2, use_pallas=True)
    t = m_plain.layers[0]._pick_generic_tile(128)
    g = g0.with_gather_tables(tile=t)
    gather = (g.gather_loc, g.gather_tab, g.gather_rev, g.gather_rev_dense,
              g.gather_rem_pos, g.gather_rem_node, g.gather_tile)
    assert m_plain.layers[0]._tab_eligible(128, gather)
    m_rk = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                 num_layers=2, layout="cm", lmax_attr=2, use_pallas=True,
                 remat=True, remat_kernel=True, residual_bwd=False)
    params = m_plain.init(jax.random.key(13))
    tgt = jnp.asarray(np.random.default_rng(14).standard_normal((128, 3)),
                      jnp.float32)

    def loss(model, graph):
        return lambda p: ((model(p, graph) - tgt) ** 2).mean()

    g_base = jax.grad(loss(m_ref, g0))(params)
    with pltpu.force_tpu_interpret_mode():
        g_tab = jax.grad(loss(m_plain, g))(params)
        g_rk = jax.grad(loss(m_rk, g))(params)
    for got, name in ((g_tab, "tabled"), (g_rk, "remat_kernel-tabled")):
        for a, b in zip(jax.tree_util.tree_leaves(g_base),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-4,
                                       rtol=1e-4, err_msg=name)
