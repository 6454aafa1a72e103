"""Stage breakdown of the TABLED generic path at the 250k lmax=2 config.

BENCH_r05-era step is ~615 ms; the kernel-chain MXU floor is ~128 ms
(bench.py lmax2_step_mxu_frac 0.21).  Attribute the remaining ~490 ms:
hu gather, tabled kernel fwd, kernel fwd+bwd (incl. split-rev sender
gradients), rev application alone, update MLP, one layer, full step.

Run: PYTHONPATH=. python tools/exp_tab_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_cell, suggest_cell_capacity)
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from tools.tputime import timed

bf = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    n, k = 250_000, 16
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, (0.,)*3, (1.,)*3, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, (0.,)*3, (1.,)*3)
    e = jax.jit(lambda t: radius_graph_cell(
        t, r, (0.,)*3, (1.,)*3, max_neighbors=k, cell_capacity=cap))(tree)
    g = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True)
    tile = model.layers[0]._pick_generic_tile(n)
    g = g.with_gather_tables(tile=tile)
    print(f"# tile={tile} U={g.gather_tab.shape[1]} "
          f"rem={g.gather_rem_pos.shape[0]} edges={int(g.edge_mask.sum())}",
          flush=True)
    layer = model.layers[0]
    params = model.init(jax.random.key(0))
    lp = jax.tree.map(lambda x: x.astype(bf), params["layer_0"])
    attrs = jax.jit(model.compute_attributes_dense)(g)
    edge_attr, node_attr, dist2, edge_geo = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
    f = model.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (n, f), bf)
    gt = (g.gather_loc, g.gather_tab, g.gather_rev, g.gather_rev_dense,
          g.gather_rem_pos, g.gather_rem_node, g.gather_tile)
    tabf = g.gather_tab.reshape(-1)

    # force kernel construction at the dispatch key
    _ = layer._fused_messages_generic(
        lp, h, h, g.senders, edge_attr, dist2, g.edge_mask,
        reverse_slot=g.reverse_slot, edge_geo=edge_geo, gather=gt)
    kern = next(iter(layer._generic_kernels.values()))
    geo2 = layer._geo2(edge_geo, edge_attr, dist2, g.edge_mask, bf)
    ptuple = tuple(lp[f"msg_{i}"] for i in range(len(layer.message_layers)))

    timed("hu gather take(h, tab)", jax.jit(
        lambda h_: jnp.take(h_, tabf, axis=0, mode="clip") * 1.0), h)

    tab_call = lambda h_: kern.geo_call_tab(
        ptuple, h_, geo2, g.gather_loc, tabf, g.gather_rev_dense,
        g.gather_rem_pos, g.gather_rem_node)
    timed("tabled kernel fwd", jax.jit(tab_call), h)
    timed("tabled kernel fwd+bwd (wrt h)", jax.jit(jax.grad(
        lambda h_: tab_call(h_).astype(jnp.float32).sum())), h)
    timed("tabled kernel fwd+bwd (wrt all)", jax.jit(jax.grad(
        lambda a: kern.geo_call_tab(
            a[0], a[1], geo2, g.gather_loc, tabf, g.gather_rev_dense,
            g.gather_rem_pos, g.gather_rem_node).astype(jnp.float32).sum())),
        (ptuple, h))

    # split-rev application alone (the sender-gradient epilogue)
    du = jax.random.normal(jax.random.key(2), (tabf.shape[0], f), bf)

    def rev_apply(d_hu):
        total = d_hu.shape[0]
        acc = None
        for qq in range(g.gather_rev_dense.shape[1]):
            idx = g.gather_rev_dense[:, qq]
            v = (idx < total).astype(bf)
            p = jnp.take(d_hu, idx, axis=0, mode="clip") * v[:, None]
            acc = p if acc is None else acc + p
        rem = jnp.take(d_hu, g.gather_rem_pos, axis=0, mode="clip")
        return acc + jax.ops.segment_sum(
            rem, g.gather_rem_node, num_segments=n,
            indices_are_sorted=True)
    timed("split-rev apply alone", jax.jit(rev_apply), du)

    def upd(h_):
        u = jnp.concatenate([h_, h_], axis=-1)
        for i, l in enumerate(layer.update_layers):
            u = l(lp[f"upd_{i}"], u, node_attr)
        return u
    timed("update MLP fwd", jax.jit(upd), h)
    timed("update MLP fwd+bwd", jax.jit(jax.grad(
        lambda h_: upd(h_).astype(jnp.float32).sum())), h)

    lf = lambda h_: layer.apply_dense(
        lp, h_, h_, g.senders, None, node_attr, None, g.edge_mask,
        g.node_mask, reverse_slot=g.reverse_slot, gather=gt,
        edge_geo=edge_geo.reshape(n, -1))
    timed("one layer fwd", jax.jit(lf), h)
    timed("one layer fwd+bwd", jax.jit(jax.grad(
        lambda h_: lf(h_).astype(jnp.float32).sum())), h)

    # model-level attribution (chained through the small h-like target so
    # the perturb pass does not ride inside the measurement)
    from scalable_e3_gnn_tpu.train.pipeline import (
        make_train_state, make_train_step, mse_loss)

    a2 = (None, node_attr, None, edge_geo)
    gb = g._replace(nodes=g.nodes.astype(bf))
    t2 = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def loss(p, g_, a_, t_):
        p = jax.tree.map(lambda x: x.astype(bf), p)
        return mse_loss(model(p, g_, attrs=a_).astype(jnp.float32), t_)

    timed("model fwd", jax.jit(
        lambda t_: loss(params, gb, a2, t_)), t2)
    timed("model fwd+bwd (wrt params)", jax.jit(
        lambda t_: jax.tree.leaves(
            jax.grad(loss)(params, gb, a2, t_))[0]), t2)

    step = make_train_step(loss, optax.adam(1e-3), donate=False)
    st = make_train_state(params, optax.adam(1e-3))
    timed("full train step", lambda t_: step(st, gb, a2, t_)[1], t2, iters=5)


if __name__ == "__main__":
    main()
