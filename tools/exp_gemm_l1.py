"""Bench-config (lmax=1) A/B: specialized stacked-lane kernel vs generic
fused kernel with the CG-folded-GEMM tensor product.

The specialized kernel minimizes VPU element ops; the GEMM form does more
FLOPs but on the MXU.  Norm constants differ (Q1-compat vs correct fan-in),
so this is a wall-clock A/B, not a parity check.
"""

import time

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell, suggest_cell_capacity
from scalable_e3_gnn_tpu.models import segnn as segnn_mod
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.ops.tensor_product import TensorProduct
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss

N = 100_000
K = 24
RADIUS = 0.04
LO, HI = (0.0,) * 3, (1.0,) * 3
HIDDEN = "32x0e+16x1o"
bf = jnp.bfloat16


def step_time(model, graph, attrs, target, params, iters=10):
    opt = optax.adam(1e-3)

    def loss_fn(p, g, a, t):
        p = jax.tree.map(lambda x: x.astype(bf), p)
        return mse_loss(model(p, g, attrs=a).astype(jnp.float32), t)

    step = make_train_step(loss_fn, opt, donate=False)
    state = make_train_state(params, opt)
    state, m = step(state, graph, attrs, target)
    state, m = step(state, graph, attrs, target)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, graph, attrs, target)
    float(m["loss"])
    return (time.perf_counter() - t0) / iters


def fwd_time(model, graph, attrs, params, iters=10):
    p = jax.tree.map(lambda x: x.astype(bf), params)
    fwd = jax.jit(lambda pp: model(pp, graph, attrs=attrs))
    out = fwd(p); out = fwd(p)
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(p)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=6))(jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, RADIUS, LO, HI)
    edges = jax.jit(lambda t: radius_graph_cell(
        t, RADIUS, LO, HI, max_neighbors=K, cell_capacity=cap))(tree)
    feats = rng.standard_normal((N, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True)
    n_edges = int(graph.edge_mask.sum())
    print("edges:", n_edges)
    target = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    def build(force_generic):
        if force_generic:
            orig = segnn_mod._make_tp

            def generic_tp(i_in, i_attr, i_out, layout_in="mul", layout_out="mul"):
                return TensorProduct(i_in, i_attr, i_out,
                                     layout_in1=layout_in, layout_out=layout_out)

            segnn_mod._make_tp = generic_tp
            try:
                m = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                          num_layers=4, remat=True, layout="cm", use_pallas=True)
            finally:
                segnn_mod._make_tp = orig
            for l in m.layers:
                assert all(isinstance(ml.tp, TensorProduct)
                           for ml in l.message_layers)
                l.use_pallas = False
                l.use_pallas_generic = True
        else:
            m = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                      num_layers=4, remat=True, layout="cm", use_pallas=True)
            assert m.layers[0].use_pallas
        return m

    for name, force in (("specialized lmax=1 kernel", False),
                        ("generic GEMM kernel", True)):
        model = build(force)
        params = model.init(jax.random.key(0))
        attrs = jax.jit(model.compute_attributes_dense)(graph)
        g2 = graph._replace(nodes=graph.nodes.astype(bf))
        attrs2 = jax.tree.map(
            lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
        dt = step_time(model, g2, attrs2, target, params)
        df = fwd_time(model, g2, attrs2, params)
        print(f"{name:28s} step {dt*1e3:8.1f} ms ({n_edges/dt/1e6:5.2f}M e/s)"
              f"  fwd {df*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
