"""Config-4 style (lmax=2) step timing: jnp chunked path vs generic fused kernel."""

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
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.pipeline import (make_train_state,
                                                make_train_step, mse_loss)

N = 250_000
K = 16
LO, HI = (0.0,) * 3, (1.0,) * 3
HIDDEN = "24x0e+12x1o+6x2e"
bf = jnp.bfloat16


def step_time(model, graph, attrs, target, params, iters=5):
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


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N, 3)).astype(np.float32)
    radius = 0.04 * (100_000 / N) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=7))(
        jnp.asarray(pts))
    edges = jax.jit(lambda t: radius_graph_cell(
        t, radius, LO, HI, max_neighbors=K, cell_capacity=64))(tree)
    feats = rng.standard_normal((N, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True)
    n_edges = int(graph.edge_mask.sum())
    print("edges:", n_edges)
    target = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    for name, kw in (
        # CG-folded GEMM TP materializes z=[E, C1*C2] per chunk in the jnp
        # path -> needs ~4x more chunks than the sparse path did
        ("jnp chunked (gemm TP)", dict(use_pallas=False, edge_chunks=8)),
        ("generic fused kernel", dict(use_pallas=True, edge_chunks=1)),
    ):
        model = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                      lmax_attr=2, num_layers=4, remat=True, layout="cm", **kw)
        if kw["use_pallas"]:
            assert model.layers[0].use_pallas_generic
        params = model.init(jax.random.key(0))
        attrs = jax.jit(model.compute_attributes_dense)(graph)
        g2 = graph._replace(nodes=graph.nodes.astype(bf))
        attrs = jax.tree.map(
            lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
        dt = step_time(model, g2, attrs, target, params)
        print(f"{name:36s} {dt*1e3:9.1f} ms/step  "
              f"{n_edges/dt/1e6:6.2f}M edges/s")


if __name__ == "__main__":
    main()
