"""Chained (trustworthy) timings of every stage of the bench step.

Protocol: each iteration perturbs one small input by a scalar read from the
previous iteration's output (value 0, so results are unchanged), forcing true
sequential device execution; one host fetch at the end.
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
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric
from scalable_e3_gnn_tpu.train.pipeline import (make_train_state,
                                                make_train_step, mse_loss)

N_POINTS = 100_000
RADIUS = 0.04
K = 24
LO, HI = (0.0,) * 3, (1.0,) * 3
HIDDEN = "32x0e+16x1o"
bf = jnp.bfloat16


def chained(name, fn, seed_scalar, iters=10):
    """fn(prev_scalar) -> (out, next_scalar); times true sequential chain."""
    out, p = fn(seed_scalar)
    out, p = fn(p)
    float(p)  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out, p = fn(p)
    float(p)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=6))(jnp.asarray(pts))
    edges = jax.jit(
        lambda t: radius_graph_cell(t, RADIUS, LO, HI, max_neighbors=K,
                                    cell_capacity=64)
    )(tree)
    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    print("edges:", int(graph.edge_mask.sum()))

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                  num_layers=4, remat=True, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    attrs0 = jax.jit(model.compute_attributes_dense)(graph)
    graph = graph._replace(nodes=graph.nodes.astype(bf))
    attrs = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x,
                         attrs0)
    target = jnp.asarray(rng.standard_normal((N_POINTS, 3)), jnp.float32)
    edge_attr, node_attr, dist2 = attrs
    f = model.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (N_POINTS, f), bf)
    layer = model.layers[0]
    lp = jax.tree.map(lambda x: x.astype(bf), params["layer_0"])

    # 1. elementwise ceiling on [N*K, F]
    big = jax.random.normal(jax.random.key(2), (N_POINTS * K, f), bf)
    ew = jax.jit(lambda x, p: (x * 1.001 + p * 0.0))
    chained("elementwise [N*K,F] (ceiling)", lambda p: (
        lambda o: (o, o.ravel()[0].astype(jnp.float32))
    )(ew(big, p)), jnp.float32(0))

    # 2. gather fwd
    tds = jax.jit(lambda h_, p: take_dense_symmetric(
        h_ + p * 0.0, graph.senders, graph.reverse_slot, graph.edge_mask))
    chained("gather fwd", lambda p: (
        lambda o: (o, o.ravel()[0].astype(jnp.float32))
    )(tds(h, p)), jnp.float32(0))

    # 3. gather fwd+bwd
    gb = jax.jit(lambda h_, p: jax.grad(
        lambda hh: take_dense_symmetric(
            hh, graph.senders, graph.reverse_slot, graph.edge_mask
        ).astype(jnp.float32).sum())(h_ + p * 0.0))
    chained("gather fwd+bwd", lambda p: (
        lambda o: (o, o.ravel()[0].astype(jnp.float32))
    )(gb(h, p)), jnp.float32(0))

    # 4. fused messages fwd (incl gather)
    mf = jax.jit(lambda p_, h_, e: layer._fused_messages(
        p_, h_ + e * 0.0, h_ + e * 0.0, graph.senders, edge_attr, dist2,
        graph.edge_mask, reverse_slot=graph.reverse_slot))
    chained("fused messages fwd (incl gather)", lambda p: (
        lambda o: (o, o.ravel()[0].astype(jnp.float32))
    )(mf(lp, h, p)), jnp.float32(0))

    # 5. fused messages fwd+bwd
    mg = jax.jit(lambda p_, h_, e: jax.grad(
        lambda hh: layer._fused_messages(
            p_, hh, hh, graph.senders, edge_attr, dist2, graph.edge_mask,
            reverse_slot=graph.reverse_slot,
        ).astype(jnp.float32).sum())(h_ + e * 0.0))
    chained("fused messages fwd+bwd", lambda p: (
        lambda o: (o, o.ravel()[0].astype(jnp.float32))
    )(mg(lp, h, p)), jnp.float32(0))

    # 6. one full layer fwd+bwd
    lg = jax.jit(lambda p_, h_, e: jax.grad(
        lambda hh: layer.apply_dense(
            p_, hh, hh, graph.senders, edge_attr, node_attr, dist2,
            graph.edge_mask, graph.node_mask, reverse_slot=graph.reverse_slot,
        ).astype(jnp.float32).sum())(h_ + e * 0.0))
    chained("one layer fwd+bwd", lambda p: (
        lambda o: (o, o.ravel()[0].astype(jnp.float32))
    )(lg(lp, h, p)), jnp.float32(0))

    # 7. full train step (state-chained; the real metric)
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
    for _ in range(10):
        state, m = step(state, graph, attrs, target)
    float(m["loss"])
    print(f"{'full train step (state-chained)':46s} "
          f"{(time.perf_counter() - t0) / 10 * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
