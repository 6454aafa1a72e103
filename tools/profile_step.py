"""Break the 100k-point bench step into timed phases on the real chip.

Times, warm (compile excluded):
  - sender-feature gather alone (take_dense_symmetric fwd)
  - fused message kernel fwd alone (pre-gathered input)
  - one full layer fwd (gather + kernel + update MLP)
  - full model fwd
  - full fwd+bwd (grad)
  - backward gather path alone (tds vjp)

Run: python tools/profile_step.py   (claims the TPU; don't run concurrently
with bench.py)
"""

import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric
from scalable_e3_gnn_tpu.train.pipeline import mse_loss

N_POINTS = 100_000
RADIUS = 0.04
MAX_NEIGHBORS = 24
LO, HI = (0.0,) * 3, (1.0,) * 3
HIDDEN = "32x0e+16x1o"
NUM_LAYERS = 4


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:9.2f} ms")
    return out, dt


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=6))(jnp.asarray(pts))
    edges = jax.jit(
        lambda t: radius_graph_cell(
            t, RADIUS, LO, HI, max_neighbors=MAX_NEIGHBORS, cell_capacity=64
        )
    )(tree)
    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    print("edges:", int(graph.edge_mask.sum()))

    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
        num_layers=NUM_LAYERS, remat=True, layout="cm", use_pallas=True,
    )
    params = model.init(jax.random.key(0))
    attrs = jax.jit(model.compute_attributes_dense)(graph)
    jax.block_until_ready(attrs)
    bf = jnp.bfloat16
    graph = graph._replace(nodes=graph.nodes.astype(bf))
    attrs = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs
    )
    target = jnp.asarray(rng.standard_normal((N_POINTS, 3)), jnp.float32)
    edge_attr, node_attr, dist2 = attrs

    f = model.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (N_POINTS, f), bf)

    # 1. gather alone
    tds = jax.jit(
        lambda h_: take_dense_symmetric(
            h_, graph.senders, graph.reverse_slot, graph.edge_mask
        )
    )
    timed("gather (take_dense_symmetric) fwd", tds, h)

    # 2. gather fwd+bwd
    gb = jax.jit(
        jax.grad(
            lambda h_: take_dense_symmetric(
                h_, graph.senders, graph.reverse_slot, graph.edge_mask
            ).astype(jnp.float32).sum()
        )
    )
    timed("gather fwd+bwd", gb, h)

    # 3. one layer fwd
    layer = model.layers[0]
    lp = params["layer_0"]
    lp = jax.tree.map(lambda x: x.astype(bf), lp)
    lf = jax.jit(
        lambda p_, h_: layer.apply_dense(
            p_, h_, h_, graph.senders, edge_attr, node_attr, dist2,
            graph.edge_mask, graph.node_mask, reverse_slot=graph.reverse_slot,
        )
    )
    timed("one layer fwd", lf, lp, h)

    # 4. one layer fwd+bwd
    lg = jax.jit(
        jax.grad(
            lambda p_, h_: lf.__wrapped__(p_, h_).astype(jnp.float32).sum(),
            argnums=(0, 1),
        )
    )
    timed("one layer fwd+bwd", lg, lp, h)

    # 5. fused kernel fwd alone (message part only, incl. gather)
    mf = jax.jit(
        lambda p_, h_: layer._fused_messages(
            p_, h_, h_, graph.senders, edge_attr, dist2, graph.edge_mask,
            reverse_slot=graph.reverse_slot,
        )
    )
    timed("fused messages fwd (incl gather)", mf, lp, h)
    mg = jax.jit(
        jax.grad(
            lambda p_, h_: mf.__wrapped__(p_, h_).astype(jnp.float32).sum(),
            argnums=1,
        )
    )
    timed("fused messages fwd+bwd", mg, lp, h)

    # 6. full model fwd
    pf = jax.jit(lambda p_: model(p_, graph, attrs=attrs))
    pbf16 = jax.tree.map(lambda x: x.astype(bf), params)
    timed("full model fwd", pf, pbf16)

    # 7. full fwd+bwd
    def loss_fn(p_):
        p2 = jax.tree.map(lambda x: x.astype(bf), p_)
        return mse_loss(model(p2, graph, attrs=attrs).astype(jnp.float32), target)

    pg = jax.jit(jax.grad(loss_fn))
    timed("full model fwd+bwd", pg, params)


if __name__ == "__main__":
    main()
