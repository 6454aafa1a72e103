"""Train SEGNN on a large point cloud (evaluation configs 3-4).

    python examples/train_pointcloud.py --points 100000            # config 3
    python examples/train_pointcloud.py --points 1000000 --lmax 2  # config 4

Pipeline: octree build -> cell-list radius graph -> dense fixed-K graph ->
jitted bf16 train step (fused Pallas message kernel on the lmax=1 path).
The synthetic target is the local mass-dipole direction — an equivariant
quantity a correct model can actually learn.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--lmax", type=int, default=1)
    ap.add_argument("--radius", type=float, default=None)
    ap.add_argument("--neighbors", type=int, default=24)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--chunks", type=int, default=None)
    ap.add_argument("--capacity", type=int, default=0,
                    help="cell capacity; 0 = auto (measured max occupancy)")
    ap.add_argument("--log", type=str, default=None)
    args = ap.parse_args()

    from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
    from scalable_e3_gnn_tpu.graph.octree import build_octree
    from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell
    from scalable_e3_gnn_tpu.models.segnn import SEGNN
    from scalable_e3_gnn_tpu.train.metrics import MetricsLogger
    from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss
    from scalable_e3_gnn_tpu.utils.profiling import StepTimer

    n = args.points
    radius = args.radius or (0.04 * (100_000 / n) ** (1 / 3))
    lo, hi = (0.0,) * 3, (1.0,) * 3
    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    masses = rng.random((n, 1)).astype(np.float32)

    levels = min(8, max(4, int(np.log2(1.0 / radius))))
    tree = jax.jit(lambda p: build_octree(p, lo, hi, num_levels=levels))(
        jnp.asarray(pts)
    )
    from scalable_e3_gnn_tpu.graph.radius import suggest_cell_capacity

    capacity = args.capacity or suggest_cell_capacity(tree, radius, lo, hi)
    seg = 1_000_000
    if n <= seg:
        edges = jax.jit(
            lambda t: radius_graph_cell(
                t, radius, lo, hi, max_neighbors=args.neighbors,
                cell_capacity=capacity,
            )
        )(tree)
    else:
        # cell-segmented build: one device program per cell range (a single
        # multi-minute program can trip the runtime watchdog); cell-major
        # internals, ~25x faster than row-range segments at 10M points
        from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell_segments

        edges = radius_graph_cell_segments(
            tree, radius, lo, hi, max_neighbors=args.neighbors,
            cell_capacity=capacity, num_segments=max(2, n // seg),
        )
    print(f"N={n} edges={int(edges.num_edges)} radius={radius:.4f} levels={levels}")

    masses_sorted = jnp.asarray(masses)[tree.order]
    feats = jnp.concatenate(
        [masses_sorted, jnp.ones_like(masses_sorted), jnp.zeros((n, 3))], axis=-1
    )
    graph = DenseEdgeGraph.from_radius_edges(feats, tree.points, edges)

    # equivariant synthetic target: local mass dipole Σ_j m_j (x_j - x_i)
    rel = graph.rel_positions()
    mj = jnp.take(masses_sorted[:, 0], jnp.minimum(graph.senders, n - 1))
    target = (rel * jnp.where(graph.edge_mask, mj, 0.0)[..., None]).sum(axis=1)

    hidden = "32x0e+16x1o" if args.lmax == 1 else "24x0e+12x1o+6x2e"
    chunks = args.chunks or max(1, n // 125_000)
    on_tpu = jax.devices()[0].platform == "tpu"
    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps(hidden), Irreps("1x1o"),
        lmax_attr=args.lmax, num_layers=4, remat=True, layout="cm",
        use_pallas=on_tpu and args.lmax == 1, edge_chunks=chunks,
    )
    params = model.init(jax.random.key(0))
    attrs = jax.jit(model.compute_attributes_dense)(graph)
    if args.bf16:
        graph = graph._replace(nodes=graph.nodes.astype(jnp.bfloat16))
        attrs = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, attrs
        )

    opt = optax.adam(1e-3)

    def loss_fn(p, g, a, t):
        if args.bf16:
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        return mse_loss(model(p, g, attrs=a).astype(jnp.float32), t)

    step = make_train_step(loss_fn, opt, donate=False)
    state = make_train_state(params, opt)
    logger = MetricsLogger(args.log, stdout_every=1)
    timer = StepTimer()
    n_edges = int(edges.num_edges)
    for i in range(args.steps):
        state, m = step(state, graph, attrs, target)
        timer.tick(m["loss"])
        logger.log(i, {"loss": m["loss"]}, edges=n_edges)
    print(f"final loss {float(m['loss']):.6f}")


if __name__ == "__main__":
    main()
