"""Benchmark: SEGNN fwd+bwd edges/s/chip on a 100k-point radius-graph cloud.

Headline metric per BASELINE.md (edges/s/chip, SEGNN fwd+bwd, config 3:
100k-point cloud, radius graph via octree cells, lmax=1, 1 chip).  The
reference publishes no numbers ("published": {} in BASELINE.json), so
``vs_baseline`` reports the ratio against a fixed target budget recorded in
this file (NOMINAL_EDGES_PER_S), not a reference measurement.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel.halo import _local_forward
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss
from scalable_e3_gnn_tpu.graph.container import SteerableGraph

# Nominal single-chip throughput budget used as the vs_baseline denominator
# (no reference numbers exist; see BASELINE.md).
NOMINAL_EDGES_PER_S = 1.0e8

N_POINTS = 100_000
RADIUS = 0.04
MAX_NEIGHBORS = 24
LO, HI = (0.0,) * 3, (1.0,) * 3
HIDDEN = "32x0e+16x1o"
NUM_LAYERS = 4


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)

    # --- graph build (octree + cell-list radius graph), timed ---
    t0 = time.time()
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=6)
    jax.block_until_ready(tree.codes)
    octree_ms = (time.time() - t0) * 1e3

    t0 = time.time()
    edges = radius_graph_cell(
        tree, RADIUS, LO, HI, max_neighbors=MAX_NEIGHBORS, cell_capacity=64
    )
    jax.block_until_ready(edges.senders)
    radius_ms = (time.time() - t0) * 1e3
    num_edges = int(edges.num_edges)

    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    graph = SteerableGraph(
        nodes=jnp.asarray(feats),
        positions=tree.points,
        senders=edges.senders,
        receivers=edges.receivers,
        node_graph=jnp.zeros(N_POINTS, jnp.int32),
        node_mask=jnp.ones(N_POINTS, bool),
        edge_mask=edges.mask,
        n_graphs=1,
    )
    target = jnp.asarray(rng.standard_normal((N_POINTS, 3)), jnp.float32)

    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"), num_layers=NUM_LAYERS,
        remat=True,
    )
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)

    def loss_fn(p, g, t):
        return mse_loss(model(p, g), t)

    step = make_train_step(loss_fn, opt)
    state = make_train_state(params, opt)

    # compile + warmup
    state, m = step(state, graph, target)
    jax.block_until_ready(m["loss"])

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, graph, target)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    step_ms = dt / iters * 1e3
    edges_per_s = num_edges * iters / dt

    print(
        json.dumps(
            {
                "metric": "edges_per_s_per_chip_segnn_fwdbwd",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / NOMINAL_EDGES_PER_S, 4),
                "extras": {
                    "n_points": N_POINTS,
                    "n_edges": num_edges,
                    "step_ms": round(step_ms, 3),
                    "octree_build_ms_100k": round(octree_ms, 1),
                    "radius_graph_ms_100k": round(radius_ms, 1),
                    "hidden": HIDDEN,
                    "layers": NUM_LAYERS,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
