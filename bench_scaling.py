"""Scaling-efficiency bench: SEGNN fwd+bwd edges/s at mesh sizes 1..P.

The capability spec (BASELINE.json:5) asks for edges/s measured at 1 chip /
1 host / N>=2 hosts with >=85% scaling efficiency.  This harness measures the
dense fused distributed train step (parallel/halo.py) at every power-of-two
spatial mesh size the device pool allows, on whatever devices exist:

- 1 tunneled TPU chip (this sandbox): degenerate P=1 point;
- CPU device farm: ``env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py``
  exercises the full partitioning/exchange curve (numbers are CPU-relative);
- a real TPU slice / pod: run unmodified per host with
  ``JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID`` set
  (parallel/multihost.py) — the mesh then spans hosts over DCN.

Strong scaling on a fixed cloud: efficiency(P) = t(1) / (P * t(P)).
Prints one JSON line.
"""

import argparse
import json
import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell, suggest_cell_capacity
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel.halo import (
    make_dist_geometry_dense,
    make_dist_train_step_dense,
    shard_partitioned_dense,
)
from scalable_e3_gnn_tpu.parallel.multihost import init_distributed, make_hosts_mesh
from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense
from scalable_e3_gnn_tpu.train.pipeline import make_train_state


def build_cloud(n, k, radius_scale=1.0):
    from scalable_e3_gnn_tpu.graph.radius import search_level_for_radius

    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3) * radius_scale
    levels = max(4, search_level_for_radius(r, (0.0,) * 3, (1.0,) * 3) + 1)
    tree = jax.jit(
        lambda p: build_octree(p, (0.0,) * 3, (1.0,) * 3, num_levels=levels)
    )(jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, (0.0,) * 3, (1.0,) * 3)
    edges = jax.jit(
        lambda t: radius_graph_cell(
            t, r, (0.0,) * 3, (1.0,) * 3, max_neighbors=k, cell_capacity=cap
        )
    )(tree)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    tgt = rng.standard_normal((n, 3)).astype(np.float32)
    return tree, graph, feats, tgt


def measure(model, graph, tree, feats, tgt, num_parts, iters, bf16, devices):
    part = partition_graph_dense(
        np.array(tree.points), feats, np.array(graph.senders),
        np.array(graph.edge_mask), num_parts=num_parts,
    )
    mesh = make_hosts_mesh(dp=1, axis_names=("dp", "graph"),
                           devices=devices[:num_parts])
    from jax.sharding import Mesh

    mesh = Mesh(np.array(devices[:num_parts]).reshape(num_parts), ("graph",))
    args = shard_partitioned_dense(part, mesh)
    attrs = make_dist_geometry_dense(model, mesh)(args)
    jax.block_until_ready(attrs)
    compute_dtype = None
    if bf16:
        bf = jnp.bfloat16
        args = tuple(x.astype(bf) if x.dtype == jnp.float32 else x for x in args)
        attrs = jax.tree.map(
            lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs
        )
        compute_dtype = bf
    tgt_sh = jnp.asarray(tgt[np.clip(part.global_ids, 0, None)])
    opt = optax.adam(1e-3)
    step = make_dist_train_step_dense(model, opt, mesh, compute_dtype=compute_dtype)
    st = make_train_state(model.init(jax.random.key(0)), opt)
    st, m = step(st, args, tgt_sh, attrs)
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for _ in range(iters):
        st, m = step(st, args, tgt_sh, attrs)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / iters
    return dt, float(m["loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=50_000)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", default="32x0e+16x1o")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-bf16", action="store_true")
    ap.add_argument("--no-pallas", action="store_true",
                    help="CPU farms cannot run Mosaic kernels")
    args = ap.parse_args()

    init_distributed()
    devices = jax.devices()
    on_cpu = devices[0].platform == "cpu"
    use_pallas = not (args.no_pallas or on_cpu)
    bf16 = not (args.no_bf16 or on_cpu)

    tree, graph, feats, tgt = build_cloud(args.points, args.k)
    n_edges = int(np.asarray(graph.edge_mask).sum())
    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps(args.hidden), Irreps("1x1o"),
        num_layers=args.layers, remat=True, layout="cm", use_pallas=use_pallas,
    )

    sizes = []
    p = 1
    while p <= len(devices):
        sizes.append(p)
        p *= 2
    curve = {}
    t1 = None
    for p in sizes:
        dt, loss = measure(
            model, graph, tree, feats, tgt, p, args.iters, bf16, devices
        )
        t1 = dt if t1 is None else t1
        eff = t1 / (p * dt)
        curve[str(p)] = {
            "step_ms": round(dt * 1e3, 2),
            "edges_per_s": round(n_edges / dt, 1),
            "efficiency": round(eff, 4),
        }
        print(f"# P={p}: {dt*1e3:.1f} ms/step, eff={eff:.3f}", flush=True)

    last = curve[str(sizes[-1])]
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": last["efficiency"],
                "unit": "t1/(P*tP)",
                "vs_baseline": round(last["efficiency"] / 0.85, 4),
                "extras": {
                    "n_points": args.points,
                    "n_edges": n_edges,
                    "devices": len(devices),
                    "platform": devices[0].platform,
                    "processes": jax.process_count(),
                    "curve": curve,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
