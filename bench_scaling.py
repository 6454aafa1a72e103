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
    from jax.sharding import PartitionSpec as PS

    from scalable_e3_gnn_tpu.parallel.multihost import global_put

    tgt_sh = global_put(tgt[np.clip(part.global_ids, 0, None)], mesh,
                        PS("graph"))
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


def config5_single_chip(iters: int, chunks: int, points: int) -> None:
    """Config 5 (10M-point cosmology cloud, lmax=2, K=16): ONE-CHIP train
    step via node-block streaming — the honest single-chip measurement the
    multi-host spec row builds on (no >=2-host hardware in this sandbox).

    HBM budget at 10M/F=90/bf16 on a 15.75 GB v5e (docs/PERF.md "config 5"):
    static graph+attrs ~5.9 GB, remat_layers boundaries 4x1.8 GB, chunked
    per-edge transients ~[N/chunks, K, F].  edge_chunks streams the message
    pass; remat_layers checkpoints each layer; attrs are computed chunked in
    bf16 (the one-shot fp32 [N, K, 9] sh would transiently need ~12 GB).
    """
    from scalable_e3_gnn_tpu.graph.radius import (
        radius_graph_cell_segments,
        search_level_for_radius,
    )
    from scalable_e3_gnn_tpu.train.pipeline import make_train_step, mse_loss

    lo, hi = (0.0,) * 3, (1.0,) * 3
    k = 16
    rng = np.random.default_rng(0)
    pts = rng.random((points, 3)).astype(np.float32)
    r = 0.04 * (100_000 / points) ** (1 / 3)
    levels = max(4, search_level_for_radius(r, lo, hi) + 1)
    t0 = time.time()
    tree = jax.jit(lambda p: build_octree(p, lo, hi, num_levels=levels))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, lo, hi)
    e = radius_graph_cell_segments(
        tree, r, lo, hi, max_neighbors=k, cell_capacity=cap,
        num_segments=max(points // 1_000_000, 1), selection="approx",
    )
    jax.block_until_ready(e.senders)
    build_s = time.time() - t0
    feats = rng.standard_normal((points, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, e, symmetrize=False)
    n_edges = int(np.asarray(graph.edge_mask).sum())
    # free the build-time device buffers before the training allocations:
    # the flat RadiusEdges (senders+mask ~0.8 GB at 10M) and the octree's
    # cell arrays are dead weight; only graph.* stays
    e = None
    tree = None
    del pts

    def hbm(tag):
        try:
            s = jax.local_devices()[0].memory_stats()
            print(f"# [{tag}] HBM in use: "
                  f"{s['bytes_in_use']/2**30:.2f} GiB", flush=True)
        except Exception:
            pass

    hbm("after graph build")

    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"), Irreps("1x1o"),
        lmax_attr=2, num_layers=4, remat=True, layout="cm", use_pallas=True,
        edge_chunks=chunks, remat_kernel=True, remat_layers=2,
    )
    params = model.init(jax.random.key(0))

    # chunked bf16 attribute build: lax.map over node slabs, emitting only
    # the packed geo stream + node attrs (geo-only attrs; a one-shot fp32
    # [N, K, 9] sh build would transiently need ~12 GB at 10M)
    bf = jnp.bfloat16
    # ~1M-point attr slabs, but nchunk must divide points exactly
    nchunk = max(points // 1_000_000, 1)
    while nchunk > 1 and points % nchunk:
        nchunk -= 1
    c = points // nchunk

    from scalable_e3_gnn_tpu.core.spherical import spherical_harmonics

    def attrs_chunked(pos, snd, msk):
        def attr_chunk(i):
            sl = i * c
            d = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, c, axis=0)
            sd, mk = d(snd), d(msk)
            rel = pos[sd] - d(pos)[:, None, :]
            dist2 = jnp.sum(rel * rel, axis=-1)
            ea = spherical_harmonics(2, rel)
            ea = jnp.where(mk[..., None], ea, 0.0)
            cnt = jnp.maximum(mk.sum(axis=1), 1)
            na = ea.sum(axis=1) / cnt[:, None].astype(ea.dtype)
            na = na.at[..., 0].set(1.0)
            geo = jnp.concatenate(
                [ea, dist2[..., None], mk[..., None].astype(ea.dtype)],
                axis=-1)
            return geo.astype(bf), na.astype(bf)

        return jax.lax.map(attr_chunk, jnp.arange(nchunk))

    # arrays enter as arguments, NOT closure constants — constants embed in
    # the serialized module and blow the remote-compile request body (HTTP
    # 413 at 10M points)
    geo, na = jax.jit(attrs_chunked)(
        graph.positions, graph.senders, graph.edge_mask)
    # geo-only attrs: passing the raw [N, K, 9] edge_attr too would hand
    # XLA a whole-graph tensor it relayouts into a 4.8 GB temp (r3 OOM #1)
    attrs = (None, na.reshape(points, -1), None,
             geo.reshape(points, k * (9 + 2)))  # 2-D lane-dense
    jax.block_until_ready(attrs)
    graph = graph._replace(nodes=graph.nodes.astype(bf))
    target = jnp.asarray(rng.standard_normal((points, 3)), jnp.float32)

    def loss_fn(p, g, a, t):
        p = jax.tree.map(lambda x: x.astype(bf), p)
        return mse_loss(model(p, g, attrs=a).astype(jnp.float32), t)

    opt = optax.adam(1e-3)
    step = make_train_step(loss_fn, opt, donate=False)
    st = make_train_state(params, opt)
    (st, m), step_s = _timed_chain(lambda s: step(s, graph, attrs, target),
                                   st, iters=iters)
    print(json.dumps({
        "metric": "config5_step_ms",
        "value": round(step_s * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(n_edges / step_s / 1e6, 3),
        "extras": {
            "n_points": points, "n_edges": n_edges, "k": k,
            "edges_per_s": round(n_edges / step_s, 1),
            "graph_build_s": round(build_s, 2),
            "loss": float(m["loss"]),
            "chunks": chunks,
            "device": str(jax.devices()[0]),
        },
    }))


def _timed_chain(fn, state, iters):
    """Chained timing through the axon tunnel (see bench.py _timed)."""
    out = fn(state)
    jax.block_until_ready(out[1]["loss"])
    probe = float(out[1]["loss"])
    t0 = time.time()
    for _ in range(iters):
        out = fn(out[0])
    jax.block_until_ready(out[1]["loss"])
    return out, (time.time() - t0) / iters


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
    ap.add_argument("--config5", action="store_true",
                    help="single-chip 10M-point lmax=2 train step")
    ap.add_argument("--chunks", type=int, default=25)
    ap.add_argument("--project", action="store_true",
                    help="config-5 projected scaling efficiency at 16 chips"
                         " / 4 hosts from MEASURED inputs: real-chip "
                         "per-shard step at P=16 partition shapes + halo "
                         "stats + public v5e link specs "
                         "(tools/exp_scaling_projection.py)")
    args = ap.parse_args()

    if args.project:
        import os
        import runpy

        runpy.run_path(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "exp_scaling_projection.py"),
            run_name="__main__")
        return

    if args.config5:
        pts = args.points if args.points != 50_000 else 10_000_000
        config5_single_chip(args.iters, args.chunks, pts)
        return

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

    if jax.process_count() > 1:
        # multi-process: every process must participate in every program —
        # a sub-mesh over a subset of processes leaves the rest computing a
        # DIFFERENT program (observed: Gloo segfault in the excluded
        # process, r4).  Measure only the full-device mesh; the P=1..P/2
        # curve is the single-process 8-virtual-device run's job.
        sizes = [len(devices)]
    else:
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
