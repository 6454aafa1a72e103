"""Benchmark: SEGNN fwd+bwd edges/s/chip on a 100k-point radius-graph cloud.

Headline metric per BASELINE.md (edges/s/chip, SEGNN fwd+bwd, config 3:
100k-point cloud, radius graph via octree cells, lmax=1, 1 chip).  The
reference publishes no numbers ("published": {} in BASELINE.json), so
``vs_baseline`` reports the speedup over the measured session-start
UNOPTIMIZED XLA implementation of the same model/config on this chip
(1950 ms/step = 1.146e6 edges/s, BASELINE.md) — our own naive starting
point, not a reference measurement.

All timings are warm (compile excluded; persistent compilation cache enabled).
Graph attributes are precomputed once per graph — they are geometry-only.

Prints exactly one JSON line.
"""

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
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss

# vs_baseline denominator: the session-start unoptimized XLA path for this
# exact model/config on this chip (no reference numbers exist; BASELINE.md).
BASELINE_EDGES_PER_S = 1.146e6

N_POINTS = 100_000
RADIUS = 0.04
MAX_NEIGHBORS = 24
LO, HI = (0.0,) * 3, (1.0,) * 3
HIDDEN = "32x0e+16x1o"
NUM_LAYERS = 4
BF16 = True  # bf16 storage/compute with fp32 param master + fp32 accumulation


def _timed(fn, *args, iters=3):
    """Chained timing: under the axon tunnel, ``block_until_ready`` does not
    reliably wait for remote completion, so each iteration perturbs the first
    array argument by a scalar probe of the previous output (value 0 — results
    unchanged) and one host fetch at the end forces the whole chain."""
    first, rest = args[0], args[1:]

    def probe(o):
        # index the first element directly — ravel() materializes a full
        # copy on big arrays (docs/PERF.md), a scalar slice does not
        leaf = jax.tree.leaves(o)[0]
        return leaf[(0,) * leaf.ndim].astype(jnp.float32)
    perturb = jax.jit(lambda a, p: jax.tree.map(
        lambda x: x + p.astype(x.dtype) * 0 if jnp.issubdtype(x.dtype, jnp.inexact) else x, a))
    out = fn(first, *rest)  # warm (compile)
    p = probe(out)
    out = fn(perturb(first, p), *rest)  # warm the perturbed path too
    p = probe(out)
    float(p)
    t0 = time.time()
    for _ in range(iters):
        out = fn(perturb(first, p), *rest)
        p = probe(out)
    float(p)
    return out, (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)

    build = jax.jit(
        lambda p: build_octree(p, LO, HI, num_levels=6), static_argnums=()
    )
    tree, octree_s = _timed(build, jnp.asarray(pts))

    # headline octree metric: build time at 10M points (BASELINE.md)
    pts10m = rng.random((10_000_000, 3)).astype(np.float32)
    build10 = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=8))
    tree10, octree10m_s = _timed(build10, jnp.asarray(pts10m), iters=1)
    del pts10m

    # config-5 graph build: 10M-point radius graph, K=16, exact nearest-K
    # (cell-segmented cell-major; see tools/exp_radius_topk.py for the
    # approx-selection variant) — reproducible from this one command
    from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell_segments

    r10 = RADIUS * (N_POINTS / 10_000_000) ** (1 / 3)
    cap10 = suggest_cell_capacity(tree10, r10, LO, HI)
    e10 = radius_graph_cell_segments(  # warm (compile)
        tree10, r10, LO, HI, max_neighbors=16, cell_capacity=cap10,
        num_segments=10,
    )
    jax.block_until_ready(e10.senders)
    t0 = time.time()
    e10 = radius_graph_cell_segments(
        tree10, r10, LO, HI, max_neighbors=16, cell_capacity=cap10,
        num_segments=10,
    )
    jax.block_until_ready(e10.senders)
    radius10m_s = time.time() - t0
    # approx2 (r5): celltab gather + recentered-bf16 d2 + approx_min_k at
    # recall 0.85 — selection drives only the neighbor CHOICE (geometry is
    # recomputed from positions downstream); accuracy gated by
    # tools/exp_approx_accuracy.py + tests/test_graph_builders.py
    e10a = radius_graph_cell_segments(  # warm (compile)
        tree10, r10, LO, HI, max_neighbors=16, cell_capacity=cap10,
        num_segments=10, selection="approx2", approx_recall=0.85,
    )
    jax.block_until_ready(e10a.senders)
    t0 = time.time()
    e10a = radius_graph_cell_segments(
        tree10, r10, LO, HI, max_neighbors=16, cell_capacity=cap10,
        num_segments=10, selection="approx2", approx_recall=0.85,
    )
    jax.block_until_ready(e10a.senders)
    radius10m_approx_s = time.time() - t0

    # 10M partition timing (VERDICT r4 next #5): host-side Morton-range
    # dense partition at P=16 with the native batched rev tables.  The
    # device->host pull of senders/mask is NOT in the timed region (it is
    # tunnel-bandwidth, not partitioner work).
    from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense

    s10 = np.asarray(e10a.senders).reshape(10_000_000, 16)
    m10 = np.asarray(e10a.mask).reshape(10_000_000, 16)
    pts10_np = np.asarray(tree10.points)
    f10 = np.zeros((10_000_000, 5), np.float32)
    t0 = time.time()
    part10 = partition_graph_dense(pts10_np, f10, s10, m10, num_parts=16)
    partition10m_s = time.time() - t0
    del part10, s10, m10, pts10_np, f10
    del tree10, e10, e10a

    cap = suggest_cell_capacity(tree, RADIUS, LO, HI)
    rg = jax.jit(
        lambda t: radius_graph_cell(
            t, RADIUS, LO, HI, max_neighbors=MAX_NEIGHBORS, cell_capacity=cap
        )
    )
    edges, radius_s = _timed(rg, tree)
    num_edges = int(edges.num_edges)

    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    # symmetrize: drops K-truncation-asymmetric edges and enables the
    # scatter-free sender-gradient path
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    num_edges = int(graph.edge_mask.sum())
    target = jnp.asarray(rng.standard_normal((N_POINTS, 3)), jnp.float32)

    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"), num_layers=NUM_LAYERS,
        remat=True, layout="cm", use_pallas=True,
    )
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)

    attrs = jax.jit(model.compute_attributes_dense)(graph)
    jax.block_until_ready(attrs)

    if BF16:
        bf = jnp.bfloat16
        graph = graph._replace(nodes=graph.nodes.astype(bf))
        attrs = jax.tree.map(
            lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs
        )

    def loss_fn(p, g, a, t):
        if BF16:
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        out = model(p, g, attrs=a).astype(jnp.float32)
        return mse_loss(out, t)

    step = make_train_step(loss_fn, opt, donate=False)
    state = make_train_state(params, opt)

    # tabled compact sender gather for TRAINING too (r5 final): with the
    # split reverse table + saved-hu residual in the lmax=1 kernel's vjp
    # the tabled step beats untabled 251.2 vs 276.5 ms (tile sweep
    # 64/128/160/256 -> 160; tools/exp_tab100_step.py)
    graph_t = graph.with_gather_tables(tile=160)
    (state, m), step_s = _timed(
        lambda s: step(s, graph_t, attrs, target), state, iters=10)
    fwd = jax.jit(lambda p: model(p, graph_t, attrs=attrs))
    _, fwd_s = _timed(fwd, state.params, iters=10)

    # --- roofline probes (VERDICT r4 weak #8): machine-visible efficiency
    # fractions instead of PERF.md prose.  Ceiling probes run on the live
    # 100k graph; analytic MXU floors for the lmax=2 configs follow below.
    F_HID = Irreps(HIDDEN).dim
    xprobe = jnp.zeros((N_POINTS * MAX_NEIGHBORS, F_HID), jnp.bfloat16)
    ew = jax.jit(lambda x: x * jnp.bfloat16(1.0009765625))
    _, ew_s = _timed(ew, xprobe, iters=10)
    # _timed's chaining perturb is itself a full-size elementwise pass, so
    # each iteration is TWO read+write traversals of xprobe
    ew_gbps = 2 * (2 * xprobe.size * 2) / ew_s / 1e9

    from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric_km

    hg = jnp.zeros((N_POINTS, F_HID), jnp.bfloat16)
    gat = jax.jit(lambda h: take_dense_symmetric_km(
        h, graph.senders, graph.reverse_slot,
        graph.edge_mask.astype(jnp.bfloat16)))
    _, gat_s = _timed(gat, hg, iters=10)
    gather_gbps = 2 * N_POINTS * MAX_NEIGHBORS * F_HID * 2 / gat_s / 1e9
    del xprobe, hg, gat, ew

    # free the 100k-config device buffers before the lmax=2 configs — the
    # 1M block runs within ~1 GiB of HBM; leftover graphs/attrs/state tip it
    del graph, graph_t, attrs, state, fwd, step, target, tree, edges

    # config-4 proxy: 250k points, lmax=2, K=16 — generic CG-folded-GEMM
    # fused kernel (full 1M measured separately: ~6.05 s/step)
    pts250 = rng.random((250_000, 3)).astype(np.float32)
    r250 = RADIUS * (N_POINTS / 250_000) ** (1 / 3)
    tree250 = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=7))(
        jnp.asarray(pts250))
    e250 = jax.jit(lambda t: radius_graph_cell(
        t, r250, LO, HI, max_neighbors=16, cell_capacity=64))(tree250)
    g250 = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((250_000, 5)).astype(np.float32)),
        tree250.points, e250, symmetrize=True)
    m2 = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"), Irreps("1x1o"),
               lmax_attr=2, num_layers=NUM_LAYERS, remat=True, layout="cm",
               use_pallas=True)
    # compact per-tile sender tables at the generic dispatch tile (r5):
    # ~5x fewer gathered rows + split reverse-table sender gradients
    g250 = g250.with_gather_tables(
        tile=m2.layers[0]._pick_generic_tile(250_000))
    p2 = m2.init(jax.random.key(0))
    a2 = jax.jit(m2.compute_attributes_dense)(g250)
    g250b = g250._replace(nodes=g250.nodes.astype(jnp.bfloat16))
    a2 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, a2)
    # geo-only attrs: the generic kernel consumes the packed stream; the raw
    # edge_attr/dist2 would sit in HBM as dead argument buffers
    a2 = (None, a2[1], None, a2[3])
    t2 = jnp.asarray(rng.standard_normal((250_000, 3)), jnp.float32)

    def loss2(p, g, a, t):
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        return mse_loss(m2(p, g, attrs=a).astype(jnp.float32), t)

    step2 = make_train_step(loss2, optax.adam(1e-3), donate=False)
    st2 = make_train_state(p2, optax.adam(1e-3))
    (_, _), lmax2_s = _timed(lambda s: step2(s, g250b, a2, t2), st2, iters=3)
    n_edges2 = int(g250.edge_mask.sum())
    del st2, g250, g250b, a2, t2, tree250, e250

    # config-4 FULL: 1M points, lmax=2, K=16, fused generic kernel,
    # remat_kernel (the HBM enabler) — reproducible from this one command
    # (VERDICT r1: BASELINE.md claims the driver can't re-run aren't evidence)
    from scalable_e3_gnn_tpu.graph.radius import search_level_for_radius

    n1m = 1_000_000
    pts1m = rng.random((n1m, 3)).astype(np.float32)
    r1m = RADIUS * (N_POINTS / n1m) ** (1 / 3)
    lv1 = max(4, search_level_for_radius(r1m, LO, HI) + 1)
    tree1m = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=lv1))(
        jnp.asarray(pts1m))
    cap1 = suggest_cell_capacity(tree1m, r1m, LO, HI)
    e1m = jax.jit(lambda t: radius_graph_cell(
        t, r1m, LO, HI, max_neighbors=16, cell_capacity=cap1))(tree1m)
    g1m = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n1m, 5)).astype(np.float32)),
        tree1m.points, e1m, symmetrize=True)
    m4 = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"), Irreps("1x1o"),
               lmax_attr=2, num_layers=NUM_LAYERS, remat=True, layout="cm",
               use_pallas=True, remat_kernel=True)
    # tabled compact sender gather at 1M too (r5): replay-mode tabled path
    # keeps node-sized residuals (no checkpoint) AND drops the [K, N, F]
    # slot-major gather — A/B 4059 -> 2620 ms (tools/exp_step250.py 1m)
    g1m = g1m.with_gather_tables(tile=m4.layers[0]._pick_generic_tile(n1m))
    p4 = m4.init(jax.random.key(0))
    a4 = jax.jit(m4.compute_attributes_dense)(g1m)
    g1mb = g1m._replace(nodes=g1m.nodes.astype(jnp.bfloat16))
    a4 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, a4)
    a4 = (None, a4[1], None, a4[3])  # geo-only (see a2)
    t4 = jnp.asarray(rng.standard_normal((n1m, 3)), jnp.float32)

    def loss4(p, g, a, t):
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        return mse_loss(m4(p, g, attrs=a).astype(jnp.float32), t)

    step4 = make_train_step(loss4, optax.adam(1e-3), donate=False)
    st4 = make_train_state(p4, optax.adam(1e-3))
    (_, _), c4_s = _timed(lambda s: step4(s, g1mb, a4, t4), st4, iters=2)
    n_edges4 = int(g1m.edge_mask.sum())
    del st4, g1m, g1mb, a4, t4, tree1m, e1m, pts1m

    edges_per_s = num_edges / step_s

    # analytic MXU floors for the generic-kernel configs: the fused message
    # chain is C2 narrow GEMMs per layer (2·C1·C2·D flops/row fwd; the
    # hand-structured backward is 2 GEMMs per forward GEMM, so fwd+bwd = 3x;
    # remat_kernel replays one forward, 4x).  Floor = chain flops at the
    # bf16 MXU peak — kernel-chain only (gathers/update MLP excluded), so
    # the fraction is conservative.  TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM.
    MXU_BF16_PEAK = 197e12
    HBM_PEAK_GBPS = 819.0

    def kernel_flops_per_row(model):
        return sum(
            2 * ml.tp.in1_dim * ml.tp.in2_dim * ml.tp.out_dim
            for ly in model.layers for ml in ly.message_layers
        )

    rows2 = 250_000 * 16
    lmax2_floor_s = 3 * kernel_flops_per_row(m2) * rows2 / MXU_BF16_PEAK
    rows4 = n1m * 16
    # sym-regather path (r5): fwd + replay-backward = 3x the forward chain
    # (the remat_kernel checkpoint replay that made this 4x is gone)
    c4_floor_s = 3 * kernel_flops_per_row(m4) * rows4 / MXU_BF16_PEAK

    print(
        json.dumps(
            {
                "metric": "edges_per_s_per_chip_segnn_fwdbwd",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
                "extras": {
                    "n_points": N_POINTS,
                    "n_edges": num_edges,
                    "step_ms": round(step_s * 1e3, 2),
                    "fwd_ms": round(fwd_s * 1e3, 2),
                    "octree_build_ms_100k": round(octree_s * 1e3, 2),
                    "octree_build_ms_10m": round(octree10m_s * 1e3, 1),
                    "radius_graph_ms_100k": round(radius_s * 1e3, 2),
                    "lmax2_250k_step_ms": round(lmax2_s * 1e3, 1),
                    "lmax2_250k_edges_per_s": round(n_edges2 / lmax2_s, 1),
                    "config4_1m_step_ms": round(c4_s * 1e3, 1),
                    "config4_1m_edges_per_s": round(n_edges4 / c4_s, 1),
                    "radius_graph_s_10m": round(radius10m_s, 2),
                    "radius_graph_s_10m_approx": round(radius10m_approx_s, 2),
                    "partition_s_10m_p16": round(partition10m_s, 2),
                    # roofline fractions (r4 weak #8): probes + analytic floors
                    "ew_ceiling_gbps": round(ew_gbps, 1),
                    "ew_frac_of_hbm": round(ew_gbps / HBM_PEAK_GBPS, 3),
                    "gather_gbps": round(gather_gbps, 1),
                    "gather_frac_of_ew": round(gather_gbps / ew_gbps, 3),
                    "lmax2_mxu_floor_ms": round(lmax2_floor_s * 1e3, 1),
                    "lmax2_step_mxu_frac": round(lmax2_floor_s / lmax2_s, 3),
                    "config4_mxu_floor_ms": round(c4_floor_s * 1e3, 1),
                    "config4_step_mxu_frac": round(c4_floor_s / c4_s, 3),
                    "hidden": HIDDEN,
                    "layers": NUM_LAYERS,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
