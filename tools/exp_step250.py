"""Focused step timer for the 250k lmax=2 config (bench.py's config-4 proxy)
and optionally the 100k lmax=1 headline — for kernel-change A/Bs without the
10M graph builds the full bench runs.

Usage: python tools/exp_step250.py [100k] [250k] [1m] [untabled]
"""

import sys
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

sys.path.insert(0, "/root/repo")
from bench import _timed  # noqa: E402  (same chained protocol as the bench)

LO, HI = (0.0,) * 3, (1.0,) * 3


def build_graph(rng, n, k, num_levels, radius):
    pts = rng.random((n, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=num_levels))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, radius, LO, HI)
    e = jax.jit(lambda t: radius_graph_cell(
        t, radius, LO, HI, max_neighbors=k, cell_capacity=cap))(tree)
    return DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)


def time_step(model, g, geo_only, iters):
    p = model.init(jax.random.key(0))
    a = jax.jit(model.compute_attributes_dense)(g)
    g = g._replace(nodes=g.nodes.astype(jnp.bfloat16))
    a = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, a)
    if geo_only:
        a = (None, a[1], None, a[3])
    t = jnp.asarray(
        np.random.default_rng(1).standard_normal((g.nodes.shape[0], 3)),
        jnp.float32)

    def loss(p, g, a, t):
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        return mse_loss(model(p, g, attrs=a).astype(jnp.float32), t)

    step = make_train_step(loss, optax.adam(1e-3), donate=False)
    st = make_train_state(p, optax.adam(1e-3))
    (_, _), s = _timed(lambda s_: step(s_, g, a, t), st, iters=iters)
    ne = int(g.edge_mask.sum())
    return s, ne


def main():
    which = set(sys.argv[1:]) or {"250k"}
    rng = np.random.default_rng(0)
    if "100k" in which:
        g = build_graph(rng, 100_000, 24, 6, 0.04)
        m = SEGNN(Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
                  num_layers=4, remat=True, layout="cm", use_pallas=True)
        s, ne = time_step(m, g, geo_only=False, iters=10)
        print(f"100k step {s*1e3:8.1f} ms  ({ne/s/1e6:.2f}M edges/s)",
              flush=True)
    # A/B knobs: "t<NN>" forces the generic/table tile, "replay" switches
    # the tabled backward from residual (saved ys) to in-kernel replay
    tile_override = next(
        (int(a[1:]) for a in sys.argv[1:]
         if a.startswith("t") and a[1:].isdigit()), None)
    replay = "replay" in sys.argv[1:]
    if tile_override is not None:
        from scalable_e3_gnn_tpu.models import segnn as _segnn
        _segnn.SEGNNLayer._pick_generic_tile = staticmethod(
            lambda n: tile_override)
    if "250k" in which:
        rng = np.random.default_rng(0)
        g = build_graph(rng, 250_000, 16, 7, 0.04 * (100_000 / 250_000) ** (1 / 3))
        m = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True,
                  residual_bwd=not replay, replay_bwd=True)
        if "untabled" not in sys.argv[1:]:
            g = g.with_gather_tables(
                tile=m.layers[0]._pick_generic_tile(250_000))
        s, ne = time_step(m, g, geo_only=True, iters=5)
        print(f"250k step {s*1e3:8.1f} ms  ({ne/s/1e6:.2f}M edges/s)",
              flush=True)
    if "1m" in which:
        from scalable_e3_gnn_tpu.graph.radius import search_level_for_radius

        rng = np.random.default_rng(0)
        n = 1_000_000
        r = 0.04 * (100_000 / n) ** (1 / 3)
        lv = max(4, search_level_for_radius(r, LO, HI) + 1)
        g = build_graph(rng, n, 16, lv, r)
        m = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True, remat_kernel=True)
        if "untabled" not in sys.argv[1:]:
            g = g.with_gather_tables(tile=m.layers[0]._pick_generic_tile(n))
        s, ne = time_step(m, g, geo_only=True, iters=2)
        print(f"1m step   {s*1e3:8.1f} ms  ({ne/s/1e6:.2f}M edges/s)",
              flush=True)


if __name__ == "__main__":
    main()
