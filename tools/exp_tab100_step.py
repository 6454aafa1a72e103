"""Full-step A/B at the 100k lmax=1 bench config: tabled vs untabled.

Earlier A/B (docs/PERF.md r3): untabled 297.4 vs tabled 303.1 ms — the
tabled backward's dense [N, Q=12] reverse-table gather + hu regather ate
the gather savings.  Re-measure after the r5 split reverse table
(dense q0=2 + sorted-COO remainder) and the hu residual save landed in
the lmax=1 kernel's vjp.

Run: PYTHONPATH=. python tools/exp_tab100_step.py [tile ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_cell, suggest_cell_capacity)
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.pipeline import (
    make_train_state, make_train_step, mse_loss)

LO, HI = (0.0,) * 3, (1.0,) * 3


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [64]
    rng = np.random.default_rng(0)
    n, radius, kmax = 100_000, 0.04, 24
    pts = rng.random((n, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=6))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, radius, LO, HI)
    e = jax.jit(lambda t: radius_graph_cell(
        t, radius, LO, HI, max_neighbors=kmax, cell_capacity=cap))(tree)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    g0 = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, e, symmetrize=True)
    target = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
                  num_layers=4, remat=True, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)

    attrs = jax.jit(model.compute_attributes_dense)(g0)
    bf = jnp.bfloat16
    attrs = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
    g0 = g0._replace(nodes=g0.nodes.astype(bf))

    def loss_fn(p, g, a, t):
        p = jax.tree.map(lambda x: x.astype(bf), p)
        return mse_loss(model(p, g, attrs=a).astype(jnp.float32), t)

    def run(tag, g):
        step = make_train_step(loss_fn, opt, donate=False)
        state = make_train_state(params, opt)
        out = step(state, g, attrs, target)  # compile
        jax.block_until_ready(out[0].params)
        st, m = out
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            st, m = step(st, g, attrs, target)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(f"# {tag:28s} {dt*1e3:7.1f} ms/step", flush=True)
        return dt

    run("untabled", g0)
    for t in tiles:
        gt = g0.with_gather_tables(tile=t)
        run(f"tabled t={t} (split rev)", gt)


if __name__ == "__main__":
    main()
