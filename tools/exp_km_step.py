"""Train-step-only timing harness (fast kernel iteration, no bench extras).

Defaults to the exact bench.py config-3 problem (100k pts, K=24, symmetric,
hidden 32x0e+16x1o, bf16, 4 layers, remat) and times ONLY the train step
with the chained protocol.  Env knobs: N, K, LMAX (1 -> km lmax=1 kernel /
2 -> generic kernel + 24x0e+12x1o+6x2e hidden), GEO_ONLY=1 (geo-only attrs
4-tuple, the config-5 protocol), ITERS.  The km-vs-t-major kernel A/B is
tools/exp_km_ab.py (isolated, no glue).
"""

import os
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
from scalable_e3_gnn_tpu.train.pipeline import (
    make_train_state,
    make_train_step,
    mse_loss,
)

N = int(os.environ.get("N", "100000"))
K = int(os.environ.get("K", "24"))
LMAX = int(os.environ.get("LMAX", "1"))
R = 0.04 * (100_000 / N) ** (1 / 3)
HIDDEN = "32x0e+16x1o" if LMAX == 1 else "24x0e+12x1o+6x2e"
LO, HI = (0.0,) * 3, (1.0,) * 3


def main():
    from scalable_e3_gnn_tpu.graph.radius import search_level_for_radius

    rng = np.random.default_rng(0)
    pts = rng.random((N, 3)).astype(np.float32)
    lv = max(4, search_level_for_radius(R, LO, HI) + 1)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=lv))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, R, LO, HI)
    e = jax.jit(lambda t: radius_graph_cell(
        t, R, LO, HI, max_neighbors=K, cell_capacity=cap))(tree)
    g = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((N, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)
    n_edges = int(g.edge_mask.sum())
    tgt = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                  lmax_attr=LMAX,
                  num_layers=4, remat=True, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    attrs = jax.jit(model.compute_attributes_dense)(g)
    bf = jnp.bfloat16
    g = g._replace(nodes=g.nodes.astype(bf))
    attrs = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
    if os.environ.get("GEO_ONLY"):
        attrs = (None, attrs[1], None, attrs[3])

    def loss_fn(p, gg, a, t):
        p = jax.tree.map(lambda x: x.astype(bf), p)
        return mse_loss(model(p, gg, attrs=a).astype(jnp.float32), t)

    step = make_train_step(loss_fn, optax.adam(1e-3), donate=False)
    st = make_train_state(params, optax.adam(1e-3))
    st, m = step(st, g, attrs, tgt)
    jax.block_until_ready(m["loss"])
    float(m["loss"])
    iters = int(os.environ.get("ITERS", "10"))
    t0 = time.time()
    for _ in range(iters):
        st, m = step(st, g, attrs, tgt)
    jax.block_until_ready(m["loss"])
    float(m["loss"])
    dt = (time.time() - t0) / iters
    print(f"step {dt*1e3:.1f} ms  ({n_edges/dt/1e6:.2f}M edges/s, "
          f"{n_edges} edges)", flush=True)


if __name__ == "__main__":
    main()
