"""Exact vs approx top-k edge selection: does training notice? (VERDICT r2 weak #7)

``selection="approx"`` (TPU PartialReduce top-k) drops ~0.009% of edges at
10M points for a 3.4x faster build.  This A/B trains the 250k lmax=2
config-4 proxy for N steps on the exact graph and on the approx graph with
identical seeds and compares the loss curves — the downstream check that the
dropped edges don't matter.

Run on the chip:  python tools/exp_approx_accuracy.py [--steps 30]
"""

import argparse
import json
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
    radius_graph_cell_segments,
    suggest_cell_capacity,
)
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.pipeline import (
    make_train_state,
    make_train_step,
    mse_loss,
)

LO, HI = (0.0,) * 3, (1.0,) * 3


def run(selection, pts, feats, target, steps):
    r = 0.04 * (100_000 / pts.shape[0]) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, LO, HI)
    e = radius_graph_cell_segments(
        tree, r, LO, HI, max_neighbors=16, cell_capacity=cap,
        num_segments=2, selection=selection)
    g = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, e, symmetrize=True)
    n_edges = int(np.asarray(g.edge_mask).sum())
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    attrs = jax.jit(model.compute_attributes_dense)(g)
    bf = jnp.bfloat16
    gb = g._replace(nodes=g.nodes.astype(bf))
    attrs = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)

    def loss_fn(p, g_, a, t):
        p = jax.tree.map(lambda x: x.astype(bf), p)
        return mse_loss(model(p, g_, attrs=a).astype(jnp.float32), t)

    step = make_train_step(loss_fn, optax.adam(1e-3), donate=False)
    st = make_train_state(params, optax.adam(1e-3))
    curve = []
    for i in range(steps):
        st, m = step(st, gb, attrs, target)
        curve.append(float(m["loss"]))
    return n_edges, curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--points", type=int, default=250_000)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    pts = rng.random((args.points, 3)).astype(np.float32)
    feats = rng.standard_normal((args.points, 5)).astype(np.float32)
    target = jnp.asarray(rng.standard_normal((args.points, 3)), jnp.float32)

    ne_ex, ex = run("sort", pts, feats, target, args.steps)
    out = {"edges_exact": ne_ex, "final_loss_exact": ex[-1],
           "steps": args.steps}
    for sel in ("approx", "approx2"):
        ne_ap, apx = run(sel, pts, feats, target, args.steps)
        rel = [abs(a - b) / max(abs(b), 1e-9) for a, b in zip(apx, ex)]
        out.update({
            f"edges_{sel}": ne_ap,
            f"edge_recall_{sel}": round(ne_ap / ne_ex, 6),
            f"final_loss_{sel}": apx[-1],
            f"max_rel_loss_diff_{sel}": max(rel),
            f"final_rel_loss_diff_{sel}": rel[-1],
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
