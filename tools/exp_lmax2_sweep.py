"""250k lmax=2 step sweep: (tile, bwd_tile) x dW-contraction form (r5).

The residual backward's dW GEMMs transpose ms[i] explicitly (mi_t = ms[i].T
then mi_t @ dya); dot_general contracting dim 0 expresses the same product
without the materialized transpose — Mosaic can fold operand transposes
into the MXU pass.  Chained-timing protocol (docs/PERF.md).

Run: PYTHONPATH=. python tools/exp_lmax2_sweep.py [tiles like 80:80 80:40 96:96]
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

bf = jnp.bfloat16


def _timed_step(step, st, args, iters=5):
    st2 = step(st, *args)[0]
    jax.block_until_ready(st2.params)
    st2, _ = step(st2, *args)
    probe = float(jax.tree_util.tree_leaves(st2.params)[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        st2, m = step(st2, *args)
    probe = float(jax.tree_util.tree_leaves(st2.params)[0][0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    specs = [a for a in sys.argv[1:] if ":" in a] or ["80:80"]
    rng = np.random.default_rng(0)
    n, k = 250_000, 16
    lo, hi = (0.0,) * 3, (1.0,) * 3
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / 250_000) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, lo, hi, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, lo, hi)
    e = jax.jit(lambda t: radius_graph_cell(
        t, r, lo, hi, max_neighbors=k, cell_capacity=cap))(tree)
    g0 = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)
    print("edges:", int(g0.edge_mask.sum()), flush=True)
    tgt = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    for spec in specs:
        parts = spec.split(":")
        t_s, b_s = int(parts[0]), int(parts[1])
        dg = "dg" in parts[2:]
        tab = "tab" in parts[2:]
        g = g0.with_gather_tables(tile=t_s) if tab else g0
        m = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True)
        # force tile/bwd_tile by priming the kernel cache
        from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
            FusedMessageGeneric)
        for lay in m.layers:
            lay._generic_kernels[(k, n)] = FusedMessageGeneric(
                lay.message_layers, k, tile=t_s, bwd_tile=b_s,
                residual_bwd=True, colpad=True, dw_dotgen=dg)
        p = m.init(jax.random.key(0))
        a = jax.jit(m.compute_attributes_dense)(g)
        gb = g._replace(nodes=g.nodes.astype(bf))
        a = jax.tree.map(
            lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, a)

        def loss(p_, g_, a_, t_):
            p_ = jax.tree.map(lambda x: x.astype(bf), p_)
            return mse_loss(m(p_, g_, attrs=a_).astype(jnp.float32), t_)

        step = make_train_step(loss, optax.adam(1e-3), donate=False)
        st = make_train_state(p, optax.adam(1e-3))
        dt = _timed_step(step, st, (gb, a, tgt))
        print(f"tile={t_s} bwd_tile={b_s}{' dotgen' if dg else ''}: "
              f"step {dt*1e3:.1f} ms", flush=True)
        del st, step, m, p, a, gb


if __name__ == "__main__":
    main()
