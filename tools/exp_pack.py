"""A/B the fused-kernel lane packing (MessageConfig.pack) on the real chip.

Bench config (100k pts, K=24, hidden 32x0e+16x1o, 4 layers, bf16): one
train-step timing per pack value, plus loss agreement vs pack=1.
"""

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


def main():
    rng = np.random.default_rng(0)
    n = 100_000
    pts = rng.random((n, 3)).astype(np.float32)
    print("building graph...", flush=True)
    tree = jax.jit(lambda p: build_octree(p, (0.0,) * 3, (1.0,) * 3, num_levels=6))(
        jnp.asarray(pts)
    )
    cap = suggest_cell_capacity(tree, 0.04, (0.0,) * 3, (1.0,) * 3)
    edges = jax.jit(
        lambda t: radius_graph_cell(
            t, 0.04, (0.0,) * 3, (1.0,) * 3, max_neighbors=24, cell_capacity=cap
        )
    )(tree)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    print("edges:", int(graph.edge_mask.sum()), "K:", graph.senders.shape[1], flush=True)
    target = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def run(pack):
        model = SEGNN(
            Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
            num_layers=4, remat=True, layout="cm", use_pallas=True, pack=pack,
        )
        params = model.init(jax.random.key(0))
        attrs = jax.jit(model.compute_attributes_dense)(graph)
        jax.block_until_ready(attrs)
        bf = jnp.bfloat16
        g = graph._replace(nodes=graph.nodes.astype(bf))
        a = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)

        def loss_fn(p, g_, a_, t):
            p = jax.tree.map(lambda x: x.astype(bf), p)
            return mse_loss(model(p, g_, attrs=a_).astype(jnp.float32), t)

        opt = optax.adam(1e-3)
        step = make_train_step(loss_fn, opt, donate=False)
        state = make_train_state(params, opt)
        t0 = time.time()
        state2, m = step(state, g, a, target)
        jax.block_until_ready(m["loss"])
        print(f"  pack={pack} compile+1st step: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(10):
            state2, m = step(state2, g, a, target)
        jax.block_until_ready(m["loss"])
        return (time.time() - t0) / 10 * 1e3, float(m["loss"])

    ms1, l1 = run(1)
    print(f"pack=1: {ms1:.1f} ms/step loss={l1:.6f}", flush=True)
    for p in (2, 3, 4):
        if 24 % p:
            continue
        msp, lp = run(p)
        print(
            f"pack={p}: {msp:.1f} ms/step loss={lp:.6f} "
            f"speedup={ms1/msp:.3f}x dloss={abs(lp-l1):.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
