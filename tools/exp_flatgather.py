"""VERDICT r1 item 7 experiment: do the [N,K,F]->[N*K,F] reshapes after the
sender gathers cause the ~2x384MB/layer XLA layout copies (docs/PERF.md HLO
audit)?  A/B on the bench config:

  A) current: take(h, senders[N,K]) -> [N,K,F] -> reshape
  B) flat:    take(h, senders.reshape(-1)) -> [N*K,F] directly
     (same for the VJP reverse gather)

Also times an isolated gather+reshape microbench both ways.
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
from scalable_e3_gnn_tpu.models.segnn import SEGNN, SEGNNLayer
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss
from scalable_e3_gnn_tpu.ops import gather_scatter as GS


def flat_take_dense_symmetric_factory():
    @jax.custom_vjp
    def tds_flat(h, senders, reverse_slot, mask):
        n, k = senders.shape
        return jnp.take(
            h, senders.reshape(-1), axis=0, mode="fill", fill_value=0
        ).reshape(n, k, h.shape[-1])

    def fwd(h, senders, reverse_slot, mask):
        return tds_flat(h, senders, reverse_slot, mask), (senders, reverse_slot, mask)

    def bwd(res, g):
        senders, reverse_slot, mask = res
        n, k = senders.shape
        f = g.shape[-1]
        gf = g.reshape(n * k, f)
        picked = jnp.take(
            gf, reverse_slot.reshape(-1), axis=0, mode="fill", fill_value=0
        )
        d_h = picked.reshape(n, k, f).sum(axis=1)
        z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return d_h, z(senders), z(reverse_slot), z(mask)

    tds_flat.defvjp(fwd, bwd)
    return tds_flat


def main():
    rng = np.random.default_rng(0)
    n, k = 100_000, 24
    pts = rng.random((n, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, (0.,)*3, (1.,)*3, num_levels=6))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, 0.04, (0.,)*3, (1.,)*3)
    edges = jax.jit(lambda t: radius_graph_cell(
        t, 0.04, (0.,)*3, (1.,)*3, max_neighbors=k, cell_capacity=cap))(tree)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True)
    target = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    # isolated microbench: gather via 2-D vs flat indices (fwd only)
    h = jax.random.normal(jax.random.key(1), (n, 104), jnp.bfloat16)
    s2 = graph.senders
    sf = graph.senders.reshape(-1)
    g2 = jax.jit(lambda h_: jnp.take(h_, s2, axis=0, mode="fill", fill_value=0)
                 .reshape(n * k, 104) * 1.0)
    gf = jax.jit(lambda h_: jnp.take(h_, sf, axis=0, mode="fill", fill_value=0) * 1.0)
    for name, fn in (("gather2d+reshape", g2), ("gather flat", gf)):
        out = fn(h); jax.block_until_ready(out)
        t0 = time.time()
        for i in range(20):
            h = h + 0 * out[0, 0].astype(h.dtype)
            out = fn(h)
        jax.block_until_ready(out)
        print(f"{name}: {(time.time()-t0)/20*1e3:.2f} ms", flush=True)

    def run(name):
        model = SEGNN(Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
                      num_layers=4, remat=True, layout="cm", use_pallas=True)
        params = model.init(jax.random.key(0))
        attrs = jax.jit(model.compute_attributes_dense)(graph)
        bf = jnp.bfloat16
        g = graph._replace(nodes=graph.nodes.astype(bf))
        a = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)

        def loss_fn(p, g_, a_, t):
            p = jax.tree.map(lambda x: x.astype(bf), p)
            return mse_loss(model(p, g_, attrs=a_).astype(jnp.float32), t)

        opt = optax.adam(1e-3)
        step = make_train_step(loss_fn, opt, donate=False)
        st = make_train_state(params, opt)
        st, m = step(st, g, a, target); jax.block_until_ready(m["loss"])
        t0 = time.time()
        for _ in range(10):
            st, m = step(st, g, a, target)
        jax.block_until_ready(m["loss"])
        print(f"{name}: {(time.time()-t0)/10*1e3:.1f} ms/step", flush=True)

    run("A current (2-D gather + reshape)")
    orig = GS.take_dense_symmetric
    try:
        import scalable_e3_gnn_tpu.models.segnn as SG

        SG.take_dense_symmetric = flat_take_dense_symmetric_factory()
        run("B flat-index gather")
    finally:
        SG.take_dense_symmetric = orig


if __name__ == "__main__":
    main()
