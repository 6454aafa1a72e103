"""Stage breakdown of the lmax=2 fused path at the 250k config.

The 250k/lmax=2 step is ~1.13 s but the MXU flop count says ~40 ms — find
where the time goes: sender gather, generic kernel fwd, kernel fwd+bwd,
update MLP, whole layer, whole step.  Chained timing (PERF.md protocol).
"""

import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell, suggest_cell_capacity
from scalable_e3_gnn_tpu.kernels.fused_message_generic import FusedMessageGeneric
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric

bf = jnp.bfloat16


def timed(name, fn, x, iters=8):
    """Chained: x -> fn -> probe -> perturb(x)."""
    pert = jax.jit(lambda a, p: jax.tree.map(
        lambda v: v + p.astype(v.dtype) * 0 if jnp.issubdtype(v.dtype, jnp.inexact) else v, a))
    out = fn(x)
    leaf = jax.tree.leaves(out)[0]
    probe = jax.jit(lambda o: jax.tree.leaves(o)[0][(0,) * jax.tree.leaves(o)[0].ndim].astype(jnp.float32))
    p = probe(out)
    x = pert(x, p)
    out = fn(x); p = probe(out); float(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = pert(x, p)
        out = fn(x)
        p = probe(out)
    float(p)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n, k = 256_000, 16
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, (0.,)*3, (1.,)*3, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, (0.,)*3, (1.,)*3)
    e = jax.jit(lambda t: radius_graph_cell(
        t, r, (0.,)*3, (1.,)*3, max_neighbors=k, cell_capacity=cap))(tree)
    g = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)
    print("edges:", int(g.edge_mask.sum()), flush=True)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True)
    assert model.layers[0].use_pallas_generic
    layer = model.layers[0]
    params = model.init(jax.random.key(0))
    lp = jax.tree.map(lambda x: x.astype(bf), params["layer_0"])
    attrs = jax.jit(model.compute_attributes_dense)(g)
    edge_attr, node_attr, dist2, edge_geo = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)

    f = model.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (n, f), bf)

    # 1. sender gather
    timed("gather (tds) fwd", jax.jit(
        lambda h_: take_dense_symmetric(h_, g.senders, g.reverse_slot, g.edge_mask) * 1.0), h)
    timed("gather fwd+bwd", jax.jit(jax.grad(
        lambda h_: take_dense_symmetric(h_, g.senders, g.reverse_slot, g.edge_mask)
        .astype(jnp.float32).sum())), h)

    # 2. generic kernel alone (pre-gathered operands)
    kern = FusedMessageGeneric(layer.message_layers, k, tile=64, bwd_tile=64)
    hs = jnp.take(h, g.senders.T, axis=0, mode="fill", fill_value=0)  # [K, N, F]
    geo2 = edge_geo.reshape(n, -1)
    ptuple = tuple(lp[f"msg_{i}"] for i in range(2))

    timed("generic kernel fwd", jax.jit(
        lambda hs_: kern.geo_call(ptuple, hs_, h, geo2)), hs)
    timed("generic kernel fwd+bwd (wrt hs,h)", jax.jit(jax.grad(
        lambda hs_: kern.geo_call(ptuple, hs_, h, geo2).astype(jnp.float32).sum())), hs)
    timed("generic kernel fwd+bwd (wrt all)", jax.jit(jax.grad(
        lambda args: kern.geo_call(args[0], args[1], args[2], geo2)
        .astype(jnp.float32).sum())), (ptuple, hs, h))

    # 3. update MLP alone
    def upd(h_):
        u = jnp.concatenate([h_, h_], axis=-1)
        for i, l in enumerate(layer.update_layers):
            u = l(lp[f"upd_{i}"], u, node_attr)
        return u
    timed("update MLP fwd", jax.jit(lambda h_: upd(h_)), h)
    timed("update MLP fwd+bwd", jax.jit(jax.grad(
        lambda h_: upd(h_).astype(jnp.float32).sum())), h)

    # 4. one full layer fwd+bwd
    lf = lambda h_: layer.apply_dense(
        lp, h_, h_, g.senders, edge_attr, node_attr, dist2, g.edge_mask,
        g.node_mask, reverse_slot=g.reverse_slot, edge_geo=edge_geo)
    timed("one layer fwd", jax.jit(lf), h)
    timed("one layer fwd+bwd", jax.jit(jax.grad(
        lambda h_: lf(h_).astype(jnp.float32).sum())), h)


if __name__ == "__main__":
    main()
