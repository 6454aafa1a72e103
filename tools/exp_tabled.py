"""Isolated timings: tabled vs untabled fused message kernel (bench config).

Pieces: XLA row gather vs table gather; kernel fwd; kernel bwd (pallas call
only); sender-grad completion (reverse-slot gather vs reverse-table gather).

Run on the real TPU: python tools/exp_tabled.py
"""

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell
from scalable_e3_gnn_tpu.kernels import fused_message as fm
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from tools.tputime import timed

N_POINTS = 100_000
RADIUS = 0.04
K = 24
LO, HI = (0.0,) * 3, (1.0,) * 3
HIDDEN = "32x0e+16x1o"
BF16 = True


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=6)
    edges = radius_graph_cell(tree, RADIUS, LO, HI, max_neighbors=K, cell_capacity=64)
    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    ).with_gather_tables(tile=64)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                  num_layers=1, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    layer = model.layers[0]
    attrs = jax.jit(model.compute_attributes_dense)(graph)
    edge_attr, node_attr, dist2 = attrs[:3]

    n, k = graph.senders.shape
    f = layer.hidden_irreps.dim
    dt = jnp.bfloat16 if BF16 else jnp.float32
    h = jnp.asarray(rng.standard_normal((n, f)), dt)
    loc, gtab, rtab, gtile = (graph.gather_loc, graph.gather_tab,
                              graph.gather_rev, graph.gather_tile)
    npad = loc.shape[0]
    u = gtab.shape[1]
    print(f"n={n} npad={npad} U={u} Q={rtab.shape[1]} ntiles={npad//gtile}")

    h_p = jnp.concatenate([h, jnp.zeros((npad - n, f), dt)]) if npad != n else h
    attr_f = jnp.concatenate([
        edge_attr.reshape(n * k, -1).astype(dt),
        jnp.zeros(((npad - n) * k, edge_attr.shape[-1]), dt)])
    d2_f = jnp.concatenate([
        dist2.reshape(n * k, 1).astype(dt), jnp.zeros(((npad - n) * k, 1), dt)])
    mask_f = jnp.concatenate([
        graph.edge_mask.astype(dt).reshape(n * k, 1),
        jnp.zeros(((npad - n) * k, 1), dt)])
    loc_f = loc.reshape(npad * k, 1)

    mp = {f"msg_{i}": jax.tree.map(lambda x: x, params["layer_0"][f"msg_{i}"])
          for i in range(2)}
    w = layer._folded_weights(params["layer_0"], dt)

    cfg_t = fm.MessageConfig(hs=layer._pallas_hs, hv=layer._pallas_hv, k=k,
                             tile=gtile, u=u)

    # --- fwd pieces ---
    gath_tab = jax.jit(lambda hh: jnp.take(
        hh, gtab.reshape(-1), axis=0, mode="fill", fill_value=0))
    timed("hu = h[gtab]  (XLA table gather)", gath_tab, h_p)

    senders_p = jnp.concatenate(
        [graph.senders, jnp.full((npad - n, k), npad, jnp.int32)])
    gath_full = jax.jit(lambda hh: jnp.take(
        hh, senders_p.reshape(-1), axis=0, mode="fill", fill_value=0))
    timed("hs = h[senders] (XLA full row gather)", gath_full, h_p)

    fwd_tab = jax.jit(lambda hh: fm.fused_message_aggregate_tabled(
        cfg_t, hh, d2_f, attr_f, mask_f, loc_f, gtab,
        graph.gather_rev_dense, graph.gather_rem_pos, graph.gather_rem_node,
        *w))
    timed("tabled kernel fwd (incl table gather)", fwd_tab, h_p)

    cfg_v2 = fm.MessageConfig(hs=layer._pallas_hs, hv=layer._pallas_hv, k=k,
                              tile=gtile)
    hs_full = gath_full(h_p)
    fwd_v2 = jax.jit(lambda hsf, hh: fm.fused_message_aggregate(
        cfg_v2, hsf, hh, d2_f, attr_f, mask_f, *w))
    timed("v2 kernel fwd (pre-gathered hs)", fwd_v2, hs_full, h_p)

    # --- bwd (whole vjp) ---
    def loss_tab(hh):
        return (fwd_tab(hh).astype(jnp.float32) ** 2).sum()

    def loss_v2(hh):
        hsf = jnp.take(hh, senders_p.reshape(-1), axis=0, mode="fill",
                       fill_value=0)
        return (fm.fused_message_aggregate(
            cfg_v2, hsf, hh, d2_f, attr_f, mask_f, *w).astype(jnp.float32) ** 2).sum()

    g_tab = jax.jit(jax.grad(loss_tab))
    timed("tabled fwd+bwd (grad wrt h)", g_tab, h_p)
    g_v2 = jax.jit(jax.grad(loss_v2))
    timed("v2 fwd+bwd (gather + grad wrt h)", g_v2, h_p)

    # --- sender-grad completion pieces ---
    dhu = jnp.asarray(
        rng.standard_normal((npad // gtile * u, f)), dt)
    rev_g = jax.jit(lambda d: jnp.take(
        d, rtab.reshape(-1), axis=0, mode="fill", fill_value=0
    ).reshape(npad, rtab.shape[1], f).sum(axis=1))
    timed("reverse-table gather-sum [N,Q,F]", rev_g, dhu)

    dhs = jnp.asarray(rng.standard_normal((npad * k, f)), dt)
    rs = graph.reverse_slot
    rs_p = jnp.concatenate([
        jnp.where(graph.edge_mask, rs, npad * k),
        jnp.full((npad - n, k), npad * k, jnp.int32)])
    rev_slot = jax.jit(lambda d: jnp.take(
        d, rs_p.reshape(-1), axis=0, mode="fill", fill_value=0
    ).reshape(npad, k, f).sum(axis=1))
    timed("reverse-slot gather-sum [N,K,F]", rev_slot, dhs)


def layer_level():
    """Layer-level fwd+bwd through the real segnn path, tables on/off."""
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=6)
    edges = radius_graph_cell(tree, RADIUS, LO, HI, max_neighbors=K, cell_capacity=64)
    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    g0 = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    gt = g0.with_gather_tables(tile=64)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps(HIDDEN), Irreps("1x1o"),
                  num_layers=1, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    layer = model.layers[0]
    edge_attr, node_attr, dist2 = jax.jit(model.compute_attributes_dense)(g0)
    dt = jnp.bfloat16 if BF16 else jnp.float32
    n, k = g0.senders.shape
    f = layer.hidden_irreps.dim
    h = jnp.asarray(rng.standard_normal((n, f)), dt)
    ea = edge_attr.astype(dt)
    na = node_attr.astype(dt)
    lp = jax.tree.map(lambda x: x.astype(dt), params["layer_0"])

    def run(gather, name):
        def apply(hh):
            return layer.apply_dense(
                lp, hh, hh, g0.senders, ea, na, dist2, g0.edge_mask,
                g0.node_mask, reverse_slot=g0.reverse_slot, gather=gather,
            )
        fwd = jax.jit(apply)
        timed(f"{name} layer fwd", fwd, h)
        grad = jax.jit(jax.grad(lambda hh: (apply(hh).astype(jnp.float32) ** 2).sum()))
        timed(f"{name} layer fwd+bwd", grad, h)

    run(None, "untabled")
    gather = (gt.gather_loc, gt.gather_tab, gt.gather_rev, gt.gather_tile)
    run(gather, "tabled  ")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "layer":
        layer_level()
    else:
        main()
