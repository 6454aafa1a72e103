"""Kernel-level A/B for the tabled generic backward at the 250k config.

Variants: residual (saved ys) vs replay (rebuild in-kernel), across table
tiles.  The model-level default is residual at 250k; exp_tab_stages shows
the backward at ~70 ms/layer vs a ~21 ms 2x-fwd floor — find out whether
the ys streams or the tile shape are the gap.

Run: PYTHONPATH=. python tools/exp_tab_bwd.py [tile ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_cell, suggest_cell_capacity)
from scalable_e3_gnn_tpu.kernels.fused_message_generic import (
    FusedMessageGeneric)
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from tools.tputime import timed

bf = jnp.bfloat16


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [200, 125, 100]
    rng = np.random.default_rng(0)
    n, k = 250_000, 16
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, (0.,)*3, (1.,)*3, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, (0.,)*3, (1.,)*3)
    e = jax.jit(lambda t: radius_graph_cell(
        t, r, (0.,)*3, (1.,)*3, max_neighbors=k, cell_capacity=cap))(tree)
    g0 = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)

    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"),
                  Irreps("1x1o"), lmax_attr=2, num_layers=4, remat=True,
                  layout="cm", use_pallas=True)
    layer = model.layers[0]
    params = model.init(jax.random.key(0))
    lp = jax.tree.map(lambda x: x.astype(bf), params["layer_0"])
    attrs = jax.jit(model.compute_attributes_dense)(g0)
    edge_attr, node_attr, dist2, edge_geo = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
    f = model.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (n, f), bf)
    geo2 = layer._geo2(edge_geo, edge_attr, dist2, g0.edge_mask, bf)
    ptuple = tuple(lp[f"msg_{i}"] for i in range(len(layer.message_layers)))

    for tile in tiles:
        if n % tile:
            print(f"# tile {tile} skipped (does not divide {n})")
            continue
        t0 = time.time()
        g = g0.with_gather_tables(tile=tile)
        tabf = g.gather_tab.reshape(-1)
        u = g.gather_tab.shape[1]
        print(f"# tile={tile} U={u} rem={g.gather_rem_pos.shape[0]} "
              f"(build {time.time()-t0:.1f}s)", flush=True)
        for mode in ("res", "rep"):
            kern = FusedMessageGeneric(
                layer.message_layers, k, tile=tile, bwd_tile=tile,
                residual_bwd=(mode == "res"), replay_bwd=(mode == "rep"),
                colpad=True)
            call = lambda h_: kern.geo_call_tab(
                ptuple, h_, geo2, g.gather_loc, tabf, g.gather_rev_dense,
                g.gather_rem_pos, g.gather_rem_node)
            _, tf = timed(f"  t{tile} {mode} fwd", jax.jit(call), h)
            _, tb = timed(f"  t{tile} {mode} fwd+bwd", jax.jit(jax.grad(
                lambda h_: call(h_).astype(jnp.float32).sum())), h)
            _, ta = timed(f"  t{tile} {mode} fwd+bwd+dw", jax.jit(jax.grad(
                lambda a_: kern.geo_call_tab(
                    a_[0], a_[1], geo2, g.gather_loc, tabf,
                    g.gather_rev_dense, g.gather_rem_pos,
                    g.gather_rem_node).astype(jnp.float32).sum())),
                (ptuple, h))


if __name__ == "__main__":
    main()
