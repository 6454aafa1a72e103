"""Dump optimized HLO for the one-layer grad and rank fusions by output bytes."""

import re
import sys

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell
from scalable_e3_gnn_tpu.models.segnn import SEGNN

N_POINTS = 100_000
K = 24
LO, HI = (0.0,) * 3, (1.0,) * 3
bf = jnp.bfloat16


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=6))(jnp.asarray(pts))
    edges = jax.jit(
        lambda t: radius_graph_cell(t, 0.04, LO, HI, max_neighbors=K,
                                    cell_capacity=64)
    )(tree)
    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
                  num_layers=4, remat=True, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    attrs = jax.jit(model.compute_attributes_dense)(graph)
    graph = graph._replace(nodes=graph.nodes.astype(bf))
    edge_attr, node_attr, dist2 = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
    f = model.hidden_irreps.dim
    h = jax.random.normal(jax.random.key(1), (N_POINTS, f), bf)
    layer = model.layers[0]
    lp = jax.tree.map(lambda x: x.astype(bf), params["layer_0"])

    def lossy(p_, h_):
        return layer.apply_dense(
            p_, h_, h_, graph.senders, edge_attr, node_attr, dist2,
            graph.edge_mask, graph.node_mask, reverse_slot=graph.reverse_slot,
        ).astype(jnp.float32).sum()

    lowered = jax.jit(jax.grad(lossy, argnums=(0, 1))).lower(lp, h)
    txt = lowered.compile().as_text()
    print("total HLO lines:", len(txt.splitlines()))

    # rank instructions by output size
    pat = re.compile(r"(\w+)\[([\d,]*)\]\{?[^=]*=\s*(\w+)")
    sizes = []
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w.\-]+) = (\w+)\[([\d,]*)\]", line.replace("(", " "))
        if not m:
            continue
        name, dtype, dims = m.groups()
        if not dims:
            continue
        try:
            numel = int(np.prod([int(d) for d in dims.split(",") if d]))
        except ValueError:
            continue
        bpe = {"bf16": 2, "f32": 4, "s32": 4, "pred": 1, "u32": 4, "f16": 2}.get(dtype, 4)
        op = line.split("=", 1)[1].strip().split("(")[0].strip()
        sizes.append((numel * bpe, name, dtype, dims, op[:60]))
    sizes.sort(reverse=True)
    total = 0
    for sz, name, dtype, dims, op in sizes[:40]:
        total += sz
        print(f"{sz/1e6:9.1f} MB  {dtype}[{dims}]  {op}")
    print("sum(top40):", round(total / 1e9, 2), "GB")


if __name__ == "__main__":
    main()
