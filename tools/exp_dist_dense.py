"""Mesh=1 dense distributed train step vs the single-chip bench (VERDICT r1
item 1 done-criterion: within ~10% of the 297 ms single-chip step).

Same config as bench.py (100k pts, K=24, hidden 32x0e+16x1o, 4 layers, bf16,
fused Pallas kernels, precomputed geometry); the only differences are the
shard_map wrapper, the degenerate halo exchange, and plain-gather sender
grads (no reverse_slot across partitions).

Optional argv[1] = number of partitions to build/time host-side as well.
"""

import sys
import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell, suggest_cell_capacity
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel.halo import (
    make_dist_geometry_dense,
    make_dist_train_step_dense,
    shard_partitioned_dense,
)
from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense
from scalable_e3_gnn_tpu.train.pipeline import make_train_state


def main():
    rng = np.random.default_rng(0)
    n = 100_000
    pts = rng.random((n, 3)).astype(np.float32)
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
    print("edges:", int(graph.edge_mask.sum()), flush=True)
    target = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    t0 = time.time()
    part = partition_graph_dense(
        np.array(tree.points), feats, np.array(graph.senders),
        np.array(graph.edge_mask), num_parts=1,
    )
    print(f"partition (P=1): {time.time()-t0:.2f}s host; "
          f"NI={part.n_interior} NB={part.n_boundary} H={part.halo_cap}", flush=True)

    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
        num_layers=4, remat=True, layout="cm", use_pallas=True,
    )
    params = model.init(jax.random.key(0))
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("graph",))
    args = shard_partitioned_dense(part, mesh)
    attrs = make_dist_geometry_dense(model, mesh)(args)
    jax.block_until_ready(attrs)
    bf = jnp.bfloat16
    args = tuple(
        x.astype(bf) if x.dtype == jnp.float32 else x for x in args
    )
    attrs = jax.tree.map(lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
    tgt_sh = jnp.asarray(np.asarray(target)[np.clip(part.global_ids, 0, None)])

    opt = optax.adam(1e-3)
    step = make_dist_train_step_dense(model, opt, mesh, compute_dtype=bf)
    st = make_train_state(params, opt)
    t0 = time.time()
    st, m = step(st, args, tgt_sh, attrs)
    jax.block_until_ready(m["loss"])
    print(f"compile+1st: {time.time()-t0:.1f}s loss={float(m['loss']):.6f}", flush=True)
    t0 = time.time()
    for _ in range(10):
        st, m = step(st, args, tgt_sh, attrs)
    jax.block_until_ready(m["loss"])
    ms = (time.time() - t0) / 10 * 1e3
    print(f"mesh=1 dense dist step: {ms:.1f} ms (bench single-chip: ~297.6)", flush=True)

    if len(sys.argv) > 1:
        p = int(sys.argv[1])
        t0 = time.time()
        part_p = partition_graph_dense(
            np.array(tree.points), feats, np.array(graph.senders),
            np.array(graph.edge_mask), num_parts=p,
        )
        print(f"partition (P={p}): {time.time()-t0:.2f}s host; "
              f"NI={part_p.n_interior} NB={part_p.n_boundary} H={part_p.halo_cap}",
              flush=True)


if __name__ == "__main__":
    main()
