"""Where does radius_graph_cell time go? top_k vs gather vs d2.

Run on the real TPU: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_radius.py
"""

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph import radius as R
from tools.tputime import timed

N = 100_000
RADIUS = 0.04
K = 24
LO, HI = (0.0,) * 3, (1.0,) * 3


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=6)

    full = jax.jit(lambda t: R.radius_graph_cell(
        t, RADIUS, LO, HI, max_neighbors=K, cell_capacity=64))
    timed("radius_graph_cell full", full, tree)

    # pieces at one block scale
    B, C = 1024, 64
    M = 27 * C
    d2 = jnp.asarray(rng.random((B, M)), jnp.float32)
    cand = jnp.asarray(rng.integers(0, N, (B, M)), jnp.int32)
    ok = jnp.asarray(rng.random((B, M)) < 0.012)  # ~21 hits/row

    topk = jax.jit(lambda d: jax.lax.top_k(-jnp.where(ok, d, jnp.inf), K))
    timed("top_k(1728->24) x1 block", topk, d2)

    gath = jax.jit(lambda c: jnp.take(tree.points, c.reshape(B, -1), axis=0))
    timed("candidate gather [B,27C,3] x1 block", gath, cand)

    dist = jax.jit(lambda c: jnp.sum(
        (jnp.take(tree.points, c, axis=0) - tree.points[:B, None, :]) ** 2, -1))
    timed("gather+d2 x1 block", dist, cand)

    # cheaper selection: first-k-within-radius via cumsum ranking (no sort)
    def firstk(d):
        okk = ok & (d <= RADIUS * RADIUS)
        rank = jnp.cumsum(okk.astype(jnp.int32), axis=1) - 1
        keep = okk & (rank < K)
        # compact via one-hot matmul-free scatter: rank as column index
        col = jnp.where(keep, rank, K)
        out = jnp.full((B, K + 1), -1, jnp.int32)
        out = out.at[jnp.arange(B)[:, None], col].set(
            jnp.where(keep, cand, -1), mode="drop")
        return out[:, :K]

    fk = jax.jit(firstk)
    timed("first-k-in-radius (cumsum+scatter) x1", fk, d2)

    # sort-based: single 1728-sort per row
    srt = jax.jit(lambda d: jax.lax.sort_key_val(
        jnp.where(ok, d, jnp.inf), cand, dimension=1)[1][:, :K])
    timed("full sort_key_val 1728 x1 block", srt, d2)


if __name__ == "__main__":
    main()
