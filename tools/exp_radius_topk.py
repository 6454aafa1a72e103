"""Profile the cell radius builder's nearest-K selection (VERDICT r1 item 6).

Hypothesis: the full `sort_key_val` over 27*cap candidate keys dominates the
64.8 s 10M-point build (bitonic sort ~ n log^2 n compare-exchanges per point
vs ~10 flops per candidate for the distances).  A/B:

  1. current sort-based `_topk_neighbors`
  2. `lax.approx_min_k` (TPU PartialReduce custom call), recall 0.95 / 1.0
  3. distance-only lower bound (selection replaced by a plain min)

at 1M points (fast iteration), then the winner at 10M.
"""

import sys
import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph import radius as R
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_cell_segments,
    suggest_cell_capacity,
)

LO, HI = (0.0,) * 3, (1.0,) * 3


def topk_sort(d2, cand_idx, valid, radius, self_idx, k):
    ok = valid & (d2 <= radius * radius) & (cand_idx != self_idx[:, None])
    key = jnp.where(ok, d2, jnp.inf)
    skey, senders = jax.lax.sort_key_val(key, cand_idx, dimension=1)
    skey, senders = skey[:, :k], senders[:, :k]
    mask = jnp.isfinite(skey)
    return jnp.where(mask, senders, jnp.int32(2**31 - 1)), mask


def make_topk_approx(recall):
    def topk_approx(d2, cand_idx, valid, radius, self_idx, k):
        ok = valid & (d2 <= radius * radius) & (cand_idx != self_idx[:, None])
        key = jnp.where(ok, d2, jnp.inf)
        skey, pos = jax.lax.approx_min_k(key, k, recall_target=recall)
        senders = jnp.take_along_axis(cand_idx, pos, axis=1)
        mask = jnp.isfinite(skey)
        return jnp.where(mask, senders, jnp.int32(2**31 - 1)), mask

    return topk_approx


def topk_minonly(d2, cand_idx, valid, radius, self_idx, k):
    ok = valid & (d2 <= radius * radius) & (cand_idx != self_idx[:, None])
    key = jnp.where(ok, d2, jnp.inf)
    m = key.min(axis=1, keepdims=True)
    senders = jnp.broadcast_to(cand_idx[:, :k], (key.shape[0], k))
    mask = jnp.broadcast_to(jnp.isfinite(m), (key.shape[0], k))
    return jnp.where(mask, senders, jnp.int32(2**31 - 1)), mask


def run(n, k, variants, iters=2):
    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    radius = 0.04 * (100_000 / n) ** (1 / 3)
    levels = min(8, max(4, int(np.log2(1.0 / radius))))
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=levels))(
        jnp.asarray(pts)
    )
    cap = suggest_cell_capacity(tree, radius, LO, HI)
    nseg = max(2, n // 1_000_000) if n > 1_000_000 else 2
    print(f"n={n} radius={radius:.5f} cap={cap} segs={nseg}", flush=True)

    results = {}
    for name, fn in variants.items():
        R._topk_neighbors_orig = R._topk_neighbors
        R._topk_neighbors = fn
        try:
            e = radius_graph_cell_segments(
                tree, radius, LO, HI, max_neighbors=k, cell_capacity=cap,
                num_segments=nseg,
            )
            ne = int(e.num_edges)
            jax.block_until_ready(e.senders)
            t0 = time.time()
            for _ in range(iters):
                e = radius_graph_cell_segments(
                    tree, radius, LO, HI, max_neighbors=k, cell_capacity=cap,
                    num_segments=nseg,
                )
                jax.block_until_ready(e.senders)
            dt = (time.time() - t0) / iters
            results[name] = (dt, ne, np.asarray(e.senders))
            print(f"  {name}: {dt*1e3:.0f} ms, {ne} edges", flush=True)
        finally:
            R._topk_neighbors = R._topk_neighbors_orig
    return results


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    variants = {
        "sort": topk_sort,
        "approx_r0.95": make_topk_approx(0.95),
        "approx_r1.0": make_topk_approx(1.0),
        "minonly_lower_bound": topk_minonly,
    }
    res = run(n, 16, variants)
    if "sort" in res and "approx_r1.0" in res:
        same = np.array_equal(res["sort"][2], res["approx_r1.0"][2])
        print(f"approx_r1.0 senders identical to sort: {same}", flush=True)
    if "sort" in res and "approx_r0.95" in res:
        a, b = res["sort"][2], res["approx_r0.95"][2]
        agree = float((a == b).mean())
        print(f"approx_r0.95 slot agreement vs sort: {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
