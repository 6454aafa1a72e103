"""Profile the cell radius builder's nearest-K selection (VERDICT r1 item 6).

The full `sort_key_val` over 27*cap candidate keys dominated the 64.8 s
10M-point build (bitonic sort ~ M log^2 M compare-exchanges per point vs ~10
flops per candidate for the distances), compounded by the tree being built
one level too shallow (8x cell occupancy -> ~5x candidate width).  A/B the
native `selection=` modes at proper depth:

  python tools/exp_radius_topk.py [n_points]
"""

import sys
import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_cell_segments,
    search_level_for_radius,
    suggest_cell_capacity,
)

LO, HI = (0.0,) * 3, (1.0,) * 3


def run(n, k, variants, iters=2):
    rng = np.random.default_rng(0)
    pts = rng.random((n, 3)).astype(np.float32)
    radius = 0.04 * (100_000 / n) ** (1 / 3)
    levels = max(4, search_level_for_radius(radius, LO, HI) + 1)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=levels))(
        jnp.asarray(pts)
    )
    cap = suggest_cell_capacity(tree, radius, LO, HI)
    nseg = max(2, n // 1_000_000) if n > 1_000_000 else 2
    print(f"n={n} radius={radius:.5f} levels={levels} cap={cap} segs={nseg}",
          flush=True)

    results = {}
    for name, kw in variants.items():
        e = radius_graph_cell_segments(
            tree, radius, LO, HI, max_neighbors=k, cell_capacity=cap,
            num_segments=nseg, **kw,
        )
        ne = int(e.num_edges)
        jax.block_until_ready(e.senders)
        t0 = time.time()
        for _ in range(iters):
            e = radius_graph_cell_segments(
                tree, radius, LO, HI, max_neighbors=k, cell_capacity=cap,
                num_segments=nseg, **kw,
            )
            jax.block_until_ready(e.senders)
        dt = (time.time() - t0) / iters
        results[name] = (dt, ne, np.asarray(e.senders))
        print(f"  {name}: {dt*1e3:.0f} ms, {ne} edges", flush=True)
    return results


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    variants = {
        "sort": dict(selection="sort"),
        "approx_r0.95": dict(selection="approx", approx_recall=0.95),
    }
    res = run(n, 16, variants)
    a, b = res["sort"], res["approx_r0.95"]
    agree = float((a[2] == b[2]).mean())
    print(
        f"edges approx/sort: {b[1]/a[1]:.5f}, slot agreement: {agree:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
