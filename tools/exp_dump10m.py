"""Build the bench's 10M approx2 radius graph once and dump senders/mask/
points to /tmp/g10m.npz so the host partitioner can be profiled offline
(CPU-only, no TPU claim) against the REAL graph rather than the synthetic
window model (real partition measured 16.9 s vs 7.9 synthetic, BENCH_r05).

Run: PYTHONPATH=. python tools/exp_dump10m.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_cell_segments, suggest_cell_capacity)

LO, HI = (0.0,) * 3, (1.0,) * 3


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((10_000_000, 3)).astype(np.float32)
    tree = jax.jit(lambda p: build_octree(p, LO, HI, num_levels=8))(
        jnp.asarray(pts))
    r = 0.04 * (100_000 / 10_000_000) ** (1 / 3)
    cap = suggest_cell_capacity(tree, r, LO, HI)
    t0 = time.time()
    e = radius_graph_cell_segments(
        tree, r, LO, HI, max_neighbors=16, cell_capacity=cap,
        num_segments=10, selection="approx2", approx_recall=0.85)
    jax.block_until_ready(e.senders)
    print(f"# build {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    s = np.asarray(e.senders).reshape(10_000_000, 16)
    m = np.asarray(e.mask).reshape(10_000_000, 16)
    p = np.asarray(tree.points)
    print(f"# pull {time.time()-t0:.1f}s", flush=True)
    np.savez("/tmp/g10m.npz", senders=s, mask=m, points=p)
    print("# saved /tmp/g10m.npz", flush=True)


if __name__ == "__main__":
    main()
