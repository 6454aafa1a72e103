"""Host partitioner profiling + native-loader acceleration A/B (VERDICT r2 #9).

Synthetic Morton-local dense-K graph at 10M points (the r2 measurement
protocol: senders within a +/-64-row window, K=16), partitioned 8 ways.
Profiles `partition_graph_dense` stage by stage so the native/threaded work
targets the real hot spots.

Run:  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/exp_partition_native.py [--points N] [--profile]
"""

import argparse
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.parallel.partition import (
    partition_graph,
    partition_graph_dense,
)


def synthetic_dense(n, k=16, window=64, seed=0):
    rng = np.random.default_rng(seed)
    offs = rng.integers(-window, window + 1, size=(n, k), dtype=np.int64)
    # wrap, don't clip: clipping concentrates ~window*K/2 sender slots on
    # rows 0 and n-1, blowing the rev-table width q (max sender multiplicity)
    # to ~500 and its np.full to ~20 GB — an artifact no radius graph has
    senders = ((np.arange(n)[:, None] + offs) % n).astype(np.int32)
    mask = rng.random((n, k)) < 0.95
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    pos = rng.random((n, 3)).astype(np.float32)
    return pos, feats, senders, mask


def coo_from_dense(senders, mask):
    n, k = senders.shape
    recv = np.repeat(np.arange(n, dtype=np.int32), k)
    return senders.reshape(-1), recv, mask.reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_000_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--coo", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    pos, feats, senders, mask = synthetic_dense(args.points)
    print(f"# synth graph {args.points} pts, {int(mask.sum())} edges: "
          f"{time.time()-t0:.1f}s")

    if args.coo:
        s, r, m = coo_from_dense(senders, mask)
        t0 = time.time()
        part = partition_graph(pos, feats, s, r, m, num_parts=args.parts)
        print(f"# partition_graph (COO): {time.time()-t0:.1f}s "
              f"(Np={part.n_per_part} H={part.halo_cap})")
        return

    if args.profile:
        pr = cProfile.Profile()
        pr.enable()
    t0 = time.time()
    part = partition_graph_dense(pos, feats, senders, mask,
                                 num_parts=args.parts)
    dt = time.time() - t0
    if args.profile:
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(18)
    print(f"# partition_graph_dense: {dt:.1f}s (NI={part.n_interior} "
          f"NB={part.n_boundary} H={part.halo_cap})")


if __name__ == "__main__":
    main()
