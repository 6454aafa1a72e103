"""Measure Morton-window locality of the bench graph's sender indices.

For the windowed in-kernel gather (kernels/fused_message.py plan): per node
tile of T receivers, senders are gathered from an aligned 2W window starting
at (min_sender // W) * W.  This script reports, for a grid of (T, W), the
fraction of real edges whose sender falls OUTSIDE the window (these go to the
COO cleanup pass) — sizing the static cleanup cap.

Run CPU-only: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/exp_window.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell

N_POINTS = 100_000
RADIUS = 0.04
MAX_NEIGHBORS = 24
LO, HI = (0.0,) * 3, (1.0,) * 3


def main():
    rng = np.random.default_rng(0)
    pts = rng.random((N_POINTS, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=6)
    edges = radius_graph_cell(
        tree, RADIUS, LO, HI, max_neighbors=MAX_NEIGHBORS, cell_capacity=64
    )
    feats = rng.standard_normal((N_POINTS, 5)).astype(np.float32)
    graph = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(feats), tree.points, edges, symmetrize=True
    )
    senders = np.asarray(graph.senders)  # [N, K], padding == N
    mask = np.asarray(graph.edge_mask)  # [N, K]
    n, k = senders.shape
    total = int(mask.sum())
    print(f"N={n} K={k} real_edges={total}")

    # window anchored at the receiver tile's own rows: receivers live at
    # rows [i*T, (i+1)*T); senders are their spatial neighbors, so they
    # cluster around the same Morton range.  Aligned window of 2W blocks
    # centered on the tile: start = clamp((i*T + T//2) // W - 1, ...) * W.
    for T in (32, 64, 128):
        ntiles = -(-n // T)
        pad = ntiles * T - n
        s = np.concatenate([senders, np.full((pad, k), n)], 0).reshape(ntiles, T * k)
        m = np.concatenate([mask, np.zeros((pad, k), bool)], 0).reshape(ntiles, T * k)
        for W in (256, 512, 1024, 2048, 4096):
            centers = np.arange(ntiles) * T + T // 2
            start = np.clip(centers // W - 1, 0, max(0, -(-n // W) - 2)) * W
            out = m & ((s < start[:, None]) | (s >= (start[:, None] + 2 * W)))
            frac = out.sum() / total
            per_tile_max = out.sum(axis=1).max()
            rel = np.abs(np.where(m, s, centers[:, None]) - centers[:, None])
            p50, p90, p99 = np.percentile(rel[m], (50, 90, 99))
            print(
                f"T={T:4d} W={W:5d}: out-of-window {out.sum():7d} "
                f"({100*frac:6.3f}%)  max/tile={per_tile_max:4d}  "
                f"|rel| p50/p90/p99={p50:6.0f}/{p90:6.0f}/{p99:6.0f}"
            )


if __name__ == "__main__":
    main()
