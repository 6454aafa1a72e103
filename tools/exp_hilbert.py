"""Compare Morton vs Hilbert node ordering for gather-window locality.

Hilbert relabeling candidate for the windowed in-kernel gather: after graph
construction, relabel nodes by Hilbert rank (same octree, different final
order) so senders of a receiver tile cluster in a small row window.

Run CPU-only: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/exp_hilbert.py
"""

import numpy as np
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell

N_POINTS = 100_000
RADIUS = 0.04
MAX_NEIGHBORS = 24
LO, HI = (0.0,) * 3, (1.0,) * 3
BITS = 10


def hilbert_index(coords: np.ndarray, bits: int = BITS) -> np.ndarray:
    """[n, 3] uint coords (< 2^bits) -> Hilbert curve index (Skilling)."""
    X = coords.astype(np.uint64).copy()
    n = 3
    M = np.uint64(1 << (bits - 1))
    # inverse undo excess work
    Q = M
    while Q > np.uint64(1):
        P = Q - np.uint64(1)
        for i in range(n):
            inv = (X[:, i] & Q).astype(bool)
            # invert low bits of X[:,0] where set, else swap low bits 0<->i
            t = np.where(inv, np.uint64(0), (X[:, 0] ^ X[:, i]) & P)
            X[:, 0] = np.where(inv, X[:, 0] ^ P, X[:, 0] ^ t)
            X[:, i] = np.where(inv, X[:, i], X[:, i] ^ t)
        Q >>= np.uint64(1)
    # Gray encode
    for i in range(1, n):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(len(X), np.uint64)
    Q = M
    while Q > np.uint64(1):
        sel = (X[:, n - 1] & Q).astype(bool)
        t = np.where(sel, t ^ (Q - np.uint64(1)), t)
        Q >>= np.uint64(1)
    for i in range(n):
        X[:, i] ^= t
    # transpose -> index: bit q of axis i -> bit q*n + (n-1-i)
    h = np.zeros(len(X), np.uint64)
    for q in range(bits):
        for i in range(n):
            bit = (X[:, i] >> np.uint64(q)) & np.uint64(1)
            h |= bit << np.uint64(q * n + (n - 1 - i))
    return h


def window_stats(senders, mask, label):
    n, k = senders.shape
    total = int(mask.sum())
    T = 64
    ntiles = -(-n // T)
    pad = ntiles * T - n
    s = np.concatenate([senders, np.full((pad, k), n)], 0).reshape(ntiles, T * k)
    m = np.concatenate([mask, np.zeros((pad, k), bool)], 0).reshape(ntiles, T * k)
    centers = np.arange(ntiles) * T + T // 2
    rel = np.abs(np.where(m, s, centers[:, None]) - centers[:, None])
    p50, p90, p99, p999 = np.percentile(rel[m], (50, 90, 99, 99.9))
    print(f"[{label}] |rel| p50/p90/p99/p99.9 = {p50:.0f}/{p90:.0f}/{p99:.0f}/{p999:.0f}")
    for W in (512, 1024, 2048, 4096):
        start = np.clip(centers // W - 1, 0, max(0, -(-n // W) - 2)) * W
        out = m & ((s < start[:, None]) | (s >= (start[:, None] + 2 * W)))
        print(
            f"[{label}] T=64 W={W:5d}: out-of-window {out.sum():7d} "
            f"({100*out.sum()/total:6.3f}%)  max/tile={out.sum(axis=1).max()}"
        )


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
    senders = np.asarray(graph.senders)
    mask = np.asarray(graph.edge_mask)
    n = senders.shape[0]
    window_stats(senders, mask, "morton")

    # Hilbert relabel: rank nodes by Hilbert index of their (quantized) pos
    pos = np.asarray(graph.positions)
    q = np.clip(((pos - LO[0]) / (HI[0] - LO[0]) * (1 << BITS)).astype(np.int64),
                0, (1 << BITS) - 1)
    h = hilbert_index(q)
    rank = np.empty(n, np.int64)
    order = np.argsort(h, kind="stable")
    rank[order] = np.arange(n)
    # relabel: new_senders[new_row] = rank[old_senders[old_row]]
    new_senders = np.full_like(senders, n)
    real = mask
    relabeled = np.where(real, rank[np.clip(senders, 0, n - 1)], n)
    new_senders[rank] = relabeled
    new_mask = np.zeros_like(mask)
    new_mask[rank] = mask
    window_stats(new_senders, new_mask, "hilbert")


if __name__ == "__main__":
    main()
