"""RCM node ordering vs Morton for gather-window locality + unique-sender stats.

Theory: a 3-D proximity graph has minimum bandwidth Theta(N^(2/3)) (~2150 at
N=100k) — no 1-D order avoids the tail entirely, but RCM approaches the
optimum while Morton/Hilbert pay big jumps at top-level cell boundaries.

Run CPU-only: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/exp_rcm.py
"""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_cell

N_POINTS = 100_000
RADIUS = 0.04
MAX_NEIGHBORS = 24
LO, HI = (0.0,) * 3, (1.0,) * 3


def stats(senders, mask, label, T=64):
    n, k = senders.shape
    total = int(mask.sum())
    ntiles = -(-n // T)
    pad = ntiles * T - n
    s = np.concatenate([senders, np.full((pad, k), n)], 0).reshape(ntiles, T * k)
    m = np.concatenate([mask, np.zeros((pad, k), bool)], 0).reshape(ntiles, T * k)
    centers = np.arange(ntiles) * T + T // 2
    rel = np.abs(np.where(m, s, centers[:, None]) - centers[:, None])
    pcts = np.percentile(rel[m], (50, 90, 99, 99.9))
    print(f"[{label}] T={T} |rel| p50/p90/p99/p99.9 = "
          + "/".join(f"{p:.0f}" for p in pcts) + f"  max={rel[m].max()}")
    for W in (1024, 2048, 4096):
        start = np.clip(centers // W - 1, 0, max(0, -(-n // W) - 2)) * W
        out = m & ((s < start[:, None]) | (s >= (start[:, None] + 2 * W)))
        # unique out-of-window senders per tile (for an exception table)
        uo = max(
            (len(np.unique(s[i][out[i]])) for i in range(ntiles)), default=0
        )
        print(
            f"[{label}] T={T} W={W:5d}: out {out.sum():7d} ({100*out.sum()/total:6.3f}%)"
            f"  max-edges/tile={out.sum(axis=1).max():4d}  max-uniq/tile={uo:4d}"
        )
    # unique senders per tile overall (for the compact-table design)
    uniq = np.array([len(np.unique(s[i][m[i]])) for i in range(ntiles)])
    # excluding the tile's own rows
    own = np.array([
        len(np.unique(s[i][m[i] & ((s[i] < i * T) | (s[i] >= (i + 1) * T))]))
        for i in range(ntiles)
    ])
    print(f"[{label}] T={T} unique senders/tile: mean={uniq.mean():.0f} "
          f"p99={np.percentile(uniq,99):.0f} max={uniq.max()}  "
          f"(excl. own rows: mean={own.mean():.0f} max={own.max()})")


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
    n, k = senders.shape
    stats(senders, mask, "morton")

    # RCM relabel on the symmetric adjacency
    rows = np.repeat(np.arange(n), k)[mask.ravel()]
    cols = senders.ravel()[mask.ravel()]
    A = sp.csr_matrix((np.ones(len(rows), np.int8), (rows, cols)), shape=(n, n))
    import time
    t0 = time.time()
    perm = reverse_cuthill_mckee(A, symmetric_mode=True)  # new order: old ids
    t1 = time.time()
    print(f"RCM time: {t1-t0:.2f}s")
    rank = np.empty(n, np.int64)
    rank[perm] = np.arange(n)
    new_senders = np.full_like(senders, n)
    new_senders[rank] = np.where(mask, rank[np.clip(senders, 0, n - 1)], n)
    new_mask = np.zeros_like(mask)
    new_mask[rank] = mask
    stats(new_senders, new_mask, "rcm")
    stats(new_senders, new_mask, "rcm", T=32)


if __name__ == "__main__":
    main()


def qstats():
    """Tiles-per-node distribution: node v appears in the utab of Q(v) tiles."""
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
    n, k = senders.shape
    for T in (32, 64):
        ntiles = -(-n // T)
        pad = ntiles * T - n
        s = np.concatenate([senders, np.full((pad, k), n)], 0).reshape(ntiles, T * k)
        m = np.concatenate([mask, np.zeros((pad, k), bool)], 0).reshape(ntiles, T * k)
        q = np.zeros(n + 1, np.int64)
        tot = 0
        for i in range(ntiles):
            u = np.unique(s[i][m[i]])
            q[u] += 1
            tot += len(u)
        q = q[:n]
        print(f"T={T}: total-table-slots={tot} tiles/node mean={q.mean():.2f} "
              f"p99={np.percentile(q,99):.0f} p99.9={np.percentile(q,99.9):.0f} max={q.max()}")
