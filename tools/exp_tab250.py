"""Estimate the tabled-gather win at the 250k lmax=2 shapes.

The 250k step's per-layer gather cost is 13.7 ms fwd + ~32 ms reverse
(exp_lmax2_stages / exp_tds_bwd): both stream ~720 MB of [K*N, F] rows.
Per-tile compact sender tables (DenseEdgeGraph.with_gather_tables) shrink
both streams to [ntiles, U, F]; this tool measures the XLA-level costs of
the tabled alternatives before porting the machinery into the generic
kernel:

  fwd:  take(h, tab)                 vs take(h, senders.T)
  bwd:  [N, Q] rev gather-sum        vs [N, K] reverse-slot gather-sum

Run: PYTHONPATH=. python tools/exp_tab250.py [tile ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import (
    radius_graph_cell, suggest_cell_capacity)

bf = jnp.bfloat16


def timed(name, fn, x, iters=10):
    pert = jax.jit(lambda a, p: a + p.astype(a.dtype) * 0)
    out = fn(x)
    jax.block_until_ready(out)
    probe = out[(0,) * out.ndim].astype(jnp.float32)
    x = pert(x, probe)
    out = fn(x)
    probe = out[(0,) * out.ndim].astype(jnp.float32)
    float(probe)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = pert(x, probe)
        out = fn(x)
        probe = out[(0,) * out.ndim].astype(jnp.float32)
    float(probe)
    dt = (time.perf_counter() - t0) / iters
    print(f"# {name:36s} {dt*1e3:7.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n, k, f = 256_000, 16, 90
    pts = rng.random((n, 3)).astype(np.float32)
    r = 0.04 * (100_000 / n) ** (1 / 3)
    tree = jax.jit(lambda p: build_octree(p, (0.,)*3, (1.,)*3, num_levels=7))(
        jnp.asarray(pts))
    cap = suggest_cell_capacity(tree, r, (0.,)*3, (1.,)*3)
    e = jax.jit(lambda t: radius_graph_cell(
        t, r, (0.,)*3, (1.,)*3, max_neighbors=k, cell_capacity=cap))(tree)
    g = DenseEdgeGraph.from_radius_edges(
        jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32)),
        tree.points, e, symmetrize=True)

    h = jax.random.normal(jax.random.key(1), (n, f), bf)
    senders_t = jnp.asarray(np.asarray(g.senders).T.copy())

    timed("fwd take(h, senders.T)", jax.jit(
        lambda h_: jnp.take(h_, senders_t, axis=0, mode="clip") * 1.0), h)

    tiles = [int(t) for t in sys.argv[1:]] or [64, 128, 200]
    for tile in tiles:
        t0 = time.perf_counter()
        gt = g.with_gather_tables(tile=tile)
        dt_build = time.perf_counter() - t0
        ntiles, u = gt.gather_tab.shape
        q = gt.gather_rev.shape[1]
        print(f"# tile={tile}: ntiles={ntiles} U={u} Q={q} "
              f"tab_rows={ntiles*u/1e6:.2f}M ({ntiles*u/(n*k):.2f}x of N*K) "
              f"build {dt_build:.2f}s", flush=True)

        tab = gt.gather_tab
        timed(f"  fwd take(h, tab) t{tile}", jax.jit(
            lambda h_: jnp.take(h_, tab, axis=0, mode="clip") * 1.0), h)

        # reverse: d_hu [ntiles*U, F] -> dh [N, F] via [N, Q] gather-sum
        rev = gt.gather_rev[:n]
        valid = (rev < ntiles * u).astype(bf)
        dhu = jax.random.normal(jax.random.key(2), (ntiles * u, f), bf)

        def revsum(d):
            acc = None
            for qq in range(q):
                p = jnp.take(d, rev[:, qq], axis=0, mode="clip") \
                    * valid[:, qq:qq+1]
                acc = p if acc is None else acc + p
            return acc

        timed(f"  bwd [N,{q}] rev gather-sum t{tile}", jax.jit(revsum), dhu)

        # split-Q: dense [N, q0] + compacted remainder (sorted by node)
        revn = np.asarray(gt.gather_rev)[:n]
        cnt = (revn < ntiles * u).sum(1)
        for q0 in (2, 3, 4):
            nodes_r, cols_r = np.nonzero(revn[:, q0:] < ntiles * u)
            pos_r = revn[nodes_r, q0 + cols_r]
            rd = jnp.asarray(revn[:, :q0].copy())
            vd = jnp.asarray((revn[:, :q0] < ntiles * u).astype(np.float32),
                             bf)
            rn = jnp.asarray(nodes_r.astype(np.int32))
            rp = jnp.asarray(pos_r.astype(np.int32))

            def revsplit(d):
                acc = None
                for qq in range(q0):
                    p = jnp.take(d, rd[:, qq], axis=0, mode="clip") \
                        * vd[:, qq:qq+1]
                    acc = p if acc is None else acc + p
                rem = jnp.take(d, rp, axis=0, mode="clip")
                return acc + jax.ops.segment_sum(
                    rem, rn, num_segments=n, indices_are_sorted=True)

            timed(f"  bwd split q0={q0} (+{len(rp)/1e3:.0f}k rem) t{tile}",
                  jax.jit(revsplit), dhu)

    # current reverse-slot baseline for comparison
    rs = np.asarray(g.reverse_slot)
    rs_c = np.minimum(rs, n * k - 1)
    rs_km = jnp.asarray(((rs_c % k) * n + rs_c // k).astype(np.int32).reshape(-1))
    valid_f = jnp.asarray((rs < n * k).reshape(-1).astype(np.float32), bf)
    dhs = jax.random.normal(jax.random.key(3), (k * n, f), bf)

    def cur(gf):
        picked = jnp.take(gf, rs_km, axis=0, mode="clip")
        return (picked * valid_f[:, None]).reshape(n, k, f).sum(axis=1)

    timed("bwd reverse-slot baseline", jax.jit(cur), dhs)


if __name__ == "__main__":
    main()
