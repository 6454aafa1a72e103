"""A/B: reverse-slot gather VJP formulations at the 250k lmax=2 shapes.

The measured sender-gradient cost (exp_lmax2_stages: gather f+b 52.7 ms vs
fwd 13.6) is ~4x the traffic estimate.  Candidates:

- base:    picked = take(gf, rs_km); (picked*valid).reshape(n,k,f).sum(1)
- kloop:   Σ_k take(gf, rs_km[:, k]) — no [N, K, F] intermediate
- kloop32: same with an f32 accumulator

Run: PYTHONPATH=. python tools/exp_tds_bwd.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

bf = jnp.bfloat16


def timed(name, fn, x, iters=10):
    pert = jax.jit(lambda a, p: a + p.astype(a.dtype) * 0)
    out = fn(x)
    jax.block_until_ready(out)
    probe = out[0, 0].astype(jnp.float32)
    x = pert(x, probe)
    out = fn(x)
    probe = out[0, 0].astype(jnp.float32)
    float(probe)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = pert(x, probe)
        out = fn(x)
        probe = out[0, 0].astype(jnp.float32)
    float(probe)
    dt = (time.perf_counter() - t0) / iters
    print(f"# {name:24s} {dt*1e3:7.2f} ms", flush=True)
    return dt


def main():
    n, k, f = 250_000, 16, 90
    rng = np.random.default_rng(0)
    # realistic reverse slots: a symmetric-ish permutation of n*k
    rs = rng.permutation(n * k).astype(np.int32).reshape(n, k)
    rs[rng.random((n, k)) < 0.05] = n * k  # some invalid
    rs = jnp.asarray(rs)
    g = jnp.asarray(rng.standard_normal((k * n, f)), bf)

    valid_f = (rs < n * k).reshape(-1).astype(bf)
    rs_km = (rs % k) * n + rs // k

    def base(gf):
        picked = jnp.take(gf, rs_km.reshape(-1), axis=0, mode="clip")
        return (picked * valid_f[:, None]).reshape(n, k, f).sum(axis=1)

    def kloop(gf):
        acc = None
        for kk in range(k):
            v = (rs[:, kk] < n * k).astype(bf)
            p = jnp.take(gf, rs_km[:, kk], axis=0, mode="clip") * v[:, None]
            acc = p if acc is None else acc + p
        return acc

    def kloop32(gf):
        acc = None
        for kk in range(k):
            v = (rs[:, kk] < n * k).astype(jnp.float32)
            p = jnp.take(gf, rs_km[:, kk], axis=0,
                         mode="clip").astype(jnp.float32) * v[:, None]
            acc = p if acc is None else acc + p
        return acc.astype(bf)

    o1 = np.array(jax.jit(base)(g), np.float32)
    o2 = np.array(jax.jit(kloop)(g), np.float32)
    np.testing.assert_allclose(o1, o2, atol=1e-1, rtol=1e-2)
    timed("base (reshape-sum)", jax.jit(base), g)
    timed("kloop", jax.jit(kloop), g)
    timed("kloop f32-accum", jax.jit(kloop32), g)


def main2():
    """Locality probe: transpose dhs to node-major first, then gather with
    the NODE-major rs (Morton-local) — vs the slot-major rs_km gather."""
    n, k, f = 250_000, 16, 90
    rng = np.random.default_rng(0)
    # Morton-local reverse slots in NODE-major space: rs[t, kk] ~ near t*k
    base_t = ((np.arange(n)[:, None] + rng.integers(-2000, 2000, (n, k))) % n)
    rs = (base_t * k + rng.integers(0, k, (n, k))).astype(np.int32)
    rs[rng.random((n, k)) < 0.05] = n * k
    rs = jnp.asarray(rs)
    g = jnp.asarray(rng.standard_normal((k * n, f)), bf)
    valid_f = (rs < n * k).reshape(-1).astype(bf)
    rs_km = jnp.where(rs < n * k, (rs % k) * n + rs // k, n * k)

    def slotmajor(gf):
        picked = jnp.take(gf, rs_km.reshape(-1), axis=0, mode="clip")
        return (picked * valid_f[:, None]).reshape(n, k, f).sum(axis=1)

    def nodemajor(gf):
        gfn = jnp.swapaxes(gf.reshape(k, n, f), 0, 1).reshape(n * k, f)
        picked = jnp.take(gfn, rs.reshape(-1), axis=0, mode="clip")
        return (picked * valid_f[:, None]).reshape(n, k, f).sum(axis=1)

    o1 = np.array(jax.jit(slotmajor)(g), np.float32)
    o2 = np.array(jax.jit(nodemajor)(g), np.float32)
    np.testing.assert_allclose(o1, o2, atol=1e-1, rtol=1e-2)
    timed("slot-major rs_km gather", jax.jit(slotmajor), g)
    timed("transpose + node-major", jax.jit(nodemajor), g)


def main3():
    """REAL-graph locality: the synthetic permutation in main() has zero
    locality; the real reverse table is Morton-local (node j's reverse slots
    point at partner edges of Morton-near neighbors).  Time the backward
    gather from (a) the current slot-major [K*N, F] cotangent layout vs
    (b) a node-major [N*K, F] layout the kernel could write directly, both
    at F=90 and lane-padded F=128."""
    import jax.random as jrandom

    from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
    from scalable_e3_gnn_tpu.graph.octree import build_octree
    from scalable_e3_gnn_tpu.graph.radius import (
        radius_graph_cell, suggest_cell_capacity)

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

    rs = np.asarray(g.reverse_slot)  # node-major flat t*K+k
    valid = (rs < n * k).reshape(-1)
    rs_c = np.minimum(rs, n * k - 1)
    rs_km = ((rs_c % k) * n + rs_c // k).astype(np.int32)  # slot-major flat
    rs_nm = rs_c.astype(np.int32)
    valid_f = jnp.asarray(valid.astype(np.float32), bf)
    rs_km = jnp.asarray(rs_km.reshape(-1))
    rs_nm = jnp.asarray(rs_nm.reshape(-1))

    for ff in (90, 128):
        gk = jrandom.normal(jrandom.key(0), (k * n, ff), bf)
        gn = jrandom.normal(jrandom.key(0), (n * k, ff), bf)

        def km(gf):
            picked = jnp.take(gf, rs_km, axis=0, mode="clip")
            return (picked * valid_f[:, None]).reshape(n, k, ff).sum(axis=1)

        def nm(gf):
            picked = jnp.take(gf, rs_nm, axis=0, mode="clip")
            return (picked * valid_f[:, None]).reshape(n, k, ff).sum(axis=1)

        timed(f"slot-major F={ff}", jax.jit(km), gk)
        timed(f"node-major F={ff}", jax.jit(nm), gn)


if __name__ == "__main__":
    if "2" in sys.argv[1:]:
        main2()
    elif "3" in sys.argv[1:]:
        main3()
    else:
        main()
