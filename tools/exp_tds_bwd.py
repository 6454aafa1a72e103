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


if __name__ == "__main__":
    main()


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


if __name__ == "__main__" and "2" in sys.argv[1:]:
    main2()
