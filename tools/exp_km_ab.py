"""Isolated A/B: t-major vs slot-major (km) lmax=1 fused kernel.

100k-bench shapes (N=100k padded, K=24, F=80, bf16).  Times kernel-only
forward and forward+backward for: the legacy t-major kernel (separate flat
operands, dense-E machinery) and the r4 slot-major kernel ([K, N, F]
senders + packed geo).  Gathers excluded — operands prebuilt.
"""

import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.kernels.fused_message import (
    MessageConfig,
    fused_message_aggregate,
    fused_message_aggregate_km,
)
from scalable_e3_gnn_tpu.models.segnn import SEGNNLayer

bf = jnp.bfloat16


def timed(name, fn, x, iters=10):
    pert = jax.jit(lambda a, p: a + p.astype(a.dtype) * 0)
    out = fn(x)
    def _p(o):
        leaf = jax.tree.leaves(o)[0]
        return leaf[(0,) * leaf.ndim].astype(jnp.float32)

    probe = jax.jit(_p)
    p = probe(out)
    x = pert(x, p)
    p = probe(fn(x))
    float(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = pert(x, p)
        p = probe(fn(x))
    float(p)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.1f} ms", flush=True)


def main():
    n, k = 100_032, 24  # 100k padded to tile 96... use 100_032 = 96*1042
    tile = 96
    layer = SEGNNLayer(Irreps("32x0e+16x1o"), Irreps.spherical_harmonics(1),
                       layout="cm", use_pallas=True)
    f = layer.hidden_irreps.dim
    params = layer.init(jax.random.key(0))
    lp = jax.tree.map(lambda x: x.astype(bf), params)
    w = layer._folded_weights(lp, bf)

    key = jax.random.key(1)
    h = jax.random.normal(key, (n, f), bf)
    hs3 = jax.random.normal(key, (k, n, f), bf)
    attr3 = jax.random.normal(key, (n, k, 4), bf)
    d23 = jax.random.uniform(key, (n, k), bf)
    mask3 = jnp.ones((n, k), bf)
    geo2 = jnp.concatenate([attr3, d23[..., None], mask3[..., None]],
                           axis=-1).reshape(n, k * 6)
    # t-major flat operands
    hs_flat = jnp.swapaxes(hs3, 0, 1).reshape(n * k, f)
    attr_f = attr3.reshape(n * k, 4)
    d2_f = d23.reshape(n * k, 1)
    mask_f = mask3.reshape(n * k, 1)

    cfg = MessageConfig(hs=32, hv=16, k=k, tile=tile)

    def old_fwd(hs_):
        return fused_message_aggregate(cfg, hs_, h, d2_f, attr_f, mask_f, *w)

    def km_fwd(hs_):
        return fused_message_aggregate_km(cfg, hs_, h, geo2, *w)

    timed("old fwd t96", jax.jit(old_fwd), hs_flat)
    timed("km  fwd t96", jax.jit(km_fwd), hs3)

    def old_fb(hs_):
        return jax.grad(
            lambda a: old_fwd(a).astype(jnp.float32).sum())(hs_)

    def km_fb(hs_):
        return jax.grad(
            lambda a: km_fwd(a).astype(jnp.float32).sum())(hs_)

    timed("old fwd+bwd t96", jax.jit(old_fb), hs_flat)
    timed("km  fwd+bwd t96", jax.jit(km_fb), hs3)

    import os
    for spec in [x for x in os.environ.get("TILES", "").split(",") if x]:
        # "t" (bwd = t//2) or "t:b" explicit bwd tile
        t, _, b = spec.partition(":")
        t, b = int(t), int(b) if b else 0
        cfg_t = MessageConfig(hs=32, hv=16, k=k, tile=t, bwd_tile=b)
        nn = (n // t) * t
        if b:
            nn = (nn // b) * b
        hs3t, ht, geot = hs3[:, :nn], h[:nn], geo2[:nn]

        def km_f_t(hs_):
            return fused_message_aggregate_km(cfg_t, hs_, ht, geot, *w)

        def km_fb_t(hs_):
            return jax.grad(lambda a: fused_message_aggregate_km(
                cfg_t, a, ht, geot, *w).astype(jnp.float32).sum())(hs_)

        timed(f"km  fwd t{t}", jax.jit(km_f_t), hs3t)
        timed(f"km  fwd+bwd t{t}:b{b or t//2}", jax.jit(km_fb_t), hs3t)


if __name__ == "__main__":
    main()
