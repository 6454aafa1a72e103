"""Experiment: fused-message kernel tile-size sweep + update-path timing."""

import time

import numpy as np

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.kernels.fused_message import (MessageConfig,
                                                       fused_message_aggregate)
from scalable_e3_gnn_tpu.models.segnn import SEGNN

N = 99_840  # multiple of 256*... (div by 512)
K = 24
HS, HV = 32, 16
F = HS + 3 * HV
bf = jnp.bfloat16


def timed(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms")
    return out


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 12)
    hs = jax.random.normal(ks[0], (N * K, F), bf)
    hr = jax.random.normal(ks[1], (N, F), bf)
    d2 = jax.random.uniform(ks[2], (N * K, 1), bf)
    attr = jax.random.normal(ks[3], (N * K, 4), bf)
    maskf = jnp.ones((N * K, 1), bf)
    w0e1 = jax.random.normal(ks[4], (2 * HS + 1 + 2 * HV, HS + HV), bf)
    w1o1 = jax.random.normal(ks[5], (2 * HS + 1 + 2 * HV, HV), bf)
    w0e2 = jax.random.normal(ks[6], (HS + HV, HS + HV), bf)
    w1o2 = jax.random.normal(ks[7], (HS + HV, HV), bf)

    for tile, bwd_tile in ((64, 32), (64, 64), (128, 64), (128, 128), (256, 128)):
        cfg = MessageConfig(hs=HS, hv=HV, k=K, tile=tile, bwd_tile=bwd_tile)
        f = jax.jit(
            lambda *a, cfg=cfg: fused_message_aggregate(cfg, *a)
        )
        timed(f"fused fwd tile={tile}", f, hs, hr, d2, attr, maskf,
              w0e1, w1o1, w0e2, w1o2, iters=30)
        g = jax.jit(
            jax.grad(
                lambda hs_, hr_, w1, w2, w3, w4, cfg=cfg: fused_message_aggregate(
                    cfg, hs_, hr_, d2, attr, maskf, w1, w2, w3, w4
                ).astype(jnp.float32).sum(),
                argnums=(0, 1, 2, 3, 4, 5),
            )
        )
        try:
            timed(f"fused fwd+bwd tile={tile}/bt={bwd_tile}", g, hs, hr,
                  w0e1, w1o1, w0e2, w1o2)
        except Exception as e:
            print(f"fused fwd+bwd tile={tile}/bt={bwd_tile} FAILED: "
                  f"{str(e)[:120]}")

    # update path alone (XLA): 2 gated TP layers on [N, 2F]
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps(f"{HS}x0e+{HV}x1o"), Irreps("1x1o"),
                  num_layers=1, layout="cm", use_pallas=True)
    layer = model.layers[0]
    params = jax.tree.map(lambda x: x.astype(bf), model.init(jax.random.key(1)))
    lp = params["layer_0"]
    nattr = jax.random.normal(ks[8], (N, 4), bf)
    agg = jax.random.normal(ks[9], (N, F), bf)
    h = jax.random.normal(ks[10], (N, F), bf)
    nmask = jnp.ones((N,), bool)

    def upd(p, h_, agg_):
        u = jnp.concatenate([h_, agg_], axis=-1)
        for i, l in enumerate(layer.update_layers):
            u = l(p[f"upd_{i}"], u, nattr)
        return jnp.where(nmask[:, None], h_ + u, 0.0)

    uf = jax.jit(upd)
    timed("update path fwd", uf, lp, h, agg)
    ug = jax.jit(jax.grad(
        lambda p, h_, agg_: upd(p, h_, agg_).astype(jnp.float32).sum(),
        argnums=(0, 1, 2)))
    timed("update path fwd+bwd", ug, lp, h, agg)


if __name__ == "__main__":
    main()
