"""DMA-layout A/B for the generic kernel's sender stream.

Hypothesis (r4): the generic kernel's ~11 ms null floor is NOT per-grid-step
overhead (flat across t64/128/256) but HBM DMA inefficiency of the
``[K, N, F]`` slot-major sender operand — its ``(K, T, F)`` blocks transfer
K·T separate 180-byte rows (F=90 bf16), far below efficient burst size.
A node-major ``[N·K, F]`` operand with ``(T·K, F)`` blocks is ONE contiguous
chunk per block.

Times two trivial kernels that only stream the operand and write a [T, F]
reduction (shapes of the 256k/K=16 lmax=2 config).
"""

import time

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K, F = 256_000, 16, 90
bf = jnp.bfloat16


def timed(name, fn, x, iters=10):
    pert = jax.jit(lambda a, p: a + p.astype(a.dtype) * 0)
    probe = jax.jit(lambda o: o[0, 0].astype(jnp.float32))
    p = probe(fn(x))
    x = pert(x, p)
    p = probe(fn(x))
    float(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = pert(x, p)
        p = probe(fn(x))
    float(p)
    dt = (time.perf_counter() - t0) / iters
    gbs = N * K * F * 2 / dt / 1e9
    print(f"{name:28s} {dt*1e3:8.2f} ms  ({gbs:6.1f} GB/s)", flush=True)


def km_stream(tile):
    def kernel(hs_ref, out_ref):
        acc = hs_ref[0].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + hs_ref[k]
        out_ref[:] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((K, tile, F), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), bf),
    )


def nm_stream(tile):
    def kernel(hs_ref, out_ref):
        rows = hs_ref[:]
        acc = rows[0:tile].astype(jnp.float32)
        for k in range(1, K):
            acc = acc + rows[k * tile : (k + 1) * tile]
        out_ref[:] = acc.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((tile * K, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), bf),
    )


def main():
    hs_km = jax.random.normal(jax.random.key(0), (K, N, F), bf)
    hs_nm = jax.random.normal(jax.random.key(0), (N * K, F), bf)
    for tile in (64, 128):
        timed(f"km [K,N,F] blocks t{tile}", jax.jit(km_stream(tile)), hs_km)
        timed(f"nm [N*K,F] blocks t{tile}", jax.jit(nm_stream(tile)), hs_nm)


def nm_copy(tile):
    """No reduction: copy first T rows only."""
    def kernel(hs_ref, out_ref):
        out_ref[:] = hs_ref[0:tile]

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((tile * K, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, F), bf),
    )


def main2():
    hs_nm = jax.random.normal(jax.random.key(0), (N * K, F), bf)
    for tile in (256, 512):
        timed(f"nm sum t{tile}", jax.jit(nm_stream(tile)), hs_nm)
    for tile in (64, 256, 512):
        timed(f"nm copy-only t{tile}", jax.jit(nm_copy(tile)), hs_nm)


if __name__ == "__main__":
    # one dispatching block: `python exp_dma_layout.py` runs the km/nm
    # sweep, `... 2` runs ONLY the copy-only A/B (r4 ADVICE.md: the split
    # blocks ran main() unconditionally before main2())
    import sys
    if "2" in sys.argv[1:]:
        main2()
    else:
        main()
