"""Calibrate VPU/HBM ceilings: trivial pallas + XLA ops on bench-sized data."""

import functools
import time

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2_396_160  # = 99840 * 24 edge slots
F = 80
bf = jnp.bfloat16


def timed(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    gb = sum(a.size * a.dtype.itemsize for a in args) / 1e9
    print(f"{name:40s} {dt * 1e3:8.2f} ms   {gb / dt:7.1f} GB/s in-read")
    return out


def _copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0


def _ops10_kernel(x_ref, o_ref):
    x = x_ref[:]
    for _ in range(10):
        x = x * 1.0001 + 0.5
    o_ref[:] = x


def _gemm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32).astype(
        x_ref.dtype
    )


def main():
    x = jax.random.normal(jax.random.key(0), (N, F), bf)
    w = jax.random.normal(jax.random.key(1), (F, F), bf)
    T = 6144

    def pcall(kernel, extra=()):
        specs = [pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        specs += [
            pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for a in extra
        ]
        return jax.jit(
            lambda x_, *e: pl.pallas_call(
                kernel,
                grid=(N // T,),
                in_specs=specs,
                out_specs=pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, F), bf),
            )(x_, *e)
        )

    timed("pallas copy (2 flops/elem)", pcall(_copy_kernel), x)
    timed("pallas 10x fma chain", pcall(_ops10_kernel), x)
    timed("pallas gemm [T,80]x[80,80]", pcall(_gemm_kernel, (w,)), x, w)
    timed("xla mult+add", jax.jit(lambda a: a * 2.0 + 1.0), x)
    timed("xla 10x fma", jax.jit(lambda a: functools.reduce(
        lambda y, _: y * 1.0001 + 0.5, range(10), a)), x)
    timed("xla gemm", jax.jit(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(bf)
    ), x, w)
    # fp32 variants
    xf = x.astype(jnp.float32)
    timed("pallas 10x fma fp32", pcall(_ops10_kernel), xf.astype(bf))
    y = jax.random.normal(jax.random.key(2), (N // 24, F), bf)
    idx = jax.random.randint(jax.random.key(3), (N,), 0, N // 24)
    timed("xla gather [N/24,F] -> [N,F]", jax.jit(
        lambda h, i: jnp.take(h, i, axis=0)), y, idx)


if __name__ == "__main__":
    main()
