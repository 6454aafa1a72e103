"""Validate the timing harness under the axon tunnel.

Compares: unchained repeats vs dependency-chained repeats vs forced host
transfer, for a trivial elementwise op and for a known-heavy kernel.
"""

import time

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

N, F = 2_396_160, 80
bf = jnp.bfloat16


def main():
    x = jax.random.normal(jax.random.key(0), (N, F), bf)
    f = jax.jit(lambda a: a * 1.0001 + 0.5)
    out = f(x)
    jax.block_until_ready(out)

    # unchained: same input every time
    for iters in (1, 8, 32):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x)
        jax.block_until_ready(out)
        print(f"unchained x{iters:3d}: {(time.perf_counter() - t0) * 1e3:8.2f} ms total")

    # chained: each call consumes the previous output
    y = f(x)
    jax.block_until_ready(y)
    for iters in (1, 8, 32):
        y = f(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(y)
        jax.block_until_ready(y)
        print(f"chained   x{iters:3d}: {(time.perf_counter() - t0) * 1e3:8.2f} ms total")

    # forced device->host transfer of a reduction
    g = jax.jit(lambda a: (a.astype(jnp.float32) * 1.0001).sum())
    _ = float(g(x))
    t0 = time.perf_counter()
    for _ in range(8):
        v = float(g(x))
    print(f"reduce+transfer x8: {(time.perf_counter() - t0) * 1e3:8.2f} ms total")


if __name__ == "__main__":
    main()
