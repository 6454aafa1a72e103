"""Determine remote-execution semantics: is there result caching / overlap?

Times the same elementwise op three ways with the probe-forced harness:
  A) unchained identical calls
  B) calls perturbed by the previous probe (defeats any result cache)
  C) true data chain y = f(y)
If A << B ~= C, identical calls are served from a cache and all future
measurements must chain.
"""

import sys

sys.path.insert(0, "/root/repo/tools")

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from tputime import timed, _probe
import time

N, F = 2_396_160, 80
bf = jnp.bfloat16


def main():
    x = jax.random.normal(jax.random.key(0), (N, F), bf)
    f = jax.jit(lambda a: a * 1.0001 + 0.5)

    timed("A unchained elementwise", f, x, iters=16)

    # B: perturb input with previous probe (scalar, value 0 contribution)
    g = jax.jit(lambda a, p: (a + p * 0.0) * 1.0001 + 0.5)
    out = g(x, jnp.float32(0))
    p = _probe(out)
    float(p)
    t0 = time.perf_counter()
    for _ in range(16):
        out = g(x, p)
        p = _probe(out)
    float(p)
    print(f"{'B probe-perturbed elementwise':46s} {(time.perf_counter()-t0)/16*1e3:9.2f} ms")

    # C: true chain
    y = f(x)
    float(_probe(y))
    t0 = time.perf_counter()
    for _ in range(16):
        y = f(y)
    float(_probe(y))
    print(f"{'C chained elementwise':46s} {(time.perf_counter()-t0)/16*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
