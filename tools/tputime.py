"""Trustworthy TPU timing under the axon tunnel.

``jax.block_until_ready`` does not reliably wait for remote completion here
(measured impossible >8 TB/s on elementwise ops), so every timed iteration
must feed a scalar probe that is finally fetched to the host — the fetch
forces the whole dependency chain.  One RPC at the end keeps the per-iter
overhead near zero.
"""

import time

import jax
import jax.numpy as jnp

__all__ = ["timed"]


def _probe(out):
    """Cheap scalar that depends on (a corner of) every output leaf."""
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel") and x.size]
    return sum(x.ravel()[0].astype(jnp.float32) for x in leaves)


def timed(name, fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(_probe(out))  # force warmup completion
    t0 = time.perf_counter()
    probes = []
    for _ in range(iters):
        out = fn(*args)
        probes.append(_probe(out))
    float(jnp.stack(probes).sum())  # forces all iterations
    dt = (time.perf_counter() - t0) / iters
    if name:
        print(f"{name:46s} {dt * 1e3:9.2f} ms")
    return out, dt
