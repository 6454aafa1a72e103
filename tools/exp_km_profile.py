"""100k lmax=1 component profile with unbiased chaining.

The older isolated timers (exp_km_ab, exp_generic_breakdown pre-r4) chained
iterations by perturbing the big sender operand — a full read+write of that
array (384 MB at the 100k shapes) rides INSIDE every measurement, inflating
kernel numbers by a constant ~2-4 ms.  Here every measurement chains through
the small [N, F] receiver array (16 MB, ~0.15 ms) so components can be
attributed against the 292 ms step honestly.

Pieces: elementwise ceiling, sender gather fwd / f+b, km kernel fwd / f+b,
gather+kernel composed f+b (the in-context path XLA actually fuses).
"""

import time

from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.kernels.fused_message import (
    MessageConfig,
    fused_message_aggregate_km,
)
from scalable_e3_gnn_tpu.models.segnn import SEGNNLayer
from scalable_e3_gnn_tpu.ops.gather_scatter import take_dense_symmetric_km

bf = jnp.bfloat16


def timed(name, fn, x, *rest, iters=10):
    """Chain via the (small) first argument; fetch one scalar at the end.

    Big arrays ride as explicit arguments (``rest``) — closing over them
    embeds them as program constants and overflows the remote-compile
    tunnel's request limit (HTTP 413).  NB every measurement carries a ~3 ms
    dispatch-latency floor (3 tunnel RPCs/iteration — the measured
    "elementwise ceiling" on a 16 MB op); subtract it when attributing."""
    pert = jax.jit(lambda a, p: a + p.astype(a.dtype) * 0)

    def _p(o):
        leaf = jax.tree.leaves(o)[0]
        return leaf[(0,) * leaf.ndim].astype(jnp.float32)

    probe = jax.jit(_p)
    p = probe(fn(x, *rest))
    x = pert(x, p)
    p = probe(fn(x, *rest))
    float(p)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = pert(x, p)
        p = probe(fn(x, *rest))
    float(p)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    n, k, tile = 100_032, 24, 96
    layer = SEGNNLayer(Irreps("32x0e+16x1o"), Irreps.spherical_harmonics(1),
                       layout="cm", use_pallas=True)
    f = layer.hidden_irreps.dim
    params = layer.init(jax.random.key(0))
    lp = jax.tree.map(lambda x: x.astype(bf), params)
    w = layer._folded_weights(lp, bf)

    key = jax.random.key(1)
    h = jax.random.normal(key, (n, f), bf)
    senders = jax.random.randint(jax.random.key(2), (n, k), 0, n)
    # synthetic reverse table/mask: wrong VALUES for a random graph, but the
    # same compute/memory shape as the real symmetric-gather VJP
    reverse_slot = jax.random.randint(jax.random.key(3), (n, k), 0, n * k)
    smask = jnp.ones((n, k), jnp.bool_)
    attr3 = jax.random.normal(key, (n, k, 4), bf)
    d23 = jax.random.uniform(key, (n, k), bf)
    mask3 = jnp.ones((n, k), bf)
    geo2 = jnp.concatenate([attr3, d23[..., None], mask3[..., None]],
                           axis=-1).reshape(n, k * 6)
    cfg = MessageConfig(hs=32, hv=16, k=k, tile=tile)

    timed("elementwise [N,F] (ceiling)", jax.jit(lambda h_: h_ * 2 + 1), h)

    gather = jax.jit(lambda h_: take_dense_symmetric_km(h_, senders, reverse_slot, smask))
    timed("gather fwd", gather, h)
    timed("gather f+b", jax.jit(jax.grad(
        lambda h_: take_dense_symmetric_km(h_, senders, reverse_slot, smask).astype(
            jnp.float32).sum())), h)

    hs3 = gather(h)

    def kfwd(h_, hs3_):
        return fused_message_aggregate_km(cfg, hs3_, h_, geo2, *w)

    timed("km kernel fwd", jax.jit(kfwd), h, hs3)
    timed("km kernel f+b (wrt hr+hs)", jax.jit(jax.grad(
        lambda h_, hs3_: kfwd(h_, hs3_).astype(jnp.float32).sum(),
        argnums=(0,))), h, hs3)

    def composed(h_):
        return fused_message_aggregate_km(
            cfg, take_dense_symmetric_km(h_, senders, reverse_slot, smask), h_, geo2, *w)

    timed("gather+kernel fwd", jax.jit(composed), h)
    timed("gather+kernel f+b", jax.jit(jax.grad(
        lambda h_: composed(h_).astype(jnp.float32).sum())), h)


if __name__ == "__main__":
    main()
