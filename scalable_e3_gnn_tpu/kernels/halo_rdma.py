"""Pallas RDMA ring all-gather for the halo boundary pool.

The explicit-overlap communication backend (SURVEY.md §7 hard part 2): the
boundary-feature pool is assembled by a ring of ``make_async_remote_copy``
RDMAs over ICI instead of an XLA all_gather.  Because the kernel owns the
DMA schedule, later rounds' sends overlap earlier rounds' waits, and the
collective can be interleaved with independent compute by the caller.

Gradient: the transpose of an all-gather is a reduce-scatter; the backward
uses XLA's psum_scatter (overlap is less critical on the backward, and the
collective matches the forward's communication volume).

Used by ``parallel.halo.exchange_halo(..., backend='rdma')``; the default
backend remains the XLA all_gather (equally correct, scheduler-overlapped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_all_gather"]


def _ring_kernel(num_devices, axis_name, x_ref, out_ref, send_sem, recv_sem, copy_sem):
    my_id = lax.axis_index(axis_name)
    p = num_devices
    right = lax.rem(my_id + 1, p)

    # place the local chunk into our slot
    local = pltpu.make_async_copy(x_ref, out_ref.at[my_id], copy_sem)
    local.start()
    local.wait()

    # no global barrier needed: every remote write targets slot ``sender_id``
    # on the receiver, which the receiver itself never writes (its local copy
    # fills its own slot), and each device's next send is gated on its own
    # recv wait — the ring stays in lockstep.

    # statically unrolled ring (p is a compile-time constant); the chunk we
    # forward at step s is the one received at step s-1 (ours at step 0)
    for step in range(p - 1):
        slot = lax.rem(my_id + p - step, p)
        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[slot],
            dst_ref=out_ref.at[slot],
            send_sem=send_sem,
            recv_sem=recv_sem,
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()


def _fwd(x, axis_name, num_devices, collective_id, interpret):
    # Mosaic requires the ring's per-slot DMA slices (out_ref.at[slot]) to be
    # aligned to the (8, 128) tiling: pad H to sublanes and F to lanes, run
    # the ring on the padded pool, slice back.  Found by AOT-compiling for a
    # real v5e 4-chip topology — interpret mode does not model DMA alignment
    # (same class as the r2 lane-offset concat bug).
    h0, f0 = x.shape
    hp = -(-h0 // 8) * 8
    fp = -(-f0 // 128) * 128
    if (hp, fp) != (h0, f0):
        x = jnp.pad(x, ((0, hp - h0), (0, fp - f0)))
        out = _fwd(x, axis_name, num_devices, collective_id, interpret)
        return out[:, :h0, :f0]
    h, f = x.shape
    out = pl.pallas_call(
        functools.partial(_ring_kernel, num_devices, axis_name),
        out_shape=jax.ShapeDtypeStruct((num_devices, h, f), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def ring_all_gather(
    x: jnp.ndarray,
    axis_name: str,
    num_devices: int,
    collective_id: int = 7,
    interpret: bool = False,
) -> jnp.ndarray:
    """[H, F] per device -> [P, H, F] pool, via a ring of RDMAs over ICI.

    Must run inside shard_map over ``axis_name`` with ``num_devices`` devices.
    """
    return _fwd(x, axis_name, num_devices, collective_id, interpret)


def _vjp_fwd(x, axis_name, num_devices, collective_id, interpret):
    return _fwd(x, axis_name, num_devices, collective_id, interpret), None


def _vjp_bwd(axis_name, num_devices, collective_id, interpret, _, g):
    # transpose of all-gather = reduce-scatter: device p needs sum_q g_q[p]
    dx = lax.psum_scatter(g, axis_name, scatter_dimension=0, tiled=False)
    return (dx,)


ring_all_gather.defvjp(_vjp_fwd, _vjp_bwd)
