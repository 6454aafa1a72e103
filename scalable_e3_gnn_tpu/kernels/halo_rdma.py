"""Pallas RDMA ring all-gather for the halo boundary pool.

The explicit-overlap communication backend (SURVEY.md §7 hard part 2): the
boundary-feature pool is assembled by a ring of ``make_async_remote_copy``
RDMAs over ICI instead of an XLA all_gather.  The ring runs the classic
pipelined schedule: round ``s``'s send is gated ONLY on round ``s-1``'s
receive (the data dependency — the chunk forwarded at round s is the one
that arrived at round s-1); the send-*completion* waits are deferred to the
end of the ring, so round s+1's outgoing DMA is in flight while round s's
is still draining.  Each round uses its own send/recv semaphore pair
(``SemaphoreType.DMA((p-1,))`` scratch arrays) — byte-counting on a shared
semaphore could otherwise satisfy round s-1's recv wait with round s's
early-arriving bytes and forward a half-written slot.

Status vs XLA all_gather: the schedule above removes the send-completion
serialization the r3 sequential ring had, and the kernel AOT-compiles for a
real v5e 4-chip topology (tests/test_halo_rdma.py, fp32 + bf16).  There is
still no *measured* advantage over XLA's scheduler-overlapped all_gather
(one-chip sandbox — a ring cannot be timed), so the default backend remains
``"xla"``; this kernel is the structural proof that the halo exchange can
own its DMA schedule (per-round granularity for future compute interleave).

Gradient: the transpose of an all-gather is a reduce-scatter; the backward
uses XLA's psum_scatter (overlap is less critical on the backward, and the
collective matches the forward's communication volume).

Used by ``parallel.halo.exchange_halo(..., backend='rdma')``.
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
    # fills its own slot), and each device's round-s send is gated on its own
    # round-(s-1) recv wait — the ring stays in lockstep.

    # statically unrolled pipelined ring (p is a compile-time constant); the
    # chunk we forward at round s is the one received at round s-1 (ours at
    # round 0).  Per-round semaphores: in-flight rounds must not alias.
    rdmas = []
    for step in range(p - 1):
        slot = lax.rem(my_id + p - step, p)
        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[slot],
            dst_ref=out_ref.at[slot],
            send_sem=send_sem.at[step],
            recv_sem=recv_sem.at[step],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        if step > 0:
            # data gate only: the previous round's chunk has ARRIVED;
            # its send completion is drained after the loop
            rdmas[step - 1].wait_recv()
        rdma.start()
        rdmas.append(rdma)
    for r in rdmas:
        r.wait_send()
    if rdmas:
        rdmas[-1].wait_recv()


def _fwd(x, axis_name, num_devices, collective_id, interpret):
    # Mosaic requires the ring's per-slot DMA slices (out_ref.at[slot]) to be
    # aligned to the native tiling: pad H to the dtype's sublane tile
    # (fp32 8 / bf16 16 / int8+fp8 32 — 32 bytes of sublanes) and F to 128
    # lanes, run the ring on the padded pool, slice back.  Found by
    # AOT-compiling for a real v5e 4-chip topology — interpret mode does not
    # model DMA alignment (same class as the r2 lane-offset concat bug).
    h0, f0 = x.shape
    sub = max(32 // x.dtype.itemsize, 8)
    hp = -(-h0 // sub) * sub
    fp = -(-f0 // 128) * 128
    if (hp, fp) != (h0, f0):
        x = jnp.pad(x, ((0, hp - h0), (0, fp - f0)))
        out = _fwd(x, axis_name, num_devices, collective_id, interpret)
        return out[:, :h0, :f0]
    h, f = x.shape
    nsem = max(num_devices - 1, 1)
    out = pl.pallas_call(
        functools.partial(_ring_kernel, num_devices, axis_name),
        out_shape=jax.ShapeDtypeStruct((num_devices, h, f), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((nsem,)),
            pltpu.SemaphoreType.DMA((nsem,)),
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
