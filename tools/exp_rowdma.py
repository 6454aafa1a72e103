"""In-kernel sender-row DMA experiment (VERDICT r4 next #3) — NEGATIVE.

Hypothesis: a Pallas kernel that DMAs individual sender rows from an
HBM-resident ``h`` (dynamic indices via scalar prefetch) could beat the
XLA pre-gather that feeds the fused kernels their [K, N, F] operand
(~90 GB/s on 180-byte rows).

Result: **structurally impossible at row granularity on this hardware.**
The v5e AOT compile of this kernel fails in Mosaic with

    Slice shape along dimension 0 must be aligned to tiling (8), but is 1.

— a DMA destination in (8,128)-tiled VMEM must be a multiple of 8 sublanes,
so single-row (1 x F) copies cannot land in VMEM at all.  The two
workarounds both lose on arithmetic before any measurement:

- aligned-panel fetch (copy the 8-row panel containing each sender row,
  select in-register): 8x the bytes per edge row; even at the measured
  266 GB/s aligned-stream bandwidth vs the 90 GB/s random-row gather,
  8/2.95 = 2.7x SLOWER than XLA's gather;
- descriptor count: K*T = 1024-1280 copies per grid step = ~4M
  descriptors per layer; at the ~0.5-1 us issue+wait cost of a Mosaic DMA
  this is seconds per layer before a byte moves.

The XLA gather (random 180 B rows through the gather unit) therefore
remains the right primitive; the tabled per-tile compact gather
(fused_message.with_gather_tables) is the only in-kernel alternative that
respects the 8-sublane DMA granularity, and its train-step A/B is already
recorded (docs/PERF.md "Tabled gather").

This file is kept as the reproduction: running it attempts the compile and
prints the Mosaic rejection.  Run: PYTHONPATH=. python tools/exp_rowdma.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25_600
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    k, tile = 16, 64
    rows_per = k * tile
    grid = n // tile

    def kernel(idx_ref, h_hbm, out_ref, scratch, sems):
        i = pl.program_id(0)
        for j in range(rows_per):
            r = idx_ref[i * rows_per + j]
            pltpu.make_async_copy(
                h_hbm.at[pl.ds(r, 1)], scratch.at[pl.ds(j, 1)], sems.at[j]
            ).start()
        for j in range(rows_per):
            r = idx_ref[i * rows_per + j]
            pltpu.make_async_copy(
                h_hbm.at[pl.ds(r, 1)], scratch.at[pl.ds(j, 1)], sems.at[j]
            ).wait()
        acc = scratch[0:tile].astype(jnp.float32)
        for kk in range(1, k):
            acc = acc + scratch[kk * tile : (kk + 1) * tile].astype(
                jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype)

    fn = lambda idx, hh: pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((tile, f), lambda i, idx: (i, 0)),
            scratch_shapes=[pltpu.VMEM((rows_per, f), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((rows_per,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, f), jnp.bfloat16),
    )(idx, hh)

    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2x1")
    sh = SingleDeviceSharding(topo.devices[0])
    idx_s = jax.ShapeDtypeStruct((n * k,), jnp.int32, sharding=sh)
    h_s = jax.ShapeDtypeStruct((n, f), jnp.bfloat16, sharding=sh)
    try:
        jax.jit(fn).lower(idx_s, h_s).compile()
        print("# UNEXPECTED: per-row DMA kernel compiled — re-measure!")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = "must be aligned to tiling"
        where = msg.find(key)
        print("# per-row DMA kernel REJECTED by Mosaic (as documented):")
        print("#  ..." + msg[max(0, where - 60) : where + 40].replace("\n", " "))


if __name__ == "__main__":
    main()
