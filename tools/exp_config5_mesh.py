"""Config-5 partitioned-step proof at 10M shapes on the CPU device farm.

Single-chip 10M training does not fit one v5e (measured scaling law:
~2.35 KB/point practical live set -> ~30 GB at 10M vs 15.75 GB HBM; see
docs/PERF.md "config 5 memory math").  Config 5 is the multi-host config by
definition (BASELINE.md ladder: "multi-host halo exchange, N>=2"), so the
required evidence is: (a) the partitioner + caps + distributed step hold at
REAL 10M shapes, (b) per-device memory at P=8 (1.25M nodes/device) is
config-4 scale, which the real chip already runs.  This script executes one
full distributed train step on the 8-virtual-device CPU mesh.

CPU-farm ceiling (r3 measured): two independent XLA:CPU artifacts cap
execution on this 2-core host well below 10M — (a) the backend allocates
its whole buffer-assignment as one up-front temp arena (~148 GiB at 1M
points, no TPU-style reuse), and (b) the in-process collective rendezvous
times out when per-device compute runs minutes on an oversubscribed host
(8 virtual devices / 2 cores), so the step executes only at test/dryrun
scale here.  Partition + sharding + distributed geometry run fine at full
10M shapes; the per-chip TPU accounting is the relevant one
(exp_config5_tpu_aot.py: 14.69 GiB/chip at 10M, P=16, within HBM).

Run:  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
          XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/exp_config5_mesh.py [--points 10000000]
"""

import argparse
import json
import resource
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel.halo import (
    make_dist_geometry_dense,
    make_dist_train_step_dense,
    shard_partitioned_dense,
)
from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense
from scalable_e3_gnn_tpu.train.pipeline import make_train_state
from tools.exp_partition_native import synthetic_dense


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_000_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    devices = jax.devices()
    assert len(devices) >= args.parts and devices[0].platform == "cpu"
    mesh = Mesh(np.array(devices[:args.parts]).reshape(args.parts),
                ("graph",))

    t0 = time.time()
    # synthetic Morton-local graph (the r2/r3 partition-bench protocol):
    # the octree+radius builders are TPU code measured separately; this
    # proof targets partitioner caps + step shapes + per-device memory
    pos, feats, senders, mask = synthetic_dense(args.points, k=args.k)
    feats = feats[:, :5]  # model input irreps 2x0e+1x1o = 5 dims
    print(f"# graph {args.points} pts / {int(mask.sum())} edges: "
          f"{time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    part = partition_graph_dense(pos, feats, senders, mask,
                                 num_parts=args.parts)
    tpart = time.time() - t0
    print(f"# partition P={args.parts}: {tpart:.1f}s  NI={part.n_interior} "
          f"NB={part.n_boundary} H={part.halo_cap} Q=({part.rev_int.shape[-1]},"
          f"{part.rev_ext.shape[-1]})", flush=True)

    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"), Irreps("1x1o"),
        lmax_attr=2, num_layers=4, remat=True, layout="cm",
    )
    bf = jnp.bfloat16
    t0 = time.time()
    sargs = shard_partitioned_dense(part, mesh)
    attrs = make_dist_geometry_dense(model, mesh)(sargs)
    attrs = jax.tree.map(
        lambda x: x.astype(bf) if x.dtype == jnp.float32 else x, attrs)
    sargs = tuple(x.astype(bf) if x.dtype == jnp.float32 else x
                  for x in sargs)
    jax.block_until_ready(attrs)
    print(f"# shard + geometry: {time.time()-t0:.1f}s", flush=True)

    tgt = jnp.zeros((args.parts, part.n_per_part, 3), jnp.float32)
    opt = optax.adam(1e-3)
    step = make_dist_train_step_dense(model, opt, mesh, compute_dtype=bf)
    st = make_train_state(model.init(jax.random.key(0)), opt)
    t0 = time.time()
    st, m = step(st, sargs, tgt, attrs)
    loss = float(m["loss"])
    t_first = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    assert np.isfinite(loss), loss
    print(json.dumps({
        "metric": "config5_mesh_step",
        "value": round(t_first, 1), "unit": "s (CPU mesh, compile incl.)",
        "vs_baseline": 0,
        "extras": {
            "points": args.points, "parts": args.parts,
            "n_per_part": part.n_per_part, "halo_cap": part.halo_cap,
            "loss": loss, "partition_s": round(tpart, 1),
            "host_rss_gib": round(rss, 1),
        },
    }))


if __name__ == "__main__":
    main()
