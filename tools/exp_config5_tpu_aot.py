"""AOT-compile the 10M-point distributed dense step for a real v5e slice."""
import os, sys, re
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp, optax
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel import halo as H
from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense
from scalable_e3_gnn_tpu.train.pipeline import make_train_state
from tools.exp_partition_native import synthetic_dense

PARTS = int(os.environ.get("PARTS", "16"))
TOPO = os.environ.get("TOPO", "v5e:4x4x1")
N = int(os.environ.get("N", "10000000"))

topo = topologies.get_topology_desc(platform="tpu", topology_name=TOPO)
mesh = Mesh(np.array(topo.devices)[:PARTS].reshape(PARTS), ("graph",))

pos, feats, senders, mask = synthetic_dense(N)
feats = feats[:, :5]
part = partition_graph_dense(pos, feats, senders, mask, num_parts=PARTS)
print(f"partition P={PARTS}: NI={part.n_interior} NB={part.n_boundary} "
      f"H={part.halo_cap}", flush=True)

model = SEGNN(Irreps("2x0e+1x1o"), Irreps("24x0e+12x1o+6x2e"), Irreps("1x1o"),
              lmax_attr=2, num_layers=4, remat=True, layout="cm",
              use_pallas=True, remat_kernel=True, residual_bwd=False)
bf = jnp.bfloat16
raw = H._shard_args_dense(part)
shd = lambda x, dt=None: jax.ShapeDtypeStruct(
    x.shape, dt or (bf if x.dtype == jnp.float32 else x.dtype),
    sharding=NamedSharding(mesh, P("graph", *([None] * (x.ndim - 1)))))
sargs_s = tuple(shd(x) for x in raw)
# attrs shapes from a tiny CPU eval_shape with the same code
cpu_mesh = Mesh(np.array(jax.devices()[:1] * 1).reshape(1), ("graph",))
attrs_shape = jax.eval_shape(
    lambda a: H.make_dist_geometry_dense(
        model, Mesh(np.array(jax.devices()[:PARTS] if len(jax.devices()) >= PARTS
                             else [jax.devices()[0]] * PARTS).reshape(PARTS),
                    ("graph",)))(a),
    tuple(jnp.zeros(x.shape, x.dtype) for x in raw))
attrs_s = jax.tree.map(shd, attrs_shape)
tgt_s = jax.ShapeDtypeStruct((PARTS, part.n_per_part, 3), jnp.float32,
                             sharding=NamedSharding(mesh, P("graph")))
opt = optax.adam(1e-3)
wrapper = H.make_dist_train_step_dense(model, opt, mesh, compute_dtype=bf)
jstep = wrapper.jit_step  # the lowerable step, exposed as API (r4)
st = make_train_state(model.init(jax.random.key(0)), opt)
rep = NamedSharding(mesh, P())
st_s = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                   sharding=rep), st)
copts = {}
if os.environ.get("DUMP"):
    import tempfile
    dump_dir = tempfile.mkdtemp(prefix="cfg5_hlo_")
    copts = {"xla_dump_to": dump_dir,
             "xla_dump_hlo_pass_re": "latency-hiding-scheduler"}
comp = jstep.lower(st_s, sargs_s, tgt_s, attrs_s).compile(
    compiler_options=copts or None)
ma = comp.memory_analysis()
print(f"COMPILED for {TOPO} ({PARTS} chips) at N={N}")
print(f"per-chip: temp {ma.temp_size_in_bytes/2**30:.2f} GiB, "
      f"args {ma.argument_size_in_bytes/2**30:.2f} GiB "
      f"(HBM 15.75 GiB/chip)")

if os.environ.get("DUMP"):
    # backward-collective evidence at CONFIG-5 SCALE (VERDICT r4 missing
    # #1): what do the gradient pass's collectives lower to, are they
    # async, and what overlaps them in the scheduled module?
    import glob
    files = sorted(glob.glob(f"{dump_dir}/*after_latency-hiding-scheduler*"),
                   key=lambda f: -len(open(f).read()))
    lines = open(files[0]).read().splitlines()
    kinds = {}
    for ln in lines:
        m = re.search(
            r"= [a-z0-9\[\],{}:()*T ]*\b(all-gather|all-reduce|"
            r"reduce-scatter|collective-permute)(-start|-done)?\(", ln)
        if m:
            shp = re.search(r"= ([a-z0-9]+\[[0-9,]*\])", ln)
            key = (m.group(1) + (m.group(2) or ""),
                   shp.group(1) if shp else "?")
            kinds[key] = kinds.get(key, 0) + 1
    print("collectives in the scheduled config-5 module:")
    for (k, shp), c in sorted(kinds.items()):
        print(f"  {c:3d} x {k:30s} {shp}")
    kernel = re.compile(r"= .*custom-call.*tpu_custom_call")
    fuse = re.compile(r"= .*(?:fusion|dot)\(")
    start_re = re.compile(r"(%[\w.\-]+) = .* (?:all-gather|all-reduce|"
                          r"collective-permute|reduce-scatter)-start\(")
    done_re = re.compile(r"(?:all-gather|all-reduce|collective-permute|"
                         r"reduce-scatter)-done\((%[\w.\-]+)")
    open_w, report = {}, []
    for i, ln in enumerate(lines):
        m = start_re.search(ln)
        if m:
            open_w[m.group(1)] = [i, 0, 0]
            continue
        m = done_re.search(ln)
        if m and m.group(1) in open_w:
            st0 = open_w.pop(m.group(1))
            report.append((m.group(1), st0[0], i, st0[1], st0[2]))
            continue
        if kernel.search(ln):
            for k in open_w:
                open_w[k][1] += 1
        elif fuse.search(ln):
            for k in open_w:
                open_w[k][2] += 1
    print(f"{len(report)} async windows:")
    for k, s, d, ck, cf in report:
        print(f"  {k}: start@{s} done@{d}, {ck} Mosaic + {cf} fusion/dot "
              f"inside")
    n_ov = sum(1 for *_, ck, cf in report if ck + cf > 0)
    print(f"=> {n_ov}/{len(report)} async collective windows overlap "
          f"compute at config-5 scale")

# Round-3 result (2026-08-21):
#   partition P=16: NI=624891 NB=119 H=118
#   COMPILED for v5e:4x4x1 (16 chips) at N=10000000
#   per-chip: temp 14.69 GiB, args 0.40 GiB (HBM 15.75 GiB/chip)
