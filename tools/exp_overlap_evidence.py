"""Exchange/compute overlap: compiled-schedule + wall-clock A/B evidence.

VERDICT r2 item 4: the structural dependency proof (tests/test_overlap_structure.py)
shows the interior-block compute is independent of each layer's halo
all_gather; this script adds two executable artifacts on an 8-device CPU mesh
(the only multi-device surface in a 1-chip sandbox):

(a) **Compiled-HLO schedule scan** — compile the dense distributed forward
    and grep the optimized module for async collective pairs
    (`all-gather-start`/`-done` or `collective-permute-start`), reporting how
    many non-trivial compute ops (dots/convs/fusions) the scheduler placed
    BETWEEN start and done.  >0 means the backend actually overlaps the
    exchange with independent compute, not merely that it could.

(b) **Wall-clock A/B** — the same step with the halo exchange artificially
    serialized (an `optimization_barrier` forcing the interior block to wait
    for the exchanged features) vs the production split step.  On CPU the
    collective is a memcpy so the delta bounds scheduling overhead, not ICI
    overlap; the interesting output is (a) plus the barrier's sign.

Run:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/exp_overlap_evidence.py
"""

import re
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, ".")

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel import halo as H
from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense

LO, HI = (-4.0,) * 3, (4.0,) * 3


def build(n=4096, parts=8):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=5)
    e = radius_graph_brute(tree.points, 0.35, max_neighbors=16)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    g = DenseEdgeGraph.from_radius_edges(jnp.asarray(feats), tree.points, e)
    part = partition_graph_dense(
        np.array(tree.points), feats, np.array(g.senders),
        np.array(g.edge_mask), num_parts=parts,
    )
    return part


def schedule_scan(hlo: str):
    """Count compute ops scheduled between each async collective start/done."""
    lines = hlo.splitlines()
    starts = {}
    report = []
    compute = re.compile(r"= .*(fusion|dot|convolution|custom-call)\(")
    pending = {}
    for i, ln in enumerate(lines):
        m = re.search(r"%?([\w.\-]*(?:all-gather|collective-permute|all-reduce)-start[\w.\-]*)\s*=", ln)
        if m:
            pending[m.group(1)] = [i, 0]
            continue
        if "-done" in ln and ("all-gather" in ln or "collective-permute" in ln
                              or "all-reduce" in ln):
            for k in list(pending):
                base = k.replace("-start", "")
                if base in ln or k in ln:
                    report.append((k, pending[k][1]))
                    del pending[k]
                    break
            continue
        if compute.search(ln):
            for k in pending:
                pending[k][1] += 1
    return report


def tpu_schedule_evidence(parts=4, topology="v5e:2x2x1"):
    """AOT-compile the dense distributed forward for a REAL v5e multi-chip
    topology (compile-only local libtpu; no hardware needed) and scan the
    scheduled module: for each layer's halo all-gather, count the compute
    ops (fusions/dots/Mosaic custom-calls) the TPU scheduler placed between
    ``all-gather-start`` and its ``-done`` — the direct evidence that the
    exchange overlaps independent interior compute (VERDICT r2 item 4a).

    ``topology="v5e:4x4x1", parts=16`` compiles for the 4-host 16-chip slice
    (4 chips/host — the mesh spans DCN), so the overlap claim covers the
    DCN-crossing collective of the config-5 spec row, not just the
    single-host 4-chip case (VERDICT r3 next #1d)."""
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    mesh = Mesh(np.array(topo.devices)[:parts].reshape(parts), ("graph",))
    part = build(n=4096, parts=parts)
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
                  num_layers=4, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    args = H._shard_args_dense(part)
    sh = lambda x: jax.ShapeDtypeStruct(
        x.shape, x.dtype,
        sharding=NamedSharding(mesh, P("graph", *([None] * (x.ndim - 1)))))
    args_s = tuple(sh(jnp.asarray(a)) for a in args)
    # attrs shapes: eval_shape against a CPU mesh (repeat the device when
    # the host has fewer than ``parts`` — shapes only, nothing executes)
    cpu_devs = jax.devices()[:parts]
    if len(cpu_devs) < parts:
        cpu_devs = [jax.devices()[0]] * parts
    cpu_attrs = jax.eval_shape(
        lambda a: H.make_dist_geometry_dense(model, Mesh(
            np.array(cpu_devs).reshape(parts), ("graph",)))(a),
        tuple(jnp.asarray(a) for a in args))
    attrs_s = jax.tree.map(sh, cpu_attrs)
    params_s = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                       sharding=NamedSharding(mesh, P())),
        params)
    fwd = H.make_dist_forward_dense(model, mesh)
    # the final executable text re-merges async pairs (sync all-gather with
    # an async_collective_name attribute), hiding the window; dump the
    # latency-hiding-scheduler output instead — line order IS the schedule
    import glob
    import tempfile

    dump = tempfile.mkdtemp(prefix="overlap_hlo_")
    jax.jit(lambda p, a, at: fwd(p, a, at)).lower(
        params_s, args_s, attrs_s).compile(compiler_options={
            "xla_dump_to": dump,
            "xla_dump_hlo_pass_re": "latency-hiding-scheduler",
        })
    files = glob.glob(f"{dump}/*after_latency-hiding-scheduler*")
    if not files:
        print("# (no latency-hiding-scheduler dump produced)")
        return []
    lines = open(files[0]).read().splitlines()
    kernel = re.compile(r"= .*custom-call.*tpu_custom_call")
    open_w, report = {}, []
    for i, ln in enumerate(lines):
        m = re.search(r"(%[\w.\-]+) = .* all-gather-start\(", ln)
        if m:
            open_w[m.group(1)] = [i, 0]
            continue
        m = re.search(r"all-gather-done\((%[\w.\-]+)", ln)
        if m and m.group(1) in open_w:
            st = open_w.pop(m.group(1))
            report.append((m.group(1), st[0], i, st[1]))
            continue
        if kernel.search(ln):
            for k in open_w:
                open_w[k][1] += 1
    print(f"# TPU v5e:{parts}-chip AOT latency-hiding schedule: "
          f"{len(report)} all-gather start/done windows")
    for k, s, d, c in report:
        print(f"#   {k}: start@{s} done@{d}, {c} Mosaic kernel(s) scheduled "
              f"inside the window")
    n_overlap = sum(1 for *_, c in report if c > 0)
    print(f"# => {n_overlap}/{len(report)} halo exchanges overlap the "
          f"interior fused kernel in the scheduled TPU module")
    return report


def tpu_schedule_evidence_train(parts=4, topology="v5e:2x2x1"):
    """Backward-pass overlap evidence (VERDICT r4 missing #1): AOT-compile
    the FULL dense distributed train step (fwd+bwd+psum+adam) for a real
    v5e topology and scan the latency-hiding-scheduler dump for EVERY async
    collective window — the forward halo all-gathers AND the gradient
    pass's collectives (the all-gather transposes/reduce-scatters and the
    grad/loss all-reduces) — counting the Mosaic custom-calls and fusions
    the TPU scheduler placed inside each start..done window.

    ``topology="v5e:4x4x1", parts=16`` covers the DCN-spanning 4-host case.
    """
    import optax
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scalable_e3_gnn_tpu.train.pipeline import make_train_state

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    mesh = Mesh(np.array(topo.devices)[:parts].reshape(parts), ("graph",))
    part = build(n=4096, parts=parts)
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("32x0e+16x1o"), Irreps("1x1o"),
                  num_layers=4, layout="cm", use_pallas=True)
    params = model.init(jax.random.key(0))
    opt = optax.adam(1e-3)
    state = make_train_state(params, opt)
    args = H._shard_args_dense(part)
    sh = lambda x: jax.ShapeDtypeStruct(
        x.shape, x.dtype,
        sharding=NamedSharding(mesh, P("graph", *([None] * (x.ndim - 1)))))
    args_s = tuple(sh(jnp.asarray(a)) for a in args)
    cpu_devs = jax.devices()[:parts]
    if len(cpu_devs) < parts:
        cpu_devs = [jax.devices()[0]] * parts
    cpu_attrs = jax.eval_shape(
        lambda a: H.make_dist_geometry_dense(model, Mesh(
            np.array(cpu_devs).reshape(parts), ("graph",)))(a),
        tuple(jnp.asarray(a) for a in args))
    attrs_s = jax.tree.map(sh, cpu_attrs)
    repl = lambda x: jax.ShapeDtypeStruct(
        np.shape(x), np.asarray(x).dtype, sharding=NamedSharding(mesh, P()))
    state_s = jax.tree.map(repl, state)
    tgt_s = jax.ShapeDtypeStruct(
        (part.global_ids.shape[0], model.output_irreps.dim), np.float32,
        sharding=NamedSharding(mesh, P("graph")))

    jstep = H.make_dist_train_step_dense(model, opt, mesh).jit_step

    import glob
    import tempfile

    dump = tempfile.mkdtemp(prefix="overlap_bwd_hlo_")
    jstep.lower(state_s, args_s, tgt_s, attrs_s).compile(compiler_options={
        "xla_dump_to": dump,
        "xla_dump_hlo_pass_re": "latency-hiding-scheduler",
    })
    files = glob.glob(f"{dump}/*after_latency-hiding-scheduler*")
    if not files:
        print("# (no latency-hiding-scheduler dump produced)")
        return []
    # pick the main entry module (largest dump)
    files.sort(key=lambda f: -len(open(f).read()))
    lines = open(files[0]).read().splitlines()
    kernel = re.compile(r"= .*custom-call.*tpu_custom_call")
    fuse = re.compile(r"= .*(?:fusion|dot)\(")
    start_re = re.compile(
        r"(%[\w.\-]+) = .* (?:all-gather|all-reduce|collective-permute|"
        r"reduce-scatter)-start\(")
    async_re = re.compile(r"(%[\w.\-]+) = .* async-start")
    done_re = re.compile(
        r"(?:all-gather|all-reduce|collective-permute|reduce-scatter)"
        r"-done\((%[\w.\-]+)")
    adone_re = re.compile(r"async-done\((%[\w.\-]+)")
    open_w, report = {}, []
    for i, ln in enumerate(lines):
        m = start_re.search(ln) or async_re.search(ln)
        if m and "-done" not in ln:
            open_w[m.group(1)] = [i, 0, 0]
            continue
        m = done_re.search(ln) or adone_re.search(ln)
        if m and m.group(1) in open_w:
            st = open_w.pop(m.group(1))
            report.append((m.group(1), st[0], i, st[1], st[2]))
            continue
        if kernel.search(ln):
            for k in open_w:
                open_w[k][1] += 1
        elif fuse.search(ln):
            for k in open_w:
                open_w[k][2] += 1
    print(f"# TPU {topology} ({parts} chips) FULL TRAIN STEP "
          f"latency-hiding schedule: {len(report)} async collective windows")
    for k, s, d, ck, cf in report:
        print(f"#   {k}: start@{s} done@{d}, {ck} Mosaic kernel(s) + "
              f"{cf} fusion/dot op(s) inside")
    n_overlap = sum(1 for *_, ck, cf in report if ck + cf > 0)
    print(f"# => {n_overlap}/{len(report)} collective windows overlap "
          f"compute in the scheduled TPU module (fwd halo + BWD gradient "
          f"collectives)")
    return report


def main():
    devices = jax.devices()
    assert len(devices) >= 8 and devices[0].platform == "cpu", devices
    mesh = Mesh(np.array(devices[:8]).reshape(8), ("graph",))
    part = build()
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("16x0e+8x1o"), Irreps("1x1o"),
                  num_layers=4, layout="cm")
    params = model.init(jax.random.key(0))
    args = H.shard_partitioned_dense(part, mesh)
    attrs = H.make_dist_geometry_dense(model, mesh)(args)

    fwd = H.make_dist_forward_dense(model, mesh)
    lowered = jax.jit(lambda p, a, at: fwd(p, a, at)).lower(
        params, args, attrs)
    hlo = lowered.compile().as_text()
    rep = schedule_scan(hlo)
    total_started = len(rep)
    overlapped = [(k, c) for k, c in rep if c > 0]
    print(f"# async collective pairs in compiled module: {total_started}")
    for k, c in rep:
        print(f"#   {k}: {c} compute ops scheduled inside start..done window")
    print(f"# => {len(overlapped)}/{total_started} windows overlap compute")

    # (b) wall-clock A/B: serialized variant — barrier ties the interior
    # h_local input to the exchanged halo, forcing exchange-before-compute
    orig = H._local_forward_dense

    def serialized(model_, params_, shard, axis, **kw):
        return orig(model_, params_, shard, axis, _serialize_exchange=True,
                    **kw)

    def timed(fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    f_split = jax.jit(lambda p, a, at: fwd(p, a, at))
    t_split = timed(f_split, params, args, attrs)
    H._local_forward_dense = serialized
    try:
        fwd_ser = H.make_dist_forward_dense(model, mesh)
        f_ser = jax.jit(lambda p, a, at: fwd_ser(p, a, at))
        t_ser = timed(f_ser, params, args, attrs)
    finally:
        H._local_forward_dense = orig
    print(f"# split step: {t_split*1e3:.2f} ms; serialized exchange: "
          f"{t_ser*1e3:.2f} ms; delta {100*(t_ser/t_split-1):.1f}%")

    tpu_schedule_evidence()


if __name__ == "__main__":
    main()
