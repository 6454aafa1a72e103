"""Multi-host scaffolding: mesh helpers (single process) and a REAL
2-process jax.distributed smoke — two CPU processes, each with 2 local
devices, run the dense distributed train step over the global 4-device mesh
with per-process data feeding (SURVEY §4.3 'multi-host' row; BASELINE.json:5
N>=2-host execution path)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from scalable_e3_gnn_tpu.parallel.multihost import local_shard_slice, make_hosts_mesh


def test_make_hosts_mesh_shapes():
    mesh = make_hosts_mesh(dp=1)
    assert mesh.shape["graph"] == len(jax.devices())
    mesh2 = make_hosts_mesh(dp=2)
    assert mesh2.shape["dp"] == 2
    assert mesh2.shape["dp"] * mesh2.shape["graph"] == len(jax.devices())
    with pytest.raises(ValueError):
        make_hosts_mesh(dp=3)


def test_local_shard_slice_single_process():
    mesh = make_hosts_mesh(dp=1)
    p = mesh.shape["graph"]
    lo, hi = local_shard_slice(p, mesh)
    assert (lo, hi) == (0, p)  # single process owns everything


_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp, optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
    from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
    from scalable_e3_gnn_tpu.models.segnn import SEGNN
    from scalable_e3_gnn_tpu.parallel.halo import (
        make_dist_geometry_dense, make_dist_train_step_dense, _shard_args_dense)
    from scalable_e3_gnn_tpu.parallel.multihost import local_shard_slice, make_hosts_mesh
    from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense
    from scalable_e3_gnn_tpu.train.pipeline import make_train_state

    assert jax.process_count() == nproc
    devs = jax.devices()
    nparts = len(devs)
    rng = np.random.default_rng(0)
    n = 128
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    e = radius_graph_brute(jnp.asarray(pts), 0.8, max_neighbors=8)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    g = DenseEdgeGraph.from_radius_edges(jnp.asarray(feats), jnp.asarray(pts), e)
    part = partition_graph_dense(
        pts, feats, np.array(g.senders), np.array(g.edge_mask), num_parts=nparts)
    mesh = Mesh(np.array(devs).reshape(nparts), ("graph",))
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("8x0e+4x1o"), Irreps("1x1o"),
                  num_layers=2, layout="cm")
    params = model.init(jax.random.key(0))
    lo, hi = local_shard_slice(nparts, mesh)
    host_args = _shard_args_dense(part)
    def put(x):
        sh = NamedSharding(mesh, P("graph", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sh, np.asarray(x)[lo:hi])
    args = tuple(put(x) for x in host_args)
    attrs = make_dist_geometry_dense(model, mesh)(args)
    tgtg = rng.standard_normal((n, 3)).astype(np.float32)
    tgt_local = tgtg[np.clip(part.global_ids, 0, None)][lo:hi]
    tgt = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("graph")), tgt_local)
    opt = optax.sgd(1.0)
    step = make_dist_train_step_dense(model, opt, mesh)
    st = make_train_state(params, opt)
    st, m = step(st, args, tgt, attrs)
    print(f"MHLOSS {float(m['loss']):.8f}", flush=True)
    """
)


def test_two_process_dense_dist_step(tmp_path):
    """Spawn 2 coordinated CPU processes; both must finish one dense dist
    train step over the global 2x2-device mesh with the same loss, and the
    loss must match the single-process 4-device run."""
    worker = tmp_path / "mh_worker.py"
    worker.write_text(_WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = "12787"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process smoke timed out")
        if p.returncode != 0 and "distributed" in err.lower():
            pytest.skip(f"jax.distributed unavailable here: {err[-400:]}")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    losses = [
        float(line.split()[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("MHLOSS")
    ]
    assert len(losses) == 2
    assert losses[0] == losses[1]
    assert np.isfinite(losses[0])


_CKPT_WORKER = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    ckdir = sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp, optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
    from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
    from scalable_e3_gnn_tpu.models.segnn import SEGNN
    from scalable_e3_gnn_tpu.parallel.halo import (
        make_dist_geometry_dense, make_dist_train_step_dense, _shard_args_dense)
    from scalable_e3_gnn_tpu.parallel.multihost import local_shard_slice, make_hosts_mesh
    from scalable_e3_gnn_tpu.parallel.partition import partition_graph_dense
    from scalable_e3_gnn_tpu.train.pipeline import make_train_state
    from scalable_e3_gnn_tpu.train.checkpoint import (
        save_checkpoint, restore_checkpoint, latest_step)

    assert jax.process_count() == nproc
    devs = jax.devices()
    nparts = len(devs)
    rng = np.random.default_rng(0)
    n = 128
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    e = radius_graph_brute(jnp.asarray(pts), 0.8, max_neighbors=8)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    g = DenseEdgeGraph.from_radius_edges(jnp.asarray(feats), jnp.asarray(pts), e)
    part = partition_graph_dense(
        pts, feats, np.array(g.senders), np.array(g.edge_mask), num_parts=nparts)
    mesh = Mesh(np.array(devs).reshape(nparts), ("graph",))
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("8x0e+4x1o"), Irreps("1x1o"),
                  num_layers=2, layout="cm")
    params = model.init(jax.random.key(0))
    lo, hi = local_shard_slice(nparts, mesh)
    host_args = _shard_args_dense(part)
    def put(x):
        sh = NamedSharding(mesh, P("graph", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sh, np.asarray(x)[lo:hi])
    args = tuple(put(x) for x in host_args)
    attrs = make_dist_geometry_dense(model, mesh)(args)
    tgtg = rng.standard_normal((n, 3)).astype(np.float32)
    tgt_local = tgtg[np.clip(part.global_ids, 0, None)][lo:hi]
    tgt = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("graph")), tgt_local)
    opt = optax.sgd(0.5)
    step = make_dist_train_step_dense(model, opt, mesh)
    st = make_train_state(params, opt)
    # step 1 -> the live state now carries mesh shardings (non-fully-
    # addressable jax.Arrays: nproc=2 processes over the 4-device mesh)
    st, m = step(st, args, tgt, attrs)
    leaf0 = jax.tree.leaves(st)[0]
    assert not leaf0.is_fully_addressable, "test needs non-addressable state"
    save_checkpoint(ckdir, 1, st, extra={"tag": "mh"})
    assert latest_step(ckdir) == 1
    # snapshot local shard data BEFORE stepping: the train step donates its
    # state input, so st's buffers are deleted by branch A
    snap = [
        [(sh.index, np.asarray(sh.data)) for sh in x.addressable_shards]
        if isinstance(x, jax.Array) else np.asarray(x)
        for x in jax.tree.leaves(st)
    ]
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if isinstance(x, jax.Array) else x, st)
    # branch A: continue without restore
    st_a, m_a = step(st, args, tgt, attrs)
    # branch B: restore into the (shape/sharding) template and continue
    st_r, got = restore_checkpoint(ckdir, template)
    assert got == 1
    for a, b in zip(snap, jax.tree.leaves(st_r)):
        if not isinstance(b, jax.Array):
            assert np.array_equal(np.asarray(a), np.asarray(b)); continue
        for (idx, data), sb in zip(a, b.addressable_shards):
            assert idx == sb.index
            np.testing.assert_array_equal(data, np.asarray(sb.data))
    st_b, m_b = step(st_r, args, tgt, attrs)
    la, lb = float(m_a["loss"]), float(m_b["loss"])
    assert la == lb, (la, lb)
    print(f"CKLOSS {la:.8f}", flush=True)
    """
)


def test_two_process_sharded_checkpoint(tmp_path):
    """2-process save/restore of non-fully-addressable state: per-process
    shard files, bitwise round-trip, and resume exactness (step after
    restore == step without the save/restore detour)."""
    worker = tmp_path / "ck_worker.py"
    worker.write_text(_CKPT_WORKER)
    ckdir = tmp_path / "ckpts"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PALLAS_AXON_POOL_IPS")
    }
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = "12791"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port, str(ckdir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("sharded-checkpoint smoke timed out")
        if p.returncode != 0 and "distributed" in err.lower():
            pytest.skip(f"jax.distributed unavailable here: {err[-400:]}")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    losses = [
        float(line.split()[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("CKLOSS")
    ]
    assert len(losses) == 2
    assert losses[0] == losses[1]
    assert np.isfinite(losses[0])
    # both processes wrote their shard file; process 0 wrote the manifest
    names = sorted(os.listdir(ckdir))
    assert "ckpt_1.p0.npz" in names and "ckpt_1.p1.npz" in names
    assert "ckpt_1.json" in names
