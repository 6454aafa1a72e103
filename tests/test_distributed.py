"""Distributed-without-a-cluster tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4.3): partition invariance, gradient parity through the halo
exchange, and dp × spatial mesh composition."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.graph.container import SteerableGraph
from scalable_e3_gnn_tpu.graph.octree import build_octree
from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.parallel.halo import (
    make_dist_forward,
    make_dist_train_step,
    shard_partitioned,
)
from scalable_e3_gnn_tpu.parallel.partition import partition_graph
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, mse_loss

LO, HI = (-4.0,) * 3, (4.0,) * 3


def _problem(n=512, seed=0, radius=0.7):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 3)).astype(np.float32)
    tree = build_octree(jnp.asarray(pts), LO, HI, num_levels=4)
    e = radius_graph_brute(tree.points, radius, max_neighbors=32)
    feats = rng.standard_normal((n, 5)).astype(np.float32)
    g = SteerableGraph(
        nodes=jnp.asarray(feats),
        positions=tree.points,
        senders=e.senders,
        receivers=e.receivers,
        node_graph=jnp.zeros(n, jnp.int32),
        node_mask=jnp.ones(n, bool),
        edge_mask=e.mask,
        n_graphs=1,
    )
    tgt = rng.standard_normal((n, 3)).astype(np.float32)
    return tree, e, feats, g, tgt


def _model(num_layers=2):
    return SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"), num_layers=num_layers
    )


def test_partitioner_structures():
    tree, e, feats, _, _ = _problem(n=200)
    part = partition_graph(
        np.array(tree.points), feats, np.array(e.senders), np.array(e.receivers),
        np.array(e.mask), num_parts=4,
    )
    assert part.nodes.shape[0] == 4
    # every valid global edge appears exactly once across partitions
    total = int(part.edge_mask.sum())
    assert total == int(np.array(e.mask).sum())
    # receivers stay sorted within each partition
    for p in range(4):
        r = part.receivers[p][part.edge_mask[p]]
        assert (np.diff(r) >= 0).all()
    # halo positions match the owner's positions
    npp, H = part.n_per_part, part.halo_cap
    pts = np.array(tree.points)
    for p in range(4):
        for j in range(H):
            pool = part.halo_map[p, j]
            q, slot = pool // H, pool % H
            gid = q * npp + part.boundary_idx[q, slot]
            if (part.positions_ext[p, npp + j] != 0).any():
                np.testing.assert_allclose(part.positions_ext[p, npp + j], pts[gid])


@pytest.mark.parametrize("num_parts", [2, 4, 8])
def test_partition_invariance_forward(num_parts):
    if len(jax.devices()) < num_parts:
        pytest.skip("not enough devices")
    tree, e, feats, g, _ = _problem()
    model = _model()
    params = model.init(jax.random.key(0))
    ref = np.array(model(params, g))

    part = partition_graph(
        np.array(tree.points), feats, np.array(e.senders), np.array(e.receivers),
        np.array(e.mask), num_parts=num_parts,
    )
    mesh = Mesh(np.array(jax.devices()[:num_parts]).reshape(num_parts), ("graph",))
    fwd = make_dist_forward(model, mesh)
    out = np.array(fwd(params, shard_partitioned(part, mesh)))
    got = out.reshape(-1, ref.shape[-1])[: ref.shape[0]]
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_gradient_parity_through_halo():
    tree, e, feats, g, tgt = _problem()
    model = _model()
    params = model.init(jax.random.key(1))
    gs = jax.grad(lambda p: mse_loss(model(p, g), jnp.asarray(tgt)))(params)

    part = partition_graph(
        np.array(tree.points), feats, np.array(e.senders), np.array(e.receivers),
        np.array(e.mask), num_parts=8,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("graph",))
    args = shard_partitioned(part, mesh)
    tgt_sh = jnp.asarray(tgt.reshape(8, -1, 3))
    st = make_train_state(jax.tree.map(jnp.copy, params), optax.sgd(1.0))
    st2, m = make_dist_train_step(model, optax.sgd(1.0), mesh)(st, args, tgt_sh)
    gd = jax.tree.map(lambda a, b: a - b, params, st2.params)
    md = max(
        jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), gs, gd))
    )
    assert md < 5e-5, md
    # loss equals single-device loss
    np.testing.assert_allclose(
        float(m["loss"]),
        float(mse_loss(model(params, g), jnp.asarray(tgt))),
        rtol=1e-6,
    )


def test_dp_times_graph_mesh():
    """2 independent clouds data-parallel × 4-way spatial partition."""
    model = _model(num_layers=1)
    params = model.init(jax.random.key(2))
    parts, targets, singles = [], [], []
    for d in range(2):
        tree, e, feats, g, tgt = _problem(seed=d + 10)
        part = partition_graph(
            np.array(tree.points), feats, np.array(e.senders), np.array(e.receivers),
            np.array(e.mask), num_parts=4, halo_cap=256, edges_per_part=6000,
            local_edges_per_part=5000, remote_edges_per_part=3000,
        )
        parts.append(part)
        targets.append(tgt)
        singles.append((g, tgt))

    devs = np.array(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "graph"))
    from scalable_e3_gnn_tpu.parallel.halo import _shard_args

    stacked = tuple(
        jnp.stack([a, b]) for a, b in zip(_shard_args(parts[0]), _shard_args(parts[1]))
    )
    tgt_sh = jnp.stack([jnp.asarray(t.reshape(4, -1, 3)) for t in targets])

    step = make_dist_train_step(model, optax.sgd(1.0), mesh, dp_axis="dp")
    st = make_train_state(jax.tree.map(jnp.copy, params), optax.sgd(1.0))
    st2, m = step(st, stacked, tgt_sh)

    # reference: grad of the mean loss over both clouds
    def ref_loss(p):
        return sum(
            mse_loss(model(p, g), jnp.asarray(t)) for g, t in singles
        ) / 2.0

    gs = jax.grad(ref_loss)(params)
    gd = jax.tree.map(lambda a, b: a - b, params, st2.params)
    md = max(
        jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), gs, gd))
    )
    assert md < 5e-5, md
