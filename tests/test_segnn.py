"""Property/integration tests: SEGNN model (SURVEY.md §4.3).

- E(3) equivariance: rotating+translating inputs rotates 1o outputs;
- permutation equivariance of nodes;
- padding invariance: adding pad nodes/edges never changes real-node outputs;
- N-body end-to-end: short training run beats the predict-zero baseline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.core.rotations import irrep_rotation, random_rotation
from scalable_e3_gnn_tpu.data.nbody import generate_dataset, make_fully_connected_edges
from scalable_e3_gnn_tpu.graph.batching import batch_same_size, pad_graph
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss


def _make_batch(G=4, steps=30, seed=0):
    ds = generate_dataset(G, num_steps=steps, seed=seed)
    N = ds["pos0"].shape[1]
    feats = np.concatenate(
        [
            (ds["vel0"] ** 2).sum(-1, keepdims=True),
            ds["charges"][..., None],
            ds["vel0"],
        ],
        -1,
    )
    s, r = make_fully_connected_edges(N)
    g = batch_same_size(feats, ds["pos0"], s, r)
    vel = jnp.asarray(ds["vel0"].reshape(-1, 3))
    tgt = jnp.asarray(ds["disp"].reshape(-1, 3))
    return g, vel, tgt


def _model(num_layers=2, hidden="8x0e+8x1o"):
    return SEGNN(
        Irreps("2x0e+1x1o"), Irreps(hidden), Irreps("1x1o"), num_layers=num_layers
    )


def test_forward_shapes():
    g, vel, _ = _make_batch()
    model = _model()
    params = model.init(jax.random.key(0))
    out = model(params, g, vel)
    assert out.shape == (g.num_nodes, 3)
    assert np.isfinite(np.array(out)).all()


@pytest.mark.parametrize("improper", [False, True])
def test_e3_equivariance(improper):
    """Rotate/reflect positions+velocities+features -> outputs co-rotate."""
    g, vel, _ = _make_batch()
    model = _model()
    params = model.init(jax.random.key(1))
    rng = np.random.default_rng(5)
    R = random_rotation(rng)
    if improper:
        R = -R
    D1 = jnp.asarray(irrep_rotation(1, -1, R), jnp.float32)  # 1o vectors
    Rm = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(rng.standard_normal(3), jnp.float32)

    out = model(params, g, vel)

    # transform: positions (translate+rotate), velocities (rotate only),
    # node features: scalar block unchanged, 1o block rotated
    feats = g.nodes
    feats_rot = jnp.concatenate([feats[:, :2], feats[:, 2:] @ D1.T], axis=-1)
    g_rot = g._replace(positions=g.positions @ Rm.T + t, nodes=feats_rot)
    out_rot = model(params, g_rot, vel @ D1.T)

    np.testing.assert_allclose(np.array(out_rot), np.array(out @ D1.T), atol=2e-4)


def test_translation_invariance():
    g, vel, _ = _make_batch()
    model = _model()
    params = model.init(jax.random.key(2))
    out = model(params, g, vel)
    g_shift = g._replace(positions=g.positions + jnp.asarray([10.0, -3.0, 7.0]))
    out_shift = model(params, g_shift, vel)
    np.testing.assert_allclose(np.array(out_shift), np.array(out), atol=1e-4)


def test_permutation_equivariance():
    g, vel, _ = _make_batch(G=1)
    model = _model()
    params = model.init(jax.random.key(3))
    out = np.array(model(params, g, vel))

    N = g.num_nodes
    rng = np.random.default_rng(7)
    perm = rng.permutation(N)
    inv = np.argsort(perm)
    # relabel node i -> inv[i]? permute arrays so new node j = old perm[j]
    s = inv[np.array(g.senders)]
    r = inv[np.array(g.receivers)]
    order = np.argsort(r, kind="stable")
    g2 = g._replace(
        nodes=g.nodes[perm],
        positions=g.positions[perm],
        senders=jnp.asarray(s[order]),
        receivers=jnp.asarray(r[order]),
        node_graph=g.node_graph[perm],
    )
    out2 = np.array(model(params, g2, vel[perm]))
    np.testing.assert_allclose(out2, out[perm], atol=1e-4)


def test_padding_invariance():
    """Adding pad nodes and trash edges must not change real-node outputs."""
    g, vel, _ = _make_batch(G=2)
    model = _model()
    params = model.init(jax.random.key(4))
    out = np.array(model(params, g, vel))

    gp = pad_graph(g, g.num_nodes + 6, g.num_edges + 11)
    velp = jnp.concatenate([vel, jnp.zeros((6, 3))])
    outp = np.array(model(params, gp, velp))
    np.testing.assert_allclose(outp[: g.num_nodes], out, atol=1e-5)


def test_graph_task_pooling():
    g, vel, _ = _make_batch(G=3)
    model = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x0e"),
        num_layers=1, task="graph",
    )
    params = model.init(jax.random.key(5))
    out = model(params, g, vel)
    assert out.shape == (3, 1)


def test_nbody_training_beats_baseline():
    """Config-1 integration gate: loss beats predict-zero baseline (SURVEY §4.3)."""
    g, vel, tgt = _make_batch(G=32, steps=100, seed=1)
    model = _model(num_layers=2)
    params = model.init(jax.random.key(6))
    opt = optax.adam(5e-3)

    def loss_fn(p, graph, v, t):
        return mse_loss(model(p, graph, v), t)

    step = make_train_step(loss_fn, opt)
    state = make_train_state(params, opt)
    for _ in range(60):
        state, m = step(state, g, vel, tgt)
    baseline = float(mse_loss(jnp.zeros_like(tgt), tgt))
    final = float(m["loss"])
    assert final < 0.5 * baseline, (final, baseline)


def test_edge_chunks_matches_unchunked():
    """edge_chunks streaming (config-5 memory mode: chunked messages AND
    chunked update/pre-head, models/segnn.py apply_dense) must reproduce
    the unchunked forward and gradients exactly — it is pure control flow."""
    from scalable_e3_gnn_tpu.graph.container import DenseEdgeGraph
    from scalable_e3_gnn_tpu.graph.radius import radius_graph_brute

    rng = np.random.default_rng(5)
    n = 128
    pts = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    e = radius_graph_brute(pts, 0.9, max_neighbors=8)
    feats = jnp.asarray(rng.standard_normal((n, 5)), jnp.float32)
    g = DenseEdgeGraph.from_radius_edges(feats, pts, e)
    tgt = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)

    def model(chunks):
        return SEGNN(Irreps("2x0e+1x1o"), Irreps("8x0e+4x1o+2x2e"),
                     Irreps("1x1o"), lmax_attr=2, num_layers=2, layout="cm",
                     remat=True, edge_chunks=chunks)

    m1, m4 = model(1), model(4)
    params = m1.init(jax.random.key(0))
    o1 = np.array(m1(params, g))
    o4 = np.array(m4(params, g))
    np.testing.assert_allclose(o4, o1, atol=1e-5)

    loss = lambda m: (lambda p: mse_loss(m(p, g), tgt))
    g1 = jax.grad(loss(m1))(params)
    g4 = jax.grad(loss(m4))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.array(b), np.array(a), atol=2e-5)
