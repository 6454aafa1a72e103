"""Checkpoint/resume exactness (SURVEY.md §5.4): train 2N steps ≡ train N,
save, restore, train N — bitwise on params."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.data.nbody import generate_dataset, make_fully_connected_edges
from scalable_e3_gnn_tpu.graph.batching import batch_same_size
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from scalable_e3_gnn_tpu.train.pipeline import make_train_state, make_train_step, mse_loss


def _setup():
    ds = generate_dataset(8, num_steps=20, seed=0)
    N = ds["pos0"].shape[1]
    feats = np.concatenate(
        [(ds["vel0"] ** 2).sum(-1, keepdims=True), ds["charges"][..., None], ds["vel0"]],
        -1,
    )
    s, r = make_fully_connected_edges(N)
    g = batch_same_size(feats, ds["pos0"], s, r)
    vel = jnp.asarray(ds["vel0"].reshape(-1, 3))
    tgt = jnp.asarray(ds["disp"].reshape(-1, 3))
    model = SEGNN(Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"), num_layers=1)
    opt = optax.adam(1e-3)

    def loss_fn(p, graph, v, t):
        return mse_loss(model(p, graph, v), t)

    step = make_train_step(loss_fn, opt, donate=False)
    return model, opt, step, (g, vel, tgt)


def test_resume_exactness(tmp_path):
    model, opt, step, batch = _setup()
    params = model.init(jax.random.key(0))

    # straight 2N run
    state = make_train_state(params, opt)
    for _ in range(6):
        state, _ = step(state, *batch)
    ref = state.params

    # N, save, restore, N
    state2 = make_train_state(jax.tree.map(jnp.copy, params), opt)
    for _ in range(3):
        state2, _ = step(state2, *batch)
    save_checkpoint(str(tmp_path), 3, state2)
    assert latest_step(str(tmp_path)) == 3

    template = make_train_state(jax.tree.map(jnp.copy, params), opt)
    restored, at = restore_checkpoint(str(tmp_path), template)
    assert at == 3
    assert int(restored.step) == 3
    for _ in range(3):
        restored, _ = step(restored, *batch)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_restore_missing_raises(tmp_path):
    model, opt, _, _ = _setup()
    state = make_train_state(model.init(jax.random.key(0)), opt)
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nope"), state)


def test_latest_of_many(tmp_path):
    model, opt, _, _ = _setup()
    state = make_train_state(model.init(jax.random.key(0)), opt)
    for s in (1, 5, 3):
        save_checkpoint(str(tmp_path), s, state)
    assert latest_step(str(tmp_path)) == 5
    _, at = restore_checkpoint(str(tmp_path), state)
    assert at == 5
