"""Downstream prediction-accuracy regression gates (VERDICT r2 missing #5).

Fixed-seed, fixed-step training runs with PINNED ABSOLUTE thresholds — the
allclose unit tests catch implementation bugs, but silent numerics drift
(bf16 policy changes, edge-selection approximations, gate rescalings) can
leave every unit test green while degrading what the model actually learns.
These gates pin the end-to-end quantity the capability spec names
(BASELINE.json:5 "match ... downstream prediction accuracy").

Thresholds carry ~30-50% headroom over values measured on the CPU backend
(2026-08-21: N-body train 0.0069 / eval 0.0079 vs predict-zero 0.0603;
QM9 0.104 vs target var 1.04).  A failure here means learning quality
regressed, not that a kernel is off by 1e-6.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.models.segnn import SEGNN
from scalable_e3_gnn_tpu.train.pipeline import (
    make_train_state,
    make_train_step,
    mse_loss,
)


def test_nbody_accuracy_gate():
    """Config 1 (charged N-body): 400 fixed-seed steps must reach the pinned
    train loss AND held-out displacement MSE (~8x under predict-zero)."""
    from scalable_e3_gnn_tpu.data.nbody import (
        generate_dataset,
        make_fully_connected_edges,
    )
    from scalable_e3_gnn_tpu.graph.batching import batch_same_size
    from scalable_e3_gnn_tpu.utils.config import nbody_config

    cfg = nbody_config()
    ds = generate_dataset(64, num_steps=500, seed=cfg.train.seed)
    n = ds["pos0"].shape[1]
    feats = np.concatenate(
        [(ds["vel0"] ** 2).sum(-1, keepdims=True), ds["charges"][..., None],
         ds["vel0"]], -1)
    s, r = make_fully_connected_edges(n)
    graph = batch_same_size(feats, ds["pos0"], s, r)
    vel = jnp.asarray(ds["vel0"].reshape(-1, 3))
    target = jnp.asarray(ds["disp"].reshape(-1, 3))
    model = SEGNN(
        Irreps(cfg.model.input_irreps), Irreps(cfg.model.hidden_irreps),
        Irreps(cfg.model.output_irreps), num_layers=cfg.model.num_layers,
        vel_attr=cfg.model.vel_attr)
    params = model.init(jax.random.key(cfg.train.seed))
    opt = optax.adam(5e-3)
    step = make_train_step(
        lambda p, g, v, t: mse_loss(model(p, g, v), t), opt, donate=False)
    state = make_train_state(params, opt)
    for _ in range(400):
        state, m = step(state, graph, vel, target)
    final = float(m["loss"])
    assert final < 0.009, f"N-body train loss regressed: {final} (gate 0.009)"

    ds_e = generate_dataset(16, num_steps=500, seed=cfg.train.seed + 1)
    feats_e = np.concatenate(
        [(ds_e["vel0"] ** 2).sum(-1, keepdims=True),
         ds_e["charges"][..., None], ds_e["vel0"]], -1)
    graph_e = batch_same_size(feats_e, ds_e["pos0"], s, r)
    vel_e = jnp.asarray(ds_e["vel0"].reshape(-1, 3))
    target_e = jnp.asarray(ds_e["disp"].reshape(-1, 3))
    pred = jax.jit(lambda p: model(p, graph_e, vel_e))(state.params)
    eval_mse = float(jnp.mean((pred - target_e) ** 2))
    base = float(jnp.mean(target_e ** 2))
    assert eval_mse < 0.011, (
        f"N-body held-out MSE regressed: {eval_mse} (gate 0.011)")
    assert eval_mse < 0.2 * base, (eval_mse, base)


def test_qm9_accuracy_gate():
    """Config 2 (QM9-style graph regression): 250 fixed-seed steps must
    reach the pinned loss (~10x under the target variance).

    Runs on the synthetic stand-in by default (no network in this sandbox);
    point ``QM9_DIR`` at a real dsgdb9nsd download to gate on real data —
    targets are then standardized so the pinned loss ratio still applies.
    """
    import os

    from scalable_e3_gnn_tpu.data.qm9 import (
        NUM_SPECIES,
        batch_molecules,
        generate_molecules,
        load_qm9,
    )

    qm9_dir = os.environ.get("QM9_DIR")
    if qm9_dir:
        mols = load_qm9(qm9_dir, target="U0", limit=48)
        mu = float(np.mean([m["target"] for m in mols]))
        sd = float(np.std([m["target"] for m in mols])) or 1.0
        for m in mols:
            m["target"] = (m["target"] - mu) / sd
    else:
        mols = generate_molecules(48, seed=2)
    g, targets = batch_molecules(mols)
    model = SEGNN(
        Irreps(f"{NUM_SPECIES}x0e"), Irreps("16x0e+8x1o"), Irreps("1x0e"),
        num_layers=2, task="graph")
    params = model.init(jax.random.key(1))
    opt = optax.adam(3e-3)

    def loss_fn(p, graph, t):
        return jnp.mean((model(p, graph)[:, 0] - t) ** 2)

    step = make_train_step(loss_fn, opt)
    state = make_train_state(params, opt)
    for _ in range(250):
        state, m = step(state, g, targets)
    final = float(m["loss"])
    var = float(jnp.var(targets))
    assert final < 0.16, f"QM9 loss regressed: {final} (gate 0.16, var {var})"
