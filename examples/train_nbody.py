"""Train SEGNN on the charged N-body task (evaluation config 1).

CPU-runnable; on the TPU sandbox run with the repo on PYTHONPATH:

    python examples/train_nbody.py --steps 500

Demonstrates the full pipeline: dataset generation, batching, jitted train
step, metrics logging, checkpoint/resume.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--graphs", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--ckpt-dir", type=str, default=None)
    ap.add_argument("--log", type=str, default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from scalable_e3_gnn_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from scalable_e3_gnn_tpu.core.irreps import Irreps
    from scalable_e3_gnn_tpu.data.nbody import generate_dataset, make_fully_connected_edges
    from scalable_e3_gnn_tpu.graph.batching import batch_same_size
    from scalable_e3_gnn_tpu.models.segnn import SEGNN
    from scalable_e3_gnn_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from scalable_e3_gnn_tpu.train.metrics import MetricsLogger
    from scalable_e3_gnn_tpu.train.pipeline import (
        make_train_state,
        make_train_step,
        mse_loss,
    )
    from scalable_e3_gnn_tpu.utils.config import nbody_config

    cfg = nbody_config()
    ds = generate_dataset(args.graphs, num_steps=500, seed=cfg.train.seed)
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
    graph = batch_same_size(feats, ds["pos0"], s, r)
    vel = jnp.asarray(ds["vel0"].reshape(-1, 3))
    target = jnp.asarray(ds["disp"].reshape(-1, 3))

    model = SEGNN(
        Irreps(cfg.model.input_irreps),
        Irreps(cfg.model.hidden_irreps),
        Irreps(cfg.model.output_irreps),
        num_layers=cfg.model.num_layers,
        vel_attr=cfg.model.vel_attr,
    )
    params = model.init(jax.random.key(cfg.train.seed))
    opt = optax.adam(args.lr)

    def loss_fn(p, g, v, t):
        return mse_loss(model(p, g, v), t)

    step = make_train_step(loss_fn, opt, donate=False)
    state = make_train_state(params, opt)
    start = 0
    if args.resume and args.ckpt_dir:
        try:
            state, start = restore_checkpoint(args.ckpt_dir, state)
            print(f"resumed from step {start}")
        except FileNotFoundError:
            pass

    logger = MetricsLogger(args.log, stdout_every=50)
    n_edges = int(graph.edge_mask.sum())
    baseline = float(mse_loss(jnp.zeros_like(target), target))
    print(f"predict-zero baseline mse: {baseline:.6f}")
    for i in range(start, args.steps):
        state, m = step(state, graph, vel, target)
        logger.log(i, {"loss": m["loss"], "grad_norm": m["grad_norm"]}, edges=n_edges)
        if args.ckpt_dir and (i + 1) % 200 == 0:
            save_checkpoint(args.ckpt_dir, i + 1, state)
    jax.block_until_ready(state.params)
    print(f"final loss {float(m['loss']):.6f} (baseline {baseline:.6f})")

    # held-out eval: fresh trajectories, displacement error (the downstream
    # prediction-accuracy metric, not just training loss)
    ds_e = generate_dataset(max(args.graphs // 5, 16), num_steps=500,
                            seed=cfg.train.seed + 1)
    feats_e = np.concatenate(
        [
            (ds_e["vel0"] ** 2).sum(-1, keepdims=True),
            ds_e["charges"][..., None],
            ds_e["vel0"],
        ],
        -1,
    )
    graph_e = batch_same_size(feats_e, ds_e["pos0"], s, r)
    vel_e = jnp.asarray(ds_e["vel0"].reshape(-1, 3))
    target_e = jnp.asarray(ds_e["disp"].reshape(-1, 3))
    pred = jax.jit(lambda p: model(p, graph_e, vel_e))(state.params)
    err = pred - target_e
    eval_mse = float(jnp.mean(err**2))
    disp_rmse = float(jnp.sqrt(jnp.mean(jnp.sum(err**2, -1))))
    base_rmse = float(jnp.sqrt(jnp.mean(jnp.sum(target_e**2, -1))))
    print(
        f"eval (held-out): mse {eval_mse:.6f}, displacement rmse "
        f"{disp_rmse:.6f} (predict-zero {base_rmse:.6f})"
    )


if __name__ == "__main__":
    main()
