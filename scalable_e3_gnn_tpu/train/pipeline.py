"""Training pipeline: jitted train/eval steps, optimizer, loss.

The train-step pipeline named in the capability spec (BASELINE.json:5
"training step pipeline").  Pure-functional: state is a pytree, the step is
one jit (donated state) — ready to be wrapped in pjit/shard_map for the
distributed configs (SURVEY.md §3.4 target stack).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "make_train_state", "make_train_step", "mse_loss"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
    err = (pred - target) ** 2
    if mask is not None:
        err = jnp.where(mask[:, None] if err.ndim > mask.ndim else mask, err, 0.0)
        denom = jnp.maximum(mask.sum(), 1) * err.shape[-1]
        return err.sum() / denom
    return err.mean()


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    optimizer: optax.GradientTransformation,
    donate: bool = True,
) -> Callable:
    """loss_fn(params, *batch) -> scalar.  Returns jitted (state, *batch) -> (state, metrics)."""

    def step(state: TrainState, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())
