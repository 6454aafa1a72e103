"""Halo exchange + distributed SEGNN execution over a device mesh.

The TPU-native communication backend (SURVEY.md §5.8): boundary node features
move between chips through XLA collectives over ICI inside ``shard_map`` — no
host-side comm library.  Per message-passing layer:

1. each device packs its exported boundary features (``boundary_idx``);
2. one ``all_gather`` over the 'graph' mesh axis builds the boundary pool
   (all-to-all exchange; Morton partitions keep the pool small);
3. each device gathers its halo slots from the pool (``halo_map``) and runs
   local gather -> tensor product -> segment-sum on the extended feature
   array.

XLA overlaps the all_gather with independent local compute where the schedule
allows; the Pallas async-remote-copy overlap kernel (SURVEY.md §7 hard part 2)
is the planned upgrade for explicit overlap.

Gradients flow through the collective (all_gather transposes to psum_scatter),
so the same code path serves fwd+bwd; the distributed train step psums grads
across the mesh.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.segnn import SEGNN
from ..ops.gather_scatter import segment_mean
from ..core.spherical import spherical_harmonics
from ..train.pipeline import TrainState
from .partition import DensePartitionedGraph, PartitionedGraph

__all__ = [
    "exchange_halo",
    "make_dist_forward",
    "make_dist_train_step",
    "shard_partitioned",
    "make_dist_forward_dense",
    "make_dist_train_step_dense",
    "shard_partitioned_dense",
    "replicate_to_mesh",
]


def replicate_to_mesh(tree, mesh: Mesh):
    """Commit every leaf to NamedSharding(mesh, P()) (replicated).

    The distributed train steps return state with mesh-committed shardings;
    if the FED-BACK state's shardings don't match (e.g. a fresh
    ``make_train_state`` on the default device), jit reshards every leaf on
    every call — measured 6.5 s/step through the tunneled-chip RPC path vs
    0.3 ms when shardings match.  The step wrappers call this on their state
    argument; it is a no-op (identity, no dispatch) once committed.
    """
    rep = NamedSharding(mesh, P())
    multi = jax.process_count() > 1

    def put(x):
        if isinstance(x, jax.Array) and x.sharding == rep:
            return x
        if multi:
            # multi-process: device_put onto shardings with non-addressable
            # devices is invalid (segfaults in XLA:CPU/Gloo, r4); assemble
            # the replicated global array from host data instead
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a committed global array
            xnp = np.asarray(x)
            return jax.make_array_from_callback(
                xnp.shape, rep, lambda idx: xnp[idx])
        return jax.device_put(x, rep)

    return jax.tree.map(put, tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _exchange_halo_xla(h_local, boundary_idx, halo_map, axis_name,
                       num_devices):
    bound = jnp.take(h_local, boundary_idx, axis=0)  # [H, F] exports
    pool = jax.lax.all_gather(bound, axis_name)  # [P, H, F]
    pool = pool.reshape(-1, h_local.shape[-1])  # [P*H, F]
    halo = jnp.take(pool, halo_map, axis=0)  # [H, F]
    return jnp.concatenate([h_local, halo], axis=0)


def _exchange_halo_xla_fwd(h_local, boundary_idx, halo_map, axis_name,
                           num_devices):
    out = _exchange_halo_xla(h_local, boundary_idx, halo_map, axis_name,
                             num_devices)
    return out, (boundary_idx, halo_map, h_local.shape[0])


def _exchange_halo_xla_bwd(axis_name, num_devices, res, d_ext):
    """Hand transpose emitting a TILED psum_scatter (native reduce-scatter).

    JAX's automatic all_gather transpose is ``psum_scatter(..., tiled=False)``
    whose leading-axis form XLA:TPU DECOMPOSES into a sync full-pool
    all-reduce + slice — 2·(P-1)/P·P·H·F wire bytes where the tiled form's
    reduce-scatter moves (P-1)/P·H·F and stays a native collective (r5
    probe, tools/exp_overlap_evidence lineage; the config-5 16-chip AOT dump
    showed ``all-reduce bf16[16,H,90]`` per layer in the gradient pass)."""
    boundary_idx, halo_map, npp = res
    f = d_ext.shape[-1]
    d_local = d_ext[:npp]
    d_halo = d_ext[npp:]
    h = boundary_idx.shape[0]
    d_pool = jnp.zeros((num_devices * h, f), d_ext.dtype)
    d_pool = d_pool.at[halo_map].add(d_halo)
    d_bound = jax.lax.psum_scatter(
        d_pool, axis_name, scatter_dimension=0, tiled=True)  # [H, F]
    d_local = d_local.at[boundary_idx].add(d_bound)
    z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_local, z(boundary_idx), z(halo_map)


_exchange_halo_xla.defvjp(_exchange_halo_xla_fwd, _exchange_halo_xla_bwd)


def exchange_halo(
    h_local: jnp.ndarray,  # [Np, F]
    boundary_idx: jnp.ndarray,  # [H]
    halo_map: jnp.ndarray,  # [H]
    axis_name: str,
    backend: str = "xla",  # "xla" (all_gather) | "rdma" (Pallas ring)
    num_devices: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Return extended features [Np + H, F]: local rows then filled halo slots."""
    if backend == "rdma":
        from ..kernels.halo_rdma import ring_all_gather

        assert num_devices is not None, "rdma backend needs num_devices"
        bound = jnp.take(h_local, boundary_idx, axis=0)  # [H, F] exports
        pool = ring_all_gather(bound, axis_name, num_devices, interpret=interpret)
        pool = pool.reshape(-1, h_local.shape[-1])  # [P*H, F]
        halo = jnp.take(pool, halo_map, axis=0)  # [H, F]
        return jnp.concatenate([h_local, halo], axis=0)
    if num_devices is not None:
        # custom transpose: tiled psum_scatter instead of the all-reduce
        # XLA decomposes the default transpose into (see _exchange_halo_xla_bwd)
        return _exchange_halo_xla(h_local, boundary_idx, halo_map,
                                  axis_name, num_devices)
    bound = jnp.take(h_local, boundary_idx, axis=0)  # [H, F] exports
    pool = jax.lax.all_gather(bound, axis_name)  # [P, H, F]
    pool = pool.reshape(-1, h_local.shape[-1])  # [P*H, F]
    halo = jnp.take(pool, halo_map, axis=0)  # [H, F]
    return jnp.concatenate([h_local, halo], axis=0)


def _edge_geometry(model: SEGNN, pos_ext, npp, senders, receivers, mask):
    s = jnp.minimum(senders, pos_ext.shape[0] - 1)
    r = jnp.minimum(receivers, npp - 1)
    rel = jnp.take(pos_ext, s, axis=0) - jnp.take(pos_ext, r, axis=0)
    rel = jnp.where(mask[:, None], rel, 0.0)
    dist2 = jnp.sum(rel * rel, axis=-1)
    attr = spherical_harmonics(model.lmax_attr, rel)
    return jnp.where(mask[:, None], attr, 0.0), dist2


def _dense_geometry(model: SEGNN, pos_src, pos_r, senders, mask):
    """[Nb, K] dense-slot edge geometry: sh attrs + squared distances."""
    xs = jnp.take(pos_src, jnp.minimum(senders, pos_src.shape[0] - 1), axis=0)
    rel = jnp.where(mask[..., None], xs - pos_r[:, None, :], 0.0)
    dist2 = jnp.sum(rel * rel, axis=-1)
    attr = spherical_harmonics(model.lmax_attr, rel)
    return jnp.where(mask[..., None], attr, 0.0), dist2


def _local_attrs_dense(model: SEGNN, shard):
    """Per-partition edge/node attributes (geometry-only, graph constants)."""
    (nodes, pos_ext, node_mask, boundary_idx, halo_map,
     s_int, m_int, s_bnd, m_bnd, rev_int, rev_ext) = shard
    npp = nodes.shape[0]
    ni = s_int.shape[0]
    pos_local = pos_ext[:npp]
    attr_i, d2_i = _dense_geometry(model, pos_local, pos_local[:ni], s_int, m_int)
    attr_b, d2_b = _dense_geometry(model, pos_ext, pos_local[ni:], s_bnd, m_bnd)
    # node attr = mean of incident edge attrs; the two receiver blocks
    # partition the rows, so each node's mean comes from exactly one block
    # (parity with SEGNN.compute_attributes_dense)
    cnt_i = jnp.maximum(m_int.sum(axis=1), 1)
    cnt_b = jnp.maximum(m_bnd.sum(axis=1), 1)
    node_attr = jnp.concatenate(
        [
            attr_i.sum(axis=1) / cnt_i[:, None].astype(attr_i.dtype),
            attr_b.sum(axis=1) / cnt_b[:, None].astype(attr_b.dtype),
        ],
        axis=0,
    )
    node_attr = node_attr.at[..., 0].set(1.0)
    return attr_i, d2_i, attr_b, d2_b, node_attr


def _local_forward_dense(
    model: SEGNN, params, shard, axis_name: str, attrs=None,
    backend: str = "xla", num_devices=None, interpret: bool = False,
    _serialize_exchange: bool = False,
):
    """Per-device dense-K SEGNN forward on one partition (inside shard_map).

    The distributed fast path: each layer dispatches both receiver blocks to
    the same fused Pallas message kernels as the single-chip bench
    (SEGNNLayer.apply_dense_split).  The interior block has no dependency on
    the boundary collective, so the exchange overlaps with it.  ``attrs``:
    optional precomputed ``_local_attrs_dense`` output — geometry-only, so
    computing it once per graph keeps the sh embedding out of the hot loop
    (matches the single-chip bench protocol).
    """
    (nodes, pos_ext, node_mask, boundary_idx, halo_map,
     s_int, m_int, s_bnd, m_bnd, rev_int, rev_ext) = shard
    if attrs is None:
        attrs = _local_attrs_dense(model, shard)
    attr_i, d2_i, attr_b, d2_b, node_attr = attrs

    h = model.embed(params["embed"], nodes, node_attr)
    h = jnp.where(node_mask[:, None], h, 0.0)
    for i, layer in enumerate(model.layers):
        h_ext = exchange_halo(
            h, boundary_idx, halo_map, axis_name,
            backend=backend, num_devices=num_devices, interpret=interpret,
        )
        if _serialize_exchange:
            # A/B instrumentation (tools/exp_overlap_evidence.py): tie the
            # interior input to the exchanged halo so XLA cannot overlap
            h_ext, h = jax.lax.optimization_barrier((h_ext, h))
        h = layer.apply_dense_split(
            params[f"layer_{i}"], h, h_ext,
            (s_int, attr_i, d2_i, m_int, rev_int),
            (s_bnd, attr_b, d2_b, m_bnd, rev_ext),
            node_attr, node_mask,
        )
    h = model.pre_head(params["pre_head"], h, node_attr)
    out = model.head(params["head"], h)
    return jnp.where(node_mask[:, None], out, 0.0)


def _shard_args_dense(part: DensePartitionedGraph):
    return (
        jnp.asarray(part.nodes),
        jnp.asarray(part.positions_ext),
        jnp.asarray(part.node_mask),
        jnp.asarray(part.boundary_idx),
        jnp.asarray(part.halo_map),
        jnp.asarray(part.senders_int),
        jnp.asarray(part.mask_int),
        jnp.asarray(part.senders_bnd),
        jnp.asarray(part.mask_bnd),
        jnp.asarray(part.rev_int),
        jnp.asarray(part.rev_ext),
    )


_NUM_SHARD_ARGS_DENSE = 11


def shard_partitioned_dense(
    part: DensePartitionedGraph, mesh: Mesh, axis: str = "graph"
):
    """Device-put the stacked dense-partition arrays over the mesh axis
    (multi-process-safe via multihost.global_put)."""
    from .multihost import global_put

    args = _shard_args_dense(part)
    put = lambda x: global_put(
        x, mesh, P(axis, *([None] * (x.ndim - 1)))
    )
    return tuple(put(x) for x in args)


def make_dist_geometry_dense(
    model: SEGNN, mesh: Mesh, axis: str = "graph"
) -> Callable:
    """jitted sharded attribute precompute: (shards) -> attrs pytree.

    Attributes are geometry-only; compute them once per graph and pass the
    result as ``attrs`` to the dense forward/train step to keep the sh
    embedding out of the training hot loop.
    """
    spec_data = P(axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=((spec_data,) * _NUM_SHARD_ARGS_DENSE,),
        out_specs=spec_data,
        check_vma=False,
    )
    def geo(shard):
        shard = tuple(x[0] for x in shard)
        return tuple(a[None] for a in _local_attrs_dense(model, shard))

    return jax.jit(geo)


def make_dist_forward_dense(
    model: SEGNN, mesh: Mesh, axis: str = "graph", backend: str = "xla",
    interpret: bool = False,
) -> Callable:
    """jitted distributed dense-K forward: (params, shards, attrs=None) ->
    [P, Np, F_out]."""
    spec_data = P(axis)
    nd = mesh.shape[axis]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), (spec_data,) * _NUM_SHARD_ARGS_DENSE, spec_data),
        out_specs=spec_data,
        check_vma=False,
    )
    def fwd(params, shard, attrs):
        shard = tuple(x[0] for x in shard)
        attrs = jax.tree.map(lambda x: x[0], attrs)
        out = _local_forward_dense(
            model, params, shard, axis, attrs=attrs or None,
            backend=backend, num_devices=nd, interpret=interpret,
        )
        return out[None]

    jfwd = jax.jit(fwd)
    return lambda params, shard, attrs=None: jfwd(params, shard, attrs or ())


def make_dist_train_step_dense(
    model: SEGNN,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "graph",
    dp_axis: Optional[str] = None,
    backend: str = "xla",
    interpret: bool = False,
    compute_dtype=None,
) -> Callable:
    """Distributed dense-K train step (fused-kernel path, psum'd grads).

    ``targets``: [P, Np, F_out] in partition-local row order
    (``target[part.global_ids]`` with pad rows anything — they are masked).
    ``compute_dtype``: cast params to this dtype inside the loss (bf16
    storage/compute with fp32 master params — the bench protocol); grads and
    the optimizer update stay in the master dtype.
    """
    lead = (dp_axis, axis) if dp_axis else (axis,)
    spec_data = P(*lead)
    nd = mesh.shape[axis]

    def local_loss(params, shard, target, attrs, denom):
        if compute_dtype is not None:
            params = jax.tree.map(lambda x: x.astype(compute_dtype), params)
        out = _local_forward_dense(
            model, params, shard, axis, attrs=attrs,
            backend=backend, num_devices=nd, interpret=interpret,
        )
        node_mask = shard[2]
        err = jnp.where(node_mask[:, None], (out - target) ** 2, 0.0)
        return err.sum() / denom

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), (spec_data,) * _NUM_SHARD_ARGS_DENSE, spec_data, spec_data),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(state, shard, target, attrs):
        strip = (lambda x: x[0][0]) if dp_axis else (lambda x: x[0])
        shard = tuple(strip(x) for x in shard)
        target = strip(target)
        attrs = jax.tree.map(strip, attrs)
        node_mask = shard[2]
        denom = jax.lax.psum(node_mask.sum(), lead) * target.shape[-1]
        loss, grads = jax.value_and_grad(local_loss)(
            state.params, shard, target, attrs or None,
            jnp.maximum(denom, 1).astype(target.dtype),
        )
        loss = jax.lax.psum(loss, lead)
        grads = jax.lax.psum(grads, lead)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    jstep = jax.jit(step, donate_argnums=(0,))

    def wrapper(state, shard, target, attrs=None):
        return jstep(replicate_to_mesh(state, mesh), shard, target, attrs or ())

    # the lowerable jitted step, as API: AOT tooling (tools/exp_config5_tpu_aot,
    # tests/test_kernels_aot_tpu) calls .jit_step.lower(...) for real-topology
    # compiles — do not make it rummage the wrapper's closure
    wrapper.jit_step = jstep
    return wrapper


def _local_forward(
    model: SEGNN, params, shard, axis_name: str, velocities=None,
    backend: str = "xla", num_devices=None, interpret: bool = False,
):
    """Per-device SEGNN forward on one partition (runs inside shard_map).

    Exchange/compute overlap (SURVEY.md §3.4): per layer, the local-edge
    aggregation has no data dependency on the boundary collective, so XLA's
    async collective scheduler runs the all_gather concurrently with it; the
    remote-edge aggregation consumes the halo afterwards.  ``backend="rdma"``
    swaps the all_gather for the Pallas async-remote-copy ring kernel
    (kernels/halo_rdma.py) for explicit overlap control.
    """
    (nodes, pos_ext, node_mask, boundary_idx, halo_map,
     s_loc, r_loc, m_loc, s_rem, r_rem, m_rem) = shard
    npp = nodes.shape[0]

    attr_loc, d2_loc = _edge_geometry(model, pos_ext, npp, s_loc, r_loc, m_loc)
    attr_rem, d2_rem = _edge_geometry(model, pos_ext, npp, s_rem, r_rem, m_rem)

    # node attr: mean of incident edge attrs over BOTH splits
    rcnt_loc = jnp.where(m_loc, r_loc, npp)
    rcnt_rem = jnp.where(m_rem, r_rem, npp)
    ssum = jax.ops.segment_sum(attr_loc, rcnt_loc, npp) + jax.ops.segment_sum(
        attr_rem, rcnt_rem, npp
    )
    cnt = jax.ops.segment_sum(
        m_loc.astype(attr_loc.dtype), rcnt_loc, npp
    ) + jax.ops.segment_sum(m_rem.astype(attr_loc.dtype), rcnt_rem, npp)
    node_attr = ssum / jnp.maximum(cnt, 1e-9)[:, None]
    if model.vel_attr and velocities is not None:
        node_attr = node_attr + spherical_harmonics(model.lmax_attr, velocities)
    node_attr = node_attr.at[..., 0].set(1.0)

    h = model.embed(params["embed"], nodes, node_attr)
    h = jnp.where(node_mask[:, None], h, 0.0)
    for i, layer in enumerate(model.layers):
        h_ext = exchange_halo(
            h, boundary_idx, halo_map, axis_name,
            backend=backend, num_devices=num_devices, interpret=interpret,
        )
        h = layer.apply_split(
            params[f"layer_{i}"], h, h_ext,
            (s_loc, r_loc, m_loc, attr_loc, d2_loc),
            (s_rem, r_rem, m_rem, attr_rem, d2_rem),
            node_attr, node_mask,
        )
    h = model.pre_head(params["pre_head"], h, node_attr)
    out = model.head(params["head"], h)
    return jnp.where(node_mask[:, None], out, 0.0)


def _shard_args(part: PartitionedGraph):
    return (
        jnp.asarray(part.nodes),
        jnp.asarray(part.positions_ext),
        jnp.asarray(part.node_mask),
        jnp.asarray(part.boundary_idx),
        jnp.asarray(part.halo_map),
        jnp.asarray(part.senders_loc),
        jnp.asarray(part.receivers_loc),
        jnp.asarray(part.mask_loc),
        jnp.asarray(part.senders_rem),
        jnp.asarray(part.receivers_rem),
        jnp.asarray(part.mask_rem),
    )


_NUM_SHARD_ARGS = 11


def shard_partitioned(part: PartitionedGraph, mesh: Mesh, axis: str = "graph"):
    """Device-put the stacked partition arrays, sharded over the mesh axis
    (multi-process-safe via multihost.global_put)."""
    from .multihost import global_put

    args = _shard_args(part)
    put = lambda x: global_put(
        x, mesh, P(axis, *([None] * (x.ndim - 1)))
    )
    return tuple(put(x) for x in args)


def make_dist_forward(
    model: SEGNN, mesh: Mesh, axis: str = "graph", backend: str = "xla",
    interpret: bool = False,
) -> Callable:
    """jitted distributed forward: (params, *shard_args) -> [P, Np, F_out]."""
    spec_data = P(axis)  # leading partition axis sharded; inside: squeezed block
    nd = mesh.shape[axis]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), (spec_data,) * _NUM_SHARD_ARGS),
        out_specs=spec_data,
        check_vma=False,
    )
    def fwd(params, shard):
        shard = tuple(x[0] for x in shard)  # strip the partition axis block dim
        out = _local_forward(
            model, params, shard, axis,
            backend=backend, num_devices=nd, interpret=interpret,
        )
        return out[None]

    return jax.jit(fwd)


def make_dist_train_step(
    model: SEGNN,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "graph",
    dp_axis: Optional[str] = None,
    backend: str = "xla",
    interpret: bool = False,
) -> Callable:
    """jitted distributed train step with replicated params + psum'd grads.

    targets: [P, Np, F_out] sharded like the nodes; loss is a masked MSE over
    real nodes, averaged globally (psum over the mesh).  With ``dp_axis`` the
    data arrays carry an extra leading axis of independent clouds [D, P, ...]:
    spatial partitioning over ``axis`` composes with data parallelism over
    ``dp_axis`` (grads psum over both).
    """
    lead = (dp_axis, axis) if dp_axis else (axis,)
    spec_data = P(*lead)
    nd = mesh.shape[axis]

    def local_loss(params, shard, target, denom):
        # purely local computation: no collectives inside the differentiated
        # function except the halo all_gather (whose transpose correctly
        # scatter-accumulates halo cotangents back to owner devices); the
        # global normalizer enters as a constant
        out = _local_forward(
            model, params, shard, axis,
            backend=backend, num_devices=nd, interpret=interpret,
        )
        node_mask = shard[2]
        err = jnp.where(node_mask[:, None], (out - target) ** 2, 0.0)
        return err.sum() / denom

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), (spec_data,) * _NUM_SHARD_ARGS, spec_data),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(state, shard, target):
        strip = (lambda x: x[0][0]) if dp_axis else (lambda x: x[0])
        shard = tuple(strip(x) for x in shard)
        target = strip(target)
        node_mask = shard[2]
        denom = jax.lax.psum(node_mask.sum(), lead) * target.shape[-1]
        loss, grads = jax.value_and_grad(local_loss)(
            state.params, shard, target, jnp.maximum(denom, 1).astype(target.dtype)
        )
        # per-device loss/grads are the partial sums -> global = psum
        loss = jax.lax.psum(loss, lead)
        grads = jax.lax.psum(grads, lead)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    jstep = jax.jit(step, donate_argnums=(0,))

    def wrapper(state, shard, target):
        return jstep(replicate_to_mesh(state, mesh), shard, target)

    wrapper.jit_step = jstep  # lowerable step for AOT tooling (see dense twin)
    return wrapper
