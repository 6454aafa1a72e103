"""Sparse neighborhood aggregation: gather / segment-sum scatter, SpMM, SDDMM.

The message-passing hot loop (SURVEY.md §3.4): per edge e=(s_e, r_e), gather
node features, compute a per-edge message, and scatter-sum into destination
nodes.  TPU-native design decisions:

- **Static shapes**: graphs carry padded edge arrays; padding edges point at a
  trash row (``segment_id == num_segments``) so no boolean masking is needed in
  the hot path — XLA's segment-sum handles out-of-range ids by dropping them.
- **Sorted-COO layout**: edges sorted by receiver make the scatter a segment
  reduction over contiguous runs (``indices_are_sorted=True``), which XLA
  lowers far better than random-access scatter-add; the graph builders in
  ``graph/`` emit this layout.
- The reference has no aggregation code in the mount; the capability spec is
  BASELINE.json:5 ("sparse gather/scatter neighborhood aggregation",
  "segment-sum scatter aggregation, SpMM/SDDMM").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gather",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "scatter_sum",
    "spmm",
    "sddmm",
    "take_dense_symmetric",
    "take_dense_symmetric_km",
    "take_dense_rev",
]


def gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-edge gather of node rows: ``x[idx]`` with explicit mode semantics.

    Out-of-range indices (edge padding) clip to the last row; callers relying
    on padding must mask downstream or scatter to the trash segment instead.
    """
    return jnp.take(x, idx, axis=0, mode="clip",
                    indices_are_sorted=False, unique_indices=False)


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sum ``data`` rows into ``num_segments`` buckets; ids >= num_segments drop.

    This is the aggregation primitive (messages -> destination nodes).  Padding
    edges use ``segment_ids == num_segments`` and vanish for free.
    """
    return jax.ops.segment_sum(
        data,
        segment_ids,
        num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
    eps: float = 1e-9,
) -> jnp.ndarray:
    s = segment_sum(data, segment_ids, num_segments, indices_are_sorted)
    cnt = segment_sum(
        jnp.ones(data.shape[:1], dtype=data.dtype),
        segment_ids,
        num_segments,
        indices_are_sorted,
    )
    return s / jnp.maximum(cnt, eps)[:, None] if data.ndim > 1 else s / jnp.maximum(cnt, eps)


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments, indices_are_sorted=indices_are_sorted
    )


def scatter_sum(
    messages: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Alias of segment_sum with message-passing naming."""
    return segment_sum(messages, receivers, num_nodes, indices_are_sorted)


def spmm(
    edge_weights: Optional[jnp.ndarray],
    node_features: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    num_nodes: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Sparse (adjacency) × dense (features): out[r] = Σ_{e: recv=r} w_e · x[s_e].

    ``edge_weights=None`` is the unweighted adjacency product (plain
    neighborhood sum).  COO with padded edges pointing at segment num_nodes.
    """
    msgs = gather(node_features, senders)
    if edge_weights is not None:
        msgs = msgs * edge_weights[:, None]
    return segment_sum(msgs, receivers, num_nodes, indices_are_sorted)


@jax.custom_vjp
def take_dense_symmetric(
    h: jnp.ndarray,  # [N, F]
    senders: jnp.ndarray,  # [N, K]
    reverse_slot: jnp.ndarray,  # [N, K] flat slot of the reverse edge
    mask: jnp.ndarray,  # [N, K] mutual-edge validity
) -> jnp.ndarray:
    """h[senders] whose VJP is a *gather* over reverse edges, not a scatter.

    Valid only for symmetric fixed-K edge sets (see ``symmetrize_dense`` in
    graph.radius): the sender-gradient of node v is the sum of the edge
    cotangents at the reverse slots of v's own K incident edges — a dense
    [N, K] gather + sum, ~3x faster on TPU than the scatter-add XLA emits for
    the transpose of a gather.

    Out-of-range slots (padding: ``senders == n``, ``reverse_slot == n*k``)
    are CLAMPED, not zero-filled: rows of invalid slots contain the clamped
    row's (real, finite) features and every consumer masks them out.  XLA's
    TPU ``mode="fill"`` lowers to clamp-gather + a SEPARATE materialized
    [N, K, F] ``select_n`` fusion (~5.9 M cycles / 384 MB extra traffic per
    layer at the 100k config — the kCustom gather cannot host the select;
    r4 full-step HLO audit), so the fill semantics cost a full edge-sized
    HBM round trip that the downstream mask multiply already provides for
    free inside the fused kernels.
    """
    return jnp.take(h, senders, axis=0, mode="clip")


def _tds_fwd(h, senders, reverse_slot, mask):
    return take_dense_symmetric(h, senders, reverse_slot, mask), (
        senders,
        reverse_slot,
        mask,
    )


def _tds_bwd(res, g):
    senders, reverse_slot, mask = res
    n, k = senders.shape
    f = g.shape[-1]
    gf = g.reshape(n * k, f)
    # non-mutual/padding slots carry reverse_slot == n*k: clamp the gather
    # and zero their contribution INSIDE the reduction — the validity
    # multiply fuses into the sum (one pass over the gathered rows), where
    # fill mode would materialize a separate full [N·K, F] select fusion
    rs = reverse_slot.reshape(-1)
    valid = (rs < n * k).astype(g.dtype)
    picked = jnp.take(gf, rs, axis=0, mode="clip")
    d_h = (picked * valid[:, None]).reshape(n, k, f).sum(axis=1)
    z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_h, z(senders), z(reverse_slot), z(mask)


take_dense_symmetric.defvjp(_tds_fwd, _tds_bwd)


@jax.custom_vjp
def take_dense_symmetric_km(
    h: jnp.ndarray,  # [N, F]
    senders: jnp.ndarray,  # [N, K]
    reverse_slot: jnp.ndarray,  # [N, K] flat NODE-major slot of the reverse edge
    mask: jnp.ndarray,  # [N, K] mutual-edge validity
) -> jnp.ndarray:
    """Slot-major ``take_dense_symmetric``: returns [K, N, F] with
    ``out[k, t] = h[senders[t, k]]`` — the operand layout the generic fused
    kernel wants (its in-kernel row assembly is K leading-dim reads + one
    sublane concat; see kernels/fused_message_generic.py).  Gathering
    directly in this order avoids an [E, F] transpose per layer per
    direction.

    The reverse table stays node-major flat (``t*K + k``); the VJP remaps
    it to the cotangent's slot-major flat space (``k*N + t``) with two int
    ops.  Padding slots are CLAMPED (see ``take_dense_symmetric``: fill
    mode costs a separate materialized [K, N, F] select on TPU) — invalid
    rows carry clamped real features and every consumer masks them.
    """
    return jnp.take(h, senders.T, axis=0, mode="clip")


def _tds_km_fwd(h, senders, reverse_slot, mask):
    return take_dense_symmetric_km(h, senders, reverse_slot, mask), (
        senders,
        reverse_slot,
        mask,
    )


def _tds_km_bwd(res, g):
    senders, reverse_slot, mask = res
    n, k = senders.shape
    f = g.shape[-1]
    gf = g.reshape(k * n, f)
    rs = reverse_slot
    # node-major flat slot t*K+k -> slot-major flat k*N+t; padding clamps
    # and is zeroed inside the reduction (fuses; see _tds_bwd)
    valid = (rs < n * k).reshape(-1).astype(g.dtype)
    rs_km = (rs % k) * n + rs // k
    picked = jnp.take(gf, rs_km.reshape(-1), axis=0, mode="clip")
    d_h = (picked * valid[:, None]).reshape(n, k, f).sum(axis=1)
    z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_h, z(senders), z(reverse_slot), z(mask)


take_dense_symmetric_km.defvjp(_tds_km_fwd, _tds_km_bwd)


@jax.custom_vjp
def take_dense_rev(
    h: jnp.ndarray,  # [M, F]
    senders: jnp.ndarray,  # [R, K] rows into h; pad >= M (reads 0)
    rev: jnp.ndarray,  # [M, Q] flat slots+1 (into R*K) where m is sender; 0=empty
) -> jnp.ndarray:
    """h[senders] whose VJP is a gather over a precomputed transpose table.

    The general form of ``take_dense_symmetric``: ``rev[m]`` lists the flat
    edge-slot positions where node m appears as the sender, **stored as
    slot + 1 with 0 = empty** — the zero-based encoding lets the host
    partitioner build the (mostly-empty) tables into calloc zero pages
    without a multi-GB sentinel fill (data/native_loader.rev_table_multi,
    r5).  The sender gradient is a dense [M, Q] gather + sum instead of
    the scatter-add XLA emits for a gather transpose; it is what makes the
    *partitioned* fused path scatter-free, where a receiver's reverse edge
    may live on another device (parallel/partition.py ``rev_int``/
    ``rev_ext``).  Padding clamps (consumers mask; see
    ``take_dense_symmetric`` for why fill mode costs a materialized
    edge-sized select on TPU).
    """
    return jnp.take(h, senders, axis=0, mode="clip")


def _tdr_fwd(h, senders, rev):
    return take_dense_rev(h, senders, rev), (senders, rev)


def _tdr_bwd(res, g):
    senders, rev = res
    r, k = senders.shape
    f = g.shape[-1]
    gf = g.reshape(r * k, f)
    m, q = rev.shape
    if q <= 16:
        rv = rev.reshape(-1)
        valid = (rv > 0).astype(g.dtype)  # +1 encoding: 0 = empty
        picked = jnp.take(gf, rv - 1, axis=0, mode="clip")
        d_h = (picked * valid[:, None]).reshape(m, q, f).sum(axis=1)
    else:
        # q-blocked accumulation: the one-shot gather materializes
        # [m, q, F] — at q=38/625k rows/F=90 that is ~6 GB PER LAYER per
        # device (the r3 16-chip config-5 AOT OOM); block the reverse
        # table's columns and accumulate instead
        B = 16
        qp = -(-q // B) * B
        revp = jnp.pad(rev, ((0, 0), (0, qp - q)),
                       constant_values=0)  # 0 = empty in the +1 encoding

        def body(i, acc):
            cols = jax.lax.dynamic_slice_in_dim(revp, i * B, B,
                                                axis=1).reshape(-1)
            valid = (cols > 0).astype(g.dtype)
            p = jnp.take(gf, cols - 1, axis=0, mode="clip")
            return acc + (p * valid[:, None]).reshape(m, B, f).sum(axis=1)

        d_h = jax.lax.fori_loop(
            0, qp // B, body, jnp.zeros((m, f), g.dtype))
    z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return d_h, z(senders), z(rev)


take_dense_rev.defvjp(_tdr_fwd, _tdr_bwd)


def sddmm(
    a: jnp.ndarray,
    b: jnp.ndarray,
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge dots e_k = <a[s_k], b[r_k]>."""
    return jnp.sum(gather(a, senders) * gather(b, receivers), axis=-1)
