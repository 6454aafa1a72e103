"""SEGNN: steerable E(3)-equivariant message-passing network.

The model family the reference's ``L1TensorProduct`` was built for (SURVEY.md
§3.3 [external context]: Brandstetter et al., ICLR 2022 — messages are
CG tensor products of concatenated node features with the spherical-harmonic
embedding of the edge direction, aggregated by scatter-sum; updates are tensor
products with node attributes; gate nonlinearities in between).

The mounted reference contains only the TP module; the surrounding SEGNN stack
here is built to the capability spec (BASELINE.json:5), TPU-first: one flat
padded node/edge address space, static shapes, sorted-receiver segment sums,
and the blockwise-GEMM tensor product on the MXU.

All modules are static objects with ``init(key) -> params`` (nested dict) and
``__call__(params, ...)``; the whole forward is jit/pjit-compatible.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..core.irreps import Irreps
from ..core.spherical import spherical_harmonics
from ..graph.container import DenseEdgeGraph, SteerableGraph
from ..ops.gate import Gate
from ..ops.gather_scatter import (gather, segment_mean, segment_sum,
                                  take_dense_rev, take_dense_symmetric,
                                  take_dense_symmetric_km)
from ..ops.linear import O3Linear
from ..ops.tensor_product import L1TensorProduct, TensorProduct

__all__ = ["O3TensorProductGate", "SEGNNLayer", "SEGNN"]


def _make_tp(
    irreps_in: Irreps,
    irreps_attr: Irreps,
    irreps_out: Irreps,
    layout_in: str = "mul",
    layout_out: str = "mul",
):
    """Pick the lmax=1 fast path when applicable, else the generic CG product."""
    if (
        irreps_in.lmax <= 1
        and irreps_out.lmax <= 1
        and repr(irreps_attr.regroup()) == "1x0e+1x1o"
    ):
        return L1TensorProduct(
            irreps_in, irreps_out, layout_in1=layout_in, layout_out=layout_out
        )
    return TensorProduct(
        irreps_in, irreps_attr, irreps_out,
        layout_in1=layout_in, layout_out=layout_out,
    )


class O3TensorProductGate:
    """Steerable 'dense layer': CG tensor product with attr, then gate.

    The TP emits ``scalars ‖ gates ‖ gated`` (gates are extra 0e channels, one
    per non-scalar copy of the target irreps); the gate squashes them.  Output
    irreps == ``irreps_out``.
    """

    def __init__(
        self,
        irreps_in: Irreps,
        irreps_attr: Irreps,
        irreps_out: Irreps,
        act: Callable = jax.nn.silu,
        gated: bool = True,
        layout_in: str = "mul",
        layout_out: str = "mul",
    ) -> None:
        self.irreps_in = Irreps(irreps_in)
        self.irreps_out = Irreps(irreps_out)
        self.gated = gated
        if gated:
            scalars = Irreps([mi for mi in self.irreps_out if mi.ir.l == 0])
            non_scalars = Irreps([mi for mi in self.irreps_out if mi.ir.l > 0])
            self.gate = Gate(scalars, non_scalars, act_scalars=act, layout=layout_out)
            tp_out = self.gate.irreps_in
        else:
            self.gate = None
            tp_out = self.irreps_out
        self.tp = _make_tp(
            self.irreps_in, Irreps(irreps_attr), tp_out,
            layout_in=layout_in, layout_out=layout_out,
        )

    def init(self, key, dtype=jnp.float32):
        return self.tp.init(key, dtype=dtype)

    def __call__(self, params, x: jnp.ndarray, attr: jnp.ndarray) -> jnp.ndarray:
        y = self.tp(params, x, attr)
        return self.gate(y) if self.gate is not None else y


class SEGNNLayer:
    """One message-passing layer.

    message m_e   = TPGate( [h_{s_e} ‖ h_{r_e} ‖ ‖x_rel‖²] , edge_attr_e )  (×2)
    aggregate     = segment_sum over receivers (sorted COO)
    update        = TPGate( [h_i ‖ agg_i] , node_attr_i )  (+ residual)
    """

    def __init__(
        self,
        hidden_irreps: Irreps,
        attr_irreps: Irreps,
        act: Callable = jax.nn.silu,
        num_message_layers: int = 2,
        num_update_layers: int = 2,
        remat: bool = False,
        layout: str = "mul",
        use_pallas: bool = False,
        edge_chunks: int = 1,
        remat_kernel: bool = False,
        pack: int = 1,
        residual_bwd: bool = True,
        replay_bwd: bool = True,
    ) -> None:
        self.edge_chunks = max(1, edge_chunks)
        # residual_bwd: the generic fused kernel saves pre-gate layer
        # intermediates in its forward and runs a hand-structured backward
        # instead of an in-kernel forward replay (fused_message_generic.py)
        self.residual_bwd = residual_bwd
        # replay_bwd: when residuals are off (remat_kernel), use the hand-
        # structured in-kernel replay backward instead of the jax.vjp
        # fallback (r5; False restores the fallback for A/B)
        self.replay_bwd = replay_bwd
        # pack: edge slots per register row in the lmax=1 fused kernel (v3
        # lane packing, kernels/fused_message.py) — silently ignored when K
        # is not a multiple of it, so callers can set a preference once
        self.pack = max(1, pack)
        # remat: rematerialize per-edge message intermediates in the backward
        # pass (jax.checkpoint) — at point-cloud scale the saved [E, F]
        # activations dominate HBM, and recomputing them is cheaper than
        # spilling (SURVEY.md §6: gather/scatter-bound, not MXU-bound)
        self.remat = remat
        # remat_kernel: ALSO checkpoint the fused-kernel dispatch.  The
        # kernels recompute in-kernel, so this adds one redundant forward per
        # layer — but it drops the per-layer [E, F+A+2] packed-stream
        # residual, which is what lets 1M-point lmax=2 training fit in HBM.
        self.remat_kernel = remat_kernel
        self.layout = layout
        h = Irreps(hidden_irreps)
        # fused Pallas message kernel eligibility (kernels/fused_message.py):
        # cm layout, 2 gated message layers, hidden = Hs x0e + Hv x1o
        hr = h.regroup()
        self.use_pallas = (
            use_pallas
            and layout == "cm"
            and num_message_layers == 2
            and act is jax.nn.silu  # the kernel hardcodes silu/sigmoid
            and len(hr) == 2
            and repr(hr[0].ir) == "0e"
            and repr(hr[1].ir) == "1o"
        )
        self._pallas_hs = hr[0].mul if self.use_pallas else 0
        self._pallas_hv = hr[1].mul if self.use_pallas else 0
        # generic fused kernel (kernels/fused_message_generic.py): any hidden
        # irreps / attr order, cm layout, generic TensorProduct message layers
        # (the L1 fast-path TP uses 3-D reshapes that do not lower in Mosaic)
        self.use_pallas_generic = (
            use_pallas and not self.use_pallas and layout == "cm"
        )
        self._generic_kernels = {}  # (k, n) -> FusedMessageGeneric
        a = Irreps(attr_irreps)
        self.hidden_irreps = h
        edge_in = h + h + Irreps("1x0e")  # h_s ‖ h_r ‖ dist²
        self.message_layers: List[O3TensorProductGate] = []
        cur = edge_in
        for _ in range(num_message_layers):
            self.message_layers.append(
                O3TensorProductGate(cur, a, h, act=act, layout_in=layout, layout_out=layout)
            )
            cur = h
        self.use_pallas_generic = self.use_pallas_generic and all(
            isinstance(l.tp, TensorProduct) and l.gate is not None
            for l in self.message_layers
        )
        node_in = h + h
        self.update_layers: List[O3TensorProductGate] = []
        cur = node_in
        for i in range(num_update_layers):
            gated = i < num_update_layers - 1
            self.update_layers.append(
                O3TensorProductGate(
                    cur, a, h, act=act, gated=gated, layout_in=layout, layout_out=layout
                )
            )
            cur = h

    def init(self, key, dtype=jnp.float32):
        n = len(self.message_layers) + len(self.update_layers)
        keys = jax.random.split(key, n)
        params = {}
        for i, (layer, k) in enumerate(zip(self.message_layers, keys)):
            params[f"msg_{i}"] = layer.init(k, dtype=dtype)
        for i, (layer, k) in enumerate(
            zip(self.update_layers, keys[len(self.message_layers) :])
        ):
            params[f"upd_{i}"] = layer.init(k, dtype=dtype)
        return params

    def apply(
        self,
        params,
        h_local: jnp.ndarray,  # [N_local, F]
        h_ext: jnp.ndarray,  # [N_ext >= N_local, F]: local ‖ halo features
        senders: jnp.ndarray,  # [E] indices into h_ext
        receivers: jnp.ndarray,  # [E] indices into h_local (sorted; pad=N_local)
        edge_attr: jnp.ndarray,
        node_attr: jnp.ndarray,
        edge_dist2: jnp.ndarray,
        edge_mask: jnp.ndarray,
        node_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """Core message->aggregate->update; sender space may include halo rows.

        Single-device: pass ``h_ext = h_local``.  Distributed (SURVEY.md §3.4):
        ``h_ext`` is local features concatenated with exchanged boundary
        features, senders pre-remapped into that space by the partitioner.
        """
        n = h_local.shape[0]

        def messages_and_aggregate(msg_params, h_local_, h_ext_):
            s = jnp.minimum(senders, h_ext_.shape[0] - 1)
            r = jnp.minimum(receivers, n - 1)
            m = jnp.concatenate(
                [gather(h_ext_, s), gather(h_local_, r), edge_dist2[:, None]],
                axis=-1,
            )
            for i, layer in enumerate(self.message_layers):
                m = layer(msg_params[f"msg_{i}"], m, edge_attr)
            m = jnp.where(edge_mask[:, None], m, 0.0)
            return segment_sum(m, receivers, n, indices_are_sorted=True)

        if self.remat:
            messages_and_aggregate = jax.checkpoint(messages_and_aggregate)
        agg = messages_and_aggregate(params, h_local, h_ext)
        u = jnp.concatenate([h_local, agg], axis=-1)
        for i, layer in enumerate(self.update_layers):
            u = layer(params[f"upd_{i}"], u, node_attr)
        h = h_local + u  # residual
        return jnp.where(node_mask[:, None], h, 0.0)

    def apply_split(
        self,
        params,
        h_local: jnp.ndarray,
        h_ext: jnp.ndarray,
        loc_edges,  # (senders_loc, receivers_loc, mask, edge_attr, dist2)
        rem_edges,  # (senders_rem(ext-space), receivers, mask, edge_attr, dist2)
        node_attr: jnp.ndarray,
        node_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        """COO variant with split local/remote edge lists (overlap path).

        The local aggregation depends only on ``h_local``; the remote one on
        the exchanged ``h_ext`` — structuring the dependencies this way lets
        XLA run the boundary collective concurrently with the local pass.
        """
        n = h_local.shape[0]

        def msgs(h_src, senders, receivers, mask, eattr, d2):
            s = jnp.minimum(senders, h_src.shape[0] - 1)
            r = jnp.minimum(receivers, n - 1)
            m = jnp.concatenate(
                [gather(h_src, s), gather(h_local, r), d2[:, None]], axis=-1
            )
            for i, layer in enumerate(self.message_layers):
                m = layer(params[f"msg_{i}"], m, eattr)
            m = jnp.where(mask[:, None], m, 0.0)
            return segment_sum(m, receivers, n, indices_are_sorted=True)

        agg = msgs(h_local, *loc_edges[:3], *loc_edges[3:])
        agg = agg + msgs(h_ext, *rem_edges[:3], *rem_edges[3:])
        u = jnp.concatenate([h_local, agg], axis=-1)
        for i, layer in enumerate(self.update_layers):
            u = layer(params[f"upd_{i}"], u, node_attr)
        return jnp.where(node_mask[:, None], h_local + u, 0.0)

    def apply_dense(
        self,
        params,
        h_local: jnp.ndarray,  # [N, F]
        h_ext: jnp.ndarray,  # [N_ext, F]
        senders: jnp.ndarray,  # [N, K] indices into h_ext
        edge_attr: jnp.ndarray,  # [N, K, A]
        node_attr: jnp.ndarray,  # [N, A]
        edge_dist2: jnp.ndarray,  # [N, K]
        edge_mask: jnp.ndarray,  # [N, K]
        node_mask: jnp.ndarray,  # [N]
        reverse_slot: Optional[jnp.ndarray] = None,  # [N, K] symmetric graphs
        gather: Optional[tuple] = None,  # (loc, gtab, rtab, tile) tables
        edge_geo: Optional[jnp.ndarray] = None,  # [N, K*(A+2)] packed geometry
    ) -> jnp.ndarray:
        """Fixed-degree variant: K neighbor slots per node.

        Aggregation is a dense masked sum over the K axis — no scatter, and
        the receiver-side features broadcast instead of gathering.  This is
        the TPU-fast path; ``apply`` (COO + segment-sum) remains for
        variable-degree graphs.  ``edge_geo`` is the precomputed packed
        geometry stream (attr ‖ d2 ‖ mask, from compute_attributes_dense):
        building it inside the step materializes 128x-lane-padded [E, 1]
        temps that dominate HBM at 1M points.
        """
        n, k = senders.shape

        # scatter-free sender gradients require the full (unchunked) edge set
        # because reverse edges cross chunk boundaries
        rs = reverse_slot if self.edge_chunks == 1 else None
        gt = gather if self.edge_chunks == 1 else None
        geo = edge_geo

        def msgs_block(msg_params, h_ext_, h_local_b, senders_b, edge_attr_b,
                       dist2_b, mask_b, geo_b):
            """Message MLP + K-sum over a block of nodes (pallas or jnp)."""
            if edge_attr_b is None:
                # geo-only attrs (config-5 protocol): unpack the packed
                # stream BEFORE any dispatch — the lmax=1 Pallas kernels
                # take separate attr/d2/mask operands.  The generic kernel
                # reads geo_b directly (_geo2), so its unpacked copies are
                # dead and XLA DCEs them.
                if geo_b is None:
                    raise ValueError(
                        "attrs gave neither edge_attr nor edge_geo"
                    )
                g3 = geo_b.reshape(geo_b.shape[0], k, -1)
                a_dim = g3.shape[-1] - 2
                edge_attr_b = g3[..., :a_dim]
                dist2_b = g3[..., a_dim]
                mask_b = g3[..., a_dim + 1] > 0
            if self.use_pallas and gt is not None and h_ext_ is h_local_b:
                return self._fused_messages_tabled(
                    msg_params, h_local_b, edge_attr_b, dist2_b, mask_b, gt,
                    edge_geo=geo_b,
                )
            if self.use_pallas:
                return self._fused_messages(
                    msg_params, h_local_b, h_ext_, senders_b, edge_attr_b,
                    dist2_b, mask_b, reverse_slot=rs, edge_geo=geo_b,
                )
            if self.use_pallas_generic:
                return self._fused_messages_generic(
                    msg_params, h_local_b, h_ext_, senders_b, edge_attr_b,
                    dist2_b, mask_b, reverse_slot=rs, edge_geo=geo_b,
                    gather=gt if h_ext_ is h_local_b else None,
                )
            if rs is not None and h_ext_ is h_local_b:
                hs = take_dense_symmetric(h_ext_, senders_b, rs, mask_b)
            else:
                hs = jnp.take(h_ext_, senders_b, axis=0, mode="clip")
            hr = jnp.broadcast_to(h_local_b[:, None, :], hs.shape)
            m = jnp.concatenate([hs, hr, dist2_b[..., None]], axis=-1)
            for i, layer in enumerate(self.message_layers):
                m = layer(msg_params[f"msg_{i}"], m, edge_attr_b)
            m = jnp.where(mask_b[..., None], m, 0.0)
            return m.sum(axis=1)

        chunks = self.edge_chunks if n % max(self.edge_chunks, 1) == 0 else 1
        if chunks > 1:
            # stream node blocks: bounds live per-edge memory to one chunk —
            # required at 1M+ points where [N, K, F] tensors exceed HBM.
            # The packed geo stream slices per chunk like everything else;
            # edge_attr/dist2 may then be None entirely (config 5 passes
            # only geo — avoids a whole-graph [N, K, A] relayout temp).
            c = n // chunks

            def chunk_fn(msg_params, h_ext_, idx):
                sl = idx * c
                d = lambda a: (jax.lax.dynamic_slice_in_dim(a, sl, c, axis=0)
                               if a is not None else None)
                return msgs_block(
                    msg_params, h_ext_, d(h_local), d(senders), d(edge_attr),
                    d(edge_dist2), d(edge_mask), d(geo),
                )

            if self.remat or self.remat_kernel:
                # REQUIRED under lax.map: un-checkpointed chunk residuals
                # stack back to full size
                chunk_fn = jax.checkpoint(chunk_fn, static_argnums=())
            agg = jax.lax.map(
                lambda i: chunk_fn(params, h_ext, i), jnp.arange(chunks)
            ).reshape(n, -1)
        else:
            f = msgs_block
            # the fused kernels save only their inputs (custom_vjp recomputes
            # in-kernel), so checkpoint would add a redundant forward pass —
            # except when remat_kernel trades that pass for the [E, F+A+2]
            # stream residual (1M-point configs).  The symmetric-regather
            # sym path needs NO checkpoint at all: its custom_vjp residuals
            # are node-sized already (geo_call_sym), so checkpointing would
            # only re-add the redundant kernel forward (r5).
            pallas = self.use_pallas or self.use_pallas_generic
            sym = (rs is not None and h_ext is h_local
                   and self._sym_regather_eligible(n, rs_available=True))
            # the tabled generic path's custom_vjp residuals are node-sized
            # under remat_kernel (replay backward) — a checkpoint would only
            # re-add the redundant kernel forward, exactly like sym
            tab = (gt is not None and h_ext is h_local
                   and self._tab_eligible(n, gt))
            if (self.remat and not pallas) or (
                    self.remat_kernel and pallas and not (sym or tab)):
                f = jax.checkpoint(f)
            agg = f(
                params, h_ext, h_local, senders, edge_attr, edge_dist2,
                edge_mask, geo
            )
        def upd_fn(upd_params, h_local_, agg_, node_attr_):
            u = jnp.concatenate([h_local_, agg_], axis=-1)
            for i, layer in enumerate(self.update_layers):
                u = layer(upd_params[f"upd_{i}"], u, node_attr_)
            return u

        if (self.remat or chunks > 1) and any(
            isinstance(l.tp, TensorProduct) for l in self.update_layers
        ):
            # the generic TP's outer-product z ([N, ~1.6k] at lmax=2) is the
            # largest node-level intermediate — recompute it in the backward.
            # The L1 fast path has no such blow-up; recomputing it would only
            # cost time (~5 ms/step at the 100k bench config).  Chunked mode
            # REQUIRES this: lax.map stacks un-checkpointed chunk residuals,
            # rebuilding the full-size z.
            upd_fn = jax.checkpoint(upd_fn)
        if chunks > 1:
            # node-block the update too: even one z tile is [N, in*C2]
            # (32 GB at 10M/lmax=2 — the config-5 OOM), and chunking the
            # messages alone leaves it whole
            def upd_chunk(i):
                sl = i * c
                d = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, c, axis=0)
                return upd_fn(params, d(h_local), d(agg), d(node_attr))

            u = jax.lax.map(upd_chunk, jnp.arange(chunks)).reshape(n, -1)
        else:
            u = upd_fn(params, h_local, agg, node_attr)
        h = h_local + u
        return jnp.where(node_mask[:, None], h, 0.0)

    def apply_dense_split(
        self,
        params,
        h_local: jnp.ndarray,  # [NI + NB, F] (interior rows then boundary)
        h_ext: jnp.ndarray,  # [NI + NB + H, F]: local rows then halo slots
        int_edges,  # (senders [NI, K] local rows, attr, dist2, mask[, rev])
        bnd_edges,  # (senders [NB, K] extended space, attr, dist2, mask[, rev])
        node_attr: jnp.ndarray,  # [NI + NB, A]
        node_mask: jnp.ndarray,  # [NI + NB]
    ) -> jnp.ndarray:
        """Dense-K layer with interior/boundary receiver split (the
        distributed fast path — see parallel.partition.DensePartitionedGraph).

        The interior aggregation reads only ``h_local``, so it carries no
        data dependency on the halo exchange that produced ``h_ext`` — XLA's
        async collective scheduler runs the exchange concurrently with it;
        the boundary aggregation consumes the halo afterwards.  Both blocks
        dispatch to the same fused Pallas kernels as the single-chip bench.

        The optional 5th edge-tuple entry is the sender-transpose table
        (``DensePartitionedGraph.rev_int``/``rev_ext``): with it, the sender
        gather's gradient is a dense reverse gather (take_dense_rev) instead
        of the scatter-add XLA otherwise emits (measured 10x step cost at the
        100k bench config).
        """
        ni = int_edges[0].shape[0]

        def msgs(msg_params, h_r, h_src, senders, eattr, d2, mask, rev=None):
            if h_r.shape[0] == 0:
                return jnp.zeros((0, h_local.shape[-1]), h_local.dtype)
            hs = None if rev is None else take_dense_rev(h_src, senders, rev)
            if self.use_pallas:
                return self._fused_messages(
                    msg_params, h_r, h_src, senders, eattr, d2, mask, hs=hs
                )
            if self.use_pallas_generic:
                return self._fused_messages_generic(
                    msg_params, h_r, h_src, senders, eattr, d2, mask, hs=hs
                )
            if hs is None:
                hs = jnp.take(h_src, senders, axis=0, mode="clip")
            hr = jnp.broadcast_to(h_r[:, None, :], hs.shape)
            m = jnp.concatenate([hs, hr, d2[..., None]], axis=-1)
            for i, layer in enumerate(self.message_layers):
                m = layer(msg_params[f"msg_{i}"], m, eattr)
            m = jnp.where(mask[..., None], m, 0.0)
            return m.sum(axis=1)

        pallas = self.use_pallas or self.use_pallas_generic
        if (self.remat and not pallas) or (self.remat_kernel and pallas):
            msgs = jax.checkpoint(msgs)
        agg_i = msgs(params, h_local[:ni], h_local, *int_edges)
        agg_b = msgs(params, h_local[ni:], h_ext, *bnd_edges)
        agg = jnp.concatenate([agg_i, agg_b], axis=0)
        u = jnp.concatenate([h_local, agg], axis=-1)
        for i, layer in enumerate(self.update_layers):
            u = layer(params[f"upd_{i}"], u, node_attr)
        return jnp.where(node_mask[:, None], h_local + u, 0.0)

    def _fused_messages(
        self, params, h_local, h_ext, senders, edge_attr, edge_dist2, edge_mask,
        reverse_slot=None, edge_geo=None, hs=None,
    ):
        """Dispatch the message MLP + aggregation to the Pallas fused kernel.

        ``hs``: optional pre-gathered sender rows [N, K, F] (the distributed
        path gathers with take_dense_rev for scatter-free gradients).

        pack == 1 (the default everywhere — pack>1 measured slower, docs/
        PERF.md) dispatches to the slot-major km kernel: [K, N, F] senders,
        node-major packed geo, no dense-E expand matmuls.  pack > 1 keeps
        the t-major stacked-lane kernel with separate flat operands."""
        from ..kernels.fused_message import MessageConfig, fused_message_aggregate

        n, k = senders.shape
        f = h_local.shape[-1]
        if self.pack == 1 or k % self.pack != 0:
            return self._fused_messages_km(
                params, h_local, h_ext, senders, edge_attr, edge_dist2,
                edge_mask, reverse_slot=reverse_slot, edge_geo=edge_geo,
                hs=hs,
            )
        # prefer a tile that divides n exactly (multiple of 16 for bf16
        # sublane tiling): kernel time is tile-insensitive, and an exact
        # divisor avoids full-array pad copies of the [N*K, F] operands
        tile = 64
        for t in range(256, 15, -16):
            if n % t == 0:
                tile = t
                break
        npad = -(-n // tile) * tile
        p = self.pack if k % self.pack == 0 else 1
        cfg = MessageConfig(
            hs=self._pallas_hs, hv=self._pallas_hv, k=k, tile=tile, pack=p
        )

        if hs is None:
            if reverse_slot is not None and h_ext is h_local:
                hs = take_dense_symmetric(h_ext, senders, reverse_slot, edge_mask)
            else:
                hs = jnp.take(h_ext, senders, axis=0, mode="clip")
        hs = hs.reshape(n * k, f)
        attr = edge_attr.reshape(n * k, edge_attr.shape[-1])
        # d2/mask flattened to [N*K, 1] outside the kernel (Mosaic cannot
        # reshape lane dims into sublanes in-kernel)
        maskf = edge_mask.astype(h_local.dtype).reshape(n * k, 1)
        d2 = edge_dist2.reshape(n * k, 1)
        if npad != n:
            pe = (npad - n) * k
            hs = jnp.concatenate([hs, jnp.zeros((pe, f), hs.dtype)])
            attr = jnp.concatenate([attr, jnp.zeros((pe, attr.shape[-1]), attr.dtype)])
            h_local_p = jnp.concatenate(
                [h_local, jnp.zeros((npad - n, f), h_local.dtype)]
            )
            d2 = jnp.concatenate([d2, jnp.zeros((pe, 1), d2.dtype)])
            maskf = jnp.concatenate([maskf, jnp.zeros((pe, 1), maskf.dtype)])
        else:
            h_local_p = h_local
        if p > 1:
            # lane packing: p consecutive edge slots per register row — all
            # contiguous (free) reshapes of the flat edge-major arrays
            r = npad * k // p
            hs = hs.reshape(r, p * f)
            attr = attr.reshape(r, p * attr.shape[-1])
            d2 = d2.reshape(r, p)
            maskf = maskf.reshape(r, p)

        w0e1, w1o1, w0e2, w1o2 = self._folded_weights(params, h_local.dtype)
        agg = fused_message_aggregate(
            cfg, hs, h_local_p, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2
        )
        return agg[:n]

    def _fused_messages_km(
        self, params, h_local, h_ext, senders, edge_attr, edge_dist2,
        edge_mask, reverse_slot=None, edge_geo=None, hs=None,
    ):
        """Slot-major lmax=1 dispatch (mirrors ``_fused_messages_generic``):
        senders gathered [K, N, F] (``h[senders.T]`` order), geometry as the
        node-major packed [N, K*6] stream (precomputed ``edge_geo`` when the
        attrs 4-tuple provides it — a bitcast reshape; rebuilt [N, K, ·]-
        shaped otherwise)."""
        from ..kernels.fused_message import (
            MessageConfig,
            fused_message_aggregate_km,
        )

        n, k = senders.shape
        f = h_local.shape[-1]
        tile = 64
        for t in range(256, 15, -16):
            if n % t == 0:
                tile = t
                break
        npad = -(-n // tile) * tile
        cfg = MessageConfig(hs=self._pallas_hs, hv=self._pallas_hv, k=k,
                            tile=tile)
        dt = h_local.dtype
        if hs is None:
            if reverse_slot is not None and h_ext is h_local:
                hs3 = take_dense_symmetric_km(
                    h_ext, senders, reverse_slot, edge_mask)
            else:
                hs3 = jnp.take(h_ext, senders.T, axis=0, mode="clip")
        else:  # pre-gathered node-major [N, K, F] (take_dense_rev path)
            hs3 = jnp.swapaxes(hs, 0, 1)
        geo2 = self._geo2(edge_geo, edge_attr, edge_dist2, edge_mask, dt)
        h_p = h_local
        if npad != n:
            hs3 = jnp.concatenate(
                [hs3, jnp.zeros((k, npad - n, f), hs3.dtype)], axis=1)
            geo2 = jnp.concatenate(
                [geo2, jnp.zeros((npad - n, geo2.shape[-1]), geo2.dtype)])
            h_p = jnp.concatenate(
                [h_local, jnp.zeros((npad - n, f), h_local.dtype)])
        w0e1, w1o1, w0e2, w1o2 = self._folded_weights(params, dt)
        agg = fused_message_aggregate_km(
            cfg, hs3, h_p, geo2, w0e1, w1o1, w0e2, w1o2)
        return agg[:n]

    @staticmethod
    def _geo2(edge_geo, edge_attr, edge_dist2, edge_mask, dt):
        """Node-major packed geometry [N, K*(A+2)] for the fused kernels.

        Prefers the precomputed ``edge_geo`` (compute_attributes_dense) —
        the reshape is a bitcast.  The fallback concat keeps everything
        [N, K, ·]-shaped (no flat [N*K, 1] temps, which materialize
        128x-lane-padded)."""
        if edge_geo is not None:
            n = edge_geo.shape[0]
            return edge_geo.astype(dt).reshape(n, -1)
        n = edge_attr.shape[0]
        geo = jnp.concatenate(
            [edge_attr.astype(dt), edge_dist2[..., None].astype(dt),
             edge_mask[..., None].astype(dt)], axis=-1,
        )
        return geo.reshape(n, -1)

    def _folded_weights(self, params, dtp):
        """Message-layer weights with per-column norm constants folded in."""

        def folded(i):
            tp = self.message_layers[i].tp
            p = params[f"msg_{i}"]
            n0 = jnp.asarray(tp._norm["l0e"], dtp)
            n1 = jnp.asarray(tp._norm_mul["l1o"], dtp)
            return (p["w_l0e"].astype(dtp) * n0[None, :],
                    p["w_l1o"].astype(dtp) * n1[None, :])

        w0e1, w1o1 = folded(0)
        w0e2, w1o2 = folded(1)
        return w0e1, w1o1, w0e2, w1o2

    def _fused_messages_tabled(
        self, params, h_local, edge_attr, edge_dist2, edge_mask, gather,
        edge_geo=None,
    ):
        """Tabled-gather dispatch: per-tile compact sender tables
        (graph.container.with_gather_tables) replace the [N*K, F] row gather
        — see kernels.fused_message.fused_message_aggregate_tabled."""
        from ..kernels.fused_message import (
            MessageConfig,
            fused_message_aggregate_tabled,
        )

        loc, gtab, _, revd, remp, remn, gtile = gather
        n, k = edge_mask.shape
        f = h_local.shape[-1]
        npad = loc.shape[0]
        cfg = MessageConfig(
            hs=self._pallas_hs, hv=self._pallas_hv, k=k, tile=gtile,
            u=gtab.shape[1],
        )
        attr = edge_attr.reshape(n * k, edge_attr.shape[-1])
        maskf = edge_mask.astype(h_local.dtype).reshape(n * k, 1)
        d2 = edge_dist2.reshape(n * k, 1)
        h_p = h_local
        if npad != n:
            pe = (npad - n) * k
            h_p = jnp.concatenate([h_local, jnp.zeros((npad - n, f), h_local.dtype)])
            attr = jnp.concatenate([attr, jnp.zeros((pe, attr.shape[-1]), attr.dtype)])
            d2 = jnp.concatenate([d2, jnp.zeros((pe, 1), d2.dtype)])
            maskf = jnp.concatenate([maskf, jnp.zeros((pe, 1), maskf.dtype)])

        w0e1, w1o1, w0e2, w1o2 = self._folded_weights(params, h_local.dtype)
        agg = fused_message_aggregate_tabled(
            cfg, h_p, d2, attr, maskf, loc.reshape(npad * k, 1), gtab,
            revd, remp, remn, w0e1, w1o1, w0e2, w1o2,
        )
        return agg[:n]

    @staticmethod
    def _pick_generic_tile(n: int) -> int:
        """Prefer a tile that divides n exactly: padding replicates the full
        [K, N, F]/geo operands through concat copies (at 1M that is
        multi-GB per layer and tipped config-4 out of HBM when a fixed
        96 stopped dividing it).  Among exact divisors, larger is mildly
        better (r3 sweep, tools/exp_lmax2_tiles.py: 96/96 885 ms vs
        64/64 895 ms at 250k; r5 sweep: 200/200 701.6 vs 80/80 707.5 ms —
        tools/exp_lmax2_sweep.py); fall back to 64 + padding."""
        for t in range(224, 47, -8):
            if n % t == 0:
                return t
        return 64

    def _tab_eligible(self, n: int, gather) -> bool:
        """True when the generic dispatch will take ``geo_call_tab`` — the
        compact per-tile sender-table path (r5): ~4-5x fewer gathered rows
        than the [K, N, F] expansion and a split reverse table for sender
        gradients (53 -> 12 ms at 250k/K=16; tools/exp_tab250.py).  Needs
        tables built at exactly the dispatch tile, the split-rev arrays
        (container r5 format), and a hand-structured kernel backward.
        Under ``remat_kernel`` the residuals are node-sized (replay mode),
        so apply_dense skips the jax.checkpoint for this case too."""
        if not self.use_pallas_generic or gather is None:
            return False
        loc, _, _, revd, remp, remn, gtile = gather
        if revd is None or remp is None or remn is None or loc is None:
            return False
        return gtile == self._pick_generic_tile(n) and loc.shape[0] == n

    def _sym_regather_eligible(self, n: int, rs_available: bool) -> bool:
        """True when the generic dispatch will take ``geo_call_sym`` — the
        sender gather inside the kernel custom_vjp, node-sized residuals
        only.  apply_dense then skips the remat_kernel jax.checkpoint
        (whose whole point was to avoid storing edge-sized residuals, at
        the price of one redundant in-kernel forward per layer)."""
        return (
            self.use_pallas_generic
            and self.remat_kernel
            and self.replay_bwd
            and rs_available
            and n % self._pick_generic_tile(n) == 0
        )

    def _fused_messages_generic(
        self, params, h_local, h_ext, senders, edge_attr, edge_dist2,
        edge_mask, reverse_slot=None, edge_geo=None, hs=None, gather=None,
    ):
        """Dispatch the message MLP + aggregation to the generic fused kernel.

        The kernel's sender operand is slot-major [K, N, F] (see
        fused_message_generic.py) — gathered directly in that order
        (``h[senders.T]``); a pre-gathered node-major ``hs`` [N, K, F]
        (the distributed take_dense_rev path) is transposed here."""
        from ..kernels.fused_message_generic import FusedMessageGeneric

        n, k = senders.shape
        f = h_local.shape[-1]
        tile = self._pick_generic_tile(n)
        # the fallback backward (remat_kernel mode) replays the forward
        # under an in-kernel jax.vjp — roughly 2x the live VMEM of the
        # residual backward; cap its tile near the validated 64.  The bwd
        # tile must also divide the padded row count (a multiple of tile),
        # so pick the largest such divisor <= 64.
        bwd = tile
        if self.remat_kernel and tile > 80:
            # 64 and 80 are chip-validated in fallback mode (1M ran b80 at
            # 5205 ms; b64 cost 1.5%); larger is untested VMEM territory
            npad_probe = -(-n // tile) * tile
            for b in (80, 64, 48, 32, 16, 8):
                if npad_probe % b == 0:
                    bwd = b
                    break
        npad = -(-n // tile) * tile
        key = (k, npad)
        if key not in self._generic_kernels:
            # remat_kernel (the 1M-point HBM-fit mode) recomputes the kernel
            # forward at backward time anyway — saving pre-gate residuals
            # there would only add the [E, D] HBM traffic/footprint the mode
            # exists to avoid, so a replay-style backward stays in force
            # (the hand-structured _bwd_call_rep by default; replay_bwd=False
            # restores the jax.vjp fallback).
            # colpad: lane-align the saved-y residual streams (free on the
            # MXU — see FusedMessageGeneric; operand/row padding measured a
            # net regression and stays off).
            self._generic_kernels[key] = FusedMessageGeneric(
                self.message_layers, k, tile=tile, bwd_tile=bwd,
                residual_bwd=self.residual_bwd and not self.remat_kernel,
                replay_bwd=self.replay_bwd, colpad=True,
            )
        kern = self._generic_kernels[key]

        dt = h_local.dtype
        geo2 = self._geo2(edge_geo, edge_attr, edge_dist2, edge_mask, dt)
        if (hs is None and h_ext is h_local and npad == n
                and gather is not None and gather[3] is not None
                and gather[0] is not None and gather[0].shape[0] == n
                and gather[6] == kern.tile
                and (kern.residual_bwd or kern.replay_bwd)):
            # tabled path: compact per-tile sender gather, in-kernel one-hot
            # expand, split reverse-table sender gradients — subsumes both
            # the reverse-slot gather (residual mode) and the sym-regather
            # entry (replay mode; node-sized residuals, no checkpoint)
            loc, gtab, _, revd, remp, remn, _ = gather
            ptuple = tuple(
                params[f"msg_{i}"] for i in range(len(self.message_layers))
            )
            return kern.geo_call_tab(
                ptuple, h_local, geo2, loc, gtab, revd, remp, remn)[:n]
        if (hs is None and reverse_slot is not None and h_ext is h_local
                and npad == n
                and self._sym_regather_eligible(n, rs_available=True)):
            # remat_kernel symmetric path: sender gather inside the kernel
            # custom_vjp — node-sized residuals, no checkpoint replay
            # (apply_dense skips the jax.checkpoint for exactly this case)
            ptuple = tuple(
                params[f"msg_{i}"] for i in range(len(self.message_layers))
            )
            return kern.geo_call_sym(
                ptuple, h_local, geo2, senders, reverse_slot)[:n]

        if hs is None:
            if reverse_slot is not None and h_ext is h_local:
                hs = take_dense_symmetric_km(
                    h_ext, senders, reverse_slot, edge_mask)
            else:
                hs = jnp.take(h_ext, senders.T, axis=0, mode="clip")
        else:  # pre-gathered node-major [N, K, F] (take_dense_rev path)
            hs = jnp.swapaxes(hs, 0, 1)
        h_p = h_local
        if npad != n:
            hs = jnp.concatenate(
                [hs, jnp.zeros((k, npad - n, f), dt)], axis=1)
            geo2 = jnp.concatenate(
                [geo2, jnp.zeros((npad - n, geo2.shape[-1]), geo2.dtype)]
            )
            h_p = jnp.concatenate(
                [h_local, jnp.zeros((npad - n, f), h_local.dtype)]
            )
        ptuple = tuple(
            params[f"msg_{i}"] for i in range(len(self.message_layers))
        )
        return kern.geo_call(ptuple, hs, h_p, geo2)[:n]

    def __call__(
        self,
        params,
        graph: SteerableGraph,
        edge_attr: jnp.ndarray,
        node_attr: jnp.ndarray,
        edge_dist2: jnp.ndarray,
    ) -> SteerableGraph:
        h = self.apply(
            params,
            graph.nodes,
            graph.nodes,
            graph.senders,
            graph.receivers,
            edge_attr,
            node_attr,
            edge_dist2,
            graph.edge_mask,
            graph.node_mask,
        )
        return graph.replace_nodes(h)


class SEGNN:
    """Full SEGNN: embed -> N message-passing layers -> output head.

    ``lmax_attr`` controls the spherical-harmonic order of edge/node attributes
    (lmax=1 engages the reference-parity fast path everywhere).  The output
    head maps to ``output_irreps`` per node; graph-level targets pool first.
    """

    def __init__(
        self,
        input_irreps: Irreps,
        hidden_irreps: Irreps,
        output_irreps: Irreps,
        lmax_attr: int = 1,
        num_layers: int = 4,
        act: Callable = jax.nn.silu,
        task: str = "node",  # "node" | "graph"
        vel_attr: bool = False,
        remat: bool = False,
        layout: Optional[str] = None,
        use_pallas: bool = False,
        edge_chunks: int = 1,
        remat_kernel: bool = False,
        pack: int = 1,
        residual_bwd: bool = True,
        replay_bwd: bool = True,
        remat_layers: int = 0,
    ) -> None:
        # remat_layers: jax.checkpoint whole message-passing layers, so the
        # backward retains only the [N, F] layer-boundary activations — the
        # config-5 single-chip HBM enabler: at 10M points/F=90/bf16 each
        # boundary is 1.8 GB, while the un-remat per-layer agg/update
        # intermediates would add ~2x that again.  An int is a GROUP size:
        # remat_layers=2 checkpoints pairs of layers, halving the retained
        # boundaries for one extra layer-forward per pair in the backward
        # (4 x 1.79 GB -> 2 x 1.79 GB at 10M — what closes the budget).
        self.remat_layers = int(remat_layers)
        self.input_irreps = Irreps(input_irreps)
        self.hidden_irreps = Irreps(hidden_irreps)
        self.output_irreps = Irreps(output_irreps)
        self.lmax_attr = lmax_attr
        self.attr_irreps = Irreps.spherical_harmonics(lmax_attr)
        self.task = task
        self.vel_attr = vel_attr

        # internal feature layout: component-major ('cm') keeps the TPU vector
        # lanes running over channels instead of (2l+1)-vectors (~40x lane
        # occupancy for l=1 blocks); default for all configs.
        if layout is None:
            layout = "cm"
        self.layout = layout

        self.embed = O3TensorProductGate(
            self.input_irreps, self.attr_irreps, self.hidden_irreps, act=act,
            gated=False, layout_in="mul", layout_out=layout,
        )
        self.layers = [
            SEGNNLayer(
                self.hidden_irreps, self.attr_irreps, act=act, remat=remat,
                layout=layout, use_pallas=use_pallas, edge_chunks=edge_chunks,
                remat_kernel=remat_kernel, pack=pack,
                residual_bwd=residual_bwd, replay_bwd=replay_bwd,
            )
            for _ in range(num_layers)
        ]
        self.pre_head = O3TensorProductGate(
            self.hidden_irreps, self.attr_irreps, self.hidden_irreps, act=act,
            layout_in=layout, layout_out=layout,
        )
        self.head = O3Linear(
            self.hidden_irreps, self.output_irreps, bias=True,
            layout_in=layout, layout_out="mul",
        )

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.layers) + 3)
        params = {"embed": self.embed.init(keys[0], dtype=dtype)}
        for i, (layer, k) in enumerate(zip(self.layers, keys[1:])):
            params[f"layer_{i}"] = layer.init(k, dtype=dtype)
        params["pre_head"] = self.pre_head.init(keys[-2], dtype=dtype)
        params["head"] = self.head.init(keys[-1], dtype=dtype)
        return params

    def compute_attributes(
        self, graph: SteerableGraph, velocities: Optional[jnp.ndarray] = None
    ):
        """Edge attr = sh(x_rel); node attr = mean of incident edge attrs
        (+ sh(v) when ``vel_attr``); the scalar channel is reset to 1."""
        rel = graph.rel_positions()
        dist2 = jnp.sum(rel * rel, axis=-1)
        edge_attr = spherical_harmonics(self.lmax_attr, rel)
        edge_attr = jnp.where(graph.edge_mask[:, None], edge_attr, 0.0)
        # padding edges must not count in the mean: send them to the trash
        # segment (keeps parity with the partitioned path, which drops them)
        recv_cnt = jnp.where(graph.edge_mask, graph.receivers, graph.num_nodes)
        node_attr = segment_mean(edge_attr, recv_cnt, graph.num_nodes)
        if self.vel_attr and velocities is not None:
            node_attr = node_attr + spherical_harmonics(self.lmax_attr, velocities)
        # keep the l=0 channel exactly 1 (sh normalization) for stability
        node_attr = node_attr.at[..., 0].set(1.0)
        return edge_attr, node_attr, dist2

    def compute_attributes_dense(
        self, graph: DenseEdgeGraph, velocities: Optional[jnp.ndarray] = None
    ):
        """Dense-K variant of compute_attributes: [N, K, ...] edge arrays.

        Returns ``(edge_attr, node_attr, dist2, edge_geo)`` where ``edge_geo``
        [N, K, A+2] = attr ‖ d2 ‖ mask is the packed per-edge geometry stream
        the fused kernels consume — precomputed here, outside the train step,
        because packing the [.., 1] pieces in-step materializes
        128x-lane-padded temps.  ``attrs`` consumers may pass either the
        3-tuple (legacy) or this 4-tuple to ``__call__``.
        """
        rel = graph.rel_positions()  # [N, K, 3]
        dist2 = jnp.sum(rel * rel, axis=-1)
        edge_attr = spherical_harmonics(self.lmax_attr, rel)
        edge_attr = jnp.where(graph.edge_mask[..., None], edge_attr, 0.0)
        cnt = jnp.maximum(graph.edge_mask.sum(axis=1), 1)
        node_attr = edge_attr.sum(axis=1) / cnt[:, None].astype(edge_attr.dtype)
        if self.vel_attr and velocities is not None:
            node_attr = node_attr + spherical_harmonics(self.lmax_attr, velocities)
        node_attr = node_attr.at[..., 0].set(1.0)
        edge_geo = jnp.concatenate(
            [edge_attr, dist2[..., None],
             graph.edge_mask[..., None].astype(edge_attr.dtype)], axis=-1,
        )
        # 2-D [N, K*(A+2)]: a 3-D [N, K, A+2] jit ARGUMENT gets the (8,128)
        # tiling on its (K, A+2) trailing dims — an 11.6x lane-padding HBM
        # blowup (the [E, 1] trap, docs/PERF.md) or a whole-graph relayout
        # copy (the r3 config-5 OOM #1); lane-dense rows avoid both
        return edge_attr, node_attr, dist2, edge_geo.reshape(
            edge_geo.shape[0], -1)

    def compute_attributes_dense_chunked(
        self,
        positions: jnp.ndarray,  # [N, 3]
        senders: jnp.ndarray,  # [N, K]
        edge_mask: jnp.ndarray,  # [N, K]
        nchunk: Optional[int] = None,
        dtype=jnp.bfloat16,
    ):
        """Geo-only attrs for 10M-class graphs, built in node slabs.

        Returns the geo-only 4-tuple ``(None, node_attr, None, edge_geo)``:
        no raw [N, K, A] edge_attr (at 10M it becomes a dead HBM argument
        buffer or a whole-graph relayout temp — the r3 config-5 OOM) and no
        separate dist2 — the fused kernels read both from the packed
        ``edge_geo`` stream.  The slab ``lax.map`` caps the fp32 sh transient
        at [N/nchunk, K, A] (a one-shot fp32 [N, K, 9] build would need
        ~12 GB at 10M); outputs are cast to ``dtype`` (bf16 production).

        Matches ``compute_attributes_dense`` exactly on the emitted streams
        (rel masked before dist2, so padding slots carry geo = 0 ‖ 0 ‖ 0).
        Takes raw arrays (not the graph) so callers can jit it with the
        arrays as ARGUMENTS — closure constants embed in the serialized
        module and blow the remote-compile request body at 10M points.
        ``vel_attr`` models are unsupported (no velocity stream at the
        point-cloud configs this path exists for).
        """
        if self.vel_attr:
            raise NotImplementedError(
                "chunked attrs have no velocity stream; use "
                "compute_attributes_dense"
            )
        n, k = senders.shape
        if nchunk is None:
            nchunk = max(n // 1_000_000, 1)
        while nchunk > 1 and n % nchunk:
            nchunk -= 1
        c = n // nchunk

        def attr_chunk(i):
            sl = i * c
            d = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, c, axis=0)
            sd, mk = d(senders), d(edge_mask)
            xs = jnp.take(positions, jnp.minimum(sd, n - 1), axis=0)
            rel = xs - d(positions)[:, None, :]
            rel = jnp.where(mk[..., None], rel, 0.0)
            dist2 = jnp.sum(rel * rel, axis=-1)
            ea = spherical_harmonics(self.lmax_attr, rel)
            ea = jnp.where(mk[..., None], ea, 0.0)
            cnt = jnp.maximum(mk.sum(axis=1), 1)
            na = ea.sum(axis=1) / cnt[:, None].astype(ea.dtype)
            na = na.at[..., 0].set(1.0)
            geo = jnp.concatenate(
                [ea, dist2[..., None], mk[..., None].astype(ea.dtype)],
                axis=-1,
            )
            return geo.astype(dtype), na.astype(dtype)

        geo, na = jax.lax.map(attr_chunk, jnp.arange(nchunk))
        a2 = geo.shape[-1]
        return (None, na.reshape(n, -1), None, geo.reshape(n, k * a2))

    def _forward_dense(
        self,
        params,
        graph: DenseEdgeGraph,
        velocities: Optional[jnp.ndarray] = None,
        attrs: Optional[tuple] = None,
    ) -> jnp.ndarray:
        if attrs is not None:
            if len(attrs) == 4:
                edge_attr, node_attr, dist2, edge_geo = attrs
            else:  # legacy 3-tuple: kernels rebuild the pack in-step
                edge_attr, node_attr, dist2 = attrs
                edge_geo = None
        else:
            edge_attr, node_attr, dist2, edge_geo = (
                self.compute_attributes_dense(graph, velocities)
            )
        n = graph.nodes.shape[0]
        ec = self.layers[0].edge_chunks if self.layers else 1
        if ec > 1 and n % ec == 0:
            # chunk the embed too: its cm-layout per-irrep blocks are narrow
            # columns XLA lays out N-minor ({0,1}), dragging whole-graph
            # relayout copies behind them (config-5 OOM temps #4-8)
            ce = n // ec

            @jax.checkpoint
            def embed_chunk(ep, x_, na_):
                return self.embed(ep, x_, na_)

            def embed_idx(i):
                sl = i * ce
                d = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, ce, axis=0)
                return embed_chunk(params["embed"], d(graph.nodes),
                                   d(node_attr))

            h = jax.lax.map(embed_idx, jnp.arange(ec)).reshape(n, -1)
        else:
            h = self.embed(params["embed"], graph.nodes, node_attr)
        gather = None
        if graph.gather_loc is not None:
            gather = (
                graph.gather_loc, graph.gather_tab, graph.gather_rev,
                graph.gather_rev_dense, graph.gather_rem_pos,
                graph.gather_rem_node, graph.gather_tile,
            )

        def layer_body(lp, h_, layer):
            return layer.apply_dense(
                lp, h_, h_, graph.senders, edge_attr, node_attr,
                dist2, graph.edge_mask, graph.node_mask,
                reverse_slot=graph.reverse_slot,
                gather=gather,
                edge_geo=edge_geo,
            )

        g = self.remat_layers
        if g:
            for start in range(0, len(self.layers), g):
                grp = list(range(start, min(start + g, len(self.layers))))

                def body(lps, h_, grp=grp):
                    for j, i in enumerate(grp):
                        h_ = layer_body(lps[j], h_, self.layers[i])
                    return h_

                body = jax.checkpoint(body)
                h = body([params[f"layer_{i}"] for i in grp], h)
        else:
            for i, layer in enumerate(self.layers):
                h = layer_body(params[f"layer_{i}"], h, layer)
        if ec > 1 and n % ec == 0:
            # pre_head's z is [N, F*C2] (1.6 GB at 10M) — stream it in the
            # same node blocks as the message/update chunking
            cc = n // ec

            # checkpoint each chunk: un-checkpointed, lax.map STACKS every
            # chunk's backward residuals — including the [cc, F*C2] z — and
            # the memory win evaporates ([chunks, cc, 810] = 18 GB at 10M)
            @jax.checkpoint
            def head_chunk(hp, h_, na_):
                hh = self.pre_head(hp["pre_head"], h_, na_)
                return self.head(hp["head"], hh)

            def head_idx(i):
                sl = i * cc
                d = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, cc, axis=0)
                return head_chunk(params, d(h), d(node_attr))

            out = jax.lax.map(head_idx, jnp.arange(ec)).reshape(n, -1)
        else:
            h = self.pre_head(params["pre_head"], h, node_attr)
            out = self.head(params["head"], h)
        if self.task == "graph":
            out = jnp.where(graph.node_mask[:, None], out, 0.0)
            out = segment_sum(out, graph.node_graph, graph.n_graphs)
        return out

    def __call__(
        self,
        params,
        graph,
        velocities: Optional[jnp.ndarray] = None,
        attrs: Optional[tuple] = None,
    ) -> jnp.ndarray:
        """``attrs``: optional precomputed (edge_attr, node_attr, dist2) —
        they depend only on the graph geometry, so computing them once per
        graph instead of per step removes the sh embedding (and its HBM
        traffic) from the training hot loop entirely.  Accepts either a COO
        ``SteerableGraph`` or a fixed-degree ``DenseEdgeGraph``."""
        if isinstance(graph, DenseEdgeGraph):
            return self._forward_dense(params, graph, velocities, attrs)
        if attrs is not None:
            edge_attr, node_attr, dist2 = attrs
        else:
            edge_attr, node_attr, dist2 = self.compute_attributes(graph, velocities)
        h = self.embed(params["embed"], graph.nodes, node_attr)
        g = graph.replace_nodes(h)
        for i, layer in enumerate(self.layers):
            g = layer(params[f"layer_{i}"], g, edge_attr, node_attr, dist2)
        h = self.pre_head(params["pre_head"], g.nodes, node_attr)
        out = self.head(params["head"], h)
        if self.task == "graph":
            out = jnp.where(graph.node_mask[:, None], out, 0.0)
            out = segment_sum(out, graph.node_graph, graph.n_graphs)
        return out
