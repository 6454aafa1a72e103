"""Generic fused Pallas message kernel: any-lmax steerable message MLP + K-sum.

The lmax=1 kernel (fused_message.py) hand-specializes the SEGNN hidden
``Hs x0e + Hv x1o``; this module fuses the *generic* message pass — any
hidden irreps, any attr order (the lmax=2 configs, BASELINE.json:10) — by
running the existing jnp building blocks (``ops.tensor_product.TensorProduct``
+ ``ops.gate.Gate`` via ``O3TensorProductGate``) *inside* a Pallas kernel
body on VMEM-resident edge tiles.  Those modules are written in 2-D
component-major ('cm') form precisely so they lower through Mosaic.

Row ordering is **slot-major** within a tile: row ``k*T + t`` is edge slot
``k`` of node ``t``.  This is what makes the expand/sum machinery free:

- sender features arrive as a 3-D ``[K, N, F]`` operand whose VMEM block
  ``[K, T, F]`` is assembled into ``[K*T, F]`` by K leading-dim reads + one
  sublane concat (no reshape that crosses the lane dim);
- receiver rows repeat via ``concat([hr] * K, axis=0)`` — replacing the
  dense ``E @ hr`` expand matmul whose T·R·F MACs/tile were most of the
  ~11 ms "machinery floor" (tools/exp_generic_breakdown.py null variants);
- the K-slot sum is K static sublane slices + adds (transpose of the
  repeat), replacing ``E.T @ m``;
- node-major lane-dense geometry ``[T, K*G]`` expands to per-edge rows by
  K *lane* slices + one sublane concat.

Every one of those is a 2-D slice/concat Mosaic lowers directly.  The
previous t-major design needed an axis-inserting ``stack``/broadcast
(``[64,11] -> [64,1,11]``) that Mosaic rejects on real hardware — the
round-2 bench crash (VERDICT.md defect 1).

The backward pass is a second Pallas kernel.  Two modes:

- **residual_bwd (default, folded-GEMM layers only)**: the forward kernel
  additionally writes each message layer's *pre-gate* TP output ``y_i``
  (the only expensive-to-recompute intermediates — everything else is a
  gate activation or a lane multiply away).  The backward reads them and
  runs a hand-structured transpose of the folded-GEMM chain: it never
  replays the forward GEMMs, cutting ≈ one kernel-forward of MXU/VPU work
  per layer for ~R·ΣD_i extra HBM traffic (≈4 ms/layer at the 250k lmax=2
  config — docs/PERF.md "residual-saving backward").
- **fallback** (any non-foldable layer): differentiate the whole tile
  computation with ``jax.vjp`` *inside* the kernel — no hand-derived
  gradients, at the cost of an in-kernel forward replay.  The repeat/sum
  inside the differentiated region use slot-major 0/1 expand *matmuls*
  (``_expand_matrix_km``) so every AD-transposed op is itself a matmul —
  the one shape Mosaic always lowers.

Weight gradients accumulate in fp32 across the sequential grid (init at
program 0) in both modes.

What this buys at 1M points / lmax=2: the XLA path materializes hundreds of
[E, mul]-sized intermediates per layer in HBM and needs edge-chunked
``lax.map`` streaming to fit; the fused kernel's per-edge chain lives in
VMEM, leaving only gather-read + cotangent-write traffic.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedMessageGeneric"]

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _cost(k, n, flat_ws, operands, outs, scale=1):
    """Rough CostEstimate so the latency-hiding scheduler sees the Mosaic
    custom-call's real weight: without one the kernel looks free and XLA
    never hoists a halo all-gather-start across it (exp_overlap_evidence).
    flops = 2·slots·Σ w_in·w_out (the folded-GEMM chain); bytes = HBM
    operand/result traffic."""
    rows = n * k
    flops = 2 * rows * sum(
        int(w.shape[-2]) * int(w.shape[-1]) for w in flat_ws if w.ndim >= 2)
    byts = 0
    for x in operands + outs:
        b = x.dtype.itemsize
        for d in x.shape:
            b *= int(d)
        byts += b
    return pl.CostEstimate(flops=scale * flops, transcendentals=rows,
                           bytes_accessed=byts)


def _expand_matrix_km(T, K, dtype):
    """[K*T, T] 0/1 matrix for slot-major rows: (E @ x)[k*T+t] = x[t];
    E.T @ m sums each node's K slots.  Only used inside the fallback
    backward's differentiated region (matmuls AD-transpose to matmuls)."""
    R = K * T
    src = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0) % T
    tgt = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
    return (src == tgt).astype(dtype)


class FusedMessageGeneric:
    """Fused message MLP + masked K-slot aggregation for one SEGNN layer.

    ``layers``: the list of O3TensorProductGate message layers (static
    objects; their ``__call__`` must be 2-D/'cm'-layout — i.e. built with
    ``layout_in='cm', layout_out='cm'`` and a generic ``TensorProduct``).
    Parameters stay a pytree (tuple of per-layer dicts) and gradients flow
    through a custom_vjp whose backward is an in-kernel ``jax.vjp``.
    """

    def __init__(self, layers: Sequence, k: int, tile: int = 16,
                 bwd_tile: int = 0, residual_bwd: bool = True,
                 fpad: int = 0, colpad: bool = False,
                 replay_bwd: bool = True, dw_dotgen: bool = False) -> None:
        # dw_dotgen: express dW'_c = m^T @ dya as a dot_general contracting
        # dim 0 of both operands (no materialized .T — Mosaic can fold the
        # operand transpose into the MXU pass); A/B flag, default off until
        # measured
        self.dw_dotgen = dw_dotgen
        self.layers = list(layers)
        self.k = k
        self.tile = tile
        self.bwd_tile = bwd_tile or max(tile // 2, 8)
        # hand-structured backwards (residual-saving OR in-kernel replay)
        # require every layer on the folded-GEMM TP path (transposable chain)
        foldable = all(
            hasattr(l, "tp")
            and getattr(l.tp, "_gemm_default", lambda: False)()
            for l in layers
        )
        self.residual_bwd = residual_bwd and foldable
        # replay_bwd: when residuals are off (remat_kernel mode — saving the
        # [K, N, D] pre-gate ys is exactly the HBM footprint that mode
        # exists to avoid), rebuild the ys with a hand-structured in-kernel
        # forward replay and run the same z-free transpose chain — instead
        # of the jax.vjp fallback whose differentiated repeat/K-sum must be
        # dense 0/1 expand MATMULS (_expand_matrix_km: T·R·C1 MACs/tile of
        # pure machinery) so that AD transposes stay Mosaic-lowerable.
        self.replay_bwd = replay_bwd and foldable
        # matmul-form gate (Gate.fast_tables): silu/sigmoid gates on the
        # folded-GEMM path evaluate as y[:, :dk] * (σ(y) @ psel) on column-
        # permuted TP outputs — one transcendental pass + one tiny MXU
        # matmul instead of the per-group lane concats whose non-aligned
        # offsets each cost a Mosaic vector relayout (~9 ms/layer of the
        # 36.5 ms generic forward at 256k/K=16, exp_generic_breakdown).
        self._gate_fast = []
        for l in self.layers:
            g = getattr(l, "gate", None)
            ok = (
                g is not None
                and g.layout == "cm"
                and g.act_scalars is jax.nn.silu
                and g.act_gates is jax.nn.sigmoid
                and hasattr(l, "tp")
                and getattr(l.tp, "_gemm_default", lambda: False)()
            )
            self._gate_fast.append(g.fast_tables() if ok else None)
        # fpad: lane-pad the [K, N, F] sender / [N, F] receiver operands and
        # the folded-weight OUTPUT columns to this width.  F=90 bf16 rows
        # (180 B) stream through the Pallas block DMA at ~108 GB/s vs ~266
        # GB/s lane-aligned (tools/exp_dma_layout.py) — padding the big
        # streams (hs fwd+bwd reads, dhs write, the saved-y residuals)
        # trades 1.4x bytes for 2.5x bandwidth.  Requires every gated layer
        # on the fast-gate path (the padded y's extra lanes are zeroed by
        # psel's zero rows; the concat-form gate would misparse them).
        # (every layer fast-gated: an ungated layer's padded y would leak
        # its zero lanes into the next layer's unpadded row space)
        self.fpad = fpad if all(t is not None for t in self._gate_fast) else 0
        # colpad: pad only the folded OUTPUT columns to the 128-lane tile.
        # The MXU already pads output lanes to 128 per pass, so the wider
        # GEMM is FREE compute — but the saved-y residual streams (the
        # biggest DMA at the 250k/1M configs) become lane-aligned.  Unlike
        # fpad it does NOT widen the contraction dim (row-padding 181->257
        # added a third 128-chunk to every GEMM contraction and measured
        # +12 ms at the 250k step — rejected for this config class).
        self.colpad = (colpad and not self.fpad
                       and all(t is not None for t in self._gate_fast))
        # layer-1 input rows are [hs(F) | hr(F) | d2]; with padding they
        # become [hs(fpad) | hr(fpad) | d2] — fold scatters weight rows
        # into the padded space via this embedding (built lazily: F comes
        # from in1_dim = 2F+1)
        if self.fpad:
            c1 = self.layers[0].tp.in1_dim
            F = (c1 - 1) // 2
            assert F <= self.fpad, (F, self.fpad)
            self._row_embed = np.concatenate([
                np.arange(F), self.fpad + np.arange(F), [2 * self.fpad]
            ]).astype(np.int32)
            self._c1p_first = 2 * self.fpad + 1
        # message output width (layer-N gate output) — differs from the
        # receiver operand width when fpad is set
        last = self.layers[-1]
        self.out_dim = (last.gate.irreps_out.dim
                        if getattr(last, "gate", None) is not None
                        else last.tp.out_dim)
        # per-layer padded folded OUT dims (column padding to the lane tile)
        self._ydims = [
            (-(-l.tp.out_dim // 128) * 128) if (self.fpad or self.colpad)
            else l.tp.out_dim
            for l in self.layers
        ]
        # psel operands (fast layers only, in layer order) ride the kernel
        # as fixed-block VMEM inputs: array constants must not be closed
        # over in a Mosaic kernel body.  Rows pad to the padded y width.
        # Kept as NUMPY on purpose: the model constructs kernels lazily
        # inside jit/remat traces and caches them — a jnp array created
        # there is a tracer of that trace and leaks into the next one
        # (UnexpectedTracerError at the 1M remat_kernel config, r4); numpy
        # operands convert to constants of whichever trace binds them.
        self._psel_ops = []
        for t, yd, l in zip(self._gate_fast, self._ydims, self.layers):
            if t is None:
                continue
            ps = t[1]
            if yd > ps.shape[0]:
                ps = np.pad(ps, ((0, yd - ps.shape[0]), (0, 0)))
            self._psel_ops.append(np.asarray(ps))

        # geometry rides a node-major lane-dense [N, K*(A+2)] operand and
        # expands to per-slot rows in-kernel: flat [R, 1] operands/residuals
        # materialize (8,128)-tiled in HBM (128x expansion, 3.8 GB per piece
        # at 1M points / K=16), and packing geometry into the hs stream
        # costs a full [R, F+A+2] concat round-trip per layer.
        def call(params_tuple, hs, hr, geo2):
            return self._fwd_call(params_tuple, hs, hr, geo2)

        def call_fwd(params_tuple, hs, hr, geo2):
            if self.residual_bwd:
                out, ys = self._fwd_call(params_tuple, hs, hr, geo2,
                                         save=True)
                return out, (params_tuple, hs, hr, geo2, tuple(ys))
            out = self._fwd_call(params_tuple, hs, hr, geo2)
            return out, (params_tuple, hs, hr, geo2, None)

        def call_bwd(res, d_agg):
            params_tuple, hs, hr, geo2, ys = res
            if self.residual_bwd:
                d_params, dhs, dhr = self._bwd_call_res(
                    params_tuple, hs, hr, geo2, ys, d_agg
                )
            elif self.replay_bwd:
                d_params, dhs, dhr = self._bwd_call_rep(
                    params_tuple, hs, hr, geo2, d_agg
                )
            else:
                d_params, dhs, dhr = self._bwd_call(
                    params_tuple, hs, hr, geo2, d_agg
                )
            return (d_params, dhs, dhr, jnp.zeros_like(geo2))

        self._call = jax.custom_vjp(call)
        self._call.defvjp(call_fwd, call_bwd)

        # symmetric-regather entry (geo_call_sym): the sender gather lives
        # INSIDE the custom_vjp, so the residuals are only node-sized
        # (params, h, geo2, index tables) — no [K, N, F] hs and no saved ys.
        # The backward regathers hs and runs the hand-structured replay
        # kernel; the sender gradient returns through the reverse-slot
        # gather-sum (ops.gather_scatter._tds_km_bwd semantics).  This is
        # what lets remat_kernel configs drop the jax.checkpoint around the
        # kernel dispatch — the checkpoint's one redundant in-kernel forward
        # per layer was ~40% of the 1M-config backward (VERDICT r4 weak #2).
        def call_sym(params_tuple, h, geo2, senders, reverse_slot):
            hs = jnp.take(h, senders.T, axis=0, mode="clip")
            return self._fwd_call(params_tuple, hs, h, geo2)

        def call_sym_fwd(params_tuple, h, geo2, senders, reverse_slot):
            out = call_sym(params_tuple, h, geo2, senders, reverse_slot)
            return out, (params_tuple, h, geo2, senders, reverse_slot)

        def call_sym_bwd(res, d_agg):
            params_tuple, h, geo2, senders, reverse_slot = res
            hs = jnp.take(h, senders.T, axis=0, mode="clip")
            d_params, dhs, dhr = self._bwd_call_rep(
                params_tuple, hs, h, geo2, d_agg)
            n, kk = senders.shape
            f = h.shape[-1]
            gf = dhs.reshape(kk * n, f)
            rs = reverse_slot
            valid = (rs < n * kk).reshape(-1).astype(d_agg.dtype)
            rs_km = (rs % kk) * n + rs // kk
            picked = jnp.take(gf, rs_km.reshape(-1), axis=0, mode="clip")
            dh_send = (picked * valid[:, None]).reshape(n, kk, f).sum(axis=1)
            z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
            return (d_params, (dh_send + dhr).astype(h.dtype),
                    jnp.zeros_like(geo2), z(senders), z(reverse_slot))

        self._call_sym = jax.custom_vjp(call_sym)
        self._call_sym.defvjp(call_sym_fwd, call_sym_bwd)

        # tabled entry (geo_call_tab): per-tile compact sender tables
        # (graph.container.with_gather_tables) replace the [K, N, F] row
        # gather with h[tab] ([ntiles·U, F], ~4-5x fewer rows — the TPU
        # gather cost is per row, tools/exp_tab250.py) and an in-kernel
        # one-hot MXU expand; sender gradients come back as the compact
        # [U, F] per-tile blocks and reach h through the SPLIT reverse
        # table (dense [N, q0] gather-sum + sorted-segment remainder:
        # 53 -> 12 ms at 250k/K=16 vs the reverse-slot gather).  Residuals
        # are node-sized + the saved ys (residual mode) or node-sized only
        # (replay mode, remat_kernel configs).
        def call_tab(params_tuple, h, geo2, loc, tabf, revd, remp, remn):
            hu = jnp.take(h, tabf, axis=0, mode="clip")
            return self._fwd_call_tab(params_tuple, hu, h, geo2, loc)

        def call_tab_fwd(params_tuple, h, geo2, loc, tabf, revd, remp, remn):
            hu = jnp.take(h, tabf, axis=0, mode="clip")
            if self.residual_bwd:
                # save hu too: the TPU row gather costs ~13-16 ns/ROW, so
                # regathering [ntiles·U, F] at backward time is ~12 ms/layer
                # at 250k/t200 while the HBM save+load of the same block is
                # <1 ms.  Replay mode (remat_kernel) keeps the regather —
                # its contract is node-sized residuals only.
                out, ys = self._fwd_call_tab(params_tuple, hu, h, geo2, loc,
                                             save=True)
                return out, (params_tuple, h, geo2, loc, tabf, revd, remp,
                             remn, tuple(ys), hu)
            out = self._fwd_call_tab(params_tuple, hu, h, geo2, loc)
            return out, (params_tuple, h, geo2, loc, tabf, revd, remp, remn,
                         None, None)

        def call_tab_bwd(res, d_agg):
            (params_tuple, h, geo2, loc, tabf, revd, remp, remn, ys,
             hu) = res
            if hu is None:
                hu = jnp.take(h, tabf, axis=0, mode="clip")
            if ys is not None:
                d_params, d_hu, dhr = self._bwd_call_res_tab(
                    params_tuple, hu, h, geo2, loc, ys, d_agg)
            else:
                d_params, d_hu, dhr = self._bwd_call_rep_tab(
                    params_tuple, hu, h, geo2, loc, d_agg)
            n = h.shape[0]
            npad = revd.shape[0]
            total = d_hu.shape[0]
            acc = None
            for qq in range(revd.shape[1]):
                idx = revd[:, qq]
                v = (idx < total).astype(d_agg.dtype)
                p = jnp.take(d_hu, idx, axis=0, mode="clip") * v[:, None]
                acc = p if acc is None else acc + p
            rem = jnp.take(d_hu, remp, axis=0, mode="clip")
            acc = acc + jax.ops.segment_sum(
                rem, remn, num_segments=npad, indices_are_sorted=True)
            z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
            return (d_params, (acc[:n] + dhr).astype(h.dtype),
                    jnp.zeros_like(geo2), z(loc), z(tabf), z(revd), z(remp),
                    z(remn))

        self._call_tab = jax.custom_vjp(call_tab)
        self._call_tab.defvjp(call_tab_fwd, call_tab_bwd)

    # ---- tile computation (shared by fwd and the in-kernel vjp) ----

    def _layer_tp(self, layer, p, m, attr):
        """One message layer's TP, z-concat-free when folded.

        The folded-GEMM product ``outer(m, attr) @ W'`` is evaluated as
        ``Σ_c (m · attr_c) @ W'_c`` — C2 narrow GEMMs with fp32 accumulation
        instead of one wide GEMM over a materialized [R, C2·C1] z.  Inside
        the kernel the z concat build was ~16 ms/layer of the 53 ms forward
        (tools/exp_generic_breakdown.py: gemm1 36.5 vs gemm1_nz 28.8 ms at
        256k/K=16 lmax=2) — the MXU work is ~1 ms either way, the concat
        materialization was the cost."""
        if "w_folded" not in p:
            return layer.tp(p, m, attr)
        c2 = layer.tp.in2_dim
        wf = p["w_folded"].astype(m.dtype)
        c1 = wf.shape[-2] // c2  # padded row space under fpad (_fold)
        acc = None
        for c in range(c2):
            # row-scalar commutes through the GEMM: (m·attr_c) @ W_c ==
            # (m @ W_c)·attr_c — scale the [R, D] GEMM result instead of the
            # wider [R, C1] input (C1=181 vs D=108 at the 256k lmax=2
            # config: one VPU lane-chunk instead of two per component), and
            # the scale rides the f32 accumulator add for free
            t = jnp.dot(m, wf[c * c1 : (c + 1) * c1],
                        preferred_element_type=jnp.float32) \
                * attr[:, c : c + 1].astype(jnp.float32)
            acc = t if acc is None else acc + t
        return acc.astype(m.dtype)

    def _rep_rows(self, x):
        """[T, F] -> [K*T, F] slot-major receiver repeat: row k*T+t = x[t].

        One sublane concat of K aliases — no expand matmul, no
        axis-inserting broadcast (Mosaic rejects [T,F]->[T,1,F])."""
        return jnp.concatenate([x] * self.k, axis=0) if self.k > 1 else x

    def _ksum(self, m):
        """[K*T, F] -> [T, F] per-node slot sum (fp32): transpose of
        ``_rep_rows`` — K static sublane slices + adds."""
        t = m.shape[0] // self.k
        acc = m[0:t].astype(jnp.float32)
        for k in range(1, self.k):
            acc = acc + m[k * t : (k + 1) * t].astype(jnp.float32)
        return acc

    def _assemble_hs(self, hs_ref):
        """[K, T, F] VMEM block -> [K*T, F] slot-major rows: K static
        leading-dim reads + one sublane concat."""
        if self.k == 1:
            return hs_ref[0]
        return jnp.concatenate([hs_ref[k] for k in range(self.k)], axis=0)

    def _expand_hu(self, hu, loc, tile):
        """Tabled expand: [U, F] compact sender rows + [T, K] table indices
        -> ([K*T, F] slot-major rows, [K*T, U] one-hot).

        One-hot rows select table entries on the MXU (exact: 0/1 weights,
        one nonzero per row); invalid slots carry ``loc == U`` and produce
        all-zero rows — which also drops their cotangents in the backward's
        transposed ``onehot^T @ dm`` without any separate mask."""
        U = hu.shape[0]
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (tile, U), 1)
        parts = [(loc[:, k : k + 1] == iota_u).astype(hu.dtype)
                 for k in range(self.k)]
        onehot = jnp.concatenate(parts, axis=0) if self.k > 1 else parts[0]
        rows = jnp.dot(onehot, hu,
                       preferred_element_type=jnp.float32).astype(hu.dtype)
        return rows, onehot

    def _psel_list(self, psel_vals):
        """Expand the compact fast-layer psel sequence to per-layer/None."""
        out, it = [], iter(psel_vals)
        for t in self._gate_fast:
            out.append(next(it) if t is not None else None)
        return out

    def _gate_apply(self, i, y, psel):
        """Layer i's gate on (possibly column-permuted) pre-gate y."""
        layer = self.layers[i]
        fast = self._gate_fast[i]
        if fast is not None:
            # weights are column-permuted for fast layers (_fold): the
            # concat-form gate would silently misread y — require psel
            assert psel is not None, "fast-gate layer needs its psel operand"
            return layer.gate.fast_apply(y, psel, fast[2])
        return layer.gate(y) if getattr(layer, "gate", None) is not None \
            else y

    def _message(self, params_tuple, hs_t, hr_rep, d2, attr, maskf,
                 ksum=None, psels=None):
        ksum = ksum or self._ksum
        psels = psels if psels is not None else [None] * len(self.layers)
        m = jnp.concatenate([hs_t, hr_rep, d2.astype(hs_t.dtype)], axis=-1)
        for i, (layer, p) in enumerate(zip(self.layers, params_tuple)):
            y = self._layer_tp(layer, p, m, attr)
            m = self._gate_apply(i, y, psels[i])
        return ksum(m * maskf)

    def _message_stages(self, params_tuple, hs_t, hr_rep, d2, attr, maskf,
                        psels=None):
        """Same as ``_message`` but also returns the pre-gate TP outputs
        ``y_i`` per layer — the residuals the hand-structured backward needs
        (everything else is reconstructible with cheap elementwise work)."""
        psels = psels if psels is not None else [None] * len(self.layers)
        m = jnp.concatenate([hs_t, hr_rep, d2.astype(hs_t.dtype)], axis=-1)
        ys = []
        for i, (layer, p) in enumerate(zip(self.layers, params_tuple)):
            y = self._layer_tp(layer, p, m, attr)
            ys.append(y)
            m = self._gate_apply(i, y, psels[i])
        return self._ksum(m * maskf), ys

    def _transpose_chain(self, wvals, psels, ms, yts, attr_t, mask_t, dagg,
                         dt):
        """Z-free transpose of the folded-GEMM message chain (shared by the
        residual and replay backwards).  ``ms[i]`` is layer i's input,
        ``yts[i]`` its pre-gate TP output; returns (dm_0, [dW trees]).

        Per layer i (last to first), with the row-scalar commuted onto the
        narrower dy (dya = dy·attr_c, shared between both GEMMs):

            dy_i  = vjp(gate_i, y_i)(dm_i)          (elementwise)
            dW'_c = m_i^T @ dya                     (MXU)
            dm   += dya @ W'_c^T                    (MXU)

        — no [R, C2·C1] z or dz ever materializes."""
        nlay = len(self.layers)
        dm = (self._rep_rows(dagg) * mask_t.astype(jnp.float32)).astype(dt)
        dws: List = [None] * nlay
        for i in range(nlay - 1, -1, -1):
            layer = self.layers[i]
            if layer.gate is not None:
                _, gvjp = jax.vjp(
                    functools.partial(self._gate_apply, i,
                                      psel=psels[i]), yts[i])
                dy = gvjp(dm)[0].astype(dt)
            else:
                dy = dm
            wf = wvals[i]["w_folded"].astype(dt)
            c2 = layer.tp.in2_dim
            c1 = wf.shape[-2] // c2  # padded row space under fpad
            dwb = []
            acc = None
            mi_t = None if self.dw_dotgen else ms[i].T
            for c in range(c2):
                dya = dy * attr_t[:, c : c + 1]
                if self.dw_dotgen:
                    dwb.append(jax.lax.dot_general(
                        ms[i], dya, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                else:
                    dwb.append(jnp.dot(
                        mi_t, dya, preferred_element_type=jnp.float32))
                t = jnp.dot(dya, wf[c * c1 : (c + 1) * c1].T,
                            preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            dws[i] = {"w_folded": jnp.concatenate(dwb, axis=0)
                      if c2 > 1 else dwb[0]}
            dm = acc.astype(dt)
        return dm, dws

    # ---- pallas plumbing ----

    def _specs(self, tile, f, a, wdefs):
        T, K = tile, self.k
        row = lambda i: (i, 0)
        fix = lambda i: (0, 0)
        data = [
            pl.BlockSpec((K, T, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),  # hs [K, N, F]
            pl.BlockSpec((T, f), row, memory_space=pltpu.VMEM),  # hr
            pl.BlockSpec((T, K * (a + 2)), row, memory_space=pltpu.VMEM),
        ]
        ws = [pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in wdefs]
        return data, ws

    def _geo_rows(self, geo_ref, geo_scr, tile, a):
        """[T, K*(a+2)] node-major geometry -> (d2, attr, mask) [K*T, ·].

        K lane slices staged through a VMEM scratch — the lane->sublane
        move as slot-major slice+store.  A direct sublane concat of the
        slices fails on hardware ("result/input offset mismatch on
        non-concat dimension": each slice's vector layout carries lane
        offset k·G mod 128, and tpu.concatenate requires equal offsets on
        the non-concat dim); store/load relayout handles the offset shift.
        Slot-major ordering is what lets this avoid the axis-inserting
        stack Mosaic also rejects (VERDICT.md r2 defect 1)."""
        g = geo_ref[:]
        G = a + 2
        if self.k == 1:
            rows = g
        else:
            for k in range(self.k):
                geo_scr[k * tile : (k + 1) * tile, :] = \
                    g[:, k * G : (k + 1) * G]
            rows = geo_scr[:]
        return rows[:, a : a + 1], rows[:, :a], rows[:, a + 1 : a + 2]

    def _psel_specs(self):
        fix = lambda i: (0, 0)
        return [pl.BlockSpec(p.shape, fix, memory_space=pltpu.VMEM)
                for p in self._psel_ops]

    def _fwd_call(self, params_tuple, hs, hr, geo2, save: bool = False):
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.tile
        assert n % tile == 0, (n, tile)
        assert hs.shape == (self.k, n, f), (hs.shape, (self.k, n, f))
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)
        nw, nps = len(flat), len(self._psel_ops)

        def kernel(*refs):
            hs_ref, hr_ref, geo_ref = refs[:3]
            w_refs = refs[3 : 3 + nw]
            psels = self._psel_list([r[:] for r in refs[3 + nw : 3 + nw + nps]])
            out_ref = refs[3 + nw + nps]
            y_refs = refs[4 + nw + nps : -1]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, refs[-1], tile, a)
            hs_t = self._assemble_hs(hs_ref)
            hr_rep = self._rep_rows(hr_ref[:])
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )
            if save:
                out, ys = self._message_stages(
                    wvals, hs_t, hr_rep, d2_t, attr_t, mask_t, psels=psels)
                for r, y in zip(y_refs, ys):
                    for k in range(self.k):
                        r[k] = y[k * tile : (k + 1) * tile].astype(r.dtype)
            else:
                out = self._message(
                    wvals, hs_t, hr_rep, d2_t, attr_t, mask_t, psels=psels)
            out_ref[:] = out.astype(out_ref.dtype)

        data_specs, w_specs = self._specs(tile, f, a, flat)
        w_specs = w_specs + self._psel_specs()
        od = self.out_dim
        out_specs = pl.BlockSpec((tile, od), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, od), hr.dtype)
        if save:
            dims = self._ydims
            out_specs = (out_specs,) + tuple(
                pl.BlockSpec((self.k, tile, d), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM) for d in dims)
            out_shape = (out_shape,) + tuple(
                jax.ShapeDtypeStruct((self.k, n, d), hr.dtype)
                for d in dims)
        res = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((self.k * tile, a + 2), hr.dtype)],
            compiler_params=_COMPILER_PARAMS,
            cost_estimate=_cost(self.k, n, flat, [hs, hr, geo2], [hr]),
        )(hs, hr, geo2, *flat, *self._psel_ops)
        if save:
            return res[0], list(res[1 : 1 + nlay])
        return res

    def _bwd_call(self, params_tuple, hs, hr, geo2, d_agg):
        """Fallback backward: in-kernel ``jax.vjp`` over the tile forward.

        The differentiated region uses slot-major expand *matmuls*
        (``_expand_matrix_km``) for the receiver repeat and the K-sum so
        that AD transposes them to matmuls — never to the pad/scatter ops
        slice-transposes would emit."""
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.bwd_tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nw, nps = len(flat), len(self._psel_ops)

        def kernel(*refs):
            hs_ref, hr_ref, geo_ref = refs[:3]
            w_refs = refs[3 : 3 + nw]
            psels = self._psel_list(
                [r[:] for r in refs[3 + nw : 3 + nw + nps]])
            dagg_ref = refs[3 + nw + nps]
            dhs_ref, dhr_ref = refs[4 + nw + nps : 6 + nw + nps]
            dw_refs = refs[6 + nw + nps : -1]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, refs[-1], tile, a)
            hs_t = self._assemble_hs(hs_ref)
            dt = hs_t.dtype
            E = _expand_matrix_km(tile, self.k, dt)
            Ef = E.astype(jnp.float32)
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )

            def ksum_mm(m):
                return jnp.dot(Ef.T, m.astype(jnp.float32),
                               preferred_element_type=jnp.float32)

            def fn(wv, hs_v, hr_t):
                hr_rep = jnp.dot(E, hr_t, preferred_element_type=jnp.float32
                                 ).astype(dt)
                return self._message(wv, hs_v, hr_rep, d2_t, attr_t, mask_t,
                                     ksum=ksum_mm, psels=psels)

            _, vjp = jax.vjp(fn, wvals, hs_t, hr_ref[:])
            d_w, d_hs, d_hr = vjp(dagg_ref[:].astype(jnp.float32))
            for k in range(self.k):
                dhs_ref[k] = d_hs[k * tile : (k + 1) * tile].astype(
                    dhs_ref.dtype)
            dhr_ref[:] = d_hr.astype(dhr_ref.dtype)
            dw_flat = jax.tree_util.tree_leaves(d_w)

            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                for r in dw_refs:
                    r[:] = jnp.zeros_like(r)

            for r, dw in zip(dw_refs, dw_flat):
                r[:] += dw.astype(r.dtype)

        data_specs, w_specs = self._specs(tile, f, a, flat)
        w_specs = w_specs + self._psel_specs()
        fix = lambda i: (0, 0)
        out_shapes = (
            jax.ShapeDtypeStruct(hs.shape, hs.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((self.k, tile, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in flat
        )
        dagg_spec = [pl.BlockSpec((tile, self.out_dim), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs + dagg_spec,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((self.k * tile, a + 2), hr.dtype)],
            compiler_params=_COMPILER_PARAMS,
            cost_estimate=_cost(self.k, n, flat, [hs, hr, geo2, d_agg],
                                [hs, hr], scale=3),
        )(hs, hr, geo2, *flat, *self._psel_ops, d_agg)
        dhs, dhr = outs[0], outs[1]
        dw_flat = [
            d.astype(w.dtype) for d, w in zip(outs[2:], flat)
        ]
        d_params = jax.tree_util.tree_unflatten(treedef, dw_flat)
        return d_params, dhs, dhr

    def _bwd_call_rep(self, params_tuple, hs, hr, geo2, d_agg):
        """Replay backward: rebuild the pre-gate ys with a hand-structured
        in-kernel forward (z-free narrow GEMMs, slot-major slice/concat
        machinery), then run the shared ``_transpose_chain`` — no saved-y
        residual streams (the [K, N, D] per-message-layer HBM footprint the
        ``remat_kernel`` 1M-point mode exists to avoid), and no ``jax.vjp``
        (whose differentiated repeat/K-sum must be dense 0/1 expand matmuls
        — ``_expand_matrix_km`` — to stay Mosaic-lowerable)."""
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.bwd_tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)
        nw, nps = len(flat), len(self._psel_ops)

        def kernel(*refs):
            hs_ref, hr_ref, geo_ref = refs[:3]
            w_refs = refs[3 : 3 + nw]
            psels = self._psel_list(
                [r[:] for r in refs[3 + nw : 3 + nw + nps]])
            dagg_ref = refs[3 + nw + nps]
            dhs_ref, dhr_ref = refs[4 + nw + nps : 6 + nw + nps]
            dw_refs = refs[6 + nw + nps : -1]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, refs[-1], tile, a)
            hs_t = self._assemble_hs(hs_ref)
            dt = hs_t.dtype
            hr_rep = self._rep_rows(hr_ref[:])
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )
            # forward replay: layer inputs m_i and pre-gate TP outputs y_i
            m = jnp.concatenate([hs_t, hr_rep, d2_t.astype(dt)], axis=-1)
            ms, yts = [m], []
            for i, (layer, p) in enumerate(zip(self.layers, wvals)):
                y = self._layer_tp(layer, p, m, attr_t)
                yts.append(y)
                if i < nlay - 1:
                    m = self._gate_apply(i, y, psels[i])
                    ms.append(m)

            dagg = dagg_ref[:].astype(jnp.float32)
            dm, dws = self._transpose_chain(
                wvals, psels, ms, yts, attr_t, mask_t, dagg, dt)
            for k in range(self.k):
                dhs_ref[k] = dm[k * tile : (k + 1) * tile, :f].astype(
                    dhs_ref.dtype)
            dhr_ref[:] = self._ksum(dm[:, f : 2 * f]).astype(dhr_ref.dtype)

            i0 = pl.program_id(0)

            @pl.when(i0 == 0)
            def _():
                for r in dw_refs:
                    r[:] = jnp.zeros_like(r)

            for r, dwv in zip(dw_refs,
                              jax.tree_util.tree_leaves(tuple(dws))):
                r[:] += dwv.astype(r.dtype)

        data_specs, w_specs = self._specs(tile, f, a, flat)
        w_specs = w_specs + self._psel_specs()
        fix = lambda i: (0, 0)
        dagg_spec = [pl.BlockSpec((tile, self.out_dim), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = (
            jax.ShapeDtypeStruct(hs.shape, hs.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((self.k, tile, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in flat
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs + dagg_spec,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((self.k * tile, a + 2), hr.dtype)],
            compiler_params=_COMPILER_PARAMS,
            cost_estimate=_cost(self.k, n, flat, [hs, hr, geo2, d_agg],
                                [hs, hr], scale=3),
        )(hs, hr, geo2, *flat, *self._psel_ops, d_agg)
        dhs, dhr = outs[0], outs[1]
        dw_flat = [d.astype(w.dtype) for d, w in zip(outs[2:], flat)]
        d_params = jax.tree_util.tree_unflatten(treedef, dw_flat)
        return d_params, dhs, dhr

    def _bwd_call_res(self, params_tuple, hs, hr, geo2, ys, d_agg):
        """Hand-structured backward from saved pre-gate residuals.

        Transpose of the folded-GEMM message chain WITHOUT replaying the
        forward GEMMs: per layer i (last to first), with ``y_i`` saved and
        the layer input ``m_{i-1}`` reconstructed cheaply (``m_0`` is a
        concat of kernel inputs; ``m_i = gate(y_i)`` is elementwise),

            dy_i  = vjp(gate_i, y_i)(dm_i)        (elementwise)
            dW'_i = z_i^T @ dy_i                  (MXU; z_i = outer(m_{i-1},
                                                   attr) rebuilt by lane
                                                   multiplies — too big to
                                                   save, cheap to rebuild)
            dz_i  = dy_i @ W'_i^T                 (MXU)
            dm_{i-1} = Σ_c dz_i[:, cC1:(c+1)C1] · attr[:, c]   (lanes)

        The repeat/K-sum transposes outside the GEMM chain are the
        slot-major slice/concat forms (dm_0 seed = concat([dagg]*K)·mask;
        dhr = slot sum) — no expand matmuls anywhere.

        Geometry (d², attr, mask) gets no gradient, matching the fallback
        backward (positions are inputs, not trained).
        """
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.bwd_tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)
        nw, nps = len(flat), len(self._psel_ops)

        def kernel(*refs):
            hs_ref, hr_ref, geo_ref = refs[:3]
            w_refs = refs[3 : 3 + nw]
            psels = self._psel_list(
                [r[:] for r in refs[3 + nw : 3 + nw + nps]])
            y_refs = refs[3 + nw + nps : 3 + nw + nps + nlay]
            dagg_ref = refs[3 + nw + nps + nlay]
            dhs_ref, dhr_ref = refs[4 + nw + nps + nlay : 6 + nw + nps + nlay]
            dw_refs = refs[6 + nw + nps + nlay : -1]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, refs[-1], tile, a)
            hs_t = self._assemble_hs(hs_ref)
            dt = hs_t.dtype
            hr_rep = self._rep_rows(hr_ref[:])
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )
            yts = [self._assemble_hs(r) for r in y_refs]
            # stage inputs: m_0 from kernel operands, m_i = gate(y_i)
            ms = [jnp.concatenate(
                [hs_t, hr_rep, d2_t.astype(dt)], axis=-1)]
            for i, y in enumerate(yts[:-1]):
                ms.append(self._gate_apply(i, y, psels[i]))

            dagg = dagg_ref[:].astype(jnp.float32)
            dm, dws = self._transpose_chain(
                wvals, psels, ms, yts, attr_t, mask_t, dagg, dt)
            # dm == dm_0 over [hs ‖ hr_rep ‖ d2], slot-major rows
            for k in range(self.k):
                dhs_ref[k] = dm[k * tile : (k + 1) * tile, :f].astype(
                    dhs_ref.dtype)
            dhr_ref[:] = self._ksum(dm[:, f : 2 * f]).astype(dhr_ref.dtype)

            i0 = pl.program_id(0)

            @pl.when(i0 == 0)
            def _():
                for r in dw_refs:
                    r[:] = jnp.zeros_like(r)

            for r, dwv in zip(dw_refs, jax.tree_util.tree_leaves(tuple(dws))):
                r[:] += dwv.astype(r.dtype)

        data_specs, w_specs = self._specs(tile, f, a, flat)
        w_specs = w_specs + self._psel_specs()
        fix = lambda i: (0, 0)
        y_specs = [pl.BlockSpec((self.k, tile, d), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM) for d in self._ydims]
        dagg_spec = [pl.BlockSpec((tile, self.out_dim), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = (
            jax.ShapeDtypeStruct(hs.shape, hs.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((self.k, tile, f), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in flat
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs + y_specs + dagg_spec,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((self.k * tile, a + 2), hr.dtype)],
            compiler_params=_COMPILER_PARAMS,
            cost_estimate=_cost(self.k, n, flat,
                                [hs, hr, geo2, d_agg] + list(ys),
                                [hs, hr], scale=2),
        )(hs, hr, geo2, *flat, *self._psel_ops, *ys, d_agg)
        dhs, dhr = outs[0], outs[1]
        dw_flat = [d.astype(w.dtype) for d, w in zip(outs[2:], flat)]
        d_params = jax.tree_util.tree_unflatten(treedef, dw_flat)
        return d_params, dhs, dhr

    # ---- tabled variants (compact per-tile sender tables) ----

    def _tab_specs(self, tile, f, a, u, wdefs):
        T, K = tile, self.k
        row = lambda i: (i, 0)
        fix = lambda i: (0, 0)
        data = [
            pl.BlockSpec((u, f), row, memory_space=pltpu.VMEM),   # hu
            pl.BlockSpec((T, K), row, memory_space=pltpu.VMEM),   # loc
            pl.BlockSpec((T, f), row, memory_space=pltpu.VMEM),   # hr
            pl.BlockSpec((T, K * (a + 2)), row, memory_space=pltpu.VMEM),
        ]
        ws = [pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM)
              for w in wdefs]
        return data, ws

    def _tab_dims(self, hu, hr, geo2, loc):
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.tile
        assert n % tile == 0, (n, tile)
        ntiles = n // tile
        assert hu.shape[0] % ntiles == 0, (hu.shape, ntiles)
        u = hu.shape[0] // ntiles
        assert loc.shape == (n, self.k), (loc.shape, (n, self.k))
        return n, f, a, tile, u

    def _fwd_call_tab(self, params_tuple, hu, hr, geo2, loc,
                      save: bool = False):
        """Tabled forward: sender rows expand from the per-tile compact
        table block on the MXU (``_expand_hu``); everything downstream is
        the standard slot-major tile computation."""
        n, f, a, tile, u = self._tab_dims(hu, hr, geo2, loc)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)
        nw, nps = len(flat), len(self._psel_ops)

        def kernel(*refs):
            hu_ref, loc_ref, hr_ref, geo_ref = refs[:4]
            w_refs = refs[4 : 4 + nw]
            psels = self._psel_list(
                [r[:] for r in refs[4 + nw : 4 + nw + nps]])
            out_ref = refs[4 + nw + nps]
            y_refs = refs[5 + nw + nps : -1]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, refs[-1], tile, a)
            hs_t, _ = self._expand_hu(hu_ref[:], loc_ref[:], tile)
            hr_rep = self._rep_rows(hr_ref[:])
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs])
            if save:
                out, ys = self._message_stages(
                    wvals, hs_t, hr_rep, d2_t, attr_t, mask_t, psels=psels)
                for r, y in zip(y_refs, ys):
                    for k in range(self.k):
                        r[k] = y[k * tile : (k + 1) * tile].astype(r.dtype)
            else:
                out = self._message(
                    wvals, hs_t, hr_rep, d2_t, attr_t, mask_t, psels=psels)
            out_ref[:] = out.astype(out_ref.dtype)

        data_specs, w_specs = self._tab_specs(tile, f, a, u, flat)
        w_specs = w_specs + self._psel_specs()
        od = self.out_dim
        out_specs = pl.BlockSpec((tile, od), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, od), hr.dtype)
        if save:
            dims = self._ydims
            out_specs = (out_specs,) + tuple(
                pl.BlockSpec((self.k, tile, d), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM) for d in dims)
            out_shape = (out_shape,) + tuple(
                jax.ShapeDtypeStruct((self.k, n, d), hr.dtype)
                for d in dims)
        res = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((self.k * tile, a + 2), hr.dtype)],
            compiler_params=_COMPILER_PARAMS,
            cost_estimate=_cost(self.k, n, flat, [hu, hr, geo2], [hr]),
        )(hu, loc, hr, geo2, *flat, *self._psel_ops)
        if save:
            return res[0], list(res[1 : 1 + nlay])
        return res

    def _bwd_call_res_tab(self, params_tuple, hu, hr, geo2, loc, ys, d_agg):
        """Tabled residual backward: the z-free transpose chain from saved
        pre-gate ys, with the sender cotangent collapsed to the compact
        per-tile table block in-kernel (``onehot^T @ dm`` — exact 0/1 MXU
        transpose; within-tile duplicate senders accumulate in fp32)."""
        n, f, a, tile, u = self._tab_dims(hu, hr, geo2, loc)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)
        nw, nps = len(flat), len(self._psel_ops)

        def kernel(*refs):
            hu_ref, loc_ref, hr_ref, geo_ref = refs[:4]
            w_refs = refs[4 : 4 + nw]
            psels = self._psel_list(
                [r[:] for r in refs[4 + nw : 4 + nw + nps]])
            y_refs = refs[4 + nw + nps : 4 + nw + nps + nlay]
            dagg_ref = refs[4 + nw + nps + nlay]
            dhu_ref, dhr_ref = refs[5 + nw + nps + nlay : 7 + nw + nps + nlay]
            dw_refs = refs[7 + nw + nps + nlay : -1]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, refs[-1], tile, a)
            hs_t, onehot = self._expand_hu(hu_ref[:], loc_ref[:], tile)
            dt = hs_t.dtype
            hr_rep = self._rep_rows(hr_ref[:])
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs])
            yts = [self._assemble_hs(r) for r in y_refs]
            ms = [jnp.concatenate(
                [hs_t, hr_rep, d2_t.astype(dt)], axis=-1)]
            for i, y in enumerate(yts[:-1]):
                ms.append(self._gate_apply(i, y, psels[i]))

            dagg = dagg_ref[:].astype(jnp.float32)
            dm, dws = self._transpose_chain(
                wvals, psels, ms, yts, attr_t, mask_t, dagg, dt)
            dhu_ref[:] = jax.lax.dot_general(
                onehot, dm[:, :f], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dhu_ref.dtype)
            dhr_ref[:] = self._ksum(dm[:, f : 2 * f]).astype(dhr_ref.dtype)

            i0 = pl.program_id(0)

            @pl.when(i0 == 0)
            def _():
                for r in dw_refs:
                    r[:] = jnp.zeros_like(r)

            for r, dwv in zip(dw_refs, jax.tree_util.tree_leaves(tuple(dws))):
                r[:] += dwv.astype(r.dtype)

        data_specs, w_specs = self._tab_specs(tile, f, a, u, flat)
        w_specs = w_specs + self._psel_specs()
        fix = lambda i: (0, 0)
        y_specs = [pl.BlockSpec((self.k, tile, d), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM) for d in self._ydims]
        dagg_spec = [pl.BlockSpec((tile, self.out_dim), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = (
            jax.ShapeDtypeStruct(hu.shape, hu.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((u, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in flat
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs + y_specs + dagg_spec,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((self.k * tile, a + 2), hr.dtype)],
            compiler_params=_COMPILER_PARAMS,
            cost_estimate=_cost(self.k, n, flat,
                                [hu, hr, geo2, d_agg] + list(ys),
                                [hu, hr], scale=2),
        )(hu, loc, hr, geo2, *flat, *self._psel_ops, *ys, d_agg)
        d_hu, dhr = outs[0], outs[1]
        dw_flat = [d.astype(w.dtype) for d, w in zip(outs[2:], flat)]
        d_params = jax.tree_util.tree_unflatten(treedef, dw_flat)
        return d_params, d_hu, dhr

    def _bwd_call_rep_tab(self, params_tuple, hu, hr, geo2, loc, d_agg):
        """Tabled replay backward: rebuild the pre-gate ys in-kernel (no
        saved residual streams — the remat_kernel mode), then the z-free
        transpose chain with the compact sender-cotangent collapse."""
        n, f, a, tile, u = self._tab_dims(hu, hr, geo2, loc)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)
        nw, nps = len(flat), len(self._psel_ops)

        def kernel(*refs):
            hu_ref, loc_ref, hr_ref, geo_ref = refs[:4]
            w_refs = refs[4 : 4 + nw]
            psels = self._psel_list(
                [r[:] for r in refs[4 + nw : 4 + nw + nps]])
            dagg_ref = refs[4 + nw + nps]
            dhu_ref, dhr_ref = refs[5 + nw + nps : 7 + nw + nps]
            dw_refs = refs[7 + nw + nps : -1]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, refs[-1], tile, a)
            hs_t, onehot = self._expand_hu(hu_ref[:], loc_ref[:], tile)
            dt = hs_t.dtype
            hr_rep = self._rep_rows(hr_ref[:])
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs])
            m = jnp.concatenate([hs_t, hr_rep, d2_t.astype(dt)], axis=-1)
            ms, yts = [m], []
            for i, (layer, p) in enumerate(zip(self.layers, wvals)):
                y = self._layer_tp(layer, p, m, attr_t)
                yts.append(y)
                if i < nlay - 1:
                    m = self._gate_apply(i, y, psels[i])
                    ms.append(m)

            dagg = dagg_ref[:].astype(jnp.float32)
            dm, dws = self._transpose_chain(
                wvals, psels, ms, yts, attr_t, mask_t, dagg, dt)
            dhu_ref[:] = jax.lax.dot_general(
                onehot, dm[:, :f], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dhu_ref.dtype)
            dhr_ref[:] = self._ksum(dm[:, f : 2 * f]).astype(dhr_ref.dtype)

            i0 = pl.program_id(0)

            @pl.when(i0 == 0)
            def _():
                for r in dw_refs:
                    r[:] = jnp.zeros_like(r)

            for r, dwv in zip(dw_refs, jax.tree_util.tree_leaves(tuple(dws))):
                r[:] += dwv.astype(r.dtype)

        data_specs, w_specs = self._tab_specs(tile, f, a, u, flat)
        w_specs = w_specs + self._psel_specs()
        fix = lambda i: (0, 0)
        dagg_spec = [pl.BlockSpec((tile, self.out_dim), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = (
            jax.ShapeDtypeStruct(hu.shape, hu.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((u, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in flat
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs + dagg_spec,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((self.k * tile, a + 2), hr.dtype)],
            compiler_params=_COMPILER_PARAMS,
            cost_estimate=_cost(self.k, n, flat, [hu, hr, geo2, d_agg],
                                [hu, hr], scale=3),
        )(hu, loc, hr, geo2, *flat, *self._psel_ops, d_agg)
        d_hu, dhr = outs[0], outs[1]
        dw_flat = [d.astype(w.dtype) for d, w in zip(outs[2:], flat)]
        d_params = jax.tree_util.tree_unflatten(treedef, dw_flat)
        return d_params, d_hu, dhr

    # ---- public entry ----

    def _fold(self, params_tuple):
        """Pre-fold CG-GEMM weights OUTSIDE the kernel (fold_params captures
        constant index arrays that must not be closed over in a kernel body);
        the fold is jnp-traceable, so ordinary AD transposes it — the
        custom_vjp boundary sits on the folded tree.

        Fast-gate layers additionally get their folded columns permuted to
        ``scalars ‖ gated ‖ gates`` (Gate.fast_tables) so the in-kernel gate
        is a slice + σ-matmul with no lane relayouts; the permutation is a
        weight-side gather AD transposes outside the kernel."""
        out = []
        for i, (layer, p) in enumerate(zip(self.layers, params_tuple)):
            tp = layer.tp
            if getattr(tp, "_gemm_default", lambda: False)():
                fp = tp.fold_params(p)
                wf = fp["w_folded"]
                if self._gate_fast[i] is not None:
                    wf = wf[:, self._gate_fast[i][0]]
                if self.fpad or self.colpad:
                    # column-pad outputs to the lane tile (aligned saved-y
                    # DMA; the pad columns stay exactly zero), and under
                    # fpad additionally scatter the first layer's rows into
                    # the padded [hs(fpad) | hr(fpad) | d2] input space
                    c2, d = tp.in2_dim, wf.shape[-1]
                    dp = self._ydims[i]
                    wf = jnp.pad(wf, ((0, 0), (0, dp - d)))
                    if self.fpad and i == 0:
                        c1 = tp.in1_dim
                        wf = jnp.zeros(
                            (c2, self._c1p_first, dp), wf.dtype
                        ).at[:, self._row_embed].set(
                            wf.reshape(c2, c1, dp)
                        ).reshape(c2 * self._c1p_first, dp)
                fp = {**fp, "w_folded": wf}
                out.append(fp)
            else:
                out.append(p)
        return tuple(out)

    def __call__(self, params_tuple, hs, hr, d2, attr, maskf):
        """agg [N, F] = Σ_k mask · MLP(h_s ‖ h_r ‖ d², attr).

        hs [K, N, F] slot-major gathered sender features (cm layout —
        ``h[senders.T]``); hr [N, F]; d2/maskf [N*K, 1] node-major flat;
        attr [N*K, A] (repacked node-major here — the dispatch-path entry
        is ``geo_call``).  N must divide by ``tile`` and ``bwd_tile``.
        """
        n, f = hr.shape
        a = attr.shape[-1]
        dt = hs.dtype
        geo2 = jnp.concatenate(
            [attr.astype(dt).reshape(n, self.k, a),
             d2.astype(dt).reshape(n, self.k, 1),
             maskf.astype(dt).reshape(n, self.k, 1)], axis=-1,
        ).reshape(n, self.k * (a + 2))
        return self.geo_call(params_tuple, hs, hr, geo2)

    def geo_call(self, params_tuple, hs, hr, geo2):
        """Dispatch entry: hs [K, N, F] slot-major, hr [N, F], geo2
        [N, K*(A+2)] node-major packed geometry (attr ‖ d2 ‖ mask per
        slot)."""
        return self._call(self._fold(params_tuple), hs, hr, geo2)

    def geo_call_sym(self, params_tuple, h, geo2, senders, reverse_slot):
        """Symmetric-graph entry with the sender gather INSIDE the
        custom_vjp: residuals are node-sized only (the backward regathers
        hs and runs the replay kernel; sender grads return via the
        reverse-slot gather-sum).  Requires ``replay_bwd`` (folded layers)
        and a symmetrized fixed-K graph (graph.radius.symmetrize_dense)."""
        assert self.replay_bwd, "geo_call_sym needs the replay backward"
        return self._call_sym(self._fold(params_tuple), h, geo2, senders,
                              reverse_slot)

    def geo_call_tab(self, params_tuple, h, geo2, loc, tab, rev_dense,
                     rem_pos, rem_node):
        """Tabled entry (graph.container.with_gather_tables, built at
        ``tile == self.tile``): compact per-tile sender gather + in-kernel
        one-hot expand; sender gradients via the split reverse table.
        ``tab`` may be [ntiles, U] or flat [ntiles*U]."""
        assert self.residual_bwd or self.replay_bwd, \
            "geo_call_tab needs a hand-structured backward (folded layers)"
        return self._call_tab(self._fold(params_tuple), h, geo2, loc,
                              tab.reshape(-1), rev_dense, rem_pos, rem_node)
