"""Generic fused Pallas message kernel: any-lmax steerable message MLP + K-sum.

The lmax=1 kernel (fused_message.py) hand-specializes the SEGNN hidden
``Hs x0e + Hv x1o``; this module fuses the *generic* message pass — any
hidden irreps, any attr order (the lmax=2 configs, BASELINE.json:10) — by
running the existing jnp building blocks (``ops.tensor_product.TensorProduct``
+ ``ops.gate.Gate`` via ``O3TensorProductGate``) *inside* a Pallas kernel
body on VMEM-resident edge tiles.  Those modules are written in 2-D
component-major ('cm') form precisely so they lower through Mosaic.

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
  gradients, at the cost of an in-kernel forward replay.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedMessageGeneric"]

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _expand_matrix(T, K, dtype):
    """[T*K, T] 0/1 matrix: E @ x repeats rows K times; E.T @ m sums groups."""
    R = T * K
    grp = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0) // K
    tgt = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
    return (grp == tgt).astype(dtype)


def _expand_geo(geo_block, T, K, G):
    """Node-major geometry [T, K*G] -> per-edge-slot rows [R=T*K, G].

    The geometry streams ride ONE lane-dense [N, K*G] operand: separate
    [R, 1] operands/residuals are lane-padded to 128 in HBM (128x
    memory/DMA — 3.8 GB per piece at 1M points/K=16), and packing geometry
    into the hs stream costs a full [R, F+G] concat round trip per layer.
    Mosaic cannot reshape lanes into sublanes, so the expansion runs as
    E-expand (MXU) + slot mask + a group-sum matmul."""
    R = T * K
    dt = geo_block.dtype
    E = _expand_matrix(T, K, dt)
    rep = jnp.dot(E, geo_block, preferred_element_type=jnp.float32)  # [R, K*G]
    slot = jax.lax.broadcasted_iota(jnp.int32, (R, K * G), 0) % K
    col = jax.lax.broadcasted_iota(jnp.int32, (R, K * G), 1) // G
    masked = jnp.where(slot == col, rep, 0.0).astype(dt)
    gi = jax.lax.broadcasted_iota(jnp.int32, (K * G, G), 0) % G
    gj = jax.lax.broadcasted_iota(jnp.int32, (K * G, G), 1)
    summer = (gi == gj).astype(dt)
    return jnp.dot(masked, summer, preferred_element_type=jnp.float32).astype(dt)


class FusedMessageGeneric:
    """Fused message MLP + masked K-slot aggregation for one SEGNN layer.

    ``layers``: the list of O3TensorProductGate message layers (static
    objects; their ``__call__`` must be 2-D/'cm'-layout — i.e. built with
    ``layout_in='cm', layout_out='cm'`` and a generic ``TensorProduct``).
    Parameters stay a pytree (tuple of per-layer dicts) and gradients flow
    through a custom_vjp whose backward is an in-kernel ``jax.vjp``.
    """

    def __init__(self, layers: Sequence, k: int, tile: int = 16,
                 bwd_tile: int = 0, residual_bwd: bool = True) -> None:
        self.layers = list(layers)
        self.k = k
        self.tile = tile
        self.bwd_tile = bwd_tile or max(tile // 2, 8)
        # residual-saving backward requires every layer to be on the folded-
        # GEMM TP path (hand-transposable) with the standard tp+gate shape
        self.residual_bwd = residual_bwd and all(
            hasattr(l, "tp")
            and getattr(l.tp, "_gemm_default", lambda: False)()
            for l in layers
        )

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
            else:
                d_params, dhs, dhr = self._bwd_call(
                    params_tuple, hs, hr, geo2, d_agg
                )
            return (d_params, dhs, dhr, jnp.zeros_like(geo2))

        self._call = jax.custom_vjp(call)
        self._call.defvjp(call_fwd, call_bwd)

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
        c1, c2 = layer.tp.in1_dim, layer.tp.in2_dim
        wf = p["w_folded"].astype(m.dtype)
        acc = None
        for c in range(c2):
            t = jnp.dot(m * attr[:, c : c + 1], wf[c * c1 : (c + 1) * c1],
                        preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        return acc.astype(m.dtype)

    def _rep_rows(self, x):
        """[T, F] -> [T*K, F] node-row repeat per edge slot.

        broadcast + leading-dims collapse — lowers in Mosaic ([T, K, F] ->
        [T*K, F] keeps the lane dim) and replaces the dense E @ x expand
        matmul, whose T*R*F MACs per tile were most of the ~11 ms "machinery
        floor" (tools/exp_generic_breakdown.py null/null_rs variants)."""
        t, f = x.shape
        return jnp.broadcast_to(
            x[:, None, :], (t, self.k, f)).reshape(t * self.k, f)

    def _ksum(self, m):
        """[T*K, F] -> [T, F] per-node slot sum (fp32), transpose of
        ``_rep_rows`` — replaces the E.T @ m group-sum matmul."""
        r, f = m.shape
        return m.astype(jnp.float32).reshape(r // self.k, self.k, f).sum(
            axis=1)

    def _message(self, params_tuple, hs_t, hr_rep, d2, attr, maskf):
        m = jnp.concatenate([hs_t, hr_rep, d2.astype(hs_t.dtype)], axis=-1)
        for layer, p in zip(self.layers, params_tuple):
            y = self._layer_tp(layer, p, m, attr)
            m = layer.gate(y) if getattr(layer, "gate", None) is not None \
                else y
        return self._ksum(m * maskf)

    def _message_stages(self, params_tuple, hs_t, hr_rep, d2, attr, maskf):
        """Same as ``_message`` but also returns the pre-gate TP outputs
        ``y_i`` per layer — the residuals the hand-structured backward needs
        (everything else is reconstructible with cheap elementwise work)."""
        m = jnp.concatenate([hs_t, hr_rep, d2.astype(hs_t.dtype)], axis=-1)
        ys = []
        for layer, p in zip(self.layers, params_tuple):
            y = self._layer_tp(layer, p, m, attr)
            ys.append(y)
            m = layer.gate(y) if layer.gate is not None else y
        return self._ksum(m * maskf), ys

    @staticmethod
    def _build_z(m, attr, c2):
        """outer(m, attr) in the folded-GEMM c2-major layout
        (ops/tensor_product.py:_call_gemm) — C2 lane-wide multiplies."""
        cols = [m * attr[:, c : c + 1] for c in range(c2)]
        return jnp.concatenate(cols, axis=-1) if c2 > 1 else cols[0]

    # ---- pallas plumbing ----

    def _specs(self, tile, f, a, wdefs):
        T, K = tile, self.k
        row = lambda i: (i, 0)
        fix = lambda i: (0, 0)
        data = [
            pl.BlockSpec((T * K, f), row, memory_space=pltpu.VMEM),  # hs
            pl.BlockSpec((T, f), row, memory_space=pltpu.VMEM),  # hr
            pl.BlockSpec((T, K * (a + 2)), row, memory_space=pltpu.VMEM),
        ]
        ws = [pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in wdefs]
        return data, ws

    def _geo_rows(self, geo_ref, tile, a):
        """[T, K*(a+2)] node-major geometry -> (d2, attr, mask) [R, ·].

        K lane slices stacked on a new middle axis and collapsed — the
        lane->sublane move Mosaic cannot do as one reshape is legal as
        slice+stack; this replaces the E-expand + slot-mask + group-sum
        matmul machinery (_expand_geo, kept for the XLA-path callers)."""
        g = geo_ref[:]
        G = a + 2
        parts = [g[:, k * G : (k + 1) * G] for k in range(self.k)]
        rows = jnp.stack(parts, axis=1).reshape(tile * self.k, G)
        return rows[:, a : a + 1], rows[:, :a], rows[:, a + 1 : a + 2]

    def _fwd_call(self, params_tuple, hs, hr, geo2, save: bool = False):
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)

        def kernel(*refs):
            hs_ref, hr_ref, geo_ref = refs[:3]
            w_refs = refs[3 : 3 + len(flat)]
            out_ref = refs[3 + len(flat)]
            y_refs = refs[4 + len(flat) :]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, tile, a)
            hs_t = hs_ref[:]
            hr_rep = self._rep_rows(hr_ref[:])
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )
            if save:
                out, ys = self._message_stages(
                    wvals, hs_t, hr_rep, d2_t, attr_t, mask_t)
                for r, y in zip(y_refs, ys):
                    r[:] = y.astype(r.dtype)
            else:
                out = self._message(
                    wvals, hs_t, hr_rep, d2_t, attr_t, mask_t)
            out_ref[:] = out.astype(out_ref.dtype)

        data_specs, w_specs = self._specs(tile, f, a, flat)
        out_specs = pl.BlockSpec((tile, f), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n, f), hr.dtype)
        if save:
            dims = [l.tp.out_dim for l in self.layers]
            out_specs = (out_specs,) + tuple(
                pl.BlockSpec((tile * self.k, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) for d in dims)
            out_shape = (out_shape,) + tuple(
                jax.ShapeDtypeStruct((n * self.k, d), hr.dtype)
                for d in dims)
        res = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=_COMPILER_PARAMS,
        )(hs, hr, geo2, *flat)
        if save:
            return res[0], list(res[1 : 1 + nlay])
        return res

    def _bwd_call(self, params_tuple, hs, hr, geo2, d_agg):
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.bwd_tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)

        def kernel(*refs):
            hs_ref, hr_ref, geo_ref = refs[:3]
            w_refs = refs[3 : 3 + len(flat)]
            dagg_ref = refs[3 + len(flat)]
            dhs_ref, dhr_ref = refs[4 + len(flat) : 6 + len(flat)]
            dw_refs = refs[6 + len(flat) :]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, tile, a)
            hs_t = hs_ref[:]
            dt = hs_t.dtype
            E = _expand_matrix(tile, self.k, dt)
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )

            def fn(wv, hs_v, hr_t):
                hr_rep = jnp.dot(E, hr_t, preferred_element_type=jnp.float32
                                 ).astype(dt)
                return self._message(wv, hs_v, hr_rep, d2_t, attr_t, mask_t, E)

            _, vjp = jax.vjp(fn, wvals, hs_t, hr_ref[:])
            d_w, d_hs, d_hr = vjp(dagg_ref[:].astype(jnp.float32))
            dhs_ref[:] = d_hs.astype(dhs_ref.dtype)
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
        fix = lambda i: (0, 0)
        out_shapes = (
            jax.ShapeDtypeStruct(hs.shape, hs.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((tile * self.k, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in flat
        )
        dagg_spec = [pl.BlockSpec((tile, f), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        outs = pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs + dagg_spec,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=_COMPILER_PARAMS,
        )(hs, hr, geo2, *flat, d_agg)
        dhs, dhr = outs[0], outs[1]
        dw_flat = [
            d.astype(w.dtype) for d, w in zip(outs[2:], flat)
        ]
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

        Geometry (d², attr, mask) gets no gradient, matching the fallback
        backward (positions are inputs, not trained).
        """
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.bwd_tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)
        nlay = len(self.layers)
        nw = len(flat)

        def kernel(*refs):
            hs_ref, hr_ref, geo_ref = refs[:3]
            w_refs = refs[3 : 3 + nw]
            y_refs = refs[3 + nw : 3 + nw + nlay]
            dagg_ref = refs[3 + nw + nlay]
            dhs_ref, dhr_ref = refs[4 + nw + nlay : 6 + nw + nlay]
            dw_refs = refs[6 + nw + nlay :]
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, tile, a)
            hs_t = hs_ref[:]
            dt = hs_t.dtype
            E = _expand_matrix(tile, self.k, dt)
            hr_rep = jnp.dot(E, hr_ref[:], preferred_element_type=jnp.float32
                             ).astype(dt)
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )
            yts = [r[:] for r in y_refs]
            # stage inputs: m_0 from kernel operands, m_i = gate(y_i)
            ms = [jnp.concatenate(
                [hs_t, hr_rep, d2_t.astype(dt)], axis=-1)]
            for layer, y in zip(self.layers[:-1], yts[:-1]):
                ms.append(layer.gate(y) if layer.gate is not None else y)

            dagg = dagg_ref[:].astype(jnp.float32)
            dm = (jnp.dot(E, dagg, preferred_element_type=jnp.float32)
                  * mask_t.astype(jnp.float32)).astype(dt)
            dws: List = [None] * nlay
            for i in range(nlay - 1, -1, -1):
                layer = self.layers[i]
                if layer.gate is not None:
                    _, gvjp = jax.vjp(layer.gate, yts[i])
                    dy = gvjp(dm)[0].astype(dt)
                else:
                    dy = dm
                # z-free transpose: per attr component c,
                #   dW'_c = (m·attr_c)^T @ dy   and   dm += (dy @ W'_c^T)·attr_c
                # — no [R, C2·C1] z or dz ever materializes (same win as the
                # forward's _layer_tp form)
                wf = wvals[i]["w_folded"].astype(dt)
                c1, c2 = layer.tp.in1_dim, layer.tp.in2_dim
                dwb = []
                acc = None
                for c in range(c2):
                    mc = ms[i] * attr_t[:, c : c + 1]
                    dwb.append(jnp.dot(
                        mc.T, dy, preferred_element_type=jnp.float32))
                    t = (jnp.dot(dy, wf[c * c1 : (c + 1) * c1].T,
                                 preferred_element_type=jnp.float32)
                         * attr_t[:, c : c + 1].astype(jnp.float32))
                    acc = t if acc is None else acc + t
                dws[i] = {"w_folded": jnp.concatenate(dwb, axis=0)
                          if c2 > 1 else dwb[0]}
                dm = acc.astype(dt)
            # dm == dm_0 over [hs ‖ hr_rep ‖ d2]
            dhs_ref[:] = dm[:, :f].astype(dhs_ref.dtype)
            dhr_ref[:] = jnp.dot(
                E.T, dm[:, f : 2 * f].astype(jnp.float32),
                preferred_element_type=jnp.float32).astype(dhr_ref.dtype)

            i0 = pl.program_id(0)

            @pl.when(i0 == 0)
            def _():
                for r in dw_refs:
                    r[:] = jnp.zeros_like(r)

            for r, dwv in zip(dw_refs, jax.tree_util.tree_leaves(tuple(dws))):
                r[:] += dwv.astype(r.dtype)

        data_specs, w_specs = self._specs(tile, f, a, flat)
        fix = lambda i: (0, 0)
        dims = [l.tp.out_dim for l in self.layers]
        y_specs = [pl.BlockSpec((tile * self.k, d), lambda i: (i, 0),
                                memory_space=pltpu.VMEM) for d in dims]
        dagg_spec = [pl.BlockSpec((tile, f), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = (
            jax.ShapeDtypeStruct(hs.shape, hs.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((tile * self.k, f), lambda i: (i, 0),
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
            compiler_params=_COMPILER_PARAMS,
        )(hs, hr, geo2, *flat, *ys, d_agg)
        dhs, dhr = outs[0], outs[1]
        dw_flat = [d.astype(w.dtype) for d, w in zip(outs[2:], flat)]
        d_params = jax.tree_util.tree_unflatten(treedef, dw_flat)
        return d_params, dhs, dhr

    # ---- public entry ----

    def _fold(self, params_tuple):
        """Pre-fold CG-GEMM weights OUTSIDE the kernel (fold_params captures
        constant index arrays that must not be closed over in a kernel body);
        the fold is jnp-traceable, so ordinary AD transposes it — the
        custom_vjp boundary sits on the folded tree."""
        out = []
        for layer, p in zip(self.layers, params_tuple):
            tp = layer.tp
            if getattr(tp, "_gemm_default", lambda: False)():
                out.append(tp.fold_params(p))
            else:
                out.append(p)
        return tuple(out)

    def __call__(self, params_tuple, hs, hr, d2, attr, maskf):
        """agg [N, F] = Σ_k mask · MLP(h_s ‖ h_r ‖ d², attr).

        hs [N*K, F] gathered sender features (cm layout); hr [N, F];
        d2/maskf [N*K, 1]; attr [N*K, A] (repacked node-major here — the
        dispatch-path entry is ``geo_call``).  N must divide by ``tile``
        and ``bwd_tile``.
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
        """Dispatch entry: hs [N*K, F], hr [N, F], geo2 [N, K*(A+2)]
        node-major packed geometry (attr ‖ d2 ‖ mask per slot)."""
        return self._call(self._fold(params_tuple), hs, hr, geo2)
