"""Generic fused Pallas message kernel: any-lmax steerable message MLP + K-sum.

The lmax=1 kernel (fused_message.py) hand-specializes the SEGNN hidden
``Hs x0e + Hv x1o``; this module fuses the *generic* message pass — any
hidden irreps, any attr order (the lmax=2 configs, BASELINE.json:10) — by
running the existing jnp building blocks (``ops.tensor_product.TensorProduct``
+ ``ops.gate.Gate`` via ``O3TensorProductGate``) *inside* a Pallas kernel
body on VMEM-resident edge tiles.  Those modules are written in 2-D
component-major ('cm') form precisely so they lower through Mosaic.

The backward pass is a second Pallas kernel that differentiates the same
tile computation with ``jax.vjp`` *inside* the kernel — no hand-derived
gradients, still fully fused (one HBM read of the gathered features, one
write of their cotangent).  Weight gradients accumulate in fp32 across the
sequential grid (init at program 0).

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
                 bwd_tile: int = 0) -> None:
        self.layers = list(layers)
        self.k = k
        self.tile = tile
        self.bwd_tile = bwd_tile or max(tile // 2, 8)

        # geometry rides a node-major lane-dense [N, K*(A+2)] operand and
        # expands to per-slot rows in-kernel: flat [R, 1] operands/residuals
        # materialize (8,128)-tiled in HBM (128x expansion, 3.8 GB per piece
        # at 1M points / K=16), and packing geometry into the hs stream
        # costs a full [R, F+A+2] concat round-trip per layer.
        def call(params_tuple, hs, hr, geo2):
            return self._fwd_call(params_tuple, hs, hr, geo2)

        def call_fwd(params_tuple, hs, hr, geo2):
            out = self._fwd_call(params_tuple, hs, hr, geo2)
            return out, (params_tuple, hs, hr, geo2)

        def call_bwd(res, d_agg):
            params_tuple, hs, hr, geo2 = res
            d_params, dhs, dhr = self._bwd_call(
                params_tuple, hs, hr, geo2, d_agg
            )
            return (d_params, dhs, dhr, jnp.zeros_like(geo2))

        self._call = jax.custom_vjp(call)
        self._call.defvjp(call_fwd, call_bwd)

    # ---- tile computation (shared by fwd and the in-kernel vjp) ----

    def _message(self, params_tuple, hs_t, hr_rep, d2, attr, maskf, E):
        m = jnp.concatenate([hs_t, hr_rep, d2.astype(hs_t.dtype)], axis=-1)
        for layer, p in zip(self.layers, params_tuple):
            m = layer(p, m, attr)
        m = m * maskf
        return jnp.dot(E.T, m.astype(hs_t.dtype),
                       preferred_element_type=jnp.float32)

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
        """[T, K*(a+2)] node-major geometry -> (d2, attr, mask) [R, ·]."""
        g = _expand_geo(geo_ref[:], tile, self.k, a + 2)
        return g[:, a : a + 1], g[:, :a], g[:, a + 1 : a + 2]

    def _fwd_call(self, params_tuple, hs, hr, geo2):
        n, f = hr.shape
        a = geo2.shape[-1] // self.k - 2
        tile = self.tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)

        def kernel(*refs):
            (hs_ref, hr_ref, geo_ref), w_refs, out_ref = (
                refs[:3], refs[3:-1], refs[-1])
            d2_t, attr_t, mask_t = self._geo_rows(geo_ref, tile, a)
            hs_t = hs_ref[:]
            dt = hs_t.dtype
            E = _expand_matrix(tile, self.k, dt)
            hr_rep = jnp.dot(E, hr_ref[:], preferred_element_type=jnp.float32
                             ).astype(dt)
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )
            out = self._message(wvals, hs_t, hr_rep, d2_t, attr_t, mask_t, E)
            out_ref[:] = out.astype(out_ref.dtype)

        data_specs, w_specs = self._specs(tile, f, a, flat)
        return pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs,
            out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, f), hr.dtype),
            compiler_params=_COMPILER_PARAMS,
        )(hs, hr, geo2, *flat)

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
