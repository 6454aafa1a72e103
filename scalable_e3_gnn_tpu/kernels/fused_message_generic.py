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

        # the custom_vjp boundary sits on the PACKED stream: the residual is
        # one lane-dense [R, F+A+2] buffer.  With separate pieces, each
        # [R, 1] residual materializes (8,128)-tiled in HBM — a 128x memory
        # expansion, 3.8 GB per piece at 1M points / K=16.
        def call(params_tuple, stream, hr):
            return self._fwd_call(params_tuple, stream, hr)

        def call_fwd(params_tuple, stream, hr):
            out = self._fwd_call(params_tuple, stream, hr)
            return out, (params_tuple, stream, hr)

        def call_bwd(res, d_agg):
            params_tuple, stream, hr = res
            d_params, dstream, dhr = self._bwd_call(
                params_tuple, stream, hr, d_agg
            )
            return (d_params, dstream, dhr)

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
            # one packed edge stream [R, f+a+2] = hs ‖ attr ‖ d2 ‖ mask:
            # separate [R, 1]/[R, a] operands would each be lane-padded to
            # 128 in HBM by the Pallas operand layout (128x memory expansion
            # — 3.8 GB per stream at 1M points/K=16), while packing into the
            # hs array is free (hs already pads f -> 128)
            pl.BlockSpec((T * K, f + a + 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, f), row, memory_space=pltpu.VMEM),  # hr
        ]
        ws = [pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in wdefs]
        return data, ws

    @staticmethod
    def _pack(hs, d2, attr, maskf):
        dt = hs.dtype
        return jnp.concatenate(
            [hs, attr.astype(dt), d2.astype(dt), maskf.astype(dt)], axis=-1
        )

    def _unpack(self, stream_ref, f, a):
        s = stream_ref[:]
        return (s[:, :f], s[:, f + a : f + a + 1], s[:, f : f + a],
                s[:, f + a + 1 : f + a + 2])

    def _fwd_call(self, params_tuple, stream, hr):
        n, f = hr.shape
        a = stream.shape[-1] - f - 2
        tile = self.tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)

        def kernel(*refs):
            (stream_ref, hr_ref), w_refs, out_ref = refs[:2], refs[2:-1], refs[-1]
            hs_t, d2_t, attr_t, mask_t = self._unpack(stream_ref, f, a)
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
        )(stream, hr, *flat)

    def _bwd_call(self, params_tuple, stream, hr, d_agg):
        n, f = hr.shape
        a = stream.shape[-1] - f - 2
        tile = self.bwd_tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)

        def kernel(*refs):
            stream_ref, hr_ref = refs[:2]
            w_refs = refs[2 : 2 + len(flat)]
            dagg_ref = refs[2 + len(flat)]
            dstream_ref, dhr_ref = refs[3 + len(flat) : 5 + len(flat)]
            dw_refs = refs[5 + len(flat) :]
            hs_t, d2_t, attr_t, mask_t = self._unpack(stream_ref, f, a)
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
            # zero cotangents for the geometry columns (graph constants)
            dstream_ref[:] = jnp.concatenate(
                [d_hs.astype(dt), jnp.zeros((d_hs.shape[0], a + 2), dt)],
                axis=-1,
            ).astype(dstream_ref.dtype)
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
            jax.ShapeDtypeStruct(stream.shape, stream.dtype),
            jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat)
        out_specs = (
            pl.BlockSpec((tile * self.k, f + a + 2), lambda i: (i, 0),
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
        )(stream, hr, *flat, d_agg)
        dstream, dhr = outs[0], outs[1]
        dw_flat = [
            d.astype(w.dtype) for d, w in zip(outs[2:], flat)
        ]
        d_params = jax.tree_util.tree_unflatten(treedef, dw_flat)
        return d_params, dstream, dhr

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
        d2/maskf [N*K, 1]; attr [N*K, A].  N must divide by ``tile`` and
        ``bwd_tile``.  The pieces fuse into one packed stream before the
        custom_vjp boundary; their cotangents come back through the concat
        transpose (d_hs slice; geometry branches are dead).
        """
        stream = self._pack(hs, d2, attr, maskf)
        return self._call(self._fold(params_tuple), stream, hr)

    def packed_call(self, params_tuple, stream, hr):
        """Entry for callers that build the packed stream themselves (e.g.
        in 3-D [N, K, ·] form to avoid flat [R, 1] intermediates)."""
        return self._call(self._fold(params_tuple), stream, hr)
