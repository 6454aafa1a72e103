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

        def call(params_tuple, hs, hr, d2, attr, maskf):
            return self._fwd_call(params_tuple, hs, hr, d2, attr, maskf)

        def call_fwd(params_tuple, hs, hr, d2, attr, maskf):
            out = self._fwd_call(params_tuple, hs, hr, d2, attr, maskf)
            return out, (params_tuple, hs, hr, d2, attr, maskf)

        def call_bwd(res, d_agg):
            params_tuple, hs, hr, d2, attr, maskf = res
            d_params, dhs, dhr = self._bwd_call(
                params_tuple, hs, hr, d2, attr, maskf, d_agg
            )
            zeros = lambda x: jnp.zeros_like(x)
            return (d_params, dhs, dhr, zeros(d2), zeros(attr), zeros(maskf))

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
            pl.BlockSpec((T * K, 1), row, memory_space=pltpu.VMEM),  # d2
            pl.BlockSpec((T * K, a), row, memory_space=pltpu.VMEM),  # attr
            pl.BlockSpec((T * K, 1), row, memory_space=pltpu.VMEM),  # mask
        ]
        ws = [pl.BlockSpec(w.shape, fix, memory_space=pltpu.VMEM) for w in wdefs]
        return data, ws

    def _fwd_call(self, params_tuple, hs, hr, d2, attr, maskf):
        n, f = hr.shape
        tile = self.tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)

        def kernel(*refs):
            data_refs, w_refs, out_ref = refs[:5], refs[5:-1], refs[-1]
            hs_ref, hr_ref, d2_ref, attr_ref, mask_ref = data_refs
            dt = hs_ref.dtype
            E = _expand_matrix(tile, self.k, dt)
            hr_rep = jnp.dot(E, hr_ref[:], preferred_element_type=jnp.float32
                             ).astype(dt)
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )
            out = self._message(wvals, hs_ref[:], hr_rep, d2_ref[:],
                                attr_ref[:], mask_ref[:], E)
            out_ref[:] = out.astype(out_ref.dtype)

        data_specs, w_specs = self._specs(tile, f, attr.shape[-1], flat)
        return pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=data_specs + w_specs,
            out_specs=pl.BlockSpec((tile, f), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, f), hr.dtype),
            compiler_params=_COMPILER_PARAMS,
        )(hs, hr, d2, attr, maskf, *flat)

    def _bwd_call(self, params_tuple, hs, hr, d2, attr, maskf, d_agg):
        n, f = hr.shape
        tile = self.bwd_tile
        assert n % tile == 0, (n, tile)
        flat, treedef = jax.tree_util.tree_flatten(params_tuple)

        def kernel(*refs):
            data_refs = refs[:5]
            w_refs = refs[5 : 5 + len(flat)]
            dagg_ref = refs[5 + len(flat)]
            dhs_ref, dhr_ref = refs[6 + len(flat) : 8 + len(flat)]
            dw_refs = refs[8 + len(flat) :]
            hs_ref, hr_ref, d2_ref, attr_ref, mask_ref = data_refs
            dt = hs_ref.dtype
            E = _expand_matrix(tile, self.k, dt)
            wvals = jax.tree_util.tree_unflatten(
                treedef, [r[:] for r in w_refs]
            )

            def fn(wv, hs_t, hr_t):
                hr_rep = jnp.dot(E, hr_t, preferred_element_type=jnp.float32
                                 ).astype(dt)
                return self._message(wv, hs_t, hr_rep, d2_ref[:],
                                     attr_ref[:], mask_ref[:], E)

            _, vjp = jax.vjp(fn, wvals, hs_ref[:], hr_ref[:])
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

        data_specs, w_specs = self._specs(tile, f, attr.shape[-1], flat)
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
        )(hs, hr, d2, attr, maskf, *flat, d_agg)
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
        d2/maskf [N*K, 1]; attr [N*K, A].  N must divide by ``tile`` and
        ``bwd_tile``.
        """
        return self._call(self._fold(params_tuple), hs, hr, d2, attr, maskf)
