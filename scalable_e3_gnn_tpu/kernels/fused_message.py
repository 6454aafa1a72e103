"""Fused Pallas kernel: SEGNN message MLP + neighborhood aggregation.

The hot loop of the framework (SURVEY.md §7 step 8, §6 roofline note): per
edge-slot (node i, neighbor k) compute the 2-layer steerable message MLP
(L1 tensor products with the edge sh attribute + gate nonlinearities) and
masked-sum over the K slots — all in one VMEM-resident pass.  The XLA path
materializes every GEMM boundary ([N·K, ~2F] tensors) in HBM; this kernel
keeps the whole chain on-chip, leaving only: read gathered sender features,
read attributes, write [N, F] aggregates.

Scope (falls back to the jnp path otherwise):
- hidden irreps = ``Hs x0e + Hv x1o`` (the standard SEGNN lmax=1 hidden),
  component-major layout;
- edge attr = sh(1) = [s, v] (dim 4); message input = h_s ‖ h_r ‖ dist²;
- exactly two gated message layers (the SEGNN default).

Forward and backward are both Pallas kernels (custom_vjp).  Cotangents for
geometry inputs (attr, dist², mask) are zero: they are graph constants during
training.  Weight-gradient accumulation across node tiles relies on the
sequential TPU grid (init at program 0, accumulate after).

Norm constants are folded into the weight columns at call time, so the kernel
sees exactly 4 matrices per layer pair.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CG110 = 1.0 / math.sqrt(3.0)
CG011 = 1.0 / math.sqrt(3.0)

__all__ = ["MessageConfig", "fused_message_aggregate"]


@dataclass(frozen=True)
class MessageConfig:
    hs: int  # scalar multiplicity of the hidden irreps
    hv: int  # vector multiplicity
    k: int  # neighbor slots per node
    tile: int = 64  # node rows per grid step (fwd)
    bwd_tile: int = 0  # node rows per grid step (bwd); 0 = tile // 2

    @property
    def f(self) -> int:  # flat hidden dim (cm layout)
        return self.hs + 3 * self.hv

    @property
    def s1(self) -> int:  # scalars entering layer 1 (h_s ‖ h_r ‖ dist²)
        return 2 * self.hs + 1

    @property
    def v1(self) -> int:  # vectors entering layer 1
        return 2 * self.hv


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _dsigmoid(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 - s)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _layer_fwd(x0e, x1o, s, v, w0e, w1o, hs, hv):
    """One gated L1 TP layer on [R, ·] tiles; returns (m0e, m1o, o0_pre).

    x0e [R, S]; x1o: tuple of 3 [R, V]; s [R, 1]; v: tuple of 3 [R, 1].
    w0e [S+V, hs+hv] (cols: scalars then gates); w1o [S+V, hv].
    """
    dot = x1o[0] * v[0] + x1o[1] * v[1] + x1o[2] * v[2]
    f0 = jnp.concatenate([x0e * s, CG110 * dot], axis=-1)
    o0 = _mm(f0, w0e)  # [R, hs+hv] fp32
    f1 = tuple(
        jnp.concatenate([CG011 * x0e * v[c], CG011 * x1o[c] * s], axis=-1)
        for c in range(3)
    )
    o1 = tuple(_mm(f1[c], w1o) for c in range(3))
    g = jax.nn.sigmoid(o0[:, hs:])
    m0e = _silu(o0[:, :hs])
    m1o = tuple(o1[c] * g for c in range(3))
    return m0e, m1o, (f0, f1, o0, o1, g)


def _expand_matrix(T, K, dtype):
    """[T*K, T] 0/1 matrix: E @ x repeats each of x's T rows K times; E.T @ m
    sums each K-row group.  Replaces sublane reshapes (which Mosaic rejects,
    esp. for bf16 tilings) with trivially cheap MXU matmuls."""
    R = T * K
    grp = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0) // K
    tgt = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
    return (grp == tgt).astype(dtype)


def _fwd_kernel(cfg: MessageConfig, hs_ref, hr_ref, d2_ref, attr_ref, mask_ref,
                w0e1_ref, w1o1_ref, w0e2_ref, w1o2_ref, out_ref):
    T, K = cfg.tile, cfg.k
    Hs, Hv = cfg.hs, cfg.hv
    R = T * K
    dt = hs_ref.dtype

    hs_t = hs_ref[:]  # [R, F]
    hr_t = hr_ref[:]  # [T, F]
    E = _expand_matrix(T, K, dt)
    hr_rep = jnp.dot(E, hr_t, preferred_element_type=jnp.float32).astype(dt)
    d2 = d2_ref[:]  # [R, 1] pre-flattened
    attr = attr_ref[:]
    s = attr[:, 0:1]
    v = tuple(attr[:, 1 + c : 2 + c] for c in range(3))

    # layer-1 inputs (cm layout: scalars [0:Hs], vector comp c at Hs+c*Hv)
    x0e = jnp.concatenate([hs_t[:, :Hs], hr_rep[:, :Hs], d2.astype(dt)], axis=-1)
    x1o = tuple(
        jnp.concatenate(
            [
                hs_t[:, Hs + c * Hv : Hs + (c + 1) * Hv],
                hr_rep[:, Hs + c * Hv : Hs + (c + 1) * Hv],
            ],
            axis=-1,
        )
        for c in range(3)
    )
    m0e, m1o, _ = _layer_fwd(x0e, x1o, s, v, w0e1_ref[:], w1o1_ref[:], Hs, Hv)
    m0e = m0e.astype(dt)
    m1o = tuple(x.astype(dt) for x in m1o)
    m0e2, m1o2, _ = _layer_fwd(m0e, m1o, s, v, w0e2_ref[:], w1o2_ref[:], Hs, Hv)

    m = jnp.concatenate([m0e2] + [m1o2[c] for c in range(3)], axis=-1)  # [R, F] f32
    m = m * mask_ref[:]
    out_ref[:] = jnp.dot(E.T, m.astype(dt), preferred_element_type=jnp.float32).astype(
        out_ref.dtype
    )


def _bwd_kernel(cfg: MessageConfig, hs_ref, hr_ref, d2_ref, attr_ref, mask_ref,
                w0e1_ref, w1o1_ref, w0e2_ref, w1o2_ref, dagg_ref,
                dhs_ref, dhr_ref, dw0e1_ref, dw1o1_ref, dw0e2_ref, dw1o2_ref):
    T, K = cfg.tile, cfg.k
    Hs, Hv = cfg.hs, cfg.hv
    R = T * K
    dt = hs_ref.dtype

    hs_t = hs_ref[:]
    hr_t = hr_ref[:]
    E = _expand_matrix(T, K, dt)
    hr_rep = jnp.dot(E, hr_t, preferred_element_type=jnp.float32).astype(dt)
    d2 = d2_ref[:]  # [R, 1] pre-flattened
    attr = attr_ref[:]
    s = attr[:, 0:1]
    v = tuple(attr[:, 1 + c : 2 + c] for c in range(3))
    maskf = mask_ref[:]  # [R, 1]

    # ---- recompute forward ----
    x0e = jnp.concatenate([hs_t[:, :Hs], hr_rep[:, :Hs], d2.astype(dt)], axis=-1)
    x1o = tuple(
        jnp.concatenate(
            [
                hs_t[:, Hs + c * Hv : Hs + (c + 1) * Hv],
                hr_rep[:, Hs + c * Hv : Hs + (c + 1) * Hv],
            ],
            axis=-1,
        )
        for c in range(3)
    )
    w0e1, w1o1, w0e2, w1o2 = w0e1_ref[:], w1o1_ref[:], w0e2_ref[:], w1o2_ref[:]
    m0e, m1o, res1 = _layer_fwd(x0e, x1o, s, v, w0e1, w1o1, Hs, Hv)
    m0e = m0e.astype(dt)
    m1o = tuple(x.astype(dt) for x in m1o)
    _, _, res2 = _layer_fwd(m0e, m1o, s, v, w0e2, w1o2, Hs, Hv)

    # ---- backward ----
    # cotangent intermediates are kept in the *input dtype*: exact in fp32
    # test/parity mode; in bf16 production mode this halves live VMEM (the
    # limit that forces a reduced bwd tile) at bf16-training-level precision.
    # Weight-grad GEMMs still accumulate fp32 (preferred_element_type).
    d_agg = dagg_ref[:]  # [T, F]
    d_m = jnp.dot(E, d_agg.astype(dt), preferred_element_type=jnp.float32)
    d_m = (d_m * maskf).astype(dt)
    d_m0e2 = d_m[:, :Hs]
    d_m1o2 = tuple(d_m[:, Hs + c * Hv : Hs + (c + 1) * Hv] for c in range(3))

    # layer 2 backward
    f0b, f1b, o0b, o1b, gb = res2
    d_o1b = tuple((d_m1o2[c] * gb).astype(dt) for c in range(3))
    d_gb = d_m1o2[0] * o1b[0] + d_m1o2[1] * o1b[1] + d_m1o2[2] * o1b[2]
    d_o0b = jnp.concatenate(
        [d_m0e2 * _dsilu(o0b[:, :Hs]), d_gb * _dsigmoid(o0b[:, Hs:])], axis=-1
    ).astype(dt)
    d_f0b = _mm(d_o0b, w0e2.T).astype(dt)
    dW0e2 = _mm(f0b.T.astype(dt), d_o0b)
    d_f1b = tuple(_mm(d_o1b[c], w1o2.T).astype(dt) for c in range(3))
    dW1o2 = sum(_mm(f1b[c].T.astype(dt), d_o1b[c]) for c in range(3))

    # back through layer-2 feature construction (input split: S2=Hs, V2=Hv)
    # f0b = [m0e*s ‖ cg110 * Σ_c m1o_c*v_c]; f1b_c = [cg011*m0e*v_c ‖ cg011*m1o_c*s]
    d_m0e = (
        d_f0b[:, :Hs] * s
        + sum(CG011 * d_f1b[c][:, :Hs] * v[c] for c in range(3))
    ).astype(dt)
    d_m1o = tuple(
        (CG110 * d_f0b[:, Hs:] * v[c] + CG011 * d_f1b[c][:, Hs:] * s).astype(dt)
        for c in range(3)
    )

    # layer 1 backward (through the gate)
    f01, f11, o01, o11, g1 = res1
    d_o11 = tuple((d_m1o[c] * g1).astype(dt) for c in range(3))
    d_g1 = d_m1o[0] * o11[0] + d_m1o[1] * o11[1] + d_m1o[2] * o11[2]
    d_o01 = jnp.concatenate(
        [d_m0e * _dsilu(o01[:, :Hs]), d_g1 * _dsigmoid(o01[:, Hs:])], axis=-1
    ).astype(dt)
    d_f01 = _mm(d_o01, w0e1.T).astype(dt)
    dW0e1 = _mm(f01.T.astype(dt), d_o01)
    d_f11 = tuple(_mm(d_o11[c], w1o1.T).astype(dt) for c in range(3))
    dW1o1 = sum(_mm(f11[c].T.astype(dt), d_o11[c]) for c in range(3))

    # back to layer-1 inputs (S1 = 2Hs+1, V1 = 2Hv)
    S1 = cfg.s1
    d_x0e = d_f01[:, :S1] * s + sum(
        CG011 * d_f11[c][:, :S1] * v[c] for c in range(3)
    )
    d_x1o = tuple(
        CG110 * d_f01[:, S1:] * v[c] + CG011 * d_f11[c][:, S1:] * s
        for c in range(3)
    )

    # split x0e -> [hs(0:Hs) ‖ hr(Hs:2Hs) ‖ d2]; x1o_c -> [hs ‖ hr]
    d_hs = jnp.concatenate(
        [d_x0e[:, :Hs]] + [d_x1o[c][:, :Hv] for c in range(3)], axis=-1
    )
    d_hr_rep = jnp.concatenate(
        [d_x0e[:, Hs : 2 * Hs]] + [d_x1o[c][:, Hv : 2 * Hv] for c in range(3)],
        axis=-1,
    )
    dhs_ref[:] = d_hs.astype(dhs_ref.dtype)
    dhr_ref[:] = jnp.dot(
        E.T, d_hr_rep.astype(dt), preferred_element_type=jnp.float32
    ).astype(dhr_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw0e1_ref[:] = jnp.zeros_like(dw0e1_ref)
        dw1o1_ref[:] = jnp.zeros_like(dw1o1_ref)
        dw0e2_ref[:] = jnp.zeros_like(dw0e2_ref)
        dw1o2_ref[:] = jnp.zeros_like(dw1o2_ref)

    dw0e1_ref[:] += dW0e1.astype(dw0e1_ref.dtype)
    dw1o1_ref[:] += dW1o1.astype(dw1o1_ref.dtype)
    dw0e2_ref[:] += dW0e2.astype(dw0e2_ref.dtype)
    dw1o2_ref[:] += dW1o2.astype(dw1o2_ref.dtype)


def _specs(cfg: MessageConfig, n_tiles: int):
    T, K, F = cfg.tile, cfg.k, cfg.f
    S1V1 = cfg.s1 + cfg.v1
    S2V2 = cfg.hs + cfg.hv
    row = lambda i: (i, 0)
    data_specs = [
        pl.BlockSpec((T * K, F), row, memory_space=pltpu.VMEM),  # hs
        pl.BlockSpec((T, F), row, memory_space=pltpu.VMEM),  # hr
        pl.BlockSpec((T * K, 1), row, memory_space=pltpu.VMEM),  # d2 (flat)
        pl.BlockSpec((T * K, 4), row, memory_space=pltpu.VMEM),  # attr
        pl.BlockSpec((T * K, 1), row, memory_space=pltpu.VMEM),  # mask (flat)
    ]
    w_specs = [
        pl.BlockSpec((S1V1, cfg.hs + cfg.hv), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S1V1, cfg.hv), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S2V2, cfg.hs + cfg.hv), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S2V2, cfg.hv), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return data_specs, w_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_message_aggregate(cfg: MessageConfig, hs, hr, d2, attr, maskf,
                            w0e1, w1o1, w0e2, w1o2):
    """agg [N, F] = Σ_k mask · MLP(h_s ‖ h_r ‖ d², sh) — fused on-chip.

    hs [N*K, F] gathered sender features (cm layout); hr [N, F]; d2 [N, K];
    attr [N*K, 4]; maskf [N, K] float; weights with norms pre-folded.
    N must be a multiple of cfg.tile (pad outside).
    """
    return _fwd_call(cfg, hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2)


# raise the scoped-VMEM cap (default ~16MB) so larger node tiles compile;
# the kernels' live set is sized by tile × K × feature width
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_call(cfg, hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2):
    n = hr.shape[0]
    assert n % cfg.tile == 0, (n, cfg.tile)
    n_tiles = n // cfg.tile
    data_specs, w_specs = _specs(cfg, n_tiles)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(n_tiles,),
        in_specs=data_specs + w_specs,
        out_specs=pl.BlockSpec((cfg.tile, cfg.f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cfg.f), hr.dtype),
        compiler_params=_COMPILER_PARAMS,
    )(hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2)


def _vjp_fwd(cfg, hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2):
    out = _fwd_call(cfg, hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2)
    return out, (hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2)


def _vjp_bwd(cfg, residuals, d_agg):
    import dataclasses

    hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2 = residuals
    # the backward holds ~2x the live tensors (recompute + cotangents):
    # default to half the fwd tile to stay inside VMEM, tunable via bwd_tile
    bt = cfg.bwd_tile or (cfg.tile // 2 if cfg.tile % 2 == 0 else cfg.tile)
    cfg = dataclasses.replace(cfg, tile=bt)
    n = hr.shape[0]
    n_tiles = n // cfg.tile
    data_specs, w_specs = _specs(cfg, n_tiles)
    T, K, F = cfg.tile, cfg.k, cfg.f
    # weight grads accumulate over ~N/tile grid steps: always fp32 in-kernel,
    # cast back to the weight dtype after the call
    out_shapes = (
        jax.ShapeDtypeStruct(hs.shape, hs.dtype),
        jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        jax.ShapeDtypeStruct(w0e1.shape, jnp.float32),
        jax.ShapeDtypeStruct(w1o1.shape, jnp.float32),
        jax.ShapeDtypeStruct(w0e2.shape, jnp.float32),
        jax.ShapeDtypeStruct(w1o2.shape, jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((T * K, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w0e1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1o1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w0e2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w1o2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    dhs, dhr, dw0e1, dw1o1, dw0e2, dw1o2 = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(n_tiles,),
        in_specs=data_specs
        + w_specs
        + [pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_COMPILER_PARAMS,
    )(hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2, d_agg)
    zeros = lambda x: jnp.zeros_like(x)
    wdt = w0e1.dtype
    return (dhs, dhr, zeros(d2), zeros(attr), zeros(maskf),
            dw0e1.astype(wdt), dw1o1.astype(wdt),
            dw0e2.astype(wdt), dw1o2.astype(wdt))


fused_message_aggregate.defvjp(_vjp_fwd, _vjp_bwd)
