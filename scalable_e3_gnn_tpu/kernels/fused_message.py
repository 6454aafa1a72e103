"""Fused Pallas kernel: SEGNN message MLP + neighborhood aggregation.

The hot loop of the framework (SURVEY.md §7 step 8, §6 roofline note): per
edge-slot (node i, neighbor k) compute the 2-layer steerable message MLP
(L1 tensor products with the edge sh attribute + gate nonlinearities) and
masked-sum over the K slots — all in one VMEM-resident pass.  The XLA path
materializes every GEMM boundary ([N·K, ~2F] tensors) in HBM; this kernel
keeps the whole chain on-chip, leaving only: read gathered sender features,
read attributes, write [N, F] aggregates.

Kernel layout (v2, stacked lanes).  The kernel is VPU-throughput-bound (tile
size has no effect; measured 21 ms fwd over 2.4M edges at any tile), so the
math is factored to minimize vector-unit element work:

- the l=1 output block is computed as
  ``o1_c = cg011 * (v_c * (Xs @ W1S) + s * ((Xv_c * s?) ... @ W1V))`` — the
  GEMM through the *concatenated* path features of the reference
  (l1_tensor_prod.py:286-297) distributes over the two row blocks, so the
  per-component [R, S+V] concats and three narrow [R, S+V] x [S+V, Hv] GEMMs
  become one [R, S] x [S, Hv] GEMM shared by all three components plus one
  block-diagonal [R, 3V] x [3V, 3Hv] GEMM over lane-stacked components;
- all vector-component tuples are kept lane-stacked ([R, 3V] with groups
  x,y,z) so elementwise ops run at 3x the lane occupancy of per-component
  [R, V] tensors.

Row packing (v3, ``MessageConfig.pack``).  At typical hidden widths most
intermediates are 16-96 lanes wide — under-occupying the 128-lane VPU.
With ``pack=p`` the kernel processes p consecutive edge slots per register
row: every logical [R, C] tensor becomes [R/p, p*C] (half-major lanes), all
GEMMs use block-diagonal weights (still MXU), and elementwise work runs at
p× the lane occupancy.  The operand reshape [N*K, F] -> [N*K/p, p*F] is a
contiguous (free) XLA reshape; slot groups never straddle a receiver because
K % p == 0.  pack=1 reproduces the v2 kernel exactly.

Forward and backward are both Pallas kernels (custom_vjp).  Cotangents for
geometry inputs (attr, dist², mask) are zero: they are graph constants during
training.  Weight-gradient accumulation across node tiles relies on the
sequential TPU grid (init at program 0, accumulate after).

Norm constants are folded into the weight columns at call time, so the kernel
sees exactly 4 logical matrices per layer pair (split/block-diagonalized
outside the kernel).
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

__all__ = ["MessageConfig", "fused_message_aggregate",
           "fused_message_aggregate_km", "fused_message_aggregate_tabled"]


@dataclass(frozen=True)
class MessageConfig:
    hs: int  # scalar multiplicity of the hidden irreps
    hv: int  # vector multiplicity
    k: int  # neighbor slots per node
    tile: int = 64  # node rows per grid step (fwd)
    bwd_tile: int = 0  # node rows per grid step (bwd); 0 = tile // 2
    u: int = 0  # compact sender-table size (tabled gather path); 0 = off
    pack: int = 1  # edge slots per register row (lane packing); K % pack == 0
    # GEMM-form (km2) tile math for the slot-major kernels: data
    # rearrangement folded into zero-row-padded weight GEMMs (see the km2
    # section below).  Forward measured 18.5 -> 17.8 ms at the 100k shapes
    # and ships by default; the GEMM-form BACKWARD measured ~1-2 ms SLOWER
    # than the stacked-lane bwd at every tile tried (36.3 vs 35.2 f+b at
    # t160:b80; 36.7 vs 34.7 at t96:b96 — the extra transposed weight-grad
    # GEMMs outweigh the relayouts they remove), so it stays opt-in for
    # experiments.
    gemm_form: bool = True
    gemm_form_bwd: bool = False

    @property
    def f(self) -> int:  # flat hidden dim (cm layout)
        return self.hs + 3 * self.hv

    @property
    def s1(self) -> int:  # scalars entering layer 1 (h_s ‖ h_r ‖ dist²)
        return 2 * self.hs + 1

    @property
    def v1(self) -> int:  # vector channels (per component) entering layer 1
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


def _cat(parts):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _rep3(x, p):
    """[R, p*M] half-major -> [R, p*3M]: each half's block repeated 3x."""
    m = x.shape[-1] // p
    return _cat([x[:, h * m : (h + 1) * m] for h in range(p) for _ in range(3)])


def _sumgroups(x, m, p):
    """[R, p*3M] half-major lane-stacked -> [R, p*M] per-half group sums."""
    outs = []
    for h in range(p):
        b = x[:, h * 3 * m : (h + 1) * 3 * m]
        outs.append(b[:, :m] + b[:, m : 2 * m] + b[:, 2 * m :])
    return _cat(outs)


def _halves(x, p):
    """[R, p*M] -> list of p [R, M] half slices."""
    m = x.shape[-1] // p
    return [x[:, h * m : (h + 1) * m] for h in range(p)]


def _bch(cols, m):
    """[R, p] per-half scalars -> [R, p*m]: column h broadcast over m lanes."""
    r, p = cols.shape
    return _cat([jnp.broadcast_to(cols[:, h : h + 1], (r, m)) for h in range(p)])


def _vstack(attr, m, p):
    """[R, 4p] packed sh attrs -> [R, p*3m]: v_c broadcast over m lanes per
    (half, component) group."""
    r = attr.shape[0]
    return _cat(
        [
            jnp.broadcast_to(attr[:, 4 * h + 1 + c : 4 * h + 2 + c], (r, m))
            for h in range(p)
            for c in range(3)
        ]
    )


def _layer_fwd(Xs, Xv, scols, vV, vH, W0, W1S, BD, hs, hv, p):
    """One gated L1 TP layer, stacked-lane half-major form.

    Xs [R, p*S] scalar channels; Xv [R, p*3V] lane-stacked vector components
    (half-major, then x,y,z groups); scols [R, p] sh scalar per half;
    vV [R, p*3V], vH [R, p*3hv] = sh vector broadcast per group.
    W0/W1S/BD are already block-diagonalized over the p halves:
    W0 [p*(S+V), p*(hs+hv)]; W1S [p*S, p*hv]; BD [p*3V, p*3hv].
    Returns m0 [R, p*hs] f32, m1 [R, p*3hv] f32, residuals.
    """
    V = Xv.shape[-1] // (3 * p)
    S = Xs.shape[-1] // p
    P = Xv * vV
    dot = _sumgroups(P, V, p)  # [R, p*V]
    Xss = Xs * _bch(scols, S)
    f0 = _cat(
        [
            t
            for xh, dh in zip(_halves(Xss, p), _halves(dot, p))
            for t in (xh, CG110 * dh)
        ]
    )  # [R, p*(S+V)]
    o0 = _mm(f0, W0)  # [R, p*(hs+hv)] f32
    A = _mm(Xs, W1S)  # [R, p*hv] f32
    Xvs = Xv * _bch(scols, 3 * V)  # [R, p*3V]
    B = _mm(Xvs, BD)  # [R, p*3hv] f32
    o1 = CG011 * (vH * _rep3(A, p) + B)  # [R, p*3hv] f32
    g = jax.nn.sigmoid(_cat([oh[:, hs:] for oh in _halves(o0, p)]))
    m0 = _silu(_cat([oh[:, :hs] for oh in _halves(o0, p)]))
    m1 = o1 * _rep3(g, p)
    return m0, m1, (Xs, Xv, f0, Xvs, o0, o1, g)


def _layer_bwd(res, d_m0, d_m1, scols, vV, vH, W0, W1S, BD, hs, hv, p, dt):
    """VJP of ``_layer_fwd`` wrt inputs and weights (s/v are constants).

    Cotangent intermediates are kept in the input dtype ``dt``: exact in the
    fp32 parity/test path; in bf16 production mode this halves live VMEM at
    bf16-training precision.  Weight-grad GEMMs accumulate fp32 per half and
    sum over the p halves (the block-diagonal structure means only the
    diagonal blocks of the full outer product are real gradients).
    Returns d_Xs [R, p*S], d_Xv [R, p*3V], dW0, dW1S, dW1V (unpacked shapes).
    """
    Xs, Xv, f0, Xvs, o0, o1, g = res
    S = Xs.shape[-1] // p
    V = Xv.shape[-1] // (3 * p)
    d_o1 = (d_m1 * _rep3(g, p)).astype(dt)
    d_g = _sumgroups(d_m1 * o1, hv, p)
    d_o0 = _cat(
        [
            t
            for oh, d0h, dgh in zip(_halves(o0, p), _halves(d_m0, p), _halves(d_g, p))
            for t in (d0h * _dsilu(oh[:, :hs]), dgh * _dsigmoid(oh[:, hs:]))
        ]
    ).astype(dt)
    # through step 8: o1 = cg011 * (vH * rep3(A) + B)
    d_B = CG011 * d_o1  # [R, p*3hv]
    d_A = (CG011 * _sumgroups(d_o1 * vH, hv, p)).astype(dt)  # [R, p*hv]
    # step 7: B = Xvs @ BD
    d_Xvs = _mm(d_B, BD.T).astype(dt)  # [R, p*3V]
    dW1V = sum(
        _mm(
            Xvs[:, c * V : (c + 1) * V].T.astype(dt),
            d_B[:, c * hv : (c + 1) * hv],
        )
        for c in range(3 * p)
    )  # [V, hv] f32
    # step 6: Xvs = Xv * s
    d_Xv = d_Xvs * _bch(scols, 3 * V)
    # step 5: A = Xs @ W1S
    d_Xs = _mm(d_A, W1S.T)
    dW1S = sum(
        _mm(xh.T.astype(dt), dh)
        for xh, dh in zip(_halves(Xs, p), _halves(d_A, p))
    )
    # step 4: o0 = f0 @ W0
    d_f0 = _mm(d_o0, W0.T).astype(dt)
    dW0 = sum(
        _mm(fh.T.astype(dt), dh)
        for fh, dh in zip(_halves(f0, p), _halves(d_o0, p))
    )
    # step 3: f0 = [Xs*s ‖ cg110*dot] per half
    f0h = _halves(d_f0, p)
    d_Xs = (d_Xs + _cat([h[:, :S] for h in f0h]) * _bch(scols, S)).astype(dt)
    d_dot = CG110 * _cat([h[:, S:] for h in f0h])  # [R, p*V]
    # steps 1-2: dot = sumgroups(Xv * vV)
    d_Xv = (d_Xv + _rep3(d_dot, p) * vV).astype(dt)
    return d_Xs, d_Xv, dW0, dW1S, dW1V


def _expand_matrix(T, K, dtype):
    """[T*K, T] 0/1 matrix: E @ x repeats each of x's T rows K times; E.T @ m
    sums each K-row group.  Replaces sublane reshapes (which Mosaic rejects,
    esp. for bf16 tilings) with trivially cheap MXU matmuls.  Only the
    pack>1 kernels still use this — the slot-major (km) kernels below
    replace both E matmuls with slice/concat forms (the r3 generic-kernel
    rework measured the dense-E machinery as most of its overhead floor)."""
    R = T * K
    grp = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0) // K
    tgt = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
    return (grp == tgt).astype(dtype)


# ---- slot-major helpers (row k*T + t = edge slot k of node t) ----
# Mirrors fused_message_generic.py: the receiver repeat is a sublane concat
# of K aliases, the K-slot sum is K static sublane slices + adds, the [K, T,
# F] VMEM block assembles by K leading-dim reads + one concat, and geometry
# arrives node-major lane-dense and relayouts through a VMEM scratch.  All
# 2-D slice/concat ops Mosaic lowers directly — no dense expand matmuls.


def _rep_rows_km(x, k):
    """[T, F] -> [K*T, F]: row k*T+t = x[t] (one sublane concat)."""
    return jnp.concatenate([x] * k, axis=0) if k > 1 else x


def _ksum_km(m, k):
    """[K*T, F] -> [T, F] per-node slot sum in fp32 (transpose of
    ``_rep_rows_km``)."""
    t = m.shape[0] // k
    acc = m[0:t].astype(jnp.float32)
    for i in range(1, k):
        acc = acc + m[i * t : (i + 1) * t].astype(jnp.float32)
    return acc


def _assemble_km(ref, k):
    """[K, T, F] VMEM block -> [K*T, F] slot-major rows."""
    if k == 1:
        return ref[0]
    return jnp.concatenate([ref[i] for i in range(k)], axis=0)


def _geo_rows_km(geo_ref, geo_scr, tile, k, a):
    """[T, K*(a+2)] node-major packed geometry -> (d2, attr, mask) [K*T, ·]
    via K lane slices staged through a VMEM scratch (a direct sublane concat
    of lane slices fails on hardware: unequal lane offsets on the non-concat
    dim — see fused_message_generic._geo_rows)."""
    g = geo_ref[:]
    G = a + 2
    if k == 1:
        rows = g
    else:
        for i in range(k):
            geo_scr[i * tile : (i + 1) * tile, :] = g[:, i * G : (i + 1) * G]
        rows = geo_scr[:]
    return rows[:, a : a + 1], rows[:, :a], rows[:, a + 1 : a + 2]


def _build_inputs(cfg, hs_t, hrr, d2, attr, p):
    """Layer-1 stacked inputs from cm-layout features (half-major packed).

    hs_t [R, p*F] packed sender rows; hrr [R, F] receiver rows (shared by all
    p halves); d2 [R, p]; attr [R, 4p].
    Xs [R, p*(2Hs+1)] per half = [hs0e ‖ hr0e ‖ d2]; Xv [R, p*3*(2Hv)] groups
    [hs_c ‖ hr_c] — matching the weight row order of the reference module's
    path concat (l1_tensor_prod.py:242-297 via ops.tensor_product._extract_*)."""
    Hs, Hv, F = cfg.hs, cfg.hv, cfg.f
    dt = hs_t.dtype
    Xs = _cat(
        [
            t
            for h in range(p)
            for t in (
                hs_t[:, h * F : h * F + Hs],
                hrr[:, :Hs],
                d2[:, h : h + 1].astype(dt),
            )
        ]
    )
    Xv = _cat(
        [
            t
            for h in range(p)
            for c in range(3)
            for t in (
                hs_t[:, h * F + Hs + c * Hv : h * F + Hs + (c + 1) * Hv],
                hrr[:, Hs + c * Hv : Hs + (c + 1) * Hv],
            )
        ]
    )
    return Xs, Xv


def _scols(attr, p):
    """[R, 4p] -> [R, p]: the sh scalar of each packed half."""
    return _cat([attr[:, 4 * h : 4 * h + 1] for h in range(p)])


def _onehot(loc, u, dt):
    """[R, 1] int32 table indices -> [R, u] 0/1 selection matrix in ``dt``.

    Row r selects table entry loc[r]; loc == u (padding / masked slot)
    selects nothing, so the expanded row reads as 0 — matching the XLA
    ``mode="fill"`` gather semantics of the untabled path."""
    i = jax.lax.broadcasted_iota(jnp.int32, (loc.shape[0], u), 1)
    return (i == loc).astype(dt)


def _fwd_tail(cfg, hs_t, hr_ref, d2_ref, attr_ref, mask_ref,
              w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref, out_ref,
              tile):
    """Shared forward body given the packed sender rows ``hs_t`` [R, p*F]."""
    K, p = cfg.k, cfg.pack
    Hs, Hv, F = cfg.hs, cfg.hv, cfg.f
    dt = hs_t.dtype

    E = _expand_matrix(tile, K // p, dt)
    hrr = jnp.dot(E, hr_ref[:], preferred_element_type=jnp.float32).astype(dt)
    attr = attr_ref[:]
    sc = _scols(attr, p)
    vV = _vstack(attr, cfg.v1, p)  # [R, p*3*2Hv]
    vH = _vstack(attr, Hv, p)  # [R, p*3*Hv]

    Xs, Xv = _build_inputs(cfg, hs_t, hrr, d2_ref[:], attr, p)
    m0, m1, _ = _layer_fwd(
        Xs, Xv, sc, vV, vH, w01_ref[:], w1s1_ref[:], bd1_ref[:], Hs, Hv, p
    )
    m0 = m0.astype(dt)
    m1 = m1.astype(dt)
    m0b, m1b, _ = _layer_fwd(
        m0, m1, sc, vH, vH, w02_ref[:], w1s2_ref[:], bd2_ref[:], Hs, Hv, p
    )
    # per-half cm-layout messages, masked, summed over the p halves
    mk = mask_ref[:]
    msum = sum(
        jnp.concatenate([m0h, m1h], axis=-1) * mk[:, h : h + 1]
        for h, (m0h, m1h) in enumerate(zip(_halves(m0b, p), _halves(m1b, p)))
    )  # [R, F] f32
    out_ref[:] = jnp.dot(
        E.T, msum.astype(dt), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _fwd_kernel(cfg: MessageConfig, hs_ref, hr_ref, d2_ref, attr_ref, mask_ref,
                w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref, out_ref):
    _fwd_tail(cfg, hs_ref[:], hr_ref, d2_ref, attr_ref, mask_ref,
              w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref, out_ref,
              cfg.tile)


def _fwd_kernel_tab(cfg: MessageConfig, hu_ref, hr_ref, loc_ref, d2_ref,
                    attr_ref, mask_ref, w01_ref, w1s1_ref, bd1_ref, w02_ref,
                    w1s2_ref, bd2_ref, out_ref):
    dt = hr_ref.dtype
    oh = _onehot(loc_ref[:], cfg.u, dt)
    hs_t = jnp.dot(oh, hu_ref[:], preferred_element_type=jnp.float32).astype(dt)
    _fwd_tail(cfg, hs_t, hr_ref, d2_ref, attr_ref, mask_ref,
              w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref, out_ref,
              cfg.tile)


def _bwd_tail(cfg, hs_t, hr_ref, d2_ref, attr_ref, mask_ref,
              w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref,
              dagg_ref, tile):
    """Shared backward body: recompute + VJP given packed ``hs_t`` [R, p*F].

    Returns (d_hs [R, p*F], d_hr [T, F] f32, 6 weight-grad tiles f32)."""
    T, K, p = tile, cfg.k, cfg.pack
    Hs, Hv, F = cfg.hs, cfg.hv, cfg.f
    S1, V1 = cfg.s1, cfg.v1
    dt = hs_t.dtype

    E = _expand_matrix(T, K // p, dt)
    hrr = jnp.dot(E, hr_ref[:], preferred_element_type=jnp.float32).astype(dt)
    attr = attr_ref[:]
    sc = _scols(attr, p)
    vV = _vstack(attr, cfg.v1, p)
    vH = _vstack(attr, Hv, p)
    mk = mask_ref[:]  # [R, p]
    w01, w1s1, bd1 = w01_ref[:], w1s1_ref[:], bd1_ref[:]
    w02, w1s2, bd2 = w02_ref[:], w1s2_ref[:], bd2_ref[:]

    # ---- recompute forward ----
    Xs, Xv = _build_inputs(cfg, hs_t, hrr, d2_ref[:], attr, p)
    m0, m1, res1 = _layer_fwd(Xs, Xv, sc, vV, vH, w01, w1s1, bd1, Hs, Hv, p)
    m0 = m0.astype(dt)
    m1 = m1.astype(dt)
    _, _, res2 = _layer_fwd(m0, m1, sc, vH, vH, w02, w1s2, bd2, Hs, Hv, p)

    # ---- backward ----
    d_agg = dagg_ref[:]  # [T, F]
    d_mr = jnp.dot(E, d_agg.astype(dt), preferred_element_type=jnp.float32)
    # per-half masked cotangents: half h of the packed message row
    dmh = [(d_mr * mk[:, h : h + 1]).astype(dt) for h in range(p)]
    d_m0b = _cat([d[:, :Hs] for d in dmh])
    d_m1b = _cat([d[:, Hs:] for d in dmh])

    d_m0, d_m1, dW02, dW1S2, dW1V2 = _layer_bwd(
        res2, d_m0b, d_m1b, sc, vH, vH, w02, w1s2, bd2, Hs, Hv, p, dt
    )
    d_Xs, d_Xv, dW01, dW1S1, dW1V1 = _layer_bwd(
        res1, d_m0, d_m1, sc, vV, vH, w01, w1s1, bd1, Hs, Hv, p, dt
    )

    # split layer-1 input cotangents back into sender / receiver features
    # (per half: Xs = [hs0e ‖ hr0e ‖ d2]; Xv groups = [hs_c ‖ hr_c]);
    # d2 is geometry.  Receiver cotangents sum over the p halves.
    d_hs = _cat(
        [
            t
            for h in range(p)
            for t in (
                [d_Xs[:, h * S1 : h * S1 + Hs]]
                + [
                    d_Xv[:, (h * 3 + c) * V1 : (h * 3 + c) * V1 + Hv]
                    for c in range(3)
                ]
            )
        ]
    )
    d_hrr = sum(
        _cat(
            [d_Xs[:, h * S1 + Hs : h * S1 + 2 * Hs]]
            + [
                d_Xv[:, (h * 3 + c) * V1 + Hv : (h * 3 + c + 1) * V1]
                for c in range(3)
            ]
        )
        for h in range(p)
    )
    d_hr = jnp.dot(E.T, d_hrr.astype(dt), preferred_element_type=jnp.float32)
    return d_hs, d_hr, (dW01, dW1S1, dW1V1, dW02, dW1S2, dW1V2)


def _accum_weight_grads(refs, vals):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for r in refs:
            r[:] = jnp.zeros_like(r)

    for r, v in zip(refs, vals):
        r[:] += v.astype(r.dtype)


def _bwd_kernel(cfg: MessageConfig, hs_ref, hr_ref, d2_ref, attr_ref, mask_ref,
                w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref, dagg_ref,
                dhs_ref, dhr_ref, dw01_ref, dw1s1_ref, dw1v1_ref,
                dw02_ref, dw1s2_ref, dw1v2_ref):
    d_hs, d_hr, dws = _bwd_tail(
        cfg, hs_ref[:], hr_ref, d2_ref, attr_ref, mask_ref,
        w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref, dagg_ref,
        cfg.tile,
    )
    dhs_ref[:] = d_hs.astype(dhs_ref.dtype)
    dhr_ref[:] = d_hr.astype(dhr_ref.dtype)
    _accum_weight_grads(
        (dw01_ref, dw1s1_ref, dw1v1_ref, dw02_ref, dw1s2_ref, dw1v2_ref), dws
    )


def _bwd_kernel_tab(cfg: MessageConfig, sub: int, hu_ref, hr_ref, loc_ref,
                    d2_ref, attr_ref, mask_ref, w01_ref, w1s1_ref, bd1_ref,
                    w02_ref, w1s2_ref, bd2_ref, dagg_ref,
                    dhu_ref, dhr_ref, dw01_ref, dw1s1_ref, dw1v1_ref,
                    dw02_ref, dw1s2_ref, dw1v2_ref):
    """Tabled backward: sender cotangents fold into the per-tile table via
    onehot^T (MXU) instead of a [N*K, F] per-edge tensor; ``sub`` backward
    sub-tiles share each table block and accumulate into the same d_hu block
    (sequential TPU grid; the block flushes when its index changes)."""
    dt = hr_ref.dtype
    oh = _onehot(loc_ref[:], cfg.u, dt)
    hs_t = jnp.dot(oh, hu_ref[:], preferred_element_type=jnp.float32).astype(dt)
    d_hs, d_hr, dws = _bwd_tail(
        cfg, hs_t, hr_ref, d2_ref, attr_ref, mask_ref,
        w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref, dagg_ref,
        cfg.tile,
    )
    dhr_ref[:] = d_hr.astype(dhr_ref.dtype)
    d_hu = jnp.dot(oh.T, d_hs.astype(dt), preferred_element_type=jnp.float32)

    i = pl.program_id(0)

    @pl.when(i % sub == 0)
    def _():
        dhu_ref[:] = jnp.zeros_like(dhu_ref)

    dhu_ref[:] += d_hu.astype(dhu_ref.dtype)
    _accum_weight_grads(
        (dw01_ref, dw1s1_ref, dw1v1_ref, dw02_ref, dw1s2_ref, dw1v2_ref), dws
    )


def _specs(cfg: MessageConfig):
    T, K, F, p = cfg.tile, cfg.k, cfg.f, cfg.pack
    Hs, Hv = cfg.hs, cfg.hv
    S1, V1 = cfg.s1, cfg.v1
    row = lambda i: (i, 0)
    fix = lambda i: (0, 0)
    R = T * K // p
    data_specs = [
        pl.BlockSpec((R, p * F), row, memory_space=pltpu.VMEM),  # hs (packed)
        pl.BlockSpec((T, F), row, memory_space=pltpu.VMEM),  # hr
        pl.BlockSpec((R, p), row, memory_space=pltpu.VMEM),  # d2
        pl.BlockSpec((R, 4 * p), row, memory_space=pltpu.VMEM),  # attr
        pl.BlockSpec((R, p), row, memory_space=pltpu.VMEM),  # mask
    ]
    w_specs = [
        pl.BlockSpec((p * (S1 + V1), p * (Hs + Hv)), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((p * S1, p * Hv), fix, memory_space=pltpu.VMEM),  # W1S l1
        pl.BlockSpec((p * 3 * V1, p * 3 * Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((p * (Hs + Hv), p * (Hs + Hv)), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((p * Hs, p * Hv), fix, memory_space=pltpu.VMEM),  # W1S l2
        pl.BlockSpec((p * 3 * Hv, p * 3 * Hv), fix, memory_space=pltpu.VMEM),
    ]
    return data_specs, w_specs


def _split_weights(cfg, w0e1, w1o1, w0e2, w1o2):
    """Reference-layout weights -> kernel form (W0, W1S, blockdiag(W1V)),
    additionally block-diagonalized over the ``pack`` halves."""
    p = cfg.pack
    eye3 = jnp.eye(3, dtype=w1o1.dtype)
    bd1 = jnp.kron(eye3, w1o1[cfg.s1 :])  # [3V1, 3Hv]
    bd2 = jnp.kron(eye3, w1o2[cfg.hs :])  # [3Hv, 3Hv]
    ws = (w0e1, w1o1[: cfg.s1], bd1, w0e2, w1o2[: cfg.hs], bd2)
    if p == 1:
        return ws
    eyep = jnp.eye(p, dtype=w1o1.dtype)
    return tuple(jnp.kron(eyep, w) for w in ws)


# raise the scoped-VMEM cap (default ~16MB) so larger node tiles compile;
# the kernels' live set is sized by tile × K × feature width
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)



def _cost(cfg, n, ws, operands, outs, scale=1):
    """Rough CostEstimate for the latency-hiding scheduler: without one,
    Mosaic custom-calls look free and XLA never hoists a halo
    all-gather-start across them (tools/exp_overlap_evidence.py).  flops =
    2·(edge slots)·Σ w_in·w_out per message layer; bytes = operand+result
    HBM traffic; transcendentals = gate activations per slot."""
    rows = n * cfg.k
    flops = 2 * rows * sum(int(w.shape[-2]) * int(w.shape[-1]) for w in ws)
    gates = rows * 2 * (cfg.hs + 2 * cfg.hv)
    byts = sum(int(np_prod(x.shape)) * x.dtype.itemsize
               for x in operands + outs)
    return pl.CostEstimate(flops=scale * flops, transcendentals=scale * gates,
                           bytes_accessed=byts)


def np_prod(shape):
    out = 1
    for d in shape:
        out *= int(d)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_message_aggregate(cfg: MessageConfig, hs, hr, d2, attr, maskf,
                            w0e1, w1o1, w0e2, w1o2):
    """agg [N, F] = Σ_k mask · MLP(h_s ‖ h_r ‖ d², sh) — fused on-chip.

    With p = cfg.pack: hs [N*K/p, p*F] gathered sender features (cm layout,
    p consecutive slots per row — the contiguous reshape of [N*K, F]);
    hr [N, F]; d2 [N*K/p, p]; attr [N*K/p, 4p]; maskf [N*K/p, p] float;
    weights with norms pre-folded, in the reference row layout
    (w0e [S+V, hs+hv], w1o [S+V, hv]).
    N must be a multiple of cfg.tile (pad outside); K % p == 0.
    """
    return _fwd_call(cfg, hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2)


def _fwd_call(cfg, hs, hr, d2, attr, maskf, w0e1, w1o1, w0e2, w1o2):
    n = hr.shape[0]
    assert n % cfg.tile == 0, (n, cfg.tile)
    assert cfg.k % cfg.pack == 0, (cfg.k, cfg.pack)
    r = n * cfg.k // cfg.pack
    # all packed-operand shapes checked up front: a caller that sets pack>1
    # but forgets the [N*K, C] -> [N*K/p, p*C] reshape would otherwise hit an
    # opaque Pallas BlockSpec/grid error
    assert hs.shape == (r, cfg.pack * cfg.f), (hs.shape, r, cfg.pack, cfg.f)
    assert d2.shape == (r, cfg.pack), (d2.shape, r, cfg.pack)
    assert attr.shape == (r, 4 * cfg.pack), (attr.shape, r, cfg.pack)
    assert maskf.shape == (r, cfg.pack), (maskf.shape, r, cfg.pack)
    n_tiles = n // cfg.tile
    data_specs, w_specs = _specs(cfg)
    ws = _split_weights(cfg, w0e1, w1o1, w0e2, w1o2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(n_tiles,),
        in_specs=data_specs + w_specs,
        out_specs=pl.BlockSpec((cfg.tile, cfg.f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cfg.f), hr.dtype),
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_cost(cfg, n, (w0e1, w1o1, w0e2, w1o2),
                            [hs, hr, d2, attr, maskf], [hr]),
    )(hs, hr, d2, attr, maskf, *ws)


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
    data_specs, w_specs = _specs(cfg)
    T, K, F, p = cfg.tile, cfg.k, cfg.f, cfg.pack
    Hs, Hv = cfg.hs, cfg.hv
    S1, V1 = cfg.s1, cfg.v1
    ws = _split_weights(cfg, w0e1, w1o1, w0e2, w1o2)
    fix = lambda i: (0, 0)
    # weight grads accumulate over ~N/tile grid steps: always fp32 in-kernel,
    # cast back to the weight dtype after the call
    out_shapes = (
        jax.ShapeDtypeStruct(hs.shape, hs.dtype),
        jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        jax.ShapeDtypeStruct((S1 + V1, Hs + Hv), jnp.float32),
        jax.ShapeDtypeStruct((S1, Hv), jnp.float32),
        jax.ShapeDtypeStruct((V1, Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hs + Hv, Hs + Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hs, Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hv, Hv), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((T * K // p, p * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S1 + V1, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((S1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((V1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs + Hv, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hv, Hv), fix, memory_space=pltpu.VMEM),
    )
    (dhs, dhr, dw01, dw1s1, dw1v1, dw02, dw1s2, dw1v2) = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(n_tiles,),
        in_specs=data_specs
        + w_specs
        + [pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_cost(cfg, hr.shape[0], (w0e1, w1o1, w0e2, w1o2),
                            [hs, hr, d2, attr, maskf, d_agg],
                            [hs, hr], scale=3),
    )(hs, hr, d2, attr, maskf, *ws, d_agg)
    zeros = lambda x: jnp.zeros_like(x)
    wdt = w0e1.dtype
    d_w1o1 = jnp.concatenate([dw1s1, dw1v1], axis=0).astype(wdt)
    d_w1o2 = jnp.concatenate([dw1s2, dw1v2], axis=0).astype(wdt)
    return (dhs, dhr, zeros(d2), zeros(attr), zeros(maskf),
            dw01.astype(wdt), d_w1o1, dw02.astype(wdt), d_w1o2)


fused_message_aggregate.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Slot-major (km) variant — the production lmax=1 bench path since r4.
#
# Same math as the v2 stacked-lane kernel above, but with the generic
# kernel's slot-major row order (row k*T + t = slot k of node t), which
# removes every dense-E expand matmul:
#   - senders arrive [K, N, F] (``h[senders.T]`` — already the gather order
#     of take_dense_symmetric_km); the VMEM block assembles by K leading
#     reads + one sublane concat;
#   - the receiver repeat is ``concat([hr] * K)``; the K-slot sum is K
#     static sublane slices + adds (its transpose);
#   - geometry rides ONE node-major lane-dense [N, K*(A+2)] operand
#     (attr ‖ d2 ‖ mask — precomputed by compute_attributes_dense) and
#     relayouts to per-slot rows through a VMEM scratch.
# The r3 generic-kernel rework measured the dense-E machinery as the bulk
# of its overhead floor (docs/PERF.md); this applies the same fix to the
# lmax=1 kernel, which had been stuck at ~297.8 ms/step for three rounds.
# pack>1 keeps the t-major kernel (measured-rejected anyway, default 1).
# ---------------------------------------------------------------------------


def _fwd_kernel_km(cfg: MessageConfig, hs_ref, hr_ref, geo_ref,
                   w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref,
                   out_ref, geo_scr):
    K, T = cfg.k, cfg.tile
    Hs, Hv = cfg.hs, cfg.hv
    dt = hr_ref.dtype
    d2, attr, maskf = _geo_rows_km(geo_ref, geo_scr, T, K, 4)
    hs_t = _assemble_km(hs_ref, K)
    hrr = _rep_rows_km(hr_ref[:], K)
    sc = attr[:, 0:1]
    vV = _vstack(attr, cfg.v1, 1)
    vH = _vstack(attr, Hv, 1)
    Xs, Xv = _build_inputs(cfg, hs_t, hrr, d2, attr, 1)
    m0, m1, _ = _layer_fwd(
        Xs, Xv, sc, vV, vH, w01_ref[:], w1s1_ref[:], bd1_ref[:], Hs, Hv, 1
    )
    m0 = m0.astype(dt)
    m1 = m1.astype(dt)
    m0b, m1b, _ = _layer_fwd(
        m0, m1, sc, vH, vH, w02_ref[:], w1s2_ref[:], bd2_ref[:], Hs, Hv, 1
    )
    msum = jnp.concatenate([m0b, m1b], axis=-1) * maskf.astype(jnp.float32)
    out_ref[:] = _ksum_km(msum, K).astype(out_ref.dtype)


def _bwd_kernel_km(cfg: MessageConfig, hs_ref, hr_ref, geo_ref,
                   w01_ref, w1s1_ref, bd1_ref, w02_ref, w1s2_ref, bd2_ref,
                   dagg_ref, dhs_ref, dhr_ref,
                   dw01_ref, dw1s1_ref, dw1v1_ref,
                   dw02_ref, dw1s2_ref, dw1v2_ref, geo_scr):
    K, T = cfg.k, cfg.tile
    Hs, Hv = cfg.hs, cfg.hv
    V1 = cfg.v1
    dt = hr_ref.dtype
    d2, attr, maskf = _geo_rows_km(geo_ref, geo_scr, T, K, 4)
    hs_t = _assemble_km(hs_ref, K)
    hrr = _rep_rows_km(hr_ref[:], K)
    sc = attr[:, 0:1]
    vV = _vstack(attr, cfg.v1, 1)
    vH = _vstack(attr, Hv, 1)
    w01, w1s1, bd1 = w01_ref[:], w1s1_ref[:], bd1_ref[:]
    w02, w1s2, bd2 = w02_ref[:], w1s2_ref[:], bd2_ref[:]

    # ---- recompute forward ----
    Xs, Xv = _build_inputs(cfg, hs_t, hrr, d2, attr, 1)
    m0, m1, res1 = _layer_fwd(Xs, Xv, sc, vV, vH, w01, w1s1, bd1, Hs, Hv, 1)
    m0 = m0.astype(dt)
    m1 = m1.astype(dt)
    _, _, res2 = _layer_fwd(m0, m1, sc, vH, vH, w02, w1s2, bd2, Hs, Hv, 1)

    # ---- backward ----
    d_mr = _rep_rows_km(dagg_ref[:].astype(jnp.float32), K)
    dmh = (d_mr * maskf.astype(jnp.float32)).astype(dt)
    d_m0, d_m1, dW02, dW1S2, dW1V2 = _layer_bwd(
        res2, dmh[:, :Hs], dmh[:, Hs:], sc, vH, vH, w02, w1s2, bd2,
        Hs, Hv, 1, dt,
    )
    d_Xs, d_Xv, dW01, dW1S1, dW1V1 = _layer_bwd(
        res1, d_m0, d_m1, sc, vV, vH, w01, w1s1, bd1, Hs, Hv, 1, dt
    )
    # split layer-1 input cotangents (Xs = [hs0e ‖ hr0e ‖ d2]; Xv groups =
    # [hs_c ‖ hr_c]); geometry gets none
    d_hs = _cat([d_Xs[:, :Hs]]
                + [d_Xv[:, c * V1 : c * V1 + Hv] for c in range(3)])
    d_hrr = _cat([d_Xs[:, Hs : 2 * Hs]]
                 + [d_Xv[:, c * V1 + Hv : (c + 1) * V1] for c in range(3)])
    for i in range(K):
        dhs_ref[i] = d_hs[i * T : (i + 1) * T].astype(dhs_ref.dtype)
    dhr_ref[:] = _ksum_km(d_hrr, K).astype(dhr_ref.dtype)
    _accum_weight_grads(
        (dw01_ref, dw1s1_ref, dw1v1_ref, dw02_ref, dw1s2_ref, dw1v2_ref),
        (dW01, dW1S1, dW1V1, dW02, dW1S2, dW1V2),
    )


def _specs_km(cfg: MessageConfig, tile: int):
    K, F = cfg.k, cfg.f
    Hs, Hv = cfg.hs, cfg.hv
    S1, V1 = cfg.s1, cfg.v1
    row = lambda i: (i, 0)
    fix = lambda i: (0, 0)
    data_specs = [
        pl.BlockSpec((K, tile, F), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),  # hs [K, N, F]
        pl.BlockSpec((tile, F), row, memory_space=pltpu.VMEM),  # hr
        pl.BlockSpec((tile, K * 6), row, memory_space=pltpu.VMEM),  # geo2
    ]
    w_specs = [
        pl.BlockSpec((S1 + V1, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((S1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * V1, 3 * Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs + Hv, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * Hv, 3 * Hv), fix, memory_space=pltpu.VMEM),
    ]
    return data_specs, w_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_message_aggregate_km(cfg: MessageConfig, hs3, hr, geo2,
                               w0e1, w1o1, w0e2, w1o2):
    """agg [N, F] = Σ_k mask · MLP(h_s ‖ h_r ‖ d², sh) — slot-major kernel.

    hs3 [K, N, F] slot-major gathered sender features (``h[senders.T]`` /
    take_dense_symmetric_km); hr [N, F]; geo2 [N, K*6] node-major packed
    lmax=1 geometry (sh attr(4) ‖ d2 ‖ mask per slot — the edge_geo stream
    of compute_attributes_dense); weights with norms pre-folded, in the
    reference row layout (l1_tensor_prod.py:242-297).  N must be a multiple
    of cfg.tile and cfg.bwd_tile (pad outside); requires cfg.pack == 1.
    """
    return _fwd_call_km(cfg, hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2)


def _fwd_call_km(cfg, hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2):
    if cfg.gemm_form:
        return _fwd_call_km2(cfg, hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2)
    n = hr.shape[0]
    assert cfg.pack == 1, "slot-major kernel runs unpacked"
    assert n % cfg.tile == 0, (n, cfg.tile)
    assert hs3.shape == (cfg.k, n, cfg.f), (hs3.shape, (cfg.k, n, cfg.f))
    assert geo2.shape == (n, cfg.k * 6), (geo2.shape, (n, cfg.k * 6))
    data_specs, w_specs = _specs_km(cfg, cfg.tile)
    ws = _split_weights(cfg, w0e1, w1o1, w0e2, w1o2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_km, cfg),
        grid=(n // cfg.tile,),
        in_specs=data_specs + w_specs,
        out_specs=pl.BlockSpec((cfg.tile, cfg.f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cfg.f), hr.dtype),
        scratch_shapes=[pltpu.VMEM((cfg.k * cfg.tile, 6), hr.dtype)],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_cost(cfg, n, (w0e1, w1o1, w0e2, w1o2),
                            [hs3, hr, geo2], [hr]),
    )(hs3, hr, geo2, *ws)


def _vjp_fwd_km(cfg, hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2):
    out = _fwd_call_km(cfg, hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2)
    return out, (hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2)


def _vjp_bwd_km(cfg, residuals, d_agg):
    import dataclasses

    hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2 = residuals
    bt = cfg.bwd_tile or (cfg.tile // 2 if cfg.tile % 2 == 0 else cfg.tile)
    cfg = dataclasses.replace(cfg, tile=bt)
    n = hr.shape[0]
    assert n % bt == 0, (n, bt)
    data_specs, w_specs = _specs_km(cfg, bt)
    T, K, F = bt, cfg.k, cfg.f
    Hs, Hv = cfg.hs, cfg.hv
    S1, V1 = cfg.s1, cfg.v1
    ws = _split_weights(cfg, w0e1, w1o1, w0e2, w1o2)
    fix = lambda i: (0, 0)
    out_shapes = (
        jax.ShapeDtypeStruct(hs3.shape, hs3.dtype),
        jax.ShapeDtypeStruct(hr.shape, hr.dtype),
        jax.ShapeDtypeStruct((S1 + V1, Hs + Hv), jnp.float32),
        jax.ShapeDtypeStruct((S1, Hv), jnp.float32),
        jax.ShapeDtypeStruct((V1, Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hs + Hv, Hs + Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hs, Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hv, Hv), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((K, T, F), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S1 + V1, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((S1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((V1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs + Hv, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hv, Hv), fix, memory_space=pltpu.VMEM),
    )
    dagg_spec = [pl.BlockSpec((T, F), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if cfg.gemm_form_bwd:
        mats = _km2_mats(cfg, w0e1, w1o1, w0e2, w1o2)
        kern, in_specs, ops = (
            functools.partial(_bwd_kernel_km2, cfg),
            data_specs + _km2_w_specs(cfg, 15) + dagg_spec,
            (hs3, hr, geo2, *mats, d_agg),
        )
    else:
        kern, in_specs, ops = (
            functools.partial(_bwd_kernel_km, cfg),
            data_specs + w_specs + dagg_spec,
            (hs3, hr, geo2, *ws, d_agg),
        )
    (dhs, dhr, dw01, dw1s1, dw1v1, dw02, dw1s2, dw1v2) = pl.pallas_call(
        kern,
        grid=(n // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((K * T, 6), hr.dtype)],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_cost(cfg, n, (w0e1, w1o1, w0e2, w1o2),
                            [hs3, hr, geo2, d_agg], [hs3, hr], scale=3),
    )(*ops)
    wdt = w0e1.dtype
    d_w1o1 = jnp.concatenate([dw1s1, dw1v1], axis=0).astype(wdt)
    d_w1o2 = jnp.concatenate([dw1s2, dw1v2], axis=0).astype(wdt)
    return (dhs, dhr, jnp.zeros_like(geo2),
            dw01.astype(wdt), d_w1o1, dw02.astype(wdt), d_w1o2)


fused_message_aggregate_km.defvjp(_vjp_fwd_km, _vjp_bwd_km)


# ---------------------------------------------------------------------------
# GEMM-form slot-major kernel (km2).  The km kernel is VPU-bound at ~3x its
# element floor on sub-128-lane features; most of the gap is Mosaic vector
# relayouts: every _cat/_vstack/_bch/_rep3/slice-at-offset is one or more
# full-register shuffle passes.  km2 folds ALL data rearrangement into
# zero-row-padded weight matrices consumed by plain GEMMs on two wide
# operands (hsr = [h_s ‖ h_r] and m01 = [m0 ‖ m1]):
#
#   o0 = (hsr @ W0p + d2 @ w0d)·s  +  Σ_c (hsr @ W0v_c)·v_c
#   A  =  hsr @ WAp + d2 @ wAd
#   B  =  s · Σ_c hsr @ WB_c          (output-block-padded: no concat)
#   o1 = cg011 · ((A @ P3) · (attr @ Pv) + B)
#   m01' = [o0_s·σ(o0_s) ‖ o1 · (σ(o0) @ Pg)]
#
# where the row-scalar scales (s, v_c) commute through the GEMMs and every
# 0/1 placement (P3 = rep3, Pv = component broadcast, Pg = gate replicate)
# is a tiny MXU matmul instead of a lane relayout.  MXU work grows ~5x
# (still ~2 ms/layer at 100k shapes) but the VPU pass count drops ~3x —
# the right trade on a VPU-bound kernel.  Same math as the reference chain
# (l1_tensor_prod.py:242-297): the padded matrices are exact row/col
# embeddings of W0 / W1S / W1V.
# ---------------------------------------------------------------------------


def _km2_mats(cfg: MessageConfig, w0e1, w1o1, w0e2, w1o2):
    """Padded GEMM-form weights + 0/1 placement mats (outside the kernel).

    Returns 13 operands, each small enough to ride as a fixed VMEM block.
    Traceable jnp ops — ordinary AD transposes the padding, so a custom_vjp
    over the ORIGINAL weights can also just reuse these inside its backward.
    """
    Hs, Hv, F = cfg.hs, cfg.hv, cfg.f
    S1 = cfg.s1
    dt = w0e1.dtype
    G = Hs + Hv
    F2 = 2 * F
    W0, W1S, W1V = w0e1, w1o1[:S1], w1o1[S1:]
    W02, W1S2, W1V2 = w0e2, w1o2[:Hs], w1o2[Hs:]
    z = lambda r, c: jnp.zeros((r, c), dt)
    cg = jnp.asarray(CG110, dt)

    w0_hsr = z(F2, G).at[0:Hs].set(W0[0:Hs]).at[F:F + Hs].set(W0[Hs:2 * Hs])
    w0_d2 = W0[2 * Hs : 2 * Hs + 1]
    w0v = jnp.concatenate([
        z(F2, G)
        .at[Hs + c * Hv : Hs + (c + 1) * Hv].set(cg * W0[S1 : S1 + Hv])
        .at[F + Hs + c * Hv : F + Hs + (c + 1) * Hv].set(
            cg * W0[S1 + Hv : S1 + 2 * Hv])
        for c in range(3)], axis=0)  # [3·F2, G]
    wA = z(F2, Hv).at[0:Hs].set(W1S[0:Hs]).at[F:F + Hs].set(W1S[Hs:2 * Hs])
    wA_d2 = W1S[2 * Hs : 2 * Hs + 1]
    wB = jnp.concatenate([
        z(F2, 3 * Hv)
        .at[Hs + c * Hv : Hs + (c + 1) * Hv, c * Hv : (c + 1) * Hv].set(
            W1V[0:Hv])
        .at[F + Hs + c * Hv : F + Hs + (c + 1) * Hv,
            c * Hv : (c + 1) * Hv].set(W1V[Hv : 2 * Hv])
        for c in range(3)], axis=0)  # [3·F2, 3Hv]

    w2_m = z(F, G).at[0:Hs].set(W02[0:Hs])
    w2v = jnp.concatenate([
        z(F, G).at[Hs + c * Hv : Hs + (c + 1) * Hv].set(
            cg * W02[Hs : Hs + Hv])
        for c in range(3)], axis=0)
    wA2 = z(F, Hv).at[0:Hs].set(W1S2)
    wB2 = jnp.concatenate([
        z(F, 3 * Hv).at[Hs + c * Hv : Hs + (c + 1) * Hv,
                        c * Hv : (c + 1) * Hv].set(W1V2)
        for c in range(3)], axis=0)

    p3 = np.zeros((Hv, 3 * Hv), np.float32)
    pg = np.zeros((G, 3 * Hv), np.float32)
    pv = np.zeros((4, 3 * Hv), np.float32)
    for c in range(3):
        for j in range(Hv):
            p3[j, c * Hv + j] = 1.0
            pg[Hs + j, c * Hv + j] = 1.0
        pv[1 + c, c * Hv : (c + 1) * Hv] = 1.0
    # backward-only selections: m01 [.., F] cotangent -> zero-padded m0
    # cotangent [.., G] / m1 cotangent [.., 3Hv] without lane slicing
    pm0 = np.zeros((F, G), np.float32)
    pm1 = np.zeros((F, 3 * Hv), np.float32)
    for j in range(Hs):
        pm0[j, j] = 1.0
    for j in range(3 * Hv):
        pm1[Hs + j, j] = 1.0
    return (w0_hsr, w0_d2, w0v, wA, wA_d2, wB, w2_m, w2v, wA2, wB2,
            jnp.asarray(p3, dt), jnp.asarray(pg, dt), jnp.asarray(pv, dt),
            jnp.asarray(pm0, dt), jnp.asarray(pm1, dt))


def _tp_layer_km2(cfg, x, d2, sc, vcols, vfull, w_main, w_d2, w_v, w_A,
                  wA_d2, w_B, p3, pg, internals: bool = False):
    """One gated L1 TP layer in GEMM form; x = hsr [R, 2F] (layer 1, with
    d2) or m01 [R, F] (layer 2, d2 None).  Returns m01' [R, F] in dtype of
    x.  Stacked w_v/w_B hold the 3 per-component matrices on sublanes."""
    Hs, Hv = cfg.hs, cfg.hv
    dt = x.dtype
    rw = x.shape[-1]
    o0 = _mm(x, w_main)
    A = _mm(x, w_A)
    if d2 is not None:
        d2t = d2.astype(dt)
        o0 = o0 + _mm(d2t, w_d2)
        A = A + _mm(d2t, wA_d2)
    o0 = o0 * sc
    for c in range(3):
        o0 = o0 + _mm(x, w_v[c * rw : (c + 1) * rw]) * vcols[c]
    B = sum(_mm(x, w_B[c * rw : (c + 1) * rw]) for c in range(3)) * sc
    o1 = CG011 * (_mm(A.astype(dt), p3) * vfull + B)
    sg = jax.nn.sigmoid(o0)  # [R, G] f32, one pass (σ feeds silu AND gates)
    gmul = _mm(sg.astype(dt), pg)
    m0 = o0[:, :Hs] * sg[:, :Hs]
    m1 = o1 * gmul
    out = jnp.concatenate([m0, m1], axis=-1).astype(dt)
    if internals:
        return out, (o0, sg, o1, gmul)
    return out


def _tp_layer_km2_bwd(cfg, x, d2, sc, vcols, vfull, internals, dm01,
                      w_main, w_d2, w_v, w_A, wA_d2, w_B, p3, pg, pm0, pm1):
    """Hand transpose of ``_tp_layer_km2`` — GEMM form throughout.

    ``dm01`` [R, F] cotangent of the layer output.  Returns
    (d_x [R, rw] dtype-of-x, wg) where ``wg`` holds the UNSLICED transposed
    products (dW_main_full [rw, G], dW_d2 [1, G]|None, dWv_full [3rw, G],
    dWA_full [rw, Hv], dWA_d2 [1, Hv]|None, dWB_full [rw, 3Hv]) — the
    caller slices them back to reference weight rows (weight-sized sublane
    slices, cheap).  No lane slicing anywhere: the m0/m1 cotangent split
    rides the pm0/pm1 selection GEMMs, and activation grads are rebuilt
    from the saved σ (no extra transcendentals)."""
    dt = x.dtype
    rw = x.shape[-1]
    o0, sg, o1, gmul = internals
    dm01f = dm01.astype(dt)
    dm1 = _mm(dm01f, pm1)  # [R, 3Hv] f32
    dm0p = _mm(dm01f, pm0)  # [R, G] f32, gate lanes zero
    d_o1 = dm1 * gmul
    d_gm = (dm1 * o1).astype(dt)
    d_sg = _mm(d_gm, pg.T)  # [R, G], scalar lanes zero
    # silu'(o0_s)·dm0 on scalar lanes + σ'(o0_g)·d_sg on gate lanes, both
    # from the saved σ — full-width, the zero lanes of each term mask the
    # other's domain
    d_o0 = dm0p * (sg * (1.0 + o0 * (1.0 - sg))) + d_sg * (sg * (1.0 - sg))
    d_B = CG011 * d_o1
    d_AP = (d_B * vfull).astype(dt)
    d_A = _mm(d_AP, p3.T).astype(dt)  # [R, Hv]
    d_Bs = (d_B * sc).astype(dt)  # [R, 3Hv]
    g_sc = (d_o0 * sc).astype(dt)  # [R, G]
    g_vc = [(d_o0 * vcols[c]).astype(dt) for c in range(3)]
    # input cotangent — every term a GEMM into the full rw-lane space
    d_x = _mm(g_sc, w_main.T)
    d_x = d_x + _mm(d_A, w_A.T)
    for c in range(3):
        d_x = d_x + _mm(g_vc[c], w_v[c * rw : (c + 1) * rw].T)
        d_x = d_x + _mm(d_Bs, w_B[c * rw : (c + 1) * rw].T)
    xt = x.T
    # d2 row gradients as masked sublane reductions ([1, R] @ [R, G]
    # transposed matmuls put R on lanes — avoid)
    red = lambda g: jnp.sum(g.astype(jnp.float32)
                            * d2.astype(jnp.float32), axis=0, keepdims=True)
    wg = (
        _mm(xt, g_sc),  # dW_main_full [rw, G]
        red(g_sc) if d2 is not None else None,
        jnp.concatenate([_mm(xt, g_vc[c]) for c in range(3)], axis=0),
        _mm(xt, d_A),  # dWA_full [rw, Hv]
        red(d_A) if d2 is not None else None,
        _mm(xt, d_Bs),  # dWB_full [rw, 3Hv] (shared by the 3 blocks)
    )
    return d_x.astype(dt), wg


def _km2_assemble_wgrads(cfg, wg1, wg2):
    """Slice the full transposed products back to reference weight rows.

    Inverse of the _km2_mats embeddings: structurally-zero weight rows'
    gradients are discarded, shared blocks (hs_v/hr_v across components;
    the W1V output blocks) sum.  All weight-sized f32 ops."""
    Hs, Hv, F = cfg.hs, cfg.hv, cfg.f
    rw = 2 * F
    cg = CG110
    dWm, dWd2, dWv, dWA, dWAd2, dWB = wg1
    hs_v = cg * sum(dWv[c * rw + Hs + c * Hv : c * rw + Hs + (c + 1) * Hv]
                    for c in range(3))
    hr_v = cg * sum(
        dWv[c * rw + F + Hs + c * Hv : c * rw + F + Hs + (c + 1) * Hv]
        for c in range(3))
    dW0 = jnp.concatenate(
        [dWm[0:Hs], dWm[F:F + Hs], dWd2, hs_v, hr_v], axis=0)  # [S1+V1, G]
    dW1S = jnp.concatenate([dWA[0:Hs], dWA[F:F + Hs], dWAd2], axis=0)
    dW1V = jnp.concatenate([
        sum(dWB[Hs + c * Hv : Hs + (c + 1) * Hv, c * Hv : (c + 1) * Hv]
            for c in range(3)),
        sum(dWB[F + Hs + c * Hv : F + Hs + (c + 1) * Hv,
                c * Hv : (c + 1) * Hv] for c in range(3)),
    ], axis=0)  # [2Hv, Hv]
    dWm2, _, dWv2, dWA2f, _, dWB2f = wg2
    dv2 = cg * sum(dWv2[c * F + Hs + c * Hv : c * F + Hs + (c + 1) * Hv]
                   for c in range(3))
    dW02 = jnp.concatenate([dWm2[0:Hs], dv2], axis=0)  # [Hs+Hv, G]
    dW1S2 = dWA2f[0:Hs]
    dW1V2 = sum(dWB2f[Hs + c * Hv : Hs + (c + 1) * Hv, c * Hv : (c + 1) * Hv]
                for c in range(3))
    return dW0, dW1S, dW1V, dW02, dW1S2, dW1V2


def _bwd_kernel_km2(cfg: MessageConfig, hs_ref, hr_ref, geo_ref,
                    m1_ref, m2_ref, m3_ref, m4_ref, m5_ref, m6_ref,
                    m7_ref, m8_ref, m9_ref, m10_ref, m11_ref, m12_ref,
                    m13_ref, m14_ref, m15_ref, dagg_ref,
                    dhs_ref, dhr_ref, dw01_ref, dw1s1_ref, dw1v1_ref,
                    dw02_ref, dw1s2_ref, dw1v2_ref, geo_scr):
    K, T, F = cfg.k, cfg.tile, cfg.f
    d2, attr, maskf = _geo_rows_km(geo_ref, geo_scr, T, K, 4)
    hs_t = _assemble_km(hs_ref, K)
    hrr = _rep_rows_km(hr_ref[:], K)
    hsr = jnp.concatenate([hs_t, hrr], axis=-1)
    (w0_hsr, w0_d2, w0v, wA, wA_d2, wB, w2_m, w2v, wA2, wB2, p3, pg, pv,
     pm0, pm1) = (m1_ref[:], m2_ref[:], m3_ref[:], m4_ref[:], m5_ref[:],
                  m6_ref[:], m7_ref[:], m8_ref[:], m9_ref[:], m10_ref[:],
                  m11_ref[:], m12_ref[:], m13_ref[:], m14_ref[:], m15_ref[:])
    sc = attr[:, 0:1].astype(jnp.float32)
    vcols = [attr[:, 1 + c : 2 + c].astype(jnp.float32) for c in range(3)]
    vfull = _mm(attr, pv)
    # recompute forward (keep σ/o0/o1/gmul per layer — cheap, row-width f32)
    m01, int1 = _tp_layer_km2(cfg, hsr, d2, sc, vcols, vfull, w0_hsr, w0_d2,
                              w0v, wA, wA_d2, wB, p3, pg, internals=True)
    _, int2 = _tp_layer_km2(cfg, m01, None, sc, vcols, vfull, w2_m, None,
                            w2v, wA2, None, wB2, p3, pg, internals=True)
    dm01b = _rep_rows_km(dagg_ref[:].astype(jnp.float32), K) \
        * maskf.astype(jnp.float32)
    d_m01, wg2 = _tp_layer_km2_bwd(cfg, m01, None, sc, vcols, vfull, int2,
                                   dm01b, w2_m, None, w2v, wA2, None, wB2,
                                   p3, pg, pm0, pm1)
    d_hsr, wg1 = _tp_layer_km2_bwd(cfg, hsr, d2, sc, vcols, vfull, int1,
                                   d_m01, w0_hsr, w0_d2, w0v, wA, wA_d2, wB,
                                   p3, pg, pm0, pm1)
    for i in range(K):
        dhs_ref[i] = d_hsr[i * T : (i + 1) * T, :F].astype(dhs_ref.dtype)
    dhr_ref[:] = _ksum_km(d_hsr[:, F:], K).astype(dhr_ref.dtype)
    _accum_weight_grads(
        (dw01_ref, dw1s1_ref, dw1v1_ref, dw02_ref, dw1s2_ref, dw1v2_ref),
        _km2_assemble_wgrads(cfg, wg1, wg2),
    )


def _fwd_kernel_km2(cfg: MessageConfig, hs_ref, hr_ref, geo_ref,
                    m1_ref, m2_ref, m3_ref, m4_ref, m5_ref, m6_ref,
                    m7_ref, m8_ref, m9_ref, m10_ref, m11_ref, m12_ref,
                    m13_ref, out_ref, geo_scr):
    K, T = cfg.k, cfg.tile
    dt = hr_ref.dtype
    d2, attr, maskf = _geo_rows_km(geo_ref, geo_scr, T, K, 4)
    hs_t = _assemble_km(hs_ref, K)
    hrr = _rep_rows_km(hr_ref[:], K)
    hsr = jnp.concatenate([hs_t, hrr], axis=-1)  # [R, 2F] — the ONE concat
    (w0_hsr, w0_d2, w0v, wA, wA_d2, wB, w2_m, w2v, wA2, wB2, p3, pg, pv) = (
        m1_ref[:], m2_ref[:], m3_ref[:], m4_ref[:], m5_ref[:], m6_ref[:],
        m7_ref[:], m8_ref[:], m9_ref[:], m10_ref[:], m11_ref[:], m12_ref[:],
        m13_ref[:])
    sc = attr[:, 0:1].astype(jnp.float32)
    vcols = [attr[:, 1 + c : 2 + c].astype(jnp.float32) for c in range(3)]
    vfull = _mm(attr, pv)  # [R, 3Hv] f32: v_c broadcast over block c
    m01 = _tp_layer_km2(cfg, hsr, d2, sc, vcols, vfull,
                        w0_hsr, w0_d2, w0v, wA, wA_d2, wB, p3, pg)
    m01b = _tp_layer_km2(cfg, m01, None, sc, vcols, vfull,
                         w2_m, None, w2v, wA2, None, wB2, p3, pg)
    out_ref[:] = _ksum_km(m01b * maskf, K).astype(out_ref.dtype)


def _km2_w_specs(cfg: MessageConfig, nmats: int = 13):
    Hs, Hv, F = cfg.hs, cfg.hv, cfg.f
    G, F2 = Hs + Hv, 2 * cfg.f
    fix = lambda i: (0, 0)
    shapes = [(F2, G), (1, G), (3 * F2, G), (F2, Hv), (1, Hv), (F2 * 3, 3 * Hv),
              (F, G), (3 * F, G), (F, Hv), (3 * F, 3 * Hv),
              (Hv, 3 * Hv), (G, 3 * Hv), (4, 3 * Hv),
              (F, G), (F, 3 * Hv)]  # pm0, pm1 (bwd only)
    return [pl.BlockSpec(s, fix, memory_space=pltpu.VMEM)
            for s in shapes[:nmats]]


def _fwd_call_km2(cfg, hs3, hr, geo2, w0e1, w1o1, w0e2, w1o2):
    n = hr.shape[0]
    assert cfg.pack == 1, "km2 kernel runs unpacked"
    assert n % cfg.tile == 0, (n, cfg.tile)
    mats = _km2_mats(cfg, w0e1, w1o1, w0e2, w1o2)[:13]
    data_specs, _ = _specs_km(cfg, cfg.tile)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_km2, cfg),
        grid=(n // cfg.tile,),
        in_specs=data_specs + _km2_w_specs(cfg, 13),
        out_specs=pl.BlockSpec((cfg.tile, cfg.f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cfg.f), hr.dtype),
        scratch_shapes=[pltpu.VMEM((cfg.k * cfg.tile, 6), hr.dtype)],
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=_cost(cfg, n, (w0e1, w1o1, w0e2, w1o2),
                            [hs3, hr, geo2], [hr]),
    )(hs3, hr, geo2, *mats)


# ---------------------------------------------------------------------------
# Tabled-gather variant: per-tile compact sender tables
# (graph.container.DenseEdgeGraph.with_gather_tables).  The XLA gather only
# fetches the ~U unique senders per tile (hu = h[gtab], ~4x less HBM traffic
# than the [N*K, F] expansion), row expansion happens on-chip via a one-hot
# MXU matmul, and sender gradients come back as a dense reverse-table
# gather-sum — no [N*K, F] per-edge cotangent tensor and no scatter.
# The tabled kernels run unpacked (cfg.pack == 1): the one-hot expansion
# already produces [R, F] rows and dominates their cost profile.
# ---------------------------------------------------------------------------


def _specs_tab(cfg: MessageConfig, tile: int, sub: int):
    """Input specs for the tabled kernels at node-tile size ``tile`` where
    ``sub`` consecutive grid steps share one table block."""
    K, F, U = cfg.k, cfg.f, cfg.u
    S1, V1 = cfg.s1, cfg.v1
    Hs, Hv = cfg.hs, cfg.hv
    row = lambda i: (i, 0)
    tab = lambda i: (i // sub, 0)
    fix = lambda i: (0, 0)
    data_specs = [
        pl.BlockSpec((U, F), tab, memory_space=pltpu.VMEM),  # hu (table rows)
        pl.BlockSpec((tile, F), row, memory_space=pltpu.VMEM),  # h (receivers)
        pl.BlockSpec((tile * K, 1), row, memory_space=pltpu.VMEM),  # loc
        pl.BlockSpec((tile * K, 1), row, memory_space=pltpu.VMEM),  # d2
        pl.BlockSpec((tile * K, 4), row, memory_space=pltpu.VMEM),  # attr
        pl.BlockSpec((tile * K, 1), row, memory_space=pltpu.VMEM),  # mask
    ]
    w_specs = [
        pl.BlockSpec((S1 + V1, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((S1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * V1, 3 * Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs + Hv, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * Hv, 3 * Hv), fix, memory_space=pltpu.VMEM),
    ]
    return data_specs, w_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_message_aggregate_tabled(cfg: MessageConfig, h, d2, attr, maskf,
                                   loc, gtab, revd, remp, remn,
                                   w0e1, w1o1, w0e2, w1o2):
    """agg [N, F] — tabled-gather fused message kernel.

    h [N, F] node features (cm layout), N a multiple of cfg.tile; d2/attr/
    maskf [N*K, ·] flattened edge geometry; loc [N*K, 1] int32 slot -> table
    index (pad = U); gtab [ntiles, U] int32 table node ids (pad = N);
    revd [N, q0] / remp+remn [M] SPLIT reverse table (container
    ``with_gather_tables``): dense flat tab positions for the first q0
    appearances of each node (pad = ntiles*U) plus the node-sorted COO
    remainder (pad node = N -> dropped by the segment_sum).  The split form
    cuts the sender-gradient epilogue's per-ROW gather cost ~4x vs the
    dense [N, Q] table (53 -> 12 ms at 250k/K=16, docs/PERF.md r5).
    cfg.tile must equal the graph's gather_tile and cfg.u its table size."""
    return _fwd_call_tab(cfg, h, d2, attr, maskf, loc, gtab,
                         w0e1, w1o1, w0e2, w1o2)


def _take_rows(a, idx):
    # clip, not fill: TPU fill mode materializes a separate full-size
    # select fusion (ops/gather_scatter.take_dense_symmetric).  Safe here:
    # pad gtab rows are never selected by a valid in-kernel one-hot, and
    # the rtab reduction masks explicitly below.  mode="clip" (not a
    # jnp.minimum pre-clamp with the default fill mode, which keeps the
    # compare + full-size NaN select in the HLO — r4 ADVICE.md).
    return jnp.take(a, idx, axis=0, mode="clip")


def _fwd_call_tab(cfg, h, d2, attr, maskf, loc, gtab, w0e1, w1o1, w0e2, w1o2,
                  hu=None):
    n = h.shape[0]
    assert n % cfg.tile == 0, (n, cfg.tile)
    assert cfg.pack == 1, "tabled kernels run unpacked"
    n_tiles = n // cfg.tile
    assert gtab.shape == (n_tiles, cfg.u), (gtab.shape, n_tiles, cfg.u)
    if hu is None:
        hu = _take_rows(h, gtab.reshape(-1))  # [ntiles*U, F]
    data_specs, w_specs = _specs_tab(cfg, cfg.tile, 1)
    ws = _split_weights(cfg, w0e1, w1o1, w0e2, w1o2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_tab, cfg),
        grid=(n_tiles,),
        in_specs=data_specs + w_specs,
        out_specs=pl.BlockSpec((cfg.tile, cfg.f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cfg.f), h.dtype),
        compiler_params=_COMPILER_PARAMS,
    )(hu, h, loc, d2, attr, maskf, *ws)


def _vjp_fwd_tab(cfg, h, d2, attr, maskf, loc, gtab, revd, remp, remn,
                 w0e1, w1o1, w0e2, w1o2):
    # gather hu once and save it: the backward's regather of [ntiles*U, F]
    # rows is pure per-row latency (~13-16 ns/row) while the HBM save+load
    # of the same block is <1 ms (docs/PERF.md r5, generic-kernel result)
    hu = _take_rows(h, gtab.reshape(-1))
    out = _fwd_call_tab(cfg, h, d2, attr, maskf, loc, gtab,
                        w0e1, w1o1, w0e2, w1o2, hu=hu)
    return out, (h, hu, d2, attr, maskf, loc, gtab, revd, remp, remn,
                 w0e1, w1o1, w0e2, w1o2)


def _vjp_bwd_tab(cfg, residuals, d_agg):
    import dataclasses

    (h, hu, d2, attr, maskf, loc, gtab, revd, remp, remn,
     w0e1, w1o1, w0e2, w1o2) = residuals
    gather_tile = cfg.tile
    bt = cfg.bwd_tile or (cfg.tile // 2 if cfg.tile % 2 == 0 else cfg.tile)
    assert gather_tile % bt == 0, (gather_tile, bt)
    sub = gather_tile // bt
    cfg = dataclasses.replace(cfg, tile=bt)
    n = h.shape[0]
    n_tiles = n // bt
    n_tab = n // gather_tile
    data_specs, w_specs = _specs_tab(cfg, bt, sub)
    T, K, F, U = bt, cfg.k, cfg.f, cfg.u
    Hs, Hv = cfg.hs, cfg.hv
    S1, V1 = cfg.s1, cfg.v1
    ws = _split_weights(cfg, w0e1, w1o1, w0e2, w1o2)
    fix = lambda i: (0, 0)
    out_shapes = (
        jax.ShapeDtypeStruct((n_tab * U, F), h.dtype),  # d_hu
        jax.ShapeDtypeStruct(h.shape, h.dtype),  # d_hr
        jax.ShapeDtypeStruct((S1 + V1, Hs + Hv), jnp.float32),
        jax.ShapeDtypeStruct((S1, Hv), jnp.float32),
        jax.ShapeDtypeStruct((V1, Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hs + Hv, Hs + Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hs, Hv), jnp.float32),
        jax.ShapeDtypeStruct((Hv, Hv), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((U, F), lambda i: (i // sub, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((S1 + V1, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((S1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((V1, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs + Hv, Hs + Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hs, Hv), fix, memory_space=pltpu.VMEM),
        pl.BlockSpec((Hv, Hv), fix, memory_space=pltpu.VMEM),
    )
    (dhu, dhr, dw01, dw1s1, dw1v1, dw02, dw1s2, dw1v2) = pl.pallas_call(
        functools.partial(_bwd_kernel_tab, cfg, sub),
        grid=(n_tiles,),
        in_specs=data_specs
        + w_specs
        + [pl.BlockSpec((T, F), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_COMPILER_PARAMS,
    )(hu, h, loc, d2, attr, maskf, *ws, d_agg)

    # sender gradients: SPLIT reverse-table gather-sum (no scatter) — node
    # v's cotangent is the sum of its d_hu rows across the tiles whose
    # tables contain it.  Dense [N, q0] covers the common case (pad
    # n_tab*U: clamped read, zeroed by the validity multiply — fuses, no
    # select temp); the node-sorted COO remainder goes through a sorted
    # segment_sum (pad node = N: dropped).  ~4x fewer gathered rows than
    # the dense [N, Q] table (docs/PERF.md r5).
    acc = dhr
    for qq in range(revd.shape[1]):
        idx = revd[:, qq]
        v = (idx < dhu.shape[0]).astype(dhu.dtype)
        acc = acc + (_take_rows(dhu, idx) * v[:, None]).astype(dhr.dtype)
    rem = _take_rows(dhu, remp)
    d_h = acc + jax.ops.segment_sum(
        rem, remn, num_segments=n, indices_are_sorted=True).astype(dhr.dtype)

    z = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    zeros = lambda x: jnp.zeros_like(x)
    wdt = w0e1.dtype
    d_w1o1 = jnp.concatenate([dw1s1, dw1v1], axis=0).astype(wdt)
    d_w1o2 = jnp.concatenate([dw1s2, dw1v2], axis=0).astype(wdt)
    return (d_h, zeros(d2), zeros(attr), zeros(maskf),
            z(loc), z(gtab), z(revd), z(remp), z(remn),
            dw01.astype(wdt), d_w1o1, dw02.astype(wdt), d_w1o2)


fused_message_aggregate_tabled.defvjp(_vjp_fwd_tab, _vjp_bwd_tab)
