"""Gate nonlinearity for steerable features.

The equivariant nonlinearity of the SEGNN stack (SURVEY.md §3.3: "gate
nonlinearity" sits between the tensor product and the scatter aggregation;
absent from the mounted reference, which only contains the TP module).

Input layout: ``scalars ‖ gates ‖ gated`` —
- ``irreps_scalars``: l=0 features passed through ``act_scalars``;
- one l=0 gate per non-scalar irrep copy, squashed by ``act_gates``;
- ``irreps_gated``: the non-scalar features, multiplied channelwise by their
  gate.  Multiplying an (l,p) irrep by an even scalar is equivariant, so the
  whole op commutes with the O(3) action.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.irreps import Irreps

__all__ = ["Gate"]


class Gate:
    """scalars -> act(scalars); gated -> act(gates) * gated.

    ``irreps_in = irreps_scalars + num_gated x 0e + irreps_gated`` where
    ``num_gated`` is the total multiplicity of ``irreps_gated``.
    ``irreps_out = irreps_scalars + irreps_gated``.
    """

    def __init__(
        self,
        irreps_scalars: Irreps,
        irreps_gated: Irreps,
        act_scalars: Callable = jax.nn.silu,
        act_gates: Callable = jax.nn.sigmoid,
        layout: str = "mul",
    ) -> None:
        # 'mul' = e3nn flat convention; 'cm' = component-major (TPU-fast):
        # each gated group stored [2l+1, mul] row-major so the gate multiply
        # broadcasts over lanes
        self.layout = layout
        self.irreps_scalars = Irreps(irreps_scalars)
        self.irreps_gated = Irreps(irreps_gated)
        if any(mi.ir.l == 0 for mi in self.irreps_gated):
            raise ValueError("irreps_gated must contain only l > 0 irreps")
        if any(mi.ir.l != 0 for mi in self.irreps_scalars):
            raise ValueError("irreps_scalars must contain only l == 0 irreps")
        self.num_gates = self.irreps_gated.num_irreps
        self.irreps_in = (
            self.irreps_scalars + Irreps([(self.num_gates, "0e")]) + self.irreps_gated
        )
        self.irreps_out = self.irreps_scalars + self.irreps_gated
        self.act_scalars = act_scalars
        self.act_gates = act_gates

        self._ns = self.irreps_scalars.dim
        # per-gated-group (mul, 2l+1) shapes, in order
        self._gated_shapes = [(mi.mul, mi.ir.dim) for mi in self.irreps_gated]

    def fast_tables(self):
        """(perm, psel, dk) for the matmul-form gate used inside Pallas kernels.

        The reference-shaped gate (``__call__``) builds its output from
        per-group lane concats whose non-128-aligned offsets cost a vector
        relayout each inside Mosaic (~9 ms/layer of the generic kernel's
        36.5 ms forward at 256k/K=16 — tools/exp_generic_breakdown.py).  The
        matmul form removes every concat: permute the upstream TP's output
        columns to ``scalars ‖ gated ‖ gates`` (a free weight-side column
        gather, outside the kernel), then

            out = y[:, :dk] * (sigmoid(y_f32) @ psel)

        — one full-width transcendental pass, one tiny MXU matmul, one lane
        multiply.  Valid exactly when ``act_scalars`` is silu (= x·σ(x), so
        the scalar multiplier is σ(y_s)) and ``act_gates`` is sigmoid, in
        'cm' layout.  ``perm`` indexes the UNPERMUTED TP output columns
        (scalars ‖ gates ‖ gated); ``psel [irreps_in.dim, dk]`` maps
        σ(y_perm) lanes to output-aligned multipliers: identity on scalars,
        gate g replicated to its component lanes, zero on gated rows.
        """
        ns, ng = self._ns, self.num_gates
        d_in = self.irreps_in.dim
        dk = self.irreps_out.dim
        perm = (list(range(ns)) + list(range(ns + ng, d_in))
                + list(range(ns, ns + ng)))
        # psel rows = σ(y_perm) lanes, cols = output lanes: identity on
        # scalars, gate g replicated to its component lanes, zero on gated
        # rows.  Full-row form on purpose: σ over ALL lanes is ONE VPU pass
        # (lanes pad to 128 regardless of slice width — two narrow σ slices
        # measured ~2x the cost of one full-width pass), and the zero rows
        # are free inside the single MXU dot.
        psel = np.zeros((d_in, dk), np.float32)
        for j in range(ns):
            psel[j, j] = 1.0
        col, gi = ns, 0
        for mul, d in self._gated_shapes:
            for _comp in range(d):
                for m in range(mul):
                    psel[dk + gi + m, col] = 1.0
                    col += 1
            gi += mul
        assert col == dk, (col, dk)
        return np.asarray(perm, np.int32), psel, dk

    def fast_apply(self, y: jnp.ndarray, psel: jnp.ndarray,
                   dk: int) -> jnp.ndarray:
        """Matmul-form gate on PERMUTED pre-gate features (see fast_tables).

        σ runs only on the lanes that feed a multiplier (scalars + gates —
        the gated rows of psel are zero); the selection dot runs at the
        kernel dtype in bf16 production (single MXU pass — psel is 0/1 so
        the dot is a permutation, rounding only via the σ operand) and at
        HIGHEST precision in f32 parity mode (exact products)."""
        cdim = ((y.ndim - 1,), (0,))
        if y.dtype == jnp.float32:
            kw = dict(precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
            dt = jnp.float32
        else:
            # Mosaic requires a 32-bit matmul accumulator for bf16 operands
            kw, dt = dict(preferred_element_type=jnp.float32), y.dtype
        sg = jax.nn.sigmoid(y.astype(jnp.float32)).astype(dt)
        mlt = jax.lax.dot_general(sg, psel.astype(dt), (cdim, ((), ())),
                                  **kw).astype(y.dtype)
        return y[..., :dk] * mlt

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ns, ng = self._ns, self.num_gates
        dt = x.dtype
        scalars = x[..., :ns]
        gates = x[..., ns : ns + ng]
        gated = x[..., ns + ng :]

        # activations in f32: exact in fp32 mode; in bf16 it is one cast and
        # sidesteps a Mosaic bf16 `logistic` lowering bug (f32 scalar
        # broadcast into a bf16 vector fails verification inside kernels)
        out = [self.act_scalars(scalars.astype(jnp.float32)).astype(dt)] if ns else []
        if ng:
            g = self.act_gates(gates.astype(jnp.float32)).astype(dt)
            gi = 0
            off = 0
            for mul, d in self._gated_shapes:
                blk = gated[..., off : off + mul * d]
                if self.layout == "cm":
                    # component-major: gate tiled d times along lanes — pure
                    # 2-D ops, so this path also lowers inside Pallas kernels
                    gg = g[..., gi : gi + mul]
                    rep = jnp.concatenate([gg] * d, axis=-1) if d > 1 else gg
                    blk = blk * rep
                    out.append(blk)
                else:
                    blk = blk.reshape(x.shape[:-1] + (mul, d))
                    blk = blk * g[..., gi : gi + mul, None]
                    out.append(blk.reshape(x.shape[:-1] + (mul * d,)))
                gi += mul
                off += mul * d
        return jnp.concatenate(out, axis=-1)
