"""Equivariant linear layers and norms over steerable features.

``O3Linear`` mixes multiplicities within each irrep (the only O(3)-equivariant
linear map), with e3nn-style 1/sqrt(fan_in) variance normalization and optional
bias on even scalars.  ``O3LayerNorm`` normalizes per-irrep-group vector norms
— both standard components of SEGNN-style stacks (absent from the mounted
reference; capability spec SURVEY.md §2.4 "Irreps/steerable-feature core").
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..core.irreps import Irrep, Irreps

__all__ = ["O3Linear", "O3LayerNorm"]


class O3Linear:
    """Per-irrep multiplicity mixing: out_ir = x_ir @ W_ir / sqrt(mul_in)."""

    def __init__(
        self,
        irreps_in: Irreps,
        irreps_out: Irreps,
        bias: bool = True,
        layout_in: str = "mul",
        layout_out: str = "mul",
    ) -> None:
        self.layout_in = layout_in
        self.layout_out = layout_out
        self.irreps_in = Irreps(irreps_in).regroup()
        self.irreps_out = Irreps(irreps_out).regroup()
        self.in_dim = self.irreps_in.dim
        self.out_dim = self.irreps_out.dim
        self.use_bias = bias

        self._maps = []  # (ir, in_slice, mul_in, out_slice, mul_out)
        for mo in self.irreps_out:
            sl_out = self.irreps_out.contiguous_slice_for(mo.ir)
            mul_in = self.irreps_in.mul_for(mo.ir)
            if mul_in > 0:
                sl_in = self.irreps_in.contiguous_slice_for(mo.ir)
                self._maps.append((mo.ir, sl_in, mul_in, sl_out, mo.mul))

    def init(self, key, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        params = {}
        keys = jax.random.split(key, len(self._maps) + 1)
        for (ir, _, mul_in, _, mul_out), k in zip(self._maps, keys):
            params[f"w_{ir}"] = jax.random.normal(k, (mul_in, mul_out), dtype=dtype)
        if self.use_bias and self.irreps_out.mul_for("0e") > 0:
            params["b_0e"] = jnp.zeros((self.irreps_out.mul_for("0e"),), dtype=dtype)
        return params

    def __call__(self, params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
        lead = x.shape[:-1]
        out = jnp.zeros(lead + (self.out_dim,), dtype=x.dtype)
        for ir, sl_in, mul_in, sl_out, mul_out in self._maps:
            d = ir.dim
            w = params[f"w_{ir}"] / math.sqrt(mul_in)
            if d == 1 or self.layout_in == "cm":
                blk = x[..., sl_in].reshape(lead + (d, mul_in))
                res = jnp.einsum(
                    "...du,uw->...dw", blk, w, preferred_element_type=jnp.float32
                ).astype(x.dtype)
            else:
                blk = x[..., sl_in].reshape(lead + (mul_in, d))
                res = jnp.swapaxes(
                    jnp.einsum(
                        "...ud,uw->...wd", blk, w, preferred_element_type=jnp.float32
                    ).astype(x.dtype),
                    -1,
                    -2,
                )  # -> [..., d, mul_out]
            if ir == Irrep(0, 1) and "b_0e" in params:
                res = res + params[f"b_0e"][..., None, :].astype(x.dtype)
            if d > 1 and self.layout_out == "mul":
                res = jnp.swapaxes(res, -1, -2)
            out = out.at[..., sl_out].set(res.reshape(lead + (mul_out * d,)))
        return out


class O3LayerNorm:
    """Norm-based equivariant layernorm.

    Scalars (l=0): standard mean/var normalization over the scalar channels.
    l>0 blocks: divide by the RMS of per-copy vector norms (no mean removal —
    subtracting a mean from an l>0 irrep would break equivariance).
    """

    def __init__(self, irreps: Irreps, eps: float = 1e-6) -> None:
        self.irreps = Irreps(irreps).regroup()
        self.eps = eps

    def init(self, key=None, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        return {
            f"g_{mi.ir}": jnp.ones((mi.mul,), dtype=dtype) for mi in self.irreps
        }

    def __call__(self, params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
        lead = x.shape[:-1]
        outs = []
        for mi, sl in zip(self.irreps, self.irreps.slices()):
            blk = x[..., sl].reshape(lead + (mi.mul, mi.ir.dim))
            g = params[f"g_{mi.ir}"]
            if mi.ir.l == 0:
                mu = jnp.mean(blk, axis=-2, keepdims=True)
                var = jnp.var(blk, axis=-2, keepdims=True)
                blk = (blk - mu) / jnp.sqrt(var + self.eps)
            else:
                norms2 = jnp.sum(blk * blk, axis=-1)  # [..., mul]
                rms = jnp.sqrt(jnp.mean(norms2, axis=-1, keepdims=True) + self.eps)
                blk = blk / rms[..., None]
            blk = blk * g[..., :, None]
            outs.append(blk.reshape(lead + (mi.dim,)))
        return jnp.concatenate(outs, axis=-1)
