"""Steerable-feature Clebsch-Gordan tensor products.

Two implementations:

- ``L1TensorProduct``: the lmax=1 fast path, numerically matching the reference
  ``L1TensorProduct`` (reference: models/segnn/l1_tensor_prod.py:9-299)
  activation-for-activation, including its fan-in normalization quirk (Q1 in
  SURVEY.md §2.2: l_out=0 path enumeration ignores parity when counting fan-in,
  l1_tensor_prod.py:137-138).  The second operand is fixed to the l<=1
  spherical harmonics ``1x0e+1x1o`` (l1_tensor_prod.py:17).  The channel
  partition into (l, p) blocks with one dense GEMM per output block — the
  reference's core idea (l1_tensor_prod.py:242-297) — is kept because it is
  exactly the right shape for the TPU MXU; the boolean-mask gathers of the
  reference become static index takes that XLA folds into slices.

- ``TensorProduct``: generic fully-connected ('uvw') CG tensor product for any
  lmax, built from the real-basis ``wigner_3j`` tensors.  Used for the lmax=2
  configs where the reference has no specialized kernel.

Design: modules are *static* Python objects built at trace time from Irreps
specs; parameters are plain pytrees (dicts of jnp arrays) created by
``init(key)`` and consumed by ``__call__(params, in1, in2)``.  All shapes,
index maps and CG constants are compile-time constants.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.irreps import Instruction, Irrep, Irreps
from ..core.wigner import wigner_3j

__all__ = ["L1TensorProduct", "TensorProduct"]

_SQRT3 = math.sqrt(3.0)
CG110 = 1.0 / math.sqrt(3.0)  # l1·l1 -> l0 dot        (l1_tensor_prod.py:92)
CG011 = 1.0 / math.sqrt(3.0)  # l0·l1 -> l1 scale      (l1_tensor_prod.py:93)
CG111 = 1.0 / math.sqrt(6.0)  # l1×l1 -> l1 cross      (l1_tensor_prod.py:94)


def _block_groups(irreps: Irreps) -> Dict[Tuple[int, int], List[Tuple[int, int]]]:
    """Per-(l, p) list of (flat_start, mul) groups in spec order.

    Equivalent of the reference's boolean masks (l1_tensor_prod.py:24-65) as
    static slice descriptors — blocks become XLA static slices, not gathers.
    """
    out: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    i = 0
    for mi in irreps:
        out.setdefault((mi.ir.l, mi.ir.p), []).append((i, mi.mul))
        i += mi.dim
    return out


def _extract_scalars(x, groups):
    parts = [x[..., st : st + m] for st, m in groups]
    if not parts:
        return x[..., :0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _extract_vectors(x, groups, layout):
    """-> [..., 3, M] component-major block (lane axis = multiplicity).

    'mul' flat layout stores each group mul-major ([m, 3] row-major, the
    e3nn/reference convention, l1_tensor_prod.py:35); 'cm' stores it
    component-major ([3, m] row-major) — the TPU-native internal layout where
    the 128-wide vector lanes run over channels instead of the 3-vector.
    """
    lead = x.shape[:-1]
    parts = []
    for st, m in groups:
        blk = x[..., st : st + 3 * m]
        if layout == "mul":
            blk = jnp.swapaxes(blk.reshape(lead + (m, 3)), -1, -2)
        else:
            blk = blk.reshape(lead + (3, m))
        parts.append(blk)
    if not parts:
        return x[..., :0].reshape(lead + (3, 0))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _cross_cm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product, component-major: a [..., 3, M], b [..., 3, 1] -> [..., 3, M].

    Cyclic in the (y,z,x) basis, so the usual index arithmetic applies.
    """
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2
    )


def _dot_cm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channelwise dot: a [..., 3, M], b [..., 3, 1] -> [..., M] (lane-wide)."""
    return (
        a[..., 0, :] * b[..., 0, :]
        + a[..., 1, :] * b[..., 1, :]
        + a[..., 2, :] * b[..., 2, :]
    )


class L1TensorProduct:
    """Weighted CG tensor product, in1/out lmax=1, in2 = sh(1) = ``1x0e+1x1o``.

    Matches the reference module's constructor contract
    (l1_tensor_prod.py:9-11) and forward semantics (l1_tensor_prod.py:234-299):
    weight layouts, path concat order, and the component/element normalization
    including the Q1 fan-in overcount, so reference torch weights load directly
    and activations agree to fp32 tolerance.

    Only ``irrep_normalization="component"`` with ``path_normalization`` in
    {"element", "none"} is supported; other combinations raise at construction
    (the reference's remaining combos are unimplemented or broken — quirk Q2,
    l1_tensor_prod.py:115-118).
    """

    def __init__(
        self,
        in1_irreps: Irreps,
        out_irreps: Optional[Irreps] = None,
        irrep_normalization: str = "component",
        path_normalization: str = "element",
        in1_var: Optional[List[float]] = None,
        in2_var: Optional[List[float]] = None,
        out_var: Optional[List[float]] = None,
        layout_in1: str = "mul",
        layout_out: str = "mul",
    ) -> None:
        # layouts: 'mul' = e3nn/reference flat convention (parity, I/O);
        # 'cm' = component-major internal layout (TPU lane-efficient).
        if layout_in1 not in ("mul", "cm") or layout_out not in ("mul", "cm"):
            raise ValueError("layouts must be 'mul' or 'cm'")
        self.layout_in1 = layout_in1
        self.layout_out = layout_out
        in1_irreps = Irreps(in1_irreps)
        out_irreps = Irreps(out_irreps) if out_irreps is not None else in1_irreps
        if in1_irreps.lmax > 1 or out_irreps.lmax > 1:
            raise ValueError("L1TensorProduct requires lmax == 1 for in1 and out")
        if irrep_normalization != "component" or path_normalization not in (
            "element",
            "none",
        ):
            raise ValueError(
                "only irrep_normalization='component' with path_normalization in "
                "{'element','none'} is supported (reference quirk Q2/Q6, "
                "l1_tensor_prod.py:115-118)"
            )

        self.irreps_in1 = in1_irreps
        self.irreps_in2 = Irreps.spherical_harmonics(1)
        self.irreps_out = out_irreps
        self.in1_dim = in1_irreps.dim
        self.in2_dim = 4
        self.out_dim = out_irreps.dim

        self._g1 = _block_groups(in1_irreps)
        self._go = _block_groups(out_irreps)
        nmul = lambda g, k: sum(m for _, m in g.get(k, []))
        self.num_i1_l0e = nmul(self._g1, (0, 1))
        self.num_i1_l0o = nmul(self._g1, (0, -1))
        self.num_i1_l1e = nmul(self._g1, (1, 1))
        self.num_i1_l1o = nmul(self._g1, (1, -1))
        self.dim_o_l0e = nmul(self._go, (0, 1))
        self.dim_o_l0o = nmul(self._go, (0, -1))
        self.dim_o_l1e = 3 * nmul(self._go, (1, 1))
        self.dim_o_l1o = 3 * nmul(self._go, (1, -1))

        # weight shapes: rows = path features in forward concat order, cols =
        # output multiplicities (l1_tensor_prod.py:81-88)
        self._w_shapes = {}
        if (self.num_i1_l0e + self.num_i1_l1o) > 0 and self.dim_o_l0e > 0:
            self._w_shapes["w_l0e"] = (self.num_i1_l0e + self.num_i1_l1o, self.dim_o_l0e)
        if (self.num_i1_l0o + self.num_i1_l1e) > 0 and self.dim_o_l0o > 0:
            self._w_shapes["w_l0o"] = (self.num_i1_l0o + self.num_i1_l1e, self.dim_o_l0o)
        if (self.num_i1_l0o + self.num_i1_l1e + self.num_i1_l1o) > 0 and self.dim_o_l1e > 0:
            self._w_shapes["w_l1e"] = (
                self.num_i1_l0o + self.num_i1_l1e + self.num_i1_l1o,
                self.dim_o_l1e // 3,
            )
        if (self.num_i1_l0e + self.num_i1_l1o + self.num_i1_l1e) > 0 and self.dim_o_l1o > 0:
            self._w_shapes["w_l1o"] = (
                self.num_i1_l0e + self.num_i1_l1o + self.num_i1_l1e,
                self.dim_o_l1o // 3,
            )

        # ---- normalization constants + instruction list ----
        # (l1_tensor_prod.py:97-193, incl. the Q1 fan-in enumeration at :137-138)
        n1 = len(in1_irreps)
        in1_var = [1.0] * n1 if in1_var is None else [float(v) for v in in1_var]
        if len(in1_var) != n1:
            raise ValueError("len(in1_var) must equal len(in1_irreps)")
        in2_var = [1.0, 1.0] if in2_var is None else [float(v) for v in in2_var]
        if len(in2_var) != len(self.irreps_in2):
            raise ValueError("len(in2_var) must equal len(in2_irreps)")
        out_var_ = (
            [1.0] * len(out_irreps) if out_var is None else [float(v) for v in out_var]
        )
        if len(out_var_) != len(out_irreps):
            raise ValueError("len(out_var) must equal len(out_irreps)")

        self.path_normalization = path_normalization
        self.instructions: List[Instruction] = []
        norm = {
            "l0e": np.zeros(self.dim_o_l0e),
            "l0o": np.zeros(self.dim_o_l0o),
            "l1e": np.zeros(self.dim_o_l1e),
            "l1o": np.zeros(self.dim_o_l1o),
        }
        # per-weight-column init half-width (1 under 'element'; 1/sqrt(x) under 'none')
        wi_cols = {k: np.ones(s[1]) for k, s in self._w_shapes.items()}
        offs = {"l0e": 0, "l0o": 0, "l1e": 0, "l1o": 0}
        col_offs = {"l0e": 0, "l0o": 0, "l1e": 0, "l1o": 0}
        for io_idx, mir_out in enumerate(out_irreps):
            alpha = mir_out.ir.dim * out_var_[io_idx]
            x = 0.0
            ins_this_out = []
            for ii2, mir_in2 in enumerate(self.irreps_in2):
                for ii1, mir_in1 in enumerate(in1_irreps):
                    lo, l1_, l2 = mir_out.ir.l, mir_in1.ir.l, mir_in2.ir.l
                    po, p1, p2 = mir_out.ir.p, mir_in1.ir.p, mir_in2.ir.p
                    # exact replica of the reference's condition incl. Python
                    # operator precedence (quirk Q1, l1_tensor_prod.py:137-138):
                    # parity binds only to the l_out==1 branch.
                    if (lo == 0 and l2 == l1_) or (
                        (lo == 1 and (l2 | l1_) != 0) and po == p2 * p1
                    ):
                        x += in1_var[ii1] * in2_var[ii2] * mir_in1.mul * mir_in2.mul
                        ins_this_out.append(
                            Instruction(
                                ii1, ii2, io_idx, "uvw", True, alpha,
                                (mir_in1.mul, mir_in2.mul, mir_out.mul),
                            )
                        )
            if path_normalization == "none":
                a = math.sqrt(alpha)
                wi = 1.0 / math.sqrt(x) if x > 0 else 1.0
            else:  # element
                a = math.sqrt(alpha / x) if x > 0 else math.sqrt(alpha)
                wi = 1.0
            self.instructions.extend(
                ins._replace(path_weight=a) for ins in ins_this_out
            )
            key = f"l{mir_out.ir.l}{'e' if mir_out.ir.p == 1 else 'o'}"
            norm[key][offs[key] : offs[key] + mir_out.dim] = a
            offs[key] += mir_out.dim
            wkey = "w_" + key
            if wkey in wi_cols:
                wi_cols[wkey][col_offs[key] : col_offs[key] + mir_out.mul] = wi
            col_offs[key] += mir_out.mul

        self._norm = {k: v for k, v in norm.items()}
        # per-multiplicity norms for the component-major l=1 blocks (the
        # per-dim arrays repeat each value over the 3 components)
        self._norm_mul = {
            k: (norm[k].reshape(-1, 3)[:, 0] if norm[k].size else norm[k])
            for k in ("l1e", "l1o")
        }
        self._wi_cols = wi_cols

    # ---- params ----

    def init(self, key, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        """uniform[-wi, wi] per output column (l1_tensor_prod.py:82,175-188)."""
        params = {}
        keys = jax.random.split(key, max(len(self._w_shapes), 1))
        for (name, shape), k in zip(sorted(self._w_shapes.items()), keys):
            u = jax.random.uniform(k, shape, dtype=dtype, minval=-1.0, maxval=1.0)
            params[name] = u * jnp.asarray(self._wi_cols[name], dtype=dtype)
        return params

    def param_shapes(self) -> Dict[str, Tuple[int, int]]:
        return dict(self._w_shapes)

    # ---- forward ----

    def __call__(
        self, params: Dict[str, jnp.ndarray], in1: jnp.ndarray, in2: jnp.ndarray
    ) -> jnp.ndarray:
        """out[..., out_dim] = norm ⊙ blockwise GEMMs (l1_tensor_prod.py:234-299).

        Accepts arbitrary leading batch dims (the reference is strictly 2-D,
        quirk Q4; we lift that restriction — layouts are unchanged).
        """
        if in1.shape[-1] != self.in1_dim:
            raise ValueError(f"in1 last dim {in1.shape[-1]} != {self.in1_dim}")
        if in2.shape[-1] != self.in2_dim:
            raise ValueError(f"in2 last dim {in2.shape[-1]} != {self.in2_dim}")

        dt = in1.dtype
        lead = in1.shape[:-1]
        lay = self.layout_in1
        x0e = _extract_scalars(in1, self._g1.get((0, 1), []))
        x0o = _extract_scalars(in1, self._g1.get((0, -1), []))
        x1e = _extract_vectors(in1, self._g1.get((1, 1), []), lay)  # [..., 3, M]
        x1o = _extract_vectors(in1, self._g1.get((1, -1), []), lay)
        s = in2[..., 0:1]
        v = in2[..., 1:4][..., :, None]  # [..., 3, 1]

        blocks = {}
        if self.dim_o_l0e > 0:
            feats = [x0e * s]
            if self.num_i1_l1o > 0:
                feats.append(CG110 * _dot_cm(x1o, v))
            f = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
            res = jnp.matmul(f, params["w_l0e"], preferred_element_type=jnp.float32)
            blocks[(0, 1)] = (res * jnp.asarray(self._norm["l0e"], dt)).astype(dt)
        if self.dim_o_l0o > 0:
            feats = [x0o * s]
            if self.num_i1_l1e > 0:
                feats.append(CG110 * _dot_cm(x1e, v))
            f = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
            res = jnp.matmul(f, params["w_l0o"], preferred_element_type=jnp.float32)
            blocks[(0, -1)] = (res * jnp.asarray(self._norm["l0o"], dt)).astype(dt)
        if self.dim_o_l1e > 0:
            feats = [CG011 * x0o[..., None, :] * v]  # [..., 3, n0o]
            if self.num_i1_l1e > 0:
                feats.append(CG011 * x1e * s[..., None])
            if self.num_i1_l1o > 0:
                feats.append(CG111 * _cross_cm(x1o, v))
            f = jnp.concatenate(feats, axis=-1)  # [..., 3, P]
            res = jnp.einsum(
                "...cp,pm->...cm", f, params["w_l1e"],
                preferred_element_type=jnp.float32,
            )
            blocks[(1, 1)] = (res * jnp.asarray(self._norm_mul["l1e"], dt)).astype(dt)
        if self.dim_o_l1o > 0:
            feats = [CG011 * x0e[..., None, :] * v]
            if self.num_i1_l1o > 0:
                feats.append(CG011 * x1o * s[..., None])
            if self.num_i1_l1e > 0:
                feats.append(CG111 * _cross_cm(x1e, v))
            f = jnp.concatenate(feats, axis=-1)
            res = jnp.einsum(
                "...cp,pm->...cm", f, params["w_l1o"],
                preferred_element_type=jnp.float32,
            )
            blocks[(1, -1)] = (res * jnp.asarray(self._norm_mul["l1o"], dt)).astype(dt)

        # assemble flat output in spec order
        taken: Dict[Tuple[int, int], int] = {}
        pieces = []
        for mi in self.irreps_out:
            key = (mi.ir.l, mi.ir.p)
            t = taken.get(key, 0)
            if key not in blocks:  # no contributing path (quirk Q3 contract)
                pieces.append(jnp.zeros(lead + (mi.dim,), dt))
                continue
            if mi.ir.l == 0:
                pieces.append(blocks[key][..., t : t + mi.mul])
            else:
                blk = blocks[key][..., :, t : t + mi.mul]  # [..., 3, m]
                if self.layout_out == "mul":
                    blk = jnp.swapaxes(blk, -1, -2)
                pieces.append(blk.reshape(lead + (3 * mi.mul,)))
            taken[key] = t + mi.mul
        return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=-1)


class TensorProduct:
    """Generic fully-connected ('uvw') weighted CG tensor product, any lmax.

    e3nn-compatible semantics with *correct* selection-rule path enumeration
    (no Q1 quirk — that is exclusive to the reference-compat L1 module):
    a path (i1, i2) -> io exists iff ``ir_out ∈ ir_in1 * ir_in2``.

    out_io = norm_io * Σ_paths  einsum('...ui,...vj,ijk->...uvk', x1, x2, C)
             contracted with W[(u·v)_total, w]   per output group io,

    with component/element normalization: norm_io = sqrt((2l_out+1) / fan_in).

    For the common case where in2 is a spherical-harmonic embedding (all muls
    1) each path reduces to one small einsum and the per-group contraction is
    a single [..., P, 2l+1] x [P, w] GEMM on the MXU — the same compute shape
    as the L1 fast path, generalized.
    """

    def __init__(
        self,
        irreps_in1: Irreps,
        irreps_in2: Irreps,
        irreps_out: Irreps,
        irrep_normalization: str = "component",
        path_normalization: str = "element",
        layout_in1: str = "mul",
        layout_out: str = "mul",
        mode: str = "auto",
    ) -> None:
        # layouts as in L1TensorProduct: 'cm' keeps the TPU lane axis on
        # multiplicities; in2 is always dense mul-major (attr vectors, mul 1
        # per group in the sh case)
        # mode: 'auto' picks the CG-folded-GEMM evaluation (fold_params +
        # one [.., C1*C2] x [C1*C2, out] MXU GEMM) whenever in1 is cm-layout
        # and in2 is narrow (sh attrs); 'sparse' forces the component-wise
        # path (reference-free oracle for tests, and the fallback for wide
        # in2 where outer(in1, in2) would blow up)
        if mode not in ("auto", "sparse", "gemm"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode == "gemm" and layout_in1 != "cm":
            # the fold plan (_build_gemm_plan) indexes in1 by flat cm
            # position; forcing gemm with mul-layout in1 silently computes
            # garbage (caught by tests/test_cg_oracle.py)
            raise ValueError("mode='gemm' requires layout_in1='cm'")
        self.mode = mode
        if layout_in1 not in ("mul", "cm") or layout_out not in ("mul", "cm"):
            raise ValueError("layouts must be 'mul' or 'cm'")
        self.layout_in1 = layout_in1
        self.layout_out = layout_out
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self.irreps_out = Irreps(irreps_out)
        if irrep_normalization != "component" or path_normalization != "element":
            raise ValueError("only component/element normalization implemented")

        self.in1_dim = self.irreps_in1.dim
        self.in2_dim = self.irreps_in2.dim
        self.out_dim = self.irreps_out.dim

        sl1 = self.irreps_in1.slices()
        sl2 = self.irreps_in2.slices()
        slo = self.irreps_out.slices()

        self.instructions: List[Instruction] = []
        # per output group: list of (sl1, mul1, l1, sl2, mul2, l2, cg) paths
        self._paths: List[List[tuple]] = [[] for _ in self.irreps_out]
        self._norm: List[float] = []
        self._w_shapes: Dict[str, Tuple[int, int]] = {}
        self._out_slices = slo

        for io, mo in enumerate(self.irreps_out):
            fan_in = 0
            rows = 0
            ins_this_out = []
            for i2, m2 in enumerate(self.irreps_in2):
                for i1, m1 in enumerate(self.irreps_in1):
                    if mo.ir in list(m1.ir * m2.ir):
                        cg = wigner_3j(m1.ir.l, m2.ir.l, mo.ir.l)
                        self._paths[io].append(
                            (sl1[i1], m1.mul, m1.ir.l, sl2[i2], m2.mul, m2.ir.l, cg)
                        )
                        fan_in += m1.mul * m2.mul
                        rows += m1.mul * m2.mul
                        ins_this_out.append(
                            Instruction(
                                i1, i2, io, "uvw", True, 0.0,
                                (m1.mul, m2.mul, mo.mul),
                            )
                        )
            a = math.sqrt(mo.ir.dim / fan_in) if fan_in > 0 else 0.0
            self.instructions.extend(i._replace(path_weight=a) for i in ins_this_out)
            self._norm.append(a)
            if rows > 0 and mo.mul > 0:
                self._w_shapes[f"w{io}"] = (rows, mo.mul)

        self._build_gemm_plan()

    def _build_gemm_plan(self) -> None:
        """Precompute the CG-folded-GEMM evaluation plan.

        The whole product can be written ``out = z @ W'`` where
        ``z = outer(in1, in2)`` (built as C2 wide lane multiplies, 2-D only —
        Mosaic-lowerable) and ``W'[Z, out_dim]`` absorbs every CG coefficient
        and norm constant into a reshuffle of the path weights
        (``fold_params``).  This is the any-lmax generalization of the
        reference's lmax=1 trick of turning the CG product into a few dense
        GEMMs (l1_tensor_prod.py:242-297): all accumulation runs on the MXU
        instead of hundreds of narrow VPU ops.  z rows are c2-major:
        ``zrow = c2 * C1 + c1``.
        """
        C1, C2 = self.in1_dim, self.in2_dim
        self._gemm_z = C1 * C2
        # per (io, k): (zrows, wrows, coeffs) fold index arrays
        plan: Dict[Tuple[int, int], list] = {}
        for io, mo in enumerate(self.irreps_out):
            if f"w{io}" not in self._w_shapes:
                continue
            a = self._norm[io]
            pathrow = 0
            for sl_1, mul1, l1, sl_2, mul2, l2, cg in self._paths[io]:
                d1, d2 = 2 * l1 + 1, 2 * l2 + 1
                u = np.arange(mul1)[:, None]
                v = np.arange(mul2)[None, :]
                for k in range(mo.ir.dim):
                    for i, j in zip(*np.nonzero(cg[:, :, k])):
                        c1 = sl_1.start + int(i) * mul1 + u  # [mul1, 1]
                        c2 = sl_2.start + v * d2 + int(j)  # [1, mul2]
                        zr = (c2 * C1 + c1).reshape(-1)
                        wr = (u * mul2 + v).reshape(-1) + pathrow
                        co = np.full(mul1 * mul2, float(cg[i, j, k]) * a,
                                     np.float32)
                        plan.setdefault((io, k), []).append((zr, wr, co))
                pathrow += mul1 * mul2
        self._gemm_plan = {
            key: tuple(np.concatenate(cols) for cols in zip(*entries))
            for key, entries in plan.items()
        }
        # cm-layout output column offsets per group
        off, self._out_cm_off = 0, []
        for mo in self.irreps_out:
            self._out_cm_off.append(off)
            off += mo.dim

    def _gemm_default(self) -> bool:
        if self.mode == "sparse":
            return False
        if self.mode == "gemm":
            return True
        return self.layout_in1 == "cm" and self.in2_dim <= 32

    def fold_params(self, params: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """CG-folded weight matrix ``{'w_folded': [C2*C1, out_dim]}``.

        Linear in the path weights, so gradients flow through by ordinary AD;
        R-independent cost (runs once per call, outside any edge loop or
        Pallas kernel body).  Output columns are cm-layout.
        """
        wf = jnp.zeros((self._gemm_z, self.out_dim), jnp.float32)
        for io, mo in enumerate(self.irreps_out):
            name = f"w{io}"
            if name not in self._w_shapes:
                continue
            w = params[name].astype(jnp.float32)
            mul = mo.mul
            col0 = self._out_cm_off[io]
            for k in range(mo.ir.dim):
                if (io, k) not in self._gemm_plan:
                    continue
                zr, wr, co = self._gemm_plan[(io, k)]
                vals = co[:, None] * w[wr, :]
                c = col0 + k * mul
                wf = wf.at[zr, c : c + mul].add(vals)
        return {"w_folded": wf}

    def _call_gemm(self, wf: jnp.ndarray, in1: jnp.ndarray, in2: jnp.ndarray):
        lead = in1.shape[:-1]
        dt = in1.dtype
        # z-free folded GEMM: out = outer(in1, in2) @ W' evaluated as
        # Σ_c (in1 · in2_c) @ W'_c — C2 narrow GEMMs with fp32 accumulation.
        # Materializing z = [*, C1*C2] (the old one-wide-GEMM form) costs a
        # [rows, ~1.6k] HBM round trip NOT fused by XLA: 12 GiB per message
        # layer per device on the 10M-point mesh step, and the 32 GB
        # concatenate that OOM'd the single-chip config-5 update layers.
        # MXU efficiency is the same (K-dim = C1 per GEMM); the multiply
        # fuses into each GEMM's producer.  (2-D ops only so the same code
        # lowers inside the generic fused Pallas kernel.)
        C1, C2 = self.in1_dim, self.in2_dim
        wt = wf.astype(dt)
        acc = None
        for c in range(C2):
            t = jnp.matmul(in1 * in2[..., c : c + 1],
                           wt[c * C1 : (c + 1) * C1],
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        out = acc.astype(dt)
        if self.layout_out == "cm":
            return out
        parts = []
        for io, mo in enumerate(self.irreps_out):
            blk = out[..., self._out_cm_off[io] : self._out_cm_off[io] + mo.dim]
            if mo.ir.dim > 1:
                blk = blk.reshape(lead + (mo.ir.dim, mo.mul))
                blk = jnp.swapaxes(blk, -1, -2).reshape(lead + (mo.dim,))
            parts.append(blk)
        return jnp.concatenate(parts, axis=-1)

    def init(self, key, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        params = {}
        keys = jax.random.split(key, max(len(self._w_shapes), 1))
        for (name, shape), k in zip(sorted(self._w_shapes.items()), keys):
            params[name] = jax.random.normal(k, shape, dtype=dtype)
        return params

    def __call__(
        self, params: Dict[str, jnp.ndarray], in1: jnp.ndarray, in2: jnp.ndarray
    ) -> jnp.ndarray:
        """Sparse-CG, component-wise evaluation.

        Path features are built per *output component* k as lane-wide
        [..., mul] tensors (the CG tensors are sparse: only the few nonzero
        (i, j, k) entries contribute), then one [..., P] x [P, w] GEMM per
        component.  No tensor ever carries a (2l+1)-sized trailing dim, which
        on TPU would pad to 128 lanes — this is what makes lmax>=2 viable at
        point-cloud scale.
        """
        if in1.shape[-1] != self.in1_dim:
            raise ValueError(f"in1 last dim {in1.shape[-1]} != {self.in1_dim}")
        if in2.shape[-1] != self.in2_dim:
            raise ValueError(f"in2 last dim {in2.shape[-1]} != {self.in2_dim}")
        if "w_folded" in params:
            # CG-folded GEMM path (fold_params); 'cm' in1 layout only — the
            # outer-product z indexes in1 components by flat cm position
            assert self.layout_in1 == "cm", "folded path requires cm in1"
            return self._call_gemm(params["w_folded"], in1, in2)
        if self._gemm_default():
            return self._call_gemm(self.fold_params(params)["w_folded"], in1, in2)
        lead = in1.shape[:-1]
        dt = in1.dtype

        def comp1(sl, mul, l, i):
            """in1 component i of a group as [..., mul] (layout-aware)."""
            d = 2 * l + 1
            if self.layout_in1 == "cm":
                return in1[..., sl.start + i * mul : sl.start + (i + 1) * mul]
            blk = in1[..., sl].reshape(lead + (mul, d))
            return blk[..., :, i]

        out_parts = []
        for io, mo in enumerate(self.irreps_out):
            name = f"w{io}"
            if name not in self._w_shapes:
                out_parts.append(jnp.zeros(lead + (mo.dim,), dtype=dt))
                continue
            k3 = mo.ir.dim
            comp_res = []
            for k in range(k3):
                path_feats = []
                for sl_1, mul1, l1, sl_2, mul2, l2, cg in self._paths[io]:
                    acc = None
                    for i, j in zip(*np.nonzero(cg[:, :, k])):
                        c = float(cg[i, j, k])
                        x1i = comp1(sl_1, mul1, l1, int(i))  # [..., mul1]
                        if mul2 == 1:
                            # 2-D slice (no reshape): keeps this path Mosaic-
                            # lowerable inside the generic fused Pallas kernel
                            x2j = in2[..., sl_2.start + int(j) : sl_2.start + int(j) + 1]
                            term = c * x1i * x2j
                        else:
                            x2j = in2[..., sl_2].reshape(
                                lead + (mul2, 2 * l2 + 1)
                            )[..., :, int(j)]
                            term = (
                                c * x1i[..., :, None] * x2j[..., None, :]
                            ).reshape(lead + (mul1 * mul2,))
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = jnp.zeros(lead + (mul1 * mul2,), dt)
                    path_feats.append(acc)
                f = (
                    jnp.concatenate(path_feats, axis=-1)
                    if len(path_feats) > 1
                    else path_feats[0]
                )  # [..., P]
                o = jnp.matmul(
                    f, params[name], preferred_element_type=jnp.float32
                )  # [..., w]
                comp_res.append((self._norm[io] * o).astype(dt))
            if self.layout_out == "cm":
                # component-major flat layout == lane concat of components
                blk = (
                    jnp.concatenate(comp_res, axis=-1) if k3 > 1 else comp_res[0]
                )
                out_parts.append(blk)
                continue
            blk = jnp.stack(comp_res, axis=-2)  # [..., k3, w]
            if k3 > 1:
                blk = jnp.swapaxes(blk, -1, -2)
            out_parts.append(blk.reshape(lead + (mo.dim,)))
        return jnp.concatenate(out_parts, axis=-1)
