"""CG-folded-GEMM TensorProduct path vs the sparse component-wise oracle.

The folded path (ops.tensor_product.TensorProduct.fold_params/_call_gemm)
reorders the CG accumulation into one big MXU GEMM; forward values and
gradients must match the sparse evaluation to fp32 tolerance on any-lmax
specs, in both output layouts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.core.spherical import spherical_harmonics
from scalable_e3_gnn_tpu.ops.tensor_product import TensorProduct

SPECS = [
    ("8x0e+4x1o", "1x0e+1x1o", "8x0e+4x1o"),
    ("8x0e+4x1o+2x2e", "1x0e+1x1o+1x2e", "6x0e+4x1o+2x2e"),
    ("4x0e+2x0o+3x1o+2x1e+1x2e+1x2o", "1x0e+1x1o+1x2e",
     "4x0e+2x0o+3x1o+2x1e+2x2e+1x2o"),
]


def _mk(spec, layout_out, mode):
    return TensorProduct(
        Irreps(spec[0]), Irreps(spec[1]), Irreps(spec[2]),
        layout_in1="cm", layout_out=layout_out, mode=mode,
    )


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("layout_out", ["cm", "mul"])
def test_gemm_matches_sparse_forward(spec, layout_out):
    tp_s = _mk(spec, layout_out, "sparse")
    tp_g = _mk(spec, layout_out, "gemm")
    params = tp_s.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (64, tp_s.in1_dim))
    lmax = Irreps(spec[1]).lmax
    sh = spherical_harmonics(lmax, jax.random.normal(jax.random.key(2), (64, 3)))
    a = np.array(tp_s(params, x, sh))
    b = np.array(tp_g(params, x, sh))
    np.testing.assert_allclose(b, a, atol=2e-5)


def test_gemm_matches_sparse_gradients():
    spec = SPECS[1]
    tp_s = _mk(spec, "cm", "sparse")
    tp_g = _mk(spec, "cm", "gemm")
    params = tp_s.init(jax.random.key(3))
    x = jax.random.normal(jax.random.key(4), (32, tp_s.in1_dim))
    sh = spherical_harmonics(2, jax.random.normal(jax.random.key(5), (32, 3)))

    def loss(tp):
        return lambda p, xx: (tp(p, xx, sh) ** 2).sum()

    gs, gxs = jax.grad(loss(tp_s), argnums=(0, 1))(params, x)
    gg, gxg = jax.grad(loss(tp_g), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.array(gxg), np.array(gxs), atol=3e-4, rtol=1e-5)
    for k in gs:
        np.testing.assert_allclose(np.array(gg[k]), np.array(gs[k]),
                                   atol=3e-4, rtol=1e-5, err_msg=k)


def test_prefolded_params_match():
    spec = SPECS[1]
    tp = _mk(spec, "cm", "sparse")
    params = tp.init(jax.random.key(6))
    x = jax.random.normal(jax.random.key(7), (16, tp.in1_dim))
    sh = spherical_harmonics(2, jax.random.normal(jax.random.key(8), (16, 3)))
    a = np.array(tp(params, x, sh))
    b = np.array(tp(tp.fold_params(params), x, sh))
    np.testing.assert_allclose(b, a, atol=2e-5)
