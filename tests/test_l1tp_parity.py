"""Parity gate: framework L1TensorProduct vs the reference torch module.

Runs the reference l1_tensor_prod.py under CPU torch with a stub e3nn
(SURVEY.md §4.2 recipe) and checks, on fixed seeds and with the torch weights
loaded into the JAX module: forward allclose, gradient parity, norm-constant
equality (including the Q1 fan-in-overcount values recorded in BASELINE.md),
instruction-list equality, and O(3) equivariance.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.core.rotations import irrep_rotation, random_rotation
from scalable_e3_gnn_tpu.ops.tensor_product import L1TensorProduct

from .parity.reference_oracle import make_reference_tp, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference mount not available"
)

SPEC_FULL = ("4x0e+2x0o+3x1o+2x1e", "5x0e+2x0o+4x1o+2x1e")
SPEC_SEGNN = ("8x0e+8x1o", "8x0e+8x1o")
WEIGHT_NAMES = {
    "w_l0e": "weights_l0e",
    "w_l0o": "weights_l0o",
    "w_l1e": "weights_l1e",
    "w_l1o": "weights_l1o",
}


def _load_ref_weights(ref, mine):
    params = {}
    for jname, tname in WEIGHT_NAMES.items():
        if jname in mine.param_shapes():
            w = getattr(ref, tname).detach().numpy()
            assert w.shape == mine.param_shapes()[jname], (jname, w.shape)
            params[jname] = jnp.asarray(w)
    return params


def _ref_norms(ref):
    return {
        "l0e": ref.norm_l0e.numpy(),
        "l0o": ref.norm_l0o.numpy(),
        "l1e": ref.norm_l1e.numpy(),
        "l1o": ref.norm_l1o.numpy(),
    }


@pytest.mark.parametrize("spec", [SPEC_FULL, SPEC_SEGNN])
def test_norm_constants_and_instructions(spec):
    import torch

    torch.manual_seed(0)
    ref = make_reference_tp(*spec)
    mine = L1TensorProduct(Irreps(spec[0]), Irreps(spec[1]))
    for k, v in _ref_norms(ref).items():
        np.testing.assert_allclose(mine._norm[k], v, rtol=1e-6, err_msg=k)
    assert len(mine.instructions) == len(ref.instructions)
    for a, b in zip(mine.instructions, ref.instructions):
        assert a.i_in1 == b.i_in1 and a.i_in2 == b.i_in2 and a.i_out == b.i_out
        assert a.connection_mode == b.connection_mode
        assert a.has_weight == b.has_weight
        assert a.path_weight == pytest.approx(b.path_weight, rel=1e-6)
        assert tuple(a.path_shape) == tuple(b.path_shape)


def test_survey_anchor_values():
    """BASELINE.md regression anchors (Q1 fan-in overcount included)."""
    mine = L1TensorProduct(Irreps(SPEC_FULL[0]), Irreps(SPEC_FULL[1]))
    assert mine._norm["l0e"][0] == pytest.approx(np.sqrt(1 / 11))
    assert mine._norm["l0o"][0] == pytest.approx(np.sqrt(1 / 11))
    assert mine._norm["l1o"][0] == pytest.approx(np.sqrt(3 / 9))
    assert mine._norm["l1e"][0] == pytest.approx(np.sqrt(3 / 7))
    assert len(mine.instructions) == 14
    m2 = L1TensorProduct(Irreps("8x0e+8x1o"))
    assert m2._norm["l0e"][0] == pytest.approx(0.25)
    assert m2._norm["l1o"][0] == pytest.approx(np.sqrt(3 / 16))
    assert set(m2.param_shapes()) == {"w_l0e", "w_l1o"}
    assert m2.param_shapes()["w_l0e"] == (16, 8)
    assert m2.param_shapes()["w_l1o"] == (16, 8)


@pytest.mark.parametrize("spec", [SPEC_FULL, SPEC_SEGNN])
def test_forward_allclose(spec):
    import torch

    torch.manual_seed(1)
    ref = make_reference_tp(*spec)
    mine = L1TensorProduct(Irreps(spec[0]), Irreps(spec[1]))
    params = _load_ref_weights(ref, mine)

    B = 11
    rng = np.random.default_rng(3)
    in1 = rng.standard_normal((B, mine.in1_dim)).astype(np.float32)
    vec = rng.standard_normal((B, 3)).astype(np.float32)
    vec /= np.linalg.norm(vec, axis=-1, keepdims=True)
    in2 = np.concatenate([np.ones((B, 1), np.float32), np.sqrt(3) * vec], -1).astype(
        np.float32
    )

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(in1), torch.from_numpy(in2)).numpy()
    my_out = np.array(mine(params, jnp.asarray(in1), jnp.asarray(in2)))
    np.testing.assert_allclose(my_out, ref_out, atol=5e-6, rtol=1e-5)


def test_gradient_parity():
    import torch

    torch.manual_seed(2)
    spec = SPEC_FULL
    ref = make_reference_tp(*spec)
    mine = L1TensorProduct(Irreps(spec[0]), Irreps(spec[1]))
    params = _load_ref_weights(ref, mine)

    B = 7
    rng = np.random.default_rng(4)
    in1 = rng.standard_normal((B, mine.in1_dim)).astype(np.float32)
    in2 = rng.standard_normal((B, 4)).astype(np.float32)
    cot = rng.standard_normal((B, mine.out_dim)).astype(np.float32)

    t1 = torch.from_numpy(in1).requires_grad_(True)
    t2 = torch.from_numpy(in2).requires_grad_(True)
    (ref(t1, t2) * torch.from_numpy(cot)).sum().backward()

    def loss(p, a, b):
        return (mine(p, a, b) * jnp.asarray(cot)).sum()

    g_params, g1, g2 = jax.grad(loss, argnums=(0, 1, 2))(
        params, jnp.asarray(in1), jnp.asarray(in2)
    )
    np.testing.assert_allclose(np.array(g1), t1.grad.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.array(g2), t2.grad.numpy(), atol=1e-5, rtol=1e-4)
    for jname, tname in WEIGHT_NAMES.items():
        if jname in params:
            tw = getattr(ref, tname)
            np.testing.assert_allclose(
                np.array(g_params[jname]), tw.grad.numpy(), atol=1e-5, rtol=1e-4,
                err_msg=jname,
            )


@pytest.mark.parametrize("spec", [SPEC_FULL, SPEC_SEGNN])
@pytest.mark.parametrize("improper", [False, True])
def test_o3_equivariance(spec, improper):
    """TP(D_in1 x, D_in2 y) == D_out TP(x, y) under O(3) (SURVEY.md §4.2)."""
    mine = L1TensorProduct(Irreps(spec[0]), Irreps(spec[1]))
    params = mine.init(jax.random.key(0))
    rng = np.random.default_rng(5)
    R = random_rotation(rng)
    if improper:
        R = -R  # inversion composed with rotation

    def blockdiag_D(irreps):
        mats = []
        for mi in Irreps(irreps):
            D = irrep_rotation(mi.ir.l, mi.ir.p, R)
            for _ in range(mi.mul):
                mats.append(D)
        n = sum(m.shape[0] for m in mats)
        out = np.zeros((n, n))
        i = 0
        for m in mats:
            out[i : i + m.shape[0], i : i + m.shape[0]] = m
            i += m.shape[0]
        return out

    B = 6
    in1 = rng.standard_normal((B, mine.in1_dim)).astype(np.float32)
    in2 = rng.standard_normal((B, 4)).astype(np.float32)

    D1 = blockdiag_D(spec[0]).astype(np.float32)
    D2 = blockdiag_D("1x0e+1x1o").astype(np.float32)
    Do = blockdiag_D(spec[1]).astype(np.float32)

    out = np.array(mine(params, jnp.asarray(in1), jnp.asarray(in2)))
    out_rot = np.array(mine(params, jnp.asarray(in1 @ D1.T), jnp.asarray(in2 @ D2.T)))
    np.testing.assert_allclose(out_rot, out @ Do.T, atol=5e-5)


def test_unsupported_normalization_rejected():
    with pytest.raises(ValueError):
        L1TensorProduct(Irreps("1x0e"), irrep_normalization="norm")
    with pytest.raises(ValueError):
        L1TensorProduct(Irreps("1x0e"), path_normalization="path")
    with pytest.raises(ValueError):
        L1TensorProduct(Irreps("2x2e+1x0e"))
