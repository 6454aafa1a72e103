"""Unit/property tests: gate nonlinearity, O3 linear, O3 layernorm equivariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.core.rotations import irrep_rotation, random_rotation
from scalable_e3_gnn_tpu.ops.gate import Gate
from scalable_e3_gnn_tpu.ops.linear import O3LayerNorm, O3Linear


def blockdiag(irreps, R):
    mats = []
    for mi in Irreps(irreps):
        D = irrep_rotation(mi.ir.l, mi.ir.p, R)
        mats.extend([D] * mi.mul)
    n = sum(m.shape[0] for m in mats)
    out = np.zeros((n, n))
    i = 0
    for m in mats:
        out[i : i + m.shape[0], i : i + m.shape[0]] = m
        i += m.shape[0]
    return out.astype(np.float32)


@pytest.mark.parametrize("improper", [False, True])
def test_gate_equivariance(improper):
    gate = Gate(Irreps("4x0e"), Irreps("3x1o+2x1e"))
    assert repr(gate.irreps_in) == "4x0e+5x0e+3x1o+2x1e"
    rng = np.random.default_rng(0)
    R = random_rotation(rng)
    if improper:
        R = -R
    x = rng.standard_normal((6, gate.irreps_in.dim)).astype(np.float32)
    Din = blockdiag(gate.irreps_in, R)
    Dout = blockdiag(gate.irreps_out, R)
    out = np.array(gate(jnp.asarray(x)))
    out_rot = np.array(gate(jnp.asarray(x @ Din.T)))
    np.testing.assert_allclose(out_rot, out @ Dout.T, atol=1e-5)


def test_gate_scalar_only_passthrough():
    gate = Gate(Irreps("3x0e"), Irreps(""))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 3)), jnp.float32)
    np.testing.assert_allclose(np.array(gate(x)), np.array(jax.nn.silu(x)), rtol=1e-6)


def test_gate_rejects_bad_specs():
    with pytest.raises(ValueError):
        Gate(Irreps("2x1o"), Irreps("2x1o"))
    with pytest.raises(ValueError):
        Gate(Irreps("2x0e"), Irreps("2x0e"))


@pytest.mark.parametrize("improper", [False, True])
def test_o3linear_equivariance(improper):
    lin = O3Linear(Irreps("4x0e+3x1o+2x1e"), Irreps("2x0e+5x1o"))
    params = lin.init(jax.random.key(0))
    rng = np.random.default_rng(2)
    R = random_rotation(rng)
    if improper:
        R = -R
    x = rng.standard_normal((5, lin.in_dim)).astype(np.float32)
    Din = blockdiag(lin.irreps_in, R)
    Dout = blockdiag(lin.irreps_out, R)
    out = np.array(lin(params, jnp.asarray(x)))
    out_rot = np.array(lin(params, jnp.asarray(x @ Din.T)))
    np.testing.assert_allclose(out_rot, out @ Dout.T, atol=1e-5)


def test_o3linear_zero_fanin_outputs_zero_or_bias():
    lin = O3Linear(Irreps("2x0e"), Irreps("2x0e+1x1o"), bias=False)
    params = lin.init(jax.random.key(0))
    x = jnp.ones((3, 2))
    out = np.array(lin(params, x))
    np.testing.assert_allclose(out[:, 2:], 0.0)


def test_o3layernorm_equivariance():
    ln = O3LayerNorm(Irreps("6x0e+4x1o"))
    params = ln.init()
    rng = np.random.default_rng(3)
    R = random_rotation(rng)
    x = rng.standard_normal((4, ln.irreps.dim)).astype(np.float32)
    D = blockdiag(ln.irreps, R)
    out = np.array(ln(params, jnp.asarray(x)))
    out_rot = np.array(ln(params, jnp.asarray(x @ D.T)))
    np.testing.assert_allclose(out_rot, out @ D.T, atol=1e-4)


def test_o3layernorm_normalizes():
    ln = O3LayerNorm(Irreps("8x0e"))
    params = ln.init()
    x = jnp.asarray(np.random.default_rng(4).standard_normal((3, 8)) * 7 + 3, jnp.float32)
    out = np.array(ln(params, x))
    np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)
