"""Layout tests: component-major ('cm') internals must be numerically
identical to the e3nn mul-major convention — same params, same outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scalable_e3_gnn_tpu.core.irreps import Irreps
from scalable_e3_gnn_tpu.ops.gate import Gate
from scalable_e3_gnn_tpu.ops.linear import O3Linear
from scalable_e3_gnn_tpu.ops.tensor_product import L1TensorProduct


def _to_cm(x, irreps):
    """Convert flat mul-major features to component-major."""
    lead = x.shape[:-1]
    out = []
    for mi, sl in zip(Irreps(irreps), Irreps(irreps).slices()):
        blk = x[..., sl]
        if mi.ir.l > 0:
            d = mi.ir.dim
            blk = jnp.swapaxes(blk.reshape(lead + (mi.mul, d)), -1, -2).reshape(
                lead + (mi.dim,)
            )
        out.append(blk)
    return jnp.concatenate(out, axis=-1)


@pytest.mark.parametrize(
    "spec", [("4x0e+2x0o+3x1o+2x1e", "5x0e+2x0o+4x1o+2x1e"), ("8x0e+8x1o", "8x0e+8x1o")]
)
def test_l1tp_cm_equals_mul(spec):
    rng = np.random.default_rng(0)
    tp_mul = L1TensorProduct(Irreps(spec[0]), Irreps(spec[1]))
    tp_cm = L1TensorProduct(
        Irreps(spec[0]), Irreps(spec[1]), layout_in1="cm", layout_out="cm"
    )
    params = tp_mul.init(jax.random.key(0))
    in1 = jnp.asarray(rng.standard_normal((6, tp_mul.in1_dim)), jnp.float32)
    in2 = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
    out_mul = tp_mul(params, in1, in2)
    out_cm = tp_cm(params, _to_cm(in1, spec[0]), in2)
    np.testing.assert_allclose(
        np.array(_to_cm(out_mul, spec[1])), np.array(out_cm), atol=1e-6
    )


def test_gate_cm_equals_mul():
    rng = np.random.default_rng(1)
    g_mul = Gate(Irreps("4x0e"), Irreps("3x1o+2x1e"))
    g_cm = Gate(Irreps("4x0e"), Irreps("3x1o+2x1e"), layout="cm")
    x = jnp.asarray(rng.standard_normal((5, g_mul.irreps_in.dim)), jnp.float32)
    out_mul = g_mul(x)
    out_cm = g_cm(_to_cm(x, g_mul.irreps_in))
    np.testing.assert_allclose(
        np.array(_to_cm(out_mul, g_mul.irreps_out)), np.array(out_cm), atol=1e-6
    )


def test_o3linear_cm_equals_mul():
    rng = np.random.default_rng(2)
    spec_in, spec_out = "4x0e+3x1o", "2x0e+5x1o"
    l_mul = O3Linear(Irreps(spec_in), Irreps(spec_out))
    l_cm = O3Linear(Irreps(spec_in), Irreps(spec_out), layout_in="cm", layout_out="cm")
    params = l_mul.init(jax.random.key(3))
    x = jnp.asarray(rng.standard_normal((5, l_mul.in_dim)), jnp.float32)
    np.testing.assert_allclose(
        np.array(_to_cm(l_mul(params, x), spec_out)),
        np.array(l_cm(params, _to_cm(x, spec_in))),
        atol=1e-6,
    )


def test_o3linear_mixed_layout():
    """cm in -> mul out (the output head configuration)."""
    rng = np.random.default_rng(4)
    spec_in, spec_out = "4x0e+3x1o", "1x1o"
    l_ref = O3Linear(Irreps(spec_in), Irreps(spec_out))
    l_mix = O3Linear(Irreps(spec_in), Irreps(spec_out), layout_in="cm", layout_out="mul")
    params = l_ref.init(jax.random.key(5))
    x = jnp.asarray(rng.standard_normal((5, l_ref.in_dim)), jnp.float32)
    np.testing.assert_allclose(
        np.array(l_ref(params, x)),
        np.array(l_mix(params, _to_cm(x, spec_in))),
        atol=1e-6,
    )


def test_segnn_cm_equals_mul():
    from scalable_e3_gnn_tpu.data.nbody import generate_dataset, make_fully_connected_edges
    from scalable_e3_gnn_tpu.graph.batching import batch_same_size
    from scalable_e3_gnn_tpu.models.segnn import SEGNN

    ds = generate_dataset(4, num_steps=20, seed=0)
    N = ds["pos0"].shape[1]
    feats = np.concatenate(
        [(ds["vel0"] ** 2).sum(-1, keepdims=True), ds["charges"][..., None], ds["vel0"]],
        -1,
    )
    s, r = make_fully_connected_edges(N)
    g = batch_same_size(feats, ds["pos0"], s, r)
    vel = jnp.asarray(ds["vel0"].reshape(-1, 3))
    m_mul = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"), num_layers=2,
        layout="mul",
    )
    m_cm = SEGNN(
        Irreps("2x0e+1x1o"), Irreps("8x0e+8x1o"), Irreps("1x1o"), num_layers=2,
        layout="cm",
    )
    params = m_mul.init(jax.random.key(0))
    np.testing.assert_allclose(
        np.array(m_mul(params, g, vel)), np.array(m_cm(params, g, vel)), atol=1e-5
    )
