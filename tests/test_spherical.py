"""Unit tests: spherical-harmonic embedding (norms, closed forms, equivariance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scalable_e3_gnn_tpu.core.rotations import random_rotation, wigner_D_from_matrix
from scalable_e3_gnn_tpu.core.spherical import spherical_harmonics


def test_l1_components():
    """l<=1 sh is [1, sqrt(3)(y,z,x)] — the reference's in2 layout."""
    v = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    Y = np.array(spherical_harmonics(1, v))
    np.testing.assert_allclose(Y[0], [1, 0, np.sqrt(3), 0], atol=1e-6)
    np.testing.assert_allclose(Y[1], [1, 0, 0, np.sqrt(3)], atol=1e-6)


def test_component_norms():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((16, 3)))
    Y = np.array(spherical_harmonics(3, v))
    i = 0
    for l in range(4):
        blk = Y[:, i : i + 2 * l + 1]
        i += 2 * l + 1
        np.testing.assert_allclose((blk**2).sum(-1), 2 * l + 1, rtol=1e-5)


def test_l2_standard_table():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((8, 3))
    vv = v / np.linalg.norm(v, axis=-1, keepdims=True)
    x, y, z = vv[:, 0], vv[:, 1], vv[:, 2]
    expected = np.stack(
        [
            np.sqrt(15) * x * y,
            np.sqrt(15) * y * z,
            np.sqrt(5) / 2 * (3 * z**2 - 1),
            np.sqrt(15) * x * z,
            np.sqrt(15) / 2 * (x**2 - y**2),
        ],
        -1,
    )
    Y = np.array(spherical_harmonics(2, jnp.asarray(v)))[:, 4:9]
    np.testing.assert_allclose(Y, expected, atol=1e-5)


@pytest.mark.parametrize("lmax", [1, 2, 3])
def test_equivariance(lmax):
    rng = np.random.default_rng(2)
    R = random_rotation(rng)
    v = rng.standard_normal((10, 3))
    Y = np.array(spherical_harmonics(lmax, jnp.asarray(v)))
    YR = np.array(spherical_harmonics(lmax, jnp.asarray(v @ R.T)))
    i = 0
    for l in range(lmax + 1):
        D = wigner_D_from_matrix(l, R)
        np.testing.assert_allclose(
            YR[:, i : i + 2 * l + 1], Y[:, i : i + 2 * l + 1] @ D.T, atol=1e-5
        )
        i += 2 * l + 1


def test_zero_vector_safe():
    """Padding vectors (zeros) embed without NaN and with zero l>=1 parts."""
    Y = np.array(spherical_harmonics(2, jnp.zeros((3, 3))))
    assert np.isfinite(Y).all()
    np.testing.assert_allclose(Y[:, 1:], 0.0, atol=1e-6)
    np.testing.assert_allclose(Y[:, 0], 1.0)


def test_differentiable():
    g = jax.grad(lambda v: spherical_harmonics(2, v).sum())(jnp.array([0.3, -0.2, 0.9]))
    assert np.isfinite(np.array(g)).all()


def test_unnormalized_polynomial():
    """normalize=False: sh of r*v scales as r^l per block."""
    v = jnp.array([[0.2, -0.4, 0.6]])
    Y1 = np.array(spherical_harmonics(2, v, normalize=False))
    Y2 = np.array(spherical_harmonics(2, 2.0 * v, normalize=False))
    np.testing.assert_allclose(Y2[:, 0], Y1[:, 0], atol=1e-6)
    np.testing.assert_allclose(Y2[:, 1:4], 2.0 * Y1[:, 1:4], rtol=1e-5)
    np.testing.assert_allclose(Y2[:, 4:9], 4.0 * Y1[:, 4:9], rtol=1e-5)
