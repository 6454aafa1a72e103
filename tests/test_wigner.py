"""Unit tests: real-basis Wigner 3j tensors vs closed forms + equivariance.

The lmax=1 closed forms are the reference's hard-coded CG constants
(l1_tensor_prod.py:91-94); higher-l tensors are checked for exact equivariance
under the framework's own Wigner-D convention (SURVEY.md §4.3).
"""

import numpy as np
import pytest

from scalable_e3_gnn_tpu.core.rotations import random_rotation, wigner_D_from_matrix
from scalable_e3_gnn_tpu.core.wigner import wigner_3j


def test_cg_constants_match_reference():
    # cg000 = 1, cg110 = cg011 = 1/sqrt(3), cg111 = 1/sqrt(6)
    assert wigner_3j(0, 0, 0)[0, 0, 0] == pytest.approx(1.0)
    np.testing.assert_allclose(
        wigner_3j(1, 1, 0)[:, :, 0], np.eye(3) / np.sqrt(3), atol=1e-14
    )
    np.testing.assert_allclose(
        wigner_3j(0, 1, 1)[0], np.eye(3) / np.sqrt(3), atol=1e-14
    )
    w111 = wigner_3j(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for a, b, c in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        eps[a, b, c] = 1.0
        eps[b, a, c] = -1.0
    np.testing.assert_allclose(w111, eps / np.sqrt(6), atol=1e-14)


def test_unit_frobenius_norm():
    for l1, l2, l3 in [(1, 1, 2), (2, 1, 1), (2, 2, 2), (2, 2, 0), (3, 2, 1)]:
        assert np.linalg.norm(wigner_3j(l1, l2, l3)) == pytest.approx(1.0)


def test_triangle_violation_is_zero():
    assert np.all(wigner_3j(0, 0, 1) == 0)
    assert np.all(wigner_3j(2, 0, 1) == 0)


@pytest.mark.parametrize("ls", [(1, 1, 2), (2, 1, 1), (2, 2, 2), (1, 2, 3)])
def test_equivariance(ls):
    """C is an invariant tensor: C = (D1 ⊗ D2 ⊗ D3) C for all rotations."""
    l1, l2, l3 = ls
    C = wigner_3j(l1, l2, l3)
    rng = np.random.default_rng(0)
    for _ in range(3):
        R = random_rotation(rng)
        D1 = wigner_D_from_matrix(l1, R)
        D2 = wigner_D_from_matrix(l2, R)
        D3 = wigner_D_from_matrix(l3, R)
        C2 = np.einsum("abc,ai,bj,ck->ijk", C, D1, D2, D3)
        np.testing.assert_allclose(C2, C, atol=1e-10)


def test_wigner_D_orthogonal():
    rng = np.random.default_rng(1)
    R = random_rotation(rng)
    for l in range(4):
        D = wigner_D_from_matrix(l, R)
        np.testing.assert_allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-10)


def test_wigner_D_composition():
    rng = np.random.default_rng(2)
    R1, R2 = random_rotation(rng), random_rotation(rng)
    for l in (1, 2):
        D12 = wigner_D_from_matrix(l, R1 @ R2)
        np.testing.assert_allclose(
            D12, wigner_D_from_matrix(l, R1) @ wigner_D_from_matrix(l, R2), atol=1e-10
        )
