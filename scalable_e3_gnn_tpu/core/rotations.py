"""Wigner-D rotation matrices in the framework's real irrep basis.

Test/tooling utility (numpy, float64): given a 3x3 orthogonal matrix R (det ±1),
produce the (2l+1)x(2l+1) matrix D_l(R) such that framework spherical-harmonic
features transform as ``Y_l(R v) = D_l(R) Y_l(v)`` and irrep-(l,p) features as
``det(R)^{(1-p)/2} * D_l(R)`` under the full O(3).

D_1 is the coordinate rotation in the (y, z, x) component order; higher D_l are
recovered exactly (to fp64 roundoff) by least-squares from sh evaluations on
random points — self-consistent with core.spherical by construction.  Used by
the equivariance test suite (SURVEY.md §4.3 property tests).
"""

from __future__ import annotations

import numpy as np

__all__ = ["random_rotation", "wigner_D_from_matrix", "irrep_rotation"]

_PERM = np.array([1, 2, 0])  # (x,y,z) -> (y,z,x) component order


def random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Haar-ish random proper rotation via QR."""
    A = rng.standard_normal((3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


def _sh_numpy(lmax: int, v: np.ndarray) -> np.ndarray:
    """float64 sh evaluation mirroring core.spherical (unit vectors assumed)."""
    from .wigner import wigner_3j
    from .spherical import _recursion_constants

    outs = [np.ones(v.shape[:-1] + (1,))]
    if lmax >= 1:
        y1 = np.sqrt(3.0) * v[..., _PERM]
        outs.append(y1)
        y_prev = y1
        for C, n in _recursion_constants(lmax):
            y_prev = n * np.einsum("...a,...b,abc->...c", y_prev, y1, C)
            outs.append(y_prev)
    return np.concatenate(outs, axis=-1)


def wigner_D_from_matrix(l: int, R: np.ndarray) -> np.ndarray:
    """D_l(R) for a proper rotation R (3x3, det +1)."""
    if l == 0:
        return np.ones((1, 1))
    if l == 1:
        return R[np.ix_(_PERM, _PERM)]
    rng = np.random.default_rng(12345)
    pts = rng.standard_normal((max(8 * (2 * l + 1), 64), 3))
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    Y = _sh_numpy(l, pts)[..., l * l : (l + 1) * (l + 1)]
    YR = _sh_numpy(l, pts @ R.T)[..., l * l : (l + 1) * (l + 1)]
    D, *_ = np.linalg.lstsq(Y, YR, rcond=None)
    return D.T


def irrep_rotation(l: int, p: int, R: np.ndarray) -> np.ndarray:
    """O(3) action on an (l, p) irrep: R may include inversion (det -1)."""
    det = np.linalg.det(R)
    Rp = R * np.sign(det)  # proper part; inversion acts as (-1)^l on sh...
    # For O(3): v -> R v with R = -Rp gives Y_l(-x) = (-1)^l Y_l(x); an (l,p)
    # irrep additionally carries intrinsic parity p under inversion.
    D = wigner_D_from_matrix(l, Rp)
    if det < 0:
        D = D * (p if p in (1, -1) else 1)
    return D
