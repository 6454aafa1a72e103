"""Unit tests: segment-sum aggregation, SpMM, SDDMM vs brute-force loops."""

import jax.numpy as jnp
import numpy as np

from scalable_e3_gnn_tpu.ops.gather_scatter import (
    sddmm,
    segment_max,
    segment_mean,
    segment_sum,
    spmm,
    take_dense_rev,
)


def test_segment_sum_vs_loop():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((20, 4)).astype(np.float32)
    ids = rng.integers(0, 5, size=20)
    out = np.array(segment_sum(jnp.asarray(data), jnp.asarray(ids), 5))
    expect = np.zeros((5, 4), np.float32)
    for d, i in zip(data, ids):
        expect[i] += d
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_segment_sum_drops_padding():
    data = jnp.ones((4, 2))
    ids = jnp.array([0, 1, 3, 3])  # 3 == num_segments -> trash
    out = np.array(segment_sum(data, ids, 3))
    np.testing.assert_allclose(out, [[1, 1], [1, 1], [0, 0]])


def test_segment_mean_max():
    data = jnp.asarray(np.array([[1.0], [3.0], [5.0]], np.float32))
    ids = jnp.array([0, 0, 1])
    np.testing.assert_allclose(np.array(segment_mean(data, ids, 2)), [[2.0], [5.0]])
    np.testing.assert_allclose(
        np.array(segment_max(data[:, 0], ids, 2)), [3.0, 5.0]
    )


def test_spmm_vs_dense():
    rng = np.random.default_rng(1)
    N, E, F = 6, 14, 3
    x = rng.standard_normal((N, F)).astype(np.float32)
    s = rng.integers(0, N, E)
    r = np.sort(rng.integers(0, N, E))
    w = rng.standard_normal(E).astype(np.float32)
    A = np.zeros((N, N), np.float32)
    for k in range(E):
        A[r[k], s[k]] += w[k]
    out = np.array(
        spmm(jnp.asarray(w), jnp.asarray(x), jnp.asarray(s), jnp.asarray(r), N,
             indices_are_sorted=True)
    )
    np.testing.assert_allclose(out, A @ x, rtol=1e-5, atol=1e-6)


def test_spmm_unweighted():
    x = jnp.asarray(np.eye(3, dtype=np.float32))
    s = jnp.array([0, 1, 2])
    r = jnp.array([1, 1, 2])
    out = np.array(spmm(None, x, s, r, 3))
    np.testing.assert_allclose(out, [[0, 0, 0], [1, 1, 0], [0, 0, 1]])


def test_sddmm_vs_dense():
    rng = np.random.default_rng(2)
    N, E, F = 5, 9, 4
    a = rng.standard_normal((N, F)).astype(np.float32)
    b = rng.standard_normal((N, F)).astype(np.float32)
    s = rng.integers(0, N, E)
    r = rng.integers(0, N, E)
    out = np.array(sddmm(jnp.asarray(a), jnp.asarray(b), jnp.asarray(s), jnp.asarray(r)))
    expect = (a @ b.T)[s, r]
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_take_dense_rev_qblocked_grad():
    """q > 16 engages the blocked reverse-table accumulation in the VJP
    (the one-shot [m, q, F] gather is a multi-GB temp at scale); gradients
    must match the dense-path result exactly."""
    import jax

    rng = np.random.default_rng(11)
    m, r, k, f, q = 40, 30, 4, 6, 22
    h = jnp.asarray(rng.standard_normal((m, f)), jnp.float32)
    senders = jnp.asarray(rng.integers(0, m + 3, (r, k)), jnp.int32)
    # build a correct rev table (+1 encoding: slot+1, 0 = empty)
    flat = np.array(senders).reshape(-1)
    rev = np.zeros((m, q), np.int32)
    for row in range(m):
        pos = np.nonzero(flat == row)[0][:q]
        rev[row, : len(pos)] = pos + 1
    rev = jnp.asarray(rev)

    def loss(h_):
        out = take_dense_rev(h_, senders, rev)
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(h)
    # reference: the same function with the naive transpose (jnp.take grad)
    def loss_ref(h_):
        out = jnp.take(h_, senders, axis=0, mode="fill", fill_value=0)
        return (out.astype(jnp.float32) ** 2).sum()

    g_ref = jax.grad(loss_ref)(h)
    np.testing.assert_allclose(np.array(g), np.array(g_ref), atol=1e-5)
