"""Conditional + KL checked against brute-force dense Gaussian algebra."""

import jax
import jax.numpy as jnp
import numpy as np

from gpitch_tpu.kernels import RBF, Matern32
from gpitch_tpu.linalg import chol_inv, conditional, gauss_kl, safe_cholesky


def _setup(rng, m=7, n=13):
    Z = jnp.asarray(np.sort(rng.random(m)).reshape(-1, 1))
    X = jnp.asarray(np.sort(rng.random(n)).reshape(-1, 1))
    q_mu = jnp.asarray(rng.standard_normal((m, 1)))
    A = rng.standard_normal((m, m)) * 0.3
    q_sqrt = jnp.asarray(np.tril(A) + np.eye(m))
    return Z, X, q_mu, q_sqrt


def test_whitened_conditional_brute_force(rng):
    kern = RBF.create(1.2, 0.3)
    Z, X, q_mu, q_sqrt = _setup(rng)
    mean, var = conditional(X, Z, kern, q_mu, q_sqrt, whiten=True, jitter=1e-10)

    Kmm = np.asarray(kern.K(Z)) + 1e-10 * np.eye(Z.shape[0])
    L = np.linalg.cholesky(Kmm)
    Kmn = np.asarray(kern.K(Z, X))
    A = np.linalg.solve(L, Kmn)
    m_want = A.T @ np.asarray(q_mu)
    S = np.asarray(q_sqrt) @ np.asarray(q_sqrt).T
    v_want = (np.asarray(kern.Kdiag(X)) - np.sum(A * A, 0)
              + np.einsum("mn,mk,kn->n", A, S, A))
    np.testing.assert_allclose(mean, m_want, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(var[:, 0], v_want, rtol=1e-7, atol=1e-10)


def test_unwhitened_conditional_brute_force(rng):
    kern = Matern32.create(0.8, 0.4)
    Z, X, q_mu, q_sqrt = _setup(rng)
    mean, var = conditional(X, Z, kern, q_mu, q_sqrt, whiten=False, jitter=1e-10)

    Kmm = np.asarray(kern.K(Z)) + 1e-10 * np.eye(Z.shape[0])
    Kmn = np.asarray(kern.K(Z, X))
    Kinv = np.linalg.inv(Kmm)
    m_want = Kmn.T @ Kinv @ np.asarray(q_mu)
    S = np.asarray(q_sqrt) @ np.asarray(q_sqrt).T
    B = Kinv @ Kmn
    v_want = (np.asarray(kern.Kdiag(X)) - np.einsum("mn,mk,kn->n", Kmn, Kinv, Kmn)
              + np.einsum("mn,mk,kn->n", B, S, B))
    np.testing.assert_allclose(mean, m_want, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(var[:, 0], v_want, rtol=1e-6, atol=1e-9)


def _kl_dense(m, S, K):
    Kinv = np.linalg.inv(K)
    return 0.5 * (np.trace(Kinv @ S) + m.T @ Kinv @ m
                  - m.shape[0] + np.log(np.linalg.det(K)) -
                  np.log(np.linalg.det(S)))[0, 0]


def test_gauss_kl_whitened(rng):
    m = 6
    q_mu = rng.standard_normal((m, 1))
    q_sqrt = np.tril(rng.standard_normal((m, m)) * 0.2) + np.eye(m)
    S = q_sqrt @ q_sqrt.T
    want = _kl_dense(q_mu, S, np.eye(m))
    got = float(gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt)))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_gauss_kl_with_prior_K(rng):
    m = 6
    q_mu = rng.standard_normal((m, 1))
    q_sqrt = np.tril(rng.standard_normal((m, m)) * 0.2) + np.eye(m)
    S = q_sqrt @ q_sqrt.T
    A = rng.standard_normal((m, m))
    K = A @ A.T + m * np.eye(m)
    want = _kl_dense(q_mu, S, K)
    got = float(gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(K),
                         jitter=0.0))
    np.testing.assert_allclose(got, want, rtol=1e-7)


def _spd(rng, m):
    A = rng.standard_normal((m, m))
    return A @ A.T + m * np.eye(m)


def test_chol_inv_values(rng):
    K = jnp.asarray(_spd(rng, 9))
    L, Linv = chol_inv(K)
    np.testing.assert_allclose(L, np.linalg.cholesky(np.asarray(K)), rtol=1e-10)
    np.testing.assert_allclose(Linv @ L, np.eye(9), atol=1e-10)


def test_chol_inv_batched(rng):
    K = jnp.asarray(np.stack([_spd(rng, 6) for _ in range(3)]))
    L, Linv = chol_inv(K)
    for b in range(3):
        np.testing.assert_allclose(L[b], np.linalg.cholesky(np.asarray(K[b])),
                                   rtol=1e-10)
        np.testing.assert_allclose(Linv[b] @ L[b], np.eye(6), atol=1e-10)


def test_chol_inv_grad_matches_autodiff(rng):
    """The matmul-only custom VJP must equal autodiff through
    cholesky + solve_triangular for any scalar readout using both outputs."""
    K = jnp.asarray(_spd(rng, 7))
    W1 = jnp.asarray(rng.standard_normal((7, 7)))
    W2 = jnp.asarray(rng.standard_normal((7, 7)))

    def via_custom(K):
        L, Linv = chol_inv(K)
        return jnp.sum(W1 * L) + jnp.sum(jnp.tanh(W2 @ Linv))

    def via_autodiff(K):
        L = jnp.linalg.cholesky(K)
        Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(7, dtype=K.dtype),
                                                 lower=True)
        return jnp.sum(W1 * L) + jnp.sum(jnp.tanh(W2 @ Linv))

    np.testing.assert_allclose(via_custom(K), via_autodiff(K), rtol=1e-10)
    g1 = jax.grad(via_custom)(K)
    g2 = jax.grad(via_autodiff)(K)
    # autodiff's gradient need not be symmetric; compare the symmetrized form
    # (K is symmetric by construction, only sym(g) is observable through it)
    g2s = 0.5 * (g2 + g2.T)
    np.testing.assert_allclose(g1, g2s, rtol=1e-8, atol=1e-10)


def test_chol_inv_grad_through_kernel(rng):
    """End-to-end: d(elbo-like scalar)/d(hypers) identical whether the
    conditional uses chol_inv or plain cholesky+solves."""
    from gpitch_tpu.linalg import base_conditional, base_conditional_inv, safe_chol_inv
    Z, X, q_mu, q_sqrt = _setup(rng)

    def loss_inv(log_ell):
        kern = RBF.create(1.0, jnp.exp(log_ell))
        _, Linv = safe_chol_inv(kern.K(Z), 1e-10)
        m, v = base_conditional_inv(kern.K(Z, X), Linv, kern.Kdiag(X),
                                    q_mu, q_sqrt, True)
        return jnp.sum(m * m) + jnp.sum(jnp.log(v))

    def loss_plain(log_ell):
        kern = RBF.create(1.0, jnp.exp(log_ell))
        L = safe_cholesky(kern.K(Z), 1e-10)
        m, v = base_conditional(kern.K(Z, X), L, kern.Kdiag(X),
                                q_mu, q_sqrt, True)
        return jnp.sum(m * m) + jnp.sum(jnp.log(v))

    x0 = jnp.asarray(-0.7)
    np.testing.assert_allclose(loss_inv(x0), loss_plain(x0), rtol=1e-9)
    np.testing.assert_allclose(jax.grad(loss_inv)(x0), jax.grad(loss_plain)(x0),
                               rtol=1e-7)


def test_safe_cholesky_jitter():
    K = jnp.zeros((4, 4))
    L = safe_cholesky(K, 1e-3)
    np.testing.assert_allclose(L, np.sqrt(1e-3) * np.eye(4), rtol=1e-6)


def test_tri_inv_blocked_matches_solve(rng):
    """Blocked-GEMM triangular inverse == solve_triangular(L, I), including
    odd sizes that need the identity-tail padding (2001 is the production
    window size) and sizes below one block."""
    from gpitch_tpu.linalg.ops import tri_inv_blocked

    for n, block in ((5, 4), (64, 16), (130, 32), (257, 64), (501, 128)):
        A = rng.standard_normal((n, n)) * 0.3 + np.eye(n) * 2.0
        L = jnp.asarray(np.linalg.cholesky(A @ A.T + n * np.eye(n)))
        want = np.asarray(jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=L.dtype), lower=True))
        got = np.asarray(tri_inv_blocked(L, block=block))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
        # strictly lower-triangular result (upper exactly zero)
        np.testing.assert_allclose(got, np.tril(got), atol=0.0)


def test_chol_inv_blocked_threshold(rng):
    """chol_inv must give identical results through the blocked path."""
    import gpitch_tpu.linalg.ops as ops

    n = 70
    A = rng.standard_normal((n, n)) * 0.3
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    L0, Li0 = ops.chol_inv(K)
    old = ops._TRI_INV_BLOCK_MIN
    try:
        ops._TRI_INV_BLOCK_MIN = 1  # force the blocked path
        L1, Li1 = ops.chol_inv(K)
    finally:
        ops._TRI_INV_BLOCK_MIN = old
    np.testing.assert_allclose(np.asarray(Li1), np.asarray(Li0), rtol=2e-6,
                               atol=1e-7)
