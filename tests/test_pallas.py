"""Pallas kernel correctness vs the XLA reference path (interpret mode on CPU;
the same kernels compile natively on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpitch_tpu.linalg.pallas.specmix import specmix_matrix, specmix_matrix_xla


@pytest.mark.parametrize("n,m", [(256, 128), (300, 100), (257, 129)])
@pytest.mark.parametrize("m32", [False, True])
def test_specmix_pallas_matches_xla(n, m, m32, rng):
    x = jnp.asarray(np.sort(rng.random(n)).reshape(-1, 1))
    x2 = jnp.asarray(np.sort(rng.random(m)).reshape(-1, 1))
    e = jnp.asarray([0.5, 0.3, 0.2])
    f = jnp.asarray([40.0, 80.0, 120.0])
    got = specmix_matrix(x, x2, e, f, variance=1.3, lengthscale=0.07,
                         tile_n=128, tile_m=128, m32=m32, interpret=True)
    want = specmix_matrix_xla(x, x2, e, f, 1.3, 0.07, m32=m32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-9)


def test_specmix_matches_kernel_class(rng):
    from gpitch_tpu.kernels import Matern12sm
    x = jnp.asarray(np.linspace(0, 1, 200).reshape(-1, 1))
    e = np.array([0.7, 0.3])
    f = np.array([25.0, 50.0])
    kern = Matern12sm.create(0.9, 0.12, e, f)
    got = specmix_matrix(x, x, jnp.asarray(e), jnp.asarray(f), 0.9, 0.12,
                         tile_n=128, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(kern.K(x)),
                               rtol=1e-6, atol=1e-9)


def test_pallas_cholesky_batched_matches_xla():
    """Lanes-batched Pallas Cholesky == jnp.linalg.cholesky (interpret mode
    on CPU), including batch padding (B not a multiple of the tile) and the
    production M=112/160 sizes."""
    from gpitch_tpu.linalg.pallas.chol import cholesky_batched

    rng = np.random.default_rng(5)
    for b, m, bt in ((5, 24, 4), (3, 112, 2), (2, 160, 2)):
        A = rng.standard_normal((b, m, m)).astype(np.float32) * 0.2
        K = jnp.asarray(A @ np.swapaxes(A, 1, 2)
                        + np.eye(m, dtype=np.float32) * m)
        want = np.asarray(jnp.linalg.cholesky(K))
        got = np.asarray(cholesky_batched(K, batch_tile=bt, interpret=True))
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)
        np.testing.assert_allclose(got, np.tril(got), atol=0.0)
