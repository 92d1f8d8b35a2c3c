"""Kernel unit tests: closed forms, PSD-ness, Kdiag consistency.

The reference has no tests (SURVEY.md section 4); closed forms below transcribe
the formulas cited per class in gpitch_tpu.kernels docstrings.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gpitch_tpu.kernels as gk

X = jnp.linspace(0.0, 0.5, 40).reshape(-1, 1)
X2 = jnp.linspace(0.1, 0.8, 25).reshape(-1, 1)


def _r(a, b):
    return np.abs(np.asarray(a) - np.asarray(b).T)


def make_kernels():
    return {
        "rbf": (gk.RBF.create(1.3, 0.2),
                lambda r: 1.3 * np.exp(-0.5 * (r / 0.2) ** 2)),
        "mat12": (gk.Matern12.create(2.0, 0.3),
                  lambda r: 2.0 * np.exp(-r / 0.3)),
        "mat32": (gk.Matern32.create(0.7, 0.4),
                  lambda r: 0.7 * (1 + np.sqrt(3) * r / 0.4) * np.exp(-np.sqrt(3) * r / 0.4)),
        "mat52": (gk.Matern52.create(1.0, 0.25),
                  lambda r: (1 + np.sqrt(5) * r / 0.25 + 5 * r**2 / (3 * 0.25**2))
                  * np.exp(-np.sqrt(5) * r / 0.25)),
        "cosine": (gk.Cosine.create(0.5, 7.0),
                   lambda r: 0.5 * np.cos(2 * np.pi * 7.0 * r)),
        "gammaexp": (gk.Gammaexponential.create(1.1, 0.3, 1.5),
                     lambda r: 1.1 * np.exp(-(r / 0.3 + 1e-12) ** 1.5)),
    }


@pytest.mark.parametrize("name", list(make_kernels()))
def test_stationary_closed_form(name):
    kern, f = make_kernels()[name]
    np.testing.assert_allclose(kern.K(X, X2), f(_r(X, X2)), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(kern.K(X), f(_r(X, X)), rtol=1e-6, atol=1e-10)


def test_matern12sm_closed_form():
    e = np.array([0.5, 0.3, 0.2])
    f = np.array([100.0, 200.0, 300.0])
    kern = gk.Matern12sm.create(variance=1.7, lengthscales=0.05, energy=e, frequency=f)
    r = _r(X, X2)
    want = 1.7 * np.exp(-r / 0.05) * sum(ei * np.cos(2 * np.pi * fi * r)
                                         for ei, fi in zip(e, f))
    np.testing.assert_allclose(kern.K(X, X2), want, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(kern.Kdiag(X), np.full(X.shape[0], 1.7 * e.sum()),
                               rtol=1e-6)


def test_mercer_matern12sm_equals_matern12sm():
    e = np.array([1.0, 0.7])
    f = np.array([15.0, 30.0])
    a = gk.Matern12sm.create(1.0, 0.5, e, f)
    b = gk.MercerMatern12sm.create(1.0, 0.5, e, f)
    np.testing.assert_allclose(a.K(X, X2), b.K(X, X2), rtol=1e-6, atol=1e-10)


def test_matern32sm_closed_form():
    v = np.array([0.1, 0.2])
    f = np.array([50.0, 100.0])
    kern = gk.Matern32sm.create(lengthscales=0.8, variances=v, frequencies=f)
    r = _r(X, X2)
    r1 = np.sqrt(3) * r / 0.8
    want = (1 + r1) * np.exp(-r1) * sum(vi * np.cos(2 * np.pi * fi * r)
                                        for vi, fi in zip(v, f))
    np.testing.assert_allclose(kern.K(X, X2), want, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(kern.Kdiag(X), np.full(X.shape[0], v.sum()), rtol=1e-6)


def test_matern32sml_closed_form():
    ls = np.array([0.5, 1.2])
    v = np.array([0.3, 0.6])
    f = np.array([20.0, 40.0])
    kern = gk.Matern32sml.create(lengthscales=ls, variances=v, frequencies=f)
    r = _r(X, X2)
    want = sum(vi * (1 + np.sqrt(3) * r / li) * np.exp(-np.sqrt(3) * r / li)
               * np.cos(2 * np.pi * fi * r) for li, vi, fi in zip(ls, v, f))
    np.testing.assert_allclose(kern.K(X, X2), want, rtol=1e-6, atol=1e-8)


def test_mercer_cosmix_and_spectrum():
    e = np.array([0.6, 0.4])
    f = np.array([10.0, 25.0])
    r = _r(X, X2)
    mix = sum(ei * np.cos(2 * np.pi * fi * r) for ei, fi in zip(e, f))
    cm = gk.MercerCosMix.create(energy=e, frequency=f, variance=0.2)
    np.testing.assert_allclose(cm.K(X, X2), 0.2 * mix, rtol=1e-6, atol=1e-8)
    sp = gk.Spectrum.create(frequency=f, energy=e, variance=1.5)
    np.testing.assert_allclose(sp.K(X, X2), 1.5 * mix, rtol=1e-6, atol=1e-8)
    sp2 = gk.Spectrum2.create(frequency=f, energy=e, variance=1.5)
    np.testing.assert_allclose(sp2.K(X, X2), sp.K(X, X2))


def test_feature_kernels_psd_and_diag():
    for kern in [gk.Sig.create(2.0, 0.5), gk.Hann(n=257),
                 gk.Env.create(np.linspace(0, 0.5, 8), 0.1 * np.ones((8, 1)))]:
        K = np.asarray(kern.K(X))
        np.testing.assert_allclose(K, K.T, atol=1e-10)
        ev = np.linalg.eigvalsh(K)
        assert ev.min() > -1e-8
        np.testing.assert_allclose(np.diag(K), kern.Kdiag(X), rtol=1e-6, atol=1e-10)
        K12 = np.asarray(kern.K(X, X2))
        assert K12.shape == (X.shape[0], X2.shape[0])


def test_nonparam_kernel():
    kern = gk.NonParam.create(num_samples=6, variance=2.0)
    K = np.asarray(kern.K())
    np.testing.assert_allclose(K, 2.0 * np.eye(6), rtol=1e-6)


def test_logistic_hat():
    kern = gk.LogisticHat.create(1.0, 0.1)
    K = np.asarray(kern.K(X, X2))
    assert K.shape == (40, 25)
    assert (K >= -1e-6).all() and (K <= 1 + 1e-6).all()


@pytest.mark.parametrize("kern", [
    gk.Matern12sm.create(1.0, 0.1, [0.6, 0.4], [40.0, 80.0]),
    gk.Matern32sm.create(lengthscales=0.9, variances=[0.1, 0.1], frequencies=[30.0, 60.0]),
    gk.MercerCosMix.create(energy=[0.5, 0.5], frequency=[10.0, 20.0], variance=0.2),
])
def test_spectral_psd(kern):
    K = np.asarray(kern.K(X))
    ev = np.linalg.eigvalsh((K + K.T) / 2)
    assert ev.min() > -1e-8


def test_sum_product_combination():
    a = gk.Matern32.create(1.0, 0.3)
    b = gk.Cosine.create(0.5, 5.0)
    s = a + b
    p = a * b
    np.testing.assert_allclose(s.K(X, X2), np.asarray(a.K(X, X2)) + np.asarray(b.K(X, X2)))
    np.testing.assert_allclose(p.K(X, X2), np.asarray(a.K(X, X2)) * np.asarray(b.K(X, X2)))
    np.testing.assert_allclose(s.Kdiag(X), np.asarray(a.Kdiag(X)) + np.asarray(b.Kdiag(X)))
    assert len((a + b + a).kern_list) == 3


def test_stack_modules_vmap():
    import jax
    kerns = [gk.Matern32.create(v, l) for v, l in [(1.0, 0.2), (2.0, 0.4), (0.5, 0.1)]]
    stacked = gk.stack_modules(kerns)
    Ks = jax.vmap(lambda k: k.K(X, X2))(stacked)
    for i, k in enumerate(kerns):
        np.testing.assert_allclose(Ks[i], k.K(X, X2), rtol=1e-6)


def test_stacked_sum_matches_sum():
    kerns = [gk.Matern12sm.create(1.0, 0.1 * (i + 1), [0.6, 0.4],
                                  [40.0 * (i + 1), 80.0 * (i + 1)])
             for i in range(4)]
    plain = gk.Sum(kern_list=tuple(kerns))
    stacked = gk.StackedSum.create(kerns)
    np.testing.assert_allclose(stacked.K(X, X2), plain.K(X, X2), rtol=1e-10)
    np.testing.assert_allclose(stacked.K(X), plain.K(X), rtol=1e-10)
    np.testing.assert_allclose(stacked.Kdiag(X), plain.Kdiag(X), rtol=1e-10)
    terms = stacked.K_terms(X, X2)
    for i, k in enumerate(kerns):
        np.testing.assert_allclose(terms[i], k.K(X, X2), rtol=1e-10)
    # kern_list round-trips
    for i, k in enumerate(stacked.kern_list):
        np.testing.assert_allclose(k.K(X), kerns[i].K(X), rtol=1e-12)


def test_stacked_sum_88_pitches():
    """AMT-scale kernel: 88 stacked pitch kernels evaluate as one vmapped op."""
    import jax
    f0s = 27.5 * 2.0 ** (np.arange(88) / 12.0)
    kerns = [gk.Matern12sm.create(1.0, 0.1, [1.0, 0.5], [f, 2 * f]) for f in f0s]
    stacked = gk.StackedSum.create(kerns)
    K = jax.jit(lambda: stacked.K(X))()
    assert K.shape == (X.shape[0], X.shape[0])
    ev = np.linalg.eigvalsh(np.asarray((K + K.T) / 2))
    assert ev.min() > -1e-6
