"""Likelihood tests: quadrature vs analytic, variational expectations vs
Monte-Carlo brute force (SURVEY.md section 7 'hard parts': the log_lik_exp
cross-term bookkeeping must match small-N Monte-Carlo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpitch_tpu.core.quadrature import gauss_hermite_moments, hermgauss
from gpitch_tpu.likelihoods import (LooLik, ModLik, ModulatedLikelihood, SsLik,
                                    exp_value_closed_form, gaussian_logdensity)
from gpitch_tpu.utils.math import gaussfun, logistic, softplus


def test_hermgauss_weights_normalized():
    _, w = hermgauss(20)
    np.testing.assert_allclose(jnp.sum(w), 1.0, rtol=1e-12)


def test_gh_moments_identity_and_square():
    # E[g] = m, E[g^2] = m^2 + v for the identity nonlinearity
    m = jnp.array([[0.5, -1.0], [2.0, 0.0]])
    v = jnp.array([[0.2, 1.5], [0.01, 3.0]])
    e1, e2 = gauss_hermite_moments(m, v, lambda x: x, h=20)
    np.testing.assert_allclose(e1, m, atol=1e-10)
    np.testing.assert_allclose(e2, m * m + v, rtol=1e-10)


@pytest.mark.parametrize("nlin", [logistic, softplus, gaussfun])
def test_gh_moments_vs_mc(nlin, rng):
    # var kept <= 0.5: the Gaussian-bump nonlinearity is narrow (sigma=0.5),
    # so wide input Gaussians need impractically high quadrature order —
    # a real limitation shared with the reference's H=20 (likelihoods.py:429)
    m = jnp.array([0.0, 1.0, 3.5])
    v = jnp.array([0.5, 0.1, 0.4])
    e1, e2 = gauss_hermite_moments(m, v, nlin, h=30)
    samp = rng.standard_normal((400000, 3)) * np.sqrt(np.array(v)) + np.array(m)
    fe = np.asarray(nlin(jnp.asarray(samp)))
    np.testing.assert_allclose(e1, fe.mean(0), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(e2, (fe ** 2).mean(0), rtol=5e-3, atol=5e-3)


def test_closed_form_bump_expectation(rng):
    # E[exp(-g^2/(2b))] for g~N(m,v) equals sqrt(b/(v+b)) exp(-m^2/(2(v+b)))
    m, v, b = 0.7, 0.4, 0.5
    samp = rng.standard_normal(2000000) * np.sqrt(v) + m
    mc = np.exp(-samp ** 2 / (2 * b)).mean()
    cf = float(exp_value_closed_form(jnp.asarray(m), jnp.asarray(v), b))
    np.testing.assert_allclose(cf, mc, rtol=2e-3)


@pytest.mark.parametrize("s", [1, 2, 3, 5])
def test_varexp_vs_monte_carlo(s, rng):
    n = 6
    lik = ModulatedLikelihood.create(num_sources=s, nlinfun=logistic, variance=0.3)
    fmu = jnp.asarray(rng.standard_normal((n, 2 * s)))
    fvar = jnp.asarray(rng.random((n, 2 * s)) * 0.3 + 0.02)
    y = jnp.asarray(rng.standard_normal((n, 1)))
    ve = np.asarray(lik.variational_expectations(fmu, fvar, y))[:, 0]

    nsamp = 300000
    samp = rng.standard_normal((nsamp, n, 2 * s)) * np.sqrt(np.array(fvar)) + np.array(fmu)
    g, f = samp[..., :s], samp[..., s:]
    mean = (np.asarray(logistic(jnp.asarray(g))) * f).sum(-1)
    lp = -0.5 * (np.log(2 * np.pi * 0.3) + (np.array(y)[:, 0] - mean) ** 2 / 0.3)
    np.testing.assert_allclose(ve, lp.mean(0), atol=2e-2)


def test_logp_matches_gaussian_density(rng):
    s = 2
    lik = ModulatedLikelihood.create(num_sources=s, variance=0.5)
    F = jnp.asarray(rng.standard_normal((4, 2 * s)))
    Y = jnp.asarray(rng.standard_normal((4, 1)))
    g, f = np.array(F[:, :s]), np.array(F[:, s:])
    mean = (np.asarray(logistic(jnp.asarray(g))) * f).sum(-1, keepdims=True)
    want = np.asarray(gaussian_logdensity(Y, jnp.asarray(mean), jnp.asarray(0.5)))
    np.testing.assert_allclose(lik.logp(F, Y), want, rtol=1e-6)


def test_wrapper_column_orders(rng):
    """ModLik/LooLik/SsLik use interleaved [f, g] columns (reference
    likelihoods.py:143-144, 77-79, 207-210); they must agree with the base
    class after the permutation."""
    base = ModulatedLikelihood.create(num_sources=3, variance=0.7)
    ss = SsLik.create(variance=0.7)
    n = 5
    fmu = jnp.asarray(rng.standard_normal((n, 6)))
    fvar = jnp.asarray(rng.random((n, 6)) * 0.2 + 0.01)
    y = jnp.asarray(rng.standard_normal((n, 1)))
    # interleave: base columns [g1 g2 g3 f1 f2 f3] -> wrapper [f1 g1 f2 g2 f3 g3]
    perm = [3, 0, 4, 1, 5, 2]
    np.testing.assert_allclose(
        ss.variational_expectations(fmu[:, perm], fvar[:, perm], y),
        base.variational_expectations(fmu, fvar, y), rtol=1e-8)

    mod = ModLik.create(variance=0.7)
    base1 = ModulatedLikelihood.create(num_sources=1, variance=0.7)
    np.testing.assert_allclose(
        mod.variational_expectations(fmu[:, [3, 0]], fvar[:, [3, 0]], y),
        base1.variational_expectations(fmu[:, [0, 3]], fvar[:, [0, 3]], y), rtol=1e-8)


def test_closed_form_path_runs():
    lik = SsLik.create(nlinfun=gaussfun, quad=False)
    fmu = jnp.zeros((4, 6))
    fvar = jnp.ones((4, 6)) * 0.1
    y = jnp.zeros((4, 1))
    ve = lik.variational_expectations(fmu, fvar, y)
    assert np.isfinite(np.asarray(ve)).all()
