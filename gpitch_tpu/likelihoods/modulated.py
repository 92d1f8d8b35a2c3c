"""Modulated-GP likelihoods with vectorized Gauss-Hermite expectations.

Rebuilds /root/reference/gpitch/likelihoods.py.  The reference has four
near-identical classes (ModLik 1 source, LooLik 2, SsLik 3, MpdLik K) that each
loop over sources calling ``hermgauss1d`` (likelihoods.py:33-45) and assemble
cross terms in ``log_lik_exp`` (likelihoods.py:47-68).  Here a single
``ModulatedLikelihood`` handles K sources with one batched quadrature over an
(N, S, H) tensor and the cross-term identity

    2 * sum_{i<j} a_i a_j = (sum_i a_i)^2 - sum_i a_i^2,

so the variational expectation is a handful of fused elementwise ops regardless
of S.  Column convention matches MpdLik (likelihoods.py:309-318):
F = [g_1..g_S, f_1..f_S].
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from ..core.params import Param, module, static_field
from ..core.quadrature import gauss_hermite_moments
from ..core.transforms import Positive
from ..utils.math import logistic

__all__ = ["ModulatedLikelihood", "ModLik", "LooLik", "SsLik", "MpdLik",
           "exp_value_closed_form", "gaussian_logdensity", "log_lik_exp"]


def gaussian_logdensity(y, mean, variance):
    """log N(y | mean, variance) — gpflow.densities.gaussian equivalent."""
    return -0.5 * (jnp.log(2.0 * jnp.pi) + jnp.log(variance)
                   + jnp.square(y - mean) / variance)


def exp_value_closed_form(mean, var, b):
    """sqrt(b/(v+b)) * exp(-m^2 / (2(v+b))) — reference likelihoods.py:8-9,
    the closed-form E[phi(g)] for the Gaussian-bump nonlinearity."""
    return jnp.sqrt(b / (var + b)) * jnp.exp(-0.5 * jnp.square(mean) / (var + b))


def log_lik_exp(y, mean_f, var_f, e1, e2, noise_var):
    """E_q[log N(y | sum_i E1_i m_f_i, sigma^2)] expansion incl. cross terms.

    Vectorized form of reference log_lik_exp (likelihoods.py:47-68).
    y: (N, 1); mean_f, var_f, e1, e2: (N, S).  Returns (N, 1).
    """
    a = e1 * mean_f                                      # (N, S)
    A = jnp.sum(a, axis=1, keepdims=True)
    B = jnp.sum(e2 * (var_f + jnp.square(mean_f)), axis=1, keepdims=True)
    C = jnp.square(A) - jnp.sum(jnp.square(a), axis=1, keepdims=True)
    quad = jnp.square(y) - 2.0 * y * A + B + C
    return -0.5 * (quad / noise_var + jnp.log(2.0 * jnp.pi) + jnp.log(noise_var))


@module
class ModulatedLikelihood:
    """y = sum_i nlin(g_i) f_i + eps — the MpdLik of the reference
    (likelihoods.py:279-447), for any number of sources.

    ``closed_form`` switches quadrature for the Gaussian-bump closed-form
    expectations with the reference's (b=0.5, b=0.25) constants
    (likelihoods.py:248-262, SsLik quad=False path).
    """

    variance: Any = None
    nlinfun: Callable = static_field(logistic)
    num_sources: int = static_field(1)
    gh_points: int = static_field(20)
    closed_form: bool = static_field(False)

    @classmethod
    def create(cls, num_sources=1, nlinfun=logistic, variance=1.0, gh_points=20,
               closed_form=False):
        return cls(variance=Param.create(variance, Positive()),
                   nlinfun=nlinfun, num_sources=num_sources, gh_points=gh_points,
                   closed_form=closed_form)

    # -- helpers -----------------------------------------------------------
    def split(self, F):
        """F: (N, 2S) -> (g, f) each (N, S); column order [g..., f...]
        (reference likelihoods.py:314-316, 430-435)."""
        s = self.num_sources
        return F[:, :s], F[:, s:]

    def moments(self, mean_g, var_g):
        """(E[phi(g)], E[phi(g)^2]) for all N x S entries at once."""
        if self.closed_form:
            e1 = exp_value_closed_form(mean_g, var_g, 0.5)
            e2 = exp_value_closed_form(mean_g, var_g, 0.25)
            return e1, e2
        return gauss_hermite_moments(mean_g, var_g, self.nlinfun, self.gh_points)

    # -- likelihood protocol ----------------------------------------------
    def mean_function(self, F):
        g, f = self.split(F)
        return jnp.sum(self.nlinfun(g) * f, axis=1, keepdims=True)

    def logp(self, F, Y):
        """log N(y | sum nlin(g_i) f_i, sigma^2) — likelihoods.py:287-322."""
        return gaussian_logdensity(Y, self.mean_function(F), self.variance.value)

    def variational_expectations(self, Fmu, Fvar, Y):
        """(N, 1) per-point expected log-likelihoods — likelihoods.py:325-447."""
        mean_g, mean_f = self.split(Fmu)
        var_g, var_f = self.split(Fvar)
        e1, e2 = self.moments(mean_g, var_g)
        return log_lik_exp(Y, mean_f, var_f, e1, e2, self.variance.value)


# The reference's general K-source likelihood (MpdLik, likelihoods.py:279-447)
# already uses the [g_1..g_K, f_1..f_K] column convention that
# ModulatedLikelihood implements natively, so it IS the base class.
MpdLik = ModulatedLikelihood


def _swap_fg(F, s):
    """[f_1, g_1, ..] interleaved -> [g_1..g_s, f_1..f_s]."""
    f = F[:, 0::2][:, :s]
    g = F[:, 1::2][:, :s]
    return jnp.concatenate([g, f], axis=1)


@module
class ModLik(ModulatedLikelihood):
    """Single-source modulated likelihood with gpitch's [f, g] column order
    (reference likelihoods.py:136-179)."""

    @classmethod
    def create(cls, transfunc=logistic, variance=1.0, gh_points=20):
        return super().create(num_sources=1, nlinfun=transfunc, variance=variance,
                              gh_points=gh_points)

    def logp(self, F, Y):
        return super().logp(_swap_fg(F, 1), Y)

    def variational_expectations(self, Fmu, Fvar, Y):
        return super().variational_expectations(_swap_fg(Fmu, 1), _swap_fg(Fvar, 1), Y)


@module
class LooLik(ModulatedLikelihood):
    """Two-source 'leave one out' likelihood, columns [f1, g1, f2, g2]
    (reference likelihoods.py:70-133, new factorized path)."""

    @classmethod
    def create(cls, variance=1.0, gh_points=20, nlinfun=None):
        # reference LooLik hardwires the plain sigmoid (likelihoods.py:80-82)
        nlin = nlinfun or (lambda x: 1.0 / (1.0 + jnp.exp(-x)))
        return super().create(num_sources=2, nlinfun=nlin, variance=variance,
                              gh_points=gh_points)

    def logp(self, F, Y):
        return super().logp(_swap_fg(F, 2), Y)

    def variational_expectations(self, Fmu, Fvar, Y):
        return super().variational_expectations(_swap_fg(Fmu, 2), _swap_fg(Fvar, 2), Y)


@module
class SsLik(ModulatedLikelihood):
    """Three-source separation likelihood, columns [f1, g1, f2, g2, f3, g3]
    (reference likelihoods.py:199-274); ``quad=False`` selects the closed-form
    Gaussian-bump path."""

    @classmethod
    def create(cls, nlinfun=logistic, quad=True, variance=1.0, gh_points=20):
        return super().create(num_sources=3, nlinfun=nlinfun, variance=variance,
                              gh_points=gh_points, closed_form=not quad)

    def logp(self, F, Y):
        return super().logp(_swap_fg(F, 3), Y)

    def variational_expectations(self, Fmu, Fvar, Y):
        return super().variational_expectations(_swap_fg(Fmu, 3), _swap_fg(Fvar, 3), Y)
