"""Gauss-Hermite quadrature, vectorized for TPU.

Replaces the per-source 1-D quadrature of the reference
(/root/reference/gpitch/likelihoods.py:33-45 ``hermgauss1d``): here a single
batched evaluation handles all N data points and S sources at once, feeding one
matmul-shaped reduction onto the MXU instead of S separate TF graphs.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..config import default_float

__all__ = ["hermgauss", "gauss_hermite_moments", "expectation_gaussian_nonlin",
           "mvhermgauss", "hermgauss1d"]


@lru_cache(maxsize=None)
def _hermgauss_np(h: int):
    x, w = np.polynomial.hermite.hermgauss(h)
    return x, w / np.sqrt(np.pi)


def hermgauss(h: int, dtype=None):
    """Nodes and probabilists-normalized weights (sum(w)=1) for E_{N(0,1/√2-scaled)}."""
    dtype = dtype or default_float()
    x, w = _hermgauss_np(h)
    return jnp.asarray(x, dtype), jnp.asarray(w, dtype)


def gauss_hermite_moments(mean, var, nlinfun, h: int = 20):
    """E[phi(g)] and E[phi(g)^2] for g ~ N(mean, var), elementwise over any shape.

    Matches reference ``hermgauss1d`` (likelihoods.py:33-45): evaluation points
    X = gh_x * sqrt(2 var) + mean, weights / sqrt(pi).

    mean, var: (...,) arrays. Returns (E1, E2) with the same shape.
    """
    gh_x, gh_w = hermgauss(h, jnp.result_type(mean))
    x = mean[..., None] + jnp.sqrt(2.0 * var)[..., None] * gh_x  # (..., H)
    f = nlinfun(x)
    e1 = jnp.einsum("...h,h->...", f, gh_w)
    e2 = jnp.einsum("...h,h->...", f * f, gh_w)
    return e1, e2


def hermgauss1d(mean, var, h=20, nlinfun=None):
    """1-D (E[phi(g)], E[phi(g)^2]) quadrature with the reference's argument
    order ``(mean_g, var_g, H, nlinfun)`` (likelihoods.py:33-45); thin wrapper
    over the batched ``gauss_hermite_moments``."""
    if nlinfun is None:
        raise TypeError("hermgauss1d requires nlinfun (reference order: "
                        "mean, var, H, nlinfun)")
    return gauss_hermite_moments(mean, var, nlinfun, h)


def mvhermgauss(means, covs, h: int, d: int):
    """Multivariate H^D-point Gauss-Hermite grid (reference likelihoods.py:11-30,
    the legacy full-grid path of LooLik/ModLik).

    means: (N, D); covs: (N, D, D).  Returns (eval_locations (H^D, N, D),
    weights (H^D,)) such that E[f(x)] ~= sum_k w_k f(X[k]).
    """
    import itertools
    dtype = jnp.result_type(means)
    raw_x, raw_w = np.polynomial.hermite.hermgauss(h)
    xn = np.array(list(itertools.product(*(raw_x,) * d)))          # (H^D, D)
    wn = np.prod(np.array(list(itertools.product(*(raw_w,) * d))), 1)
    chol = jnp.linalg.cholesky(covs)                               # (N, D, D)
    # X[n] = sqrt(2) * L_n @ xn^T + mean_n  -> (N, D, H^D)
    X = np.sqrt(2.0) * jnp.einsum("nde,ke->ndk", chol, jnp.asarray(xn, dtype)) \
        + means[..., None]
    Xr = jnp.transpose(X, (2, 0, 1))                               # (H^D, N, D)
    return Xr, jnp.asarray(wn * np.pi ** (-0.5 * d), dtype)


def expectation_gaussian_nonlin(mean, var, nlinfun, h: int = 20):
    """E[phi(g)] only; same contract as gauss_hermite_moments."""
    gh_x, gh_w = hermgauss(h, jnp.result_type(mean))
    x = mean[..., None] + jnp.sqrt(2.0 * var)[..., None] * gh_x
    return jnp.einsum("...h,h->...", nlinfun(x), gh_w)
