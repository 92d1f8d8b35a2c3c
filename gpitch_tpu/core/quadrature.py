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

__all__ = ["hermgauss", "gauss_hermite_moments", "expectation_gaussian_nonlin"]


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


def expectation_gaussian_nonlin(mean, var, nlinfun, h: int = 20):
    """E[phi(g)] only; same contract as gauss_hermite_moments."""
    gh_x, gh_w = hermgauss(h, jnp.result_type(mean))
    x = mean[..., None] + jnp.sqrt(2.0 * var)[..., None] * gh_x
    return jnp.einsum("...h,h->...", nlinfun(x), gh_w)
