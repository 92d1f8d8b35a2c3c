"""Stationary kernels.

The reference takes RBF/Matern12/32/52 from gpflow (init_models.py:1,
init_kernels.py:1) and defines Cosine, Logistic_hat and Gammaexponential itself
(kernels.py:118-151, 379-390, 559-571).  All are rebuilt here as pytree modules.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.params import Param, module, static_field
from ..core.transforms import Logistic, Positive
from .base import Kernel, absdist

__all__ = ["RBF", "Matern12", "Matern32", "Matern52", "Cosine",
           "Gammaexponential", "LogisticHat", "Stationary"]


def _scaled_dist(X, X2, lengthscales):
    return absdist(X / lengthscales, None if X2 is None else X2 / lengthscales)


@module
class Stationary(Kernel):
    """Base: positive variance + lengthscales (gpflow Stationary equivalent)."""

    variance: Any = None
    lengthscales: Any = None

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, **kw):
        return cls(variance=Param.create(variance, Positive()),
                   lengthscales=Param.create(lengthscales, Positive()), **kw)

    def _r(self, X, X2=None):
        return _scaled_dist(X, X2, self.lengthscales.value)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), self.variance.value, dtype=X.dtype)

    def k_r(self, r):
        return self._k_scaled(r / self.lengthscales.value)

    def _k_scaled(self, r):
        raise NotImplementedError


@module
class RBF(Stationary):
    def K(self, X, X2=None):
        return self._k_scaled(self._r(X, X2))

    def _k_scaled(self, r):
        return self.variance.value * jnp.exp(-0.5 * r * r)


@module
class Matern12(Stationary):
    """Exponential kernel — activation kernel of init_kernel_training
    (init_models.py:83)."""

    def K(self, X, X2=None):
        return self._k_scaled(self._r(X, X2))

    def _k_scaled(self, r):
        return self.variance.value * jnp.exp(-r)


@module
class Matern32(Stationary):
    """Activation kernel of init_kern_act (init_kernels.py:12)."""

    def K(self, X, X2=None):
        return self._k_scaled(self._r(X, X2))

    def _k_scaled(self, r):
        r = np.sqrt(3.0) * r
        return self.variance.value * (1.0 + r) * jnp.exp(-r)


@module
class Matern52(Stationary):
    """Component base kernel of init_models.init_kern (init_models.py:190)."""

    def K(self, X, X2=None):
        return self._k_scaled(self._r(X, X2))

    def _k_scaled(self, r):
        r = np.sqrt(5.0) * r
        return self.variance.value * (1.0 + r + r * r / 3.0) * jnp.exp(-r)


@module
class Cosine(Kernel):
    """variance * cos(2*pi*frequency*|x-x'|) — reference kernels.py:118-151
    (which scales X by 2*pi*f then takes the euclidean distance; identical for
    1-D inputs)."""

    variance: Any = None
    frequency: Any = None

    @classmethod
    def create(cls, variance=1.0, frequency=1.0):
        return cls(variance=Param.create(variance, Positive()),
                   frequency=Param.create(frequency, Positive()))

    def K(self, X, X2=None):
        r = absdist(X, X2)
        return self.k_r(r)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), self.variance.value, dtype=X.dtype)

    def k_r(self, r):
        return self.variance.value * jnp.cos(2.0 * jnp.pi * self.frequency.value * r)


@module
class Gammaexponential(Stationary):
    """variance * exp(-r^gamma), gamma in (1e-5, 2) — kernels.py:559-571."""

    gamma: Any = None

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, gamma=1.0):
        return cls(variance=Param.create(variance, Positive()),
                   lengthscales=Param.create(lengthscales, Positive()),
                   gamma=Param.create(gamma, Logistic(1e-5, 2.0)))

    def K(self, X, X2=None):
        return self._k_scaled(self._r(X, X2))

    def _k_scaled(self, r):
        return self.variance.value * jnp.exp(-jnp.power(r + 1e-12, self.gamma.value))


@module
class LogisticHat(Stationary):
    """Difference of steep logistics of distance ('hat') — kernels.py:379-390."""

    def K(self, X, X2=None):
        return self._k_scaled(self._r(X, X2))

    def _k_scaled(self, r):
        f1 = 1.0 / (1.0 + jnp.exp(100.0 * (-1.0 - r)))
        f2 = 1.0 / (1.0 + jnp.exp(100.0 * (1.0 - r)))
        return self.variance.value * (f1 - f2)
