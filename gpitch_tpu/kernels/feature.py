"""Degenerate / feature-space and learned kernels.

Rebuilds Sig, Hann, Env, NonParam, MeanGP, KernelGPR from
/root/reference/gpitch/kernels.py:15-115, 478-556.  These are finite-rank
kernels K = phi(X) phi(X2)^T or kernels interpolated from data; all become
feature matmuls (MXU) here.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.params import Param, module, static_field
from ..core.transforms import FillTriangular, Positive
from ..linalg.ops import safe_cholesky, solve_lower
from .base import Kernel, absdist
from .stationary import RBF

__all__ = ["Sig", "Hann", "Env", "NonParam", "MeanGP", "KernelGPR"]


@module
class Sig(Kernel):
    """Sigmoid feature outer product K = sig(aX+b) sig(aX2+b)^T
    (kernels.py:58-86)."""

    a: Any = None
    b: Any = None

    @classmethod
    def create(cls, a=1.0, b=1.0):
        return cls(a=Param.create(a), b=Param.create(b))

    def _phi(self, X):
        return 1.0 / (1.0 + jnp.exp(-(X * self.a.value + self.b.value)))

    def K(self, X, X2=None):
        phi = self._phi(X)
        phi2 = phi if X2 is None else self._phi(X2)
        return phi @ phi2.T

    def Kdiag(self, X):
        return jnp.sum(jnp.square(self._phi(X)), axis=1)


@module
class Hann(Kernel):
    """Hann-window feature outer product (kernels.py:89-115); the reference
    hardcodes fs=16000 (kernels.py:104), kept as a configurable static."""

    n: int = static_field(1025)
    fs: float = static_field(16000.0)

    def _phi(self, X):
        return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * X * self.fs / (self.n - 1.0)))

    def K(self, X, X2=None):
        phi = self._phi(X)
        phi2 = phi if X2 is None else self._phi(X2)
        return phi @ phi2.T

    def Kdiag(self, X):
        return jnp.sum(jnp.square(self._phi(X)), axis=1)


@module
class Env(Kernel):
    """Envelope kernel (kernels.py:15-55): a latent GP function g built from its
    own inducing set via Cholesky + triangular solves, squashed through
    softplus; K = softplus(g)(X) softplus(g)(X2)^T."""

    kernel: Any = None     # internal RBF
    z: Any = None          # (M, 1) Param
    u: Any = None          # (M, 1) Param

    @classmethod
    def create(cls, z, u=None, lengthscales=0.5, variance=1.0):
        z = jnp.asarray(z).reshape(-1, 1)
        if u is None:
            u = jnp.zeros((z.shape[0], 1))
        return cls(kernel=RBF.create(variance=variance, lengthscales=lengthscales),
                   z=Param.create(z), u=Param.create(u))

    def _phi(self, X):
        z = self.z.value
        K = self.kernel.K(z)
        L = safe_cholesky(K, 0.001)   # reference adds 0.001*I (kernels.py:28)
        A = solve_lower(L, self.kernel.K(z, X))
        V = solve_lower(L, self.u.value)
        g = A.T @ V
        return jnp.logaddexp(g, 0.0)  # log(1 + e^g), kernels.py:35

    def K(self, X, X2=None):
        phi = self._phi(X)
        phi2 = phi if X2 is None else self._phi(X2)
        return phi @ phi2.T

    def Kdiag(self, X):
        return jnp.sum(jnp.square(self._phi(X)), axis=1)


@module
class NonParam(Kernel):
    """Free-form PSD kernel K = variance * L L^T with trainable lower-triangular
    L (kernels.py:478-497).  Ignores X by construction; only valid when the
    Gram matrix size equals num_samples."""

    variance: Any = None
    L: Any = None
    num_samples: int = static_field(1)

    @classmethod
    def create(cls, num_samples, variance=1.0):
        tril = FillTriangular(num_samples)
        return cls(variance=Param.create(variance, Positive()),
                   L=Param.create(np.eye(num_samples), tril),
                   num_samples=num_samples)

    def K(self, X=None, X2=None):
        L = self.L.value
        return self.variance.value * (L @ L.T)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), self.variance.value, dtype=X.dtype)


@module
class MeanGP(Kernel):
    """Kernel interpolated by an RBF GP over precomputed kernel observations
    (kernels.py:500-519).

    The reference version returns the raw cross-covariance (its K is unused /
    half-finished); here the full posterior-mean interpolation is implemented:
    K(X, X2) = variance * reshape(K_r,xk @ (K_xk,xk + jitter I)^{-1} fkern).
    """

    variance: Any = None
    kern: Any = None       # internal RBF over distances
    xkern: Any = None      # (Mk, 1) distance grid (fixed)
    fkern: Any = None      # (Mk, 1) sampled kernel values (fixed)

    @classmethod
    def create(cls, xkern, fkern, variance=1.0, plen=1.0, pvar=1.0):
        return cls(variance=Param.create(variance, Positive()),
                   kern=RBF.create(variance=pvar, lengthscales=plen),
                   xkern=Param.create(np.asarray(xkern).reshape(-1, 1), trainable=False),
                   fkern=Param.create(np.asarray(fkern).reshape(-1, 1), trainable=False))

    def _interp(self, r_flat):
        xk = self.xkern.value
        L = safe_cholesky(self.kern.K(xk))
        alpha = solve_lower(L, self.fkern.value)
        A = solve_lower(L, self.kern.K(xk, r_flat))
        return A.T @ alpha

    def K(self, X, X2=None):
        r = absdist(X, X2)
        vals = self._interp(r.reshape(-1, 1))
        return self.variance.value * vals.reshape(r.shape)

    def Kdiag(self, X):
        zero = jnp.zeros((1, 1), dtype=X.dtype)
        k0 = self._interp(zero)[0, 0]
        return jnp.full((X.shape[0],), self.variance.value * k0, dtype=X.dtype)


@module
class KernelGPR(Kernel):
    """Kernel = posterior mean of a trained GP regression evaluated at pairwise
    distances (kernels.py:522-556).  ``gpm`` is any model exposing
    ``predict_f(Xnew) -> (mean, var)`` (see models.gpr.GPR)."""

    variance: Any = None
    gpm: Any = None

    @classmethod
    def create(cls, gpm, variance=1.0):
        return cls(variance=Param.create(variance, Positive()), gpm=gpm)

    def K(self, X, X2=None):
        r = absdist(X, X2)
        mean, _ = self.gpm.predict_f(r.reshape(-1, 1))
        return self.variance.value * mean.reshape(r.shape)

    def Kdiag(self, X):
        zero = jnp.zeros((1, 1), dtype=X.dtype)
        mean, _ = self.gpm.predict_f(zero)
        return jnp.full((X.shape[0],), self.variance.value * mean[0, 0], dtype=X.dtype)
