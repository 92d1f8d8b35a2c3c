"""Bijective parameter transforms (unconstrained <-> constrained).

Replaces gpflow ``transforms`` used throughout the reference kernels
(/root/reference/gpitch/kernels.py:220-224, matern12_spectral_mixture.py:26-32):
``positive`` (softplus) and ``Logistic(a, b)`` bounds, plus a lower-triangular
pack used by the NonParam kernel (kernels.py:488-489) and variational q_sqrt
factors.  Pure functions of jnp arrays; every transform is a frozen dataclass
registered as a static pytree aux so it can live inside jit without retracing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

__all__ = [
    "Transform",
    "Identity",
    "Positive",
    "Logistic",
    "FillTriangular",
    "positive",
    "identity",
]

_SOFTPLUS_CLIP = 30.0


def _softplus(x):
    # numerically stable log(1+e^x)
    return jnp.where(x > _SOFTPLUS_CLIP, x, jnp.log1p(jnp.exp(jnp.minimum(x, _SOFTPLUS_CLIP))))


def _softplus_inv(y):
    y = jnp.asarray(y)
    # log(e^y - 1), stable for large y
    return jnp.where(y > _SOFTPLUS_CLIP, y, jnp.log(-jnp.expm1(-y)) + y)


@dataclasses.dataclass(frozen=True)
class Transform:
    """forward: unconstrained -> constrained; inverse: constrained -> unconstrained."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Transform):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y


@dataclasses.dataclass(frozen=True)
class Positive(Transform):
    """Softplus positivity transform with a small floor.

    gpflow's ``transforms.positive`` (softplus); floor keeps Cholesky-adjacent
    parameters away from exact zero in float32.
    """

    lower: float = 1e-6

    def forward(self, x):
        return _softplus(x) + self.lower

    def inverse(self, y):
        return _softplus_inv(jnp.maximum(jnp.asarray(y) - self.lower, 1e-20))


@dataclasses.dataclass(frozen=True)
class Logistic(Transform):
    """Bounded transform y = a + (b-a)*sigmoid(x).

    gpflow ``transforms.Logistic(a, b)`` as used for spectral-mixture
    lengthscales/variances (reference kernels.py:220-224).
    """

    a: float = 0.0
    b: float = 1.0

    def forward(self, x):
        return self.a + (self.b - self.a) * jax_sigmoid(x)

    def inverse(self, y):
        t = (jnp.asarray(y) - self.a) / (self.b - self.a)
        t = jnp.clip(t, 1e-12, 1.0 - 1e-12)
        return jnp.log(t) - jnp.log1p(-t)


def jax_sigmoid(x):
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


@dataclasses.dataclass(frozen=True)
class FillTriangular(Transform):
    """Packs a flat vector of n*(n+1)/2 entries into a lower-triangular matrix.

    Replaces gpflow ``transforms.LowerTriangular`` (reference kernels.py:488-489)
    and the q_sqrt storage of the SVGP model (pdgp.py:102-103).
    """

    n: int = 1

    # TPU note: the obvious ``zeros.at[tril_indices].set(x)`` is a scatter,
    # which XLA serializes on TPU (it sat on the SVGP hot path via q_sqrt and
    # cost ~0.14 ms/step at M=128).  This uses the TFP fill_triangular
    # construction instead: concat([x[n:], flip(x)]) reshaped to (n, n) is a
    # permutation whose lower triangle contains every packed entry exactly
    # once, so forward = concat+flip+reshape+mask (pure layout/elementwise ops
    # with equally cheap VJPs, no scatter/gather anywhere).

    def forward(self, x):
        x = jnp.asarray(x)
        xc = jnp.concatenate([x[..., self.n:], jnp.flip(x, axis=-1)], axis=-1)
        y = xc.reshape(x.shape[:-1] + (self.n, self.n))
        return jnp.tril(y)

    def inverse(self, y):
        # static index map: packed slot t lives at (ii[t], jj[t]) under forward
        n = self.n
        m = n * (n + 1) // 2
        k = np.arange(m)
        xc = np.concatenate([k[n:], k[::-1]]).reshape(n, n)
        ii, jj = np.tril_indices(n)
        order = np.argsort(xc[ii, jj])
        return jnp.asarray(y)[..., ii[order], jj[order]]


positive = Positive()
identity = Identity()
