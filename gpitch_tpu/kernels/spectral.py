"""Spectral-mixture kernels — the pitch models of gpitch.

Rebuilds /root/reference/gpitch/kernels.py:154-318, 393-475 and
matern12_spectral_mixture.py:14-133 with one structural change that is the core
of the TPU design: a cosine mixture

    sum_i e_i cos(2*pi*f_i*(x - x'))
      = phi(x)^T phi(x'),   phi(x) = [sqrt(e_i) cos(2*pi*f_i x);
                                      sqrt(e_i) sin(2*pi*f_i x)]

is an (N, 2P) x (2P, M) matmul, so every spectral-mixture Gram matrix is built
by the MXU in a single fused op instead of the reference's per-partial Python
loop of TF broadcast ops (kernels.py:244-246, matern12_spectral_mixture.py:53-55).
The Matern envelope multiplies in elementwise (VPU) and XLA fuses it with the
matmul epilogue.  Partial energies/frequencies are single array Params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.params import Param, module, static_field
from ..core.transforms import Logistic, Positive
from .base import Kernel, absdist

__all__ = ["Matern12sm", "Matern32sm", "Matern32smOld", "Matern32sml",
           "MercerMatern12sm", "MercerCosMix", "Spectrum", "Spectrum2",
           "cosine_features", "cos_mixture", "cos_mixture_r"]


def _pallas_enabled() -> bool:
    """Trace-time switch to the fused Pallas covariance kernel.

    Off by default: on TPU v5e the XLA feature-matmul path is faster at every
    measured size (docs/PALLAS_SPECMIX.md) — enable via
    ``config.set_pallas_specmix(True)`` to re-measure on other hardware."""
    from .. import config
    if not config.use_pallas_specmix():
        return False
    import jax
    return jax.default_backend() not in ("cpu",)


def cosine_features(X, energy, frequency):
    """phi(X): (N, 2P) cos/sin features with sqrt-energy scaling.

    Counterpart of phi_features (matern12_spectral_mixture.py:123-133,
    kernels.py:352-360) without the per-partial loop.
    """
    ang = 2.0 * jnp.pi * X * frequency[None, :]  # (N, P) for (N,1) X
    w = jnp.sqrt(energy)[None, :]
    return jnp.concatenate([w * jnp.cos(ang), w * jnp.sin(ang)], axis=-1)


def cos_mixture(X, X2, energy, frequency):
    """sum_i e_i cos(2 pi f_i (x-x')) as a feature matmul, (N, M)."""
    phi = cosine_features(X, energy, frequency)
    phi2 = phi if X2 is None else cosine_features(X2, energy, frequency)
    return jnp.matmul(phi, phi2.T, preferred_element_type=phi.dtype)


def cos_mixture_r(r, energy, frequency):
    """sum_i e_i cos(2 pi f_i r) evaluated directly on distances r (any shape);
    identical values to ``cos_mixture`` — the stationary (k_r) form."""
    ang = 2.0 * jnp.pi * r[..., None] * frequency
    return jnp.sum(energy * jnp.cos(ang), axis=-1)


@module
class Matern12sm(Kernel):
    """variance * exp(-r/l) * sum_i e_i cos(2 pi f_i r).

    Reference Matern12sm (matern12_spectral_mixture.py:14-67); energies and
    frequencies are fixed by default there (line 34), mirrored via trainable
    flags.  Identical math to MercerMatern12sm — kept as a distinct class for
    API parity.
    """

    variance: Any = None
    lengthscales: Any = None
    energy: Any = None
    frequency: Any = None

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, energy=(1.0,), frequency=(1.0,),
               train_energy=False, train_frequency=False, len_fixed=False):
        return cls(
            variance=Param.create(variance, Positive()),
            lengthscales=Param.create(lengthscales, Positive(), trainable=not len_fixed),
            energy=Param.create(np.asarray(energy).reshape(-1), Positive(),
                                trainable=train_energy),
            frequency=Param.create(np.asarray(frequency).reshape(-1), Positive(),
                                   trainable=train_frequency),
        )

    @property
    def num_partials(self):
        return self.energy.raw.shape[-1]

    def K(self, X, X2=None):
        if _pallas_enabled():
            from ..linalg.pallas.specmix import specmix_matrix
            return specmix_matrix(X, X if X2 is None else X2,
                                  self.energy.value, self.frequency.value,
                                  self.variance.value, self.lengthscales.value)
        r = absdist(X, X2)
        mix = cos_mixture(X, X2, self.energy.value, self.frequency.value)
        return self.variance.value * jnp.exp(-r / self.lengthscales.value) * mix

    def Kdiag(self, X):
        v = self.variance.value * jnp.sum(self.energy.value)
        return jnp.full((X.shape[0],), v, dtype=X.dtype)

    def k_r(self, r):
        mix = cos_mixture_r(r, self.energy.value, self.frequency.value)
        return self.variance.value * jnp.exp(-r / self.lengthscales.value) * mix


@module
class MercerMatern12sm(Matern12sm):
    """The workhorse component kernel (matern12_spectral_mixture.py:70-133),
    used by init_kern_com (init_kernels.py:29-37) and both demos.

    Same covariance as Matern12sm; energies/frequencies are trainable by
    default here (matching the reference where only this variant leaves them
    free).
    """

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, energy=(1.0,), frequency=(1.0,),
               train_energy=True, train_frequency=True, len_fixed=False):
        return super().create(variance, lengthscales, energy, frequency,
                              train_energy, train_frequency, len_fixed)


@module
class Matern32sm(Kernel):
    """sum_i v_i (1+sqrt(3) r/l) exp(-sqrt(3) r/l) cos(2 pi f_i r) — the main
    pitch kernel of the 2017 paper (reference kernels.py:204-258).

    Single lengthscale with Logistic(0, 2) bound (kernels.py:220); per-partial
    variances Logistic(0, 0.25) (kernels.py:223); frequencies positive.
    """

    lengthscales: Any = None
    variance: Any = None   # per-partial weights, (P,)
    frequency: Any = None  # (P,)

    @classmethod
    def create(cls, num_partials=None, lengthscales=None, variances=None,
               frequencies=None, len_bound=2.0, var_bound=0.25,
               train_vars=True, train_freqs=True):
        if lengthscales is None:
            lengthscales = 1.0
            variances = 0.125 * np.ones(num_partials)
            frequencies = 1.0 + np.arange(num_partials, dtype=float)
        return cls(
            lengthscales=Param.create(lengthscales, Logistic(0.0, len_bound)),
            variance=Param.create(np.asarray(variances).reshape(-1),
                                  Logistic(0.0, var_bound), trainable=train_vars),
            frequency=Param.create(np.asarray(frequencies).reshape(-1), Positive(),
                                   trainable=train_freqs),
        )

    @property
    def num_partials(self):
        return self.frequency.raw.shape[-1]

    def vars_n_freqs_fixed(self, fix_var=True, fix_freq=False):
        """Mirror of kernels.py:255-258; returns a new kernel (functional)."""
        return self.replace(variance=self.variance.with_trainable(not fix_var),
                            frequency=self.frequency.with_trainable(not fix_freq))

    def K(self, X, X2=None):
        r = absdist(X, X2)
        r1 = np.sqrt(3.0) * r / self.lengthscales.value
        mix = cos_mixture(X, X2, self.variance.value, self.frequency.value)
        return (1.0 + r1) * jnp.exp(-r1) * mix

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), jnp.sum(self.variance.value), dtype=X.dtype)

    def k_r(self, r):
        r1 = np.sqrt(3.0) * r / self.lengthscales.value
        mix = cos_mixture_r(r, self.variance.value, self.frequency.value)
        return (1.0 + r1) * jnp.exp(-r1) * mix


@module
class Matern32smOld(Matern32sm):
    """Legacy variant (kernels.py:154-201): lengthscale bound Logistic(0, 10),
    variances fixed."""

    @classmethod
    def create(cls, num_partials=None, lengthscales=None, variances=None,
               frequencies=None, **kw):
        kw.setdefault("len_bound", 10.0)
        kw.setdefault("train_vars", False)
        return super().create(num_partials, lengthscales, variances, frequencies, **kw)


@module
class Matern32sml(Kernel):
    """Per-partial lengthscales variant (kernels.py:261-318):
    sum_i v_i (1+sqrt(3) r/l_i) exp(-sqrt(3) r/l_i) cos(2 pi f_i r).

    The envelope no longer factors out of the mixture, so this accumulates over
    partials with a scan carrying one (N, M) buffer — O(P) passes but O(N*M)
    memory, never materializing a (P, N, M) tensor.
    """

    lengthscales: Any = None  # (P,)
    variance: Any = None      # (P,)
    frequency: Any = None     # (P,)

    @classmethod
    def create(cls, num_partials=None, lengthscales=None, variances=None,
               frequencies=None):
        if lengthscales is None:
            lengthscales = np.ones(num_partials)
            variances = 0.125 * np.ones(num_partials)
            frequencies = 1.0 + np.arange(num_partials, dtype=float)
        return cls(
            lengthscales=Param.create(np.asarray(lengthscales).reshape(-1),
                                      Logistic(0.0, 2.0)),
            variance=Param.create(np.asarray(variances).reshape(-1),
                                  Logistic(0.0, 1.0)),
            frequency=Param.create(np.asarray(frequencies).reshape(-1), Positive()),
        )

    @property
    def num_partials(self):
        return self.frequency.raw.shape[-1]

    def K(self, X, X2=None):
        r = absdist(X, X2)
        ls, vs, fs = self.lengthscales.value, self.variance.value, self.frequency.value

        def body(acc, p):
            l_i, v_i, f_i = p
            r1 = np.sqrt(3.0) * r / l_i
            acc = acc + v_i * (1.0 + r1) * jnp.exp(-r1) * jnp.cos(2.0 * jnp.pi * f_i * r)
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.zeros_like(r), (ls, vs, fs))
        return acc

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), jnp.sum(self.variance.value), dtype=X.dtype)

    def k_r(self, r):
        ls, vs, fs = self.lengthscales.value, self.variance.value, self.frequency.value
        r1 = np.sqrt(3.0) * r[..., None] / ls       # (..., P)
        cosr = jnp.cos(2.0 * jnp.pi * fs * r[..., None])
        return jnp.sum(vs * (1.0 + r1) * jnp.exp(-r1) * cosr, axis=-1)


@module
class MercerCosMix(Kernel):
    """Pure cosine-mixture Mercer kernel (kernels.py:321-376): K = variance *
    phi^T phi.  Kdiag deliberately matches the reference's ``fill(variance)``
    (kernels.py:375-376), exact when energies are normalized to sum 1.
    """

    variance: Any = None
    energy: Any = None
    frequency: Any = None

    @classmethod
    def create(cls, energy=(1.0,), frequency=(2 * np.pi,), variance=1.0,
               features_as_params=False):
        return cls(
            variance=Param.create(variance, Logistic(0.0, 0.25)),
            energy=Param.create(np.asarray(energy).reshape(-1), Positive(),
                                trainable=features_as_params),
            frequency=Param.create(np.asarray(frequency).reshape(-1), Positive(),
                                   trainable=features_as_params),
        )

    @property
    def num_features(self):
        return self.frequency.raw.shape[-1]

    def K(self, X, X2=None):
        return self.variance.value * cos_mixture(X, X2, self.energy.value,
                                                 self.frequency.value)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), self.variance.value, dtype=X.dtype)

    def k_r(self, r):
        return self.variance.value * cos_mixture_r(r, self.energy.value,
                                                   self.frequency.value)


@module
class Spectrum(Kernel):
    """variance * sum_i e_i cos(2 pi f_i r) with fixed energies/frequencies
    (kernels.py:393-427)."""

    variance: Any = None
    energy: Any = None
    frequency: Any = None

    @classmethod
    def create(cls, frequency=None, energy=None, variance=1.0):
        return cls(variance=Param.create(variance, Positive()),
                   energy=Param.create(np.asarray(energy).reshape(-1), Positive(),
                                       trainable=False),
                   frequency=Param.create(np.asarray(frequency).reshape(-1),
                                          Positive(), trainable=False))

    def K(self, X, X2=None):
        return self.variance.value * cos_mixture(X, X2, self.energy.value,
                                                 self.frequency.value)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), self.variance.value, dtype=X.dtype)

    def k_r(self, r):
        return self.variance.value * cos_mixture_r(r, self.energy.value,
                                                   self.frequency.value)


@module
class Spectrum2(Spectrum):
    """Squared-distance-path variant (kernels.py:430-475); same covariance."""
