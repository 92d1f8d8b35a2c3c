"""Sparse variational modulated-GP model (multi-pitch detection).

TPU-native rebuild of ``Pdgp`` (/root/reference/gpitch/pdgp.py:48-208): per
source i an activation GP g_i and a component GP f_i, each with its own
inducing set and whitened variational distribution, combined through
``ModulatedLikelihood`` (y = sum_i nlin(g_i) f_i + eps).

Design departures from the reference (all deliberate, TPU-first):

* The model is a pure pytree; the ELBO and predictions are pure functions of
  (model, data) — no TF graph/session, one ``jax.jit`` around the whole
  training step.
* Inducing inputs and variational parameters are stacked arrays with a leading
  source axis, and homogeneous kernel banks are stacked + vmapped, so the
  per-source Python loop of pdgp.py:146-155 becomes one batched
  Cholesky/triangular-solve/matmul pipeline on the MXU.
* q_sqrt is stored as a packed lower-triangular vector (FillTriangular), so the
  optimizer cannot leave the triangular manifold (reference stores a dense
  matrix and relies on tf.matrix_band_part downstream).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NumericsConfig
from ..core.params import Param, module, static_field
from ..core.transforms import FillTriangular
from ..likelihoods import ModulatedLikelihood
from ..linalg.ops import base_conditional, gauss_kl, safe_cholesky
from ..kernels.base import stack_modules
from ..utils.math import logistic

__all__ = ["ModGP", "predict_windowed"]


def _stack_z(z_list: Sequence[np.ndarray]) -> jnp.ndarray:
    """Stack per-source inducing inputs (S, M, 1); requires equal sizes.

    The reference allows ragged per-source inducing sets (pdgp.py:92-97); for
    batched TPU execution sets are padded to the max size by repeating the last
    point (harmless for the conditional: duplicated points are absorbed by
    jitter) — pad explicitly upstream if a different scheme is wanted.
    """
    z_list = [np.asarray(z).reshape(-1, 1) for z in z_list]
    m = max(z.shape[0] for z in z_list)
    padded = []
    for z in z_list:
        if z.shape[0] < m:
            pad = np.repeat(z[-1:], m - z.shape[0], axis=0)
            pad = pad + np.arange(1, m - z.shape[0] + 1).reshape(-1, 1) * 1e-3
            z = np.concatenate([z, pad], 0)
        padded.append(z)
    return jnp.asarray(np.stack(padded))


@module
class ModGP:
    """Modulated-GP SVGP model (Pdgp equivalent)."""

    kern_act: Any = None          # stacked kernel pytree (leading source axis) or tuple
    kern_com: Any = None
    likelihood: Any = None
    za: Any = None                # Param (S, Ma, 1)
    zc: Any = None                # Param (S, Mc, 1)
    q_mu_act: Any = None          # Param (S, Ma, 1)
    q_mu_com: Any = None          # Param (S, Mc, 1)
    q_sqrt_act: Any = None        # Param packed tril (S, Ma*(Ma+1)/2)
    q_sqrt_com: Any = None
    whiten: bool = static_field(True)
    num_sources: int = static_field(1)
    stacked_act: bool = static_field(True)
    stacked_com: bool = static_field(True)
    join_banks: bool = static_field(True)
    numerics: NumericsConfig = static_field(NumericsConfig())

    # ------------------------------------------------------------------ init
    @classmethod
    def create(cls, z, kern, nlinfun=logistic, whiten=True, noise_variance=1.0,
               gh_points=20, numerics=NumericsConfig(), train_z=False):
        """Mirror of Pdgp.__init__ (pdgp.py:49-111).

        z: [za_list, zc_list]; kern: [kern_act_list, kern_com_list].
        q_mu starts at zero, q_sqrt at identity (pdgp.py:99-103).  The demo
        fixes inducing locations (demos/scripts/demo-modgp.py:40-41) — that is
        the default here (``train_z=False``).
        """
        kern_act, kern_com = list(kern[0]), list(kern[1])
        s = len(kern_act)
        za = _stack_z(z[0])
        zc = _stack_z(z[1])
        ma, mc = za.shape[1], zc.shape[1]

        def eye_batch(m):
            return jnp.tile(jnp.eye(m)[None], (s, 1, 1))

        stacked_act, k_act = _maybe_stack(kern_act)
        stacked_com, k_com = _maybe_stack(kern_com)

        return cls(
            kern_act=k_act, kern_com=k_com,
            likelihood=ModulatedLikelihood.create(
                num_sources=s, nlinfun=nlinfun, variance=noise_variance,
                gh_points=gh_points),
            za=Param.create(za, trainable=train_z),
            zc=Param.create(zc, trainable=train_z),
            q_mu_act=Param.create(jnp.zeros((s, ma, 1))),
            q_mu_com=Param.create(jnp.zeros((s, mc, 1))),
            q_sqrt_act=Param.create(eye_batch(ma), FillTriangular(ma)),
            q_sqrt_com=Param.create(eye_batch(mc), FillTriangular(mc)),
            whiten=whiten, num_sources=s,
            stacked_act=stacked_act, stacked_com=stacked_com,
            numerics=numerics,
        )

    # ------------------------------------------------------- conditionals
    def _can_join(self):
        """Joint act+com batching needs equal inducing counts and stacked
        kernel banks; the linalg then runs as ONE (2S, M, M) batched
        Cholesky/solve instead of two sequential bank pipelines — small-matrix
        Cholesky is latency-bound on TPU, so halving the sequential chain is
        nearly a 2x on the SVGP step."""
        return (self.join_banks and self.stacked_act and self.stacked_com
                and self.za.raw.shape[1] == self.zc.raw.shape[1])

    def _banks_joint(self, xnew):
        """(mean, var) each (N, 2S), columns [act..., com...]."""
        jitter = self.numerics.jitter_value()
        za, zc = self.za.value, self.zc.value

        def gram(kern, z):
            return jax.vmap(lambda k, zi: k.K(zi))(kern, z)

        def cross(kern, z):
            return jax.vmap(lambda k, zi: k.K(zi, xnew))(kern, z)

        def diag(kern):
            return jax.vmap(lambda k: k.Kdiag(xnew))(kern)

        kmm = jnp.concatenate([gram(self.kern_act, za), gram(self.kern_com, zc)])
        kmn = jnp.concatenate([cross(self.kern_act, za), cross(self.kern_com, zc)])
        knn = jnp.concatenate([diag(self.kern_act), diag(self.kern_com)])
        q_mu = jnp.concatenate([self.q_mu_act.value, self.q_mu_com.value])
        q_sqrt = jnp.concatenate([self.q_sqrt_act.value, self.q_sqrt_com.value])

        # NOTE: solve-based (not chol_inv): the activation Gram at dense
        # extrema inducing points is ill-conditioned; in f32 the explicit
        # triangular inverse loses ~cond(L)^2 precision and NaNs the training
        # step on TPU, while backward-substitution stays stable.
        lm = jnp.linalg.cholesky(
            kmm + jitter * jnp.eye(kmm.shape[-1], dtype=kmm.dtype))
        a = jax.scipy.linalg.solve_triangular(lm, kmn, lower=True)  # (2S, M, N)
        fvar = knn - jnp.sum(jnp.square(a), axis=1)                 # (2S, N)
        if not self.whiten:
            a = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(lm, -1, -2), a, lower=False)
        fmean = jnp.einsum("bmn,bmq->bnq", a, q_mu)[..., 0]         # (2S, N)
        lta = jnp.einsum("bkm,bkn->bmn", jnp.tril(q_sqrt), a)
        fvar = fvar + jnp.sum(jnp.square(lta), axis=1)
        return fmean.T, fvar.T                                      # (N, 2S)

    def _bank(self, which: str, xnew):
        """Marginal q(f) for all sources of one bank -> mean, var (N, S)."""
        if which == "act":
            kerns, stacked = self.kern_act, self.stacked_act
            z, q_mu, q_sqrt = self.za.value, self.q_mu_act.value, self.q_sqrt_act.value
        else:
            kerns, stacked = self.kern_com, self.stacked_com
            z, q_mu, q_sqrt = self.zc.value, self.q_mu_com.value, self.q_sqrt_com.value
        jitter = self.numerics.jitter_value()

        def one(kern, z_i, mu_i, sq_i):
            kmm = kern.K(z_i)
            lm = safe_cholesky(kmm, jitter)
            kmn = kern.K(z_i, xnew)
            knn = kern.Kdiag(xnew)
            m, v = base_conditional(kmn, lm, knn, mu_i, sq_i, self.whiten)
            return m[:, 0], v[:, 0]

        if stacked:
            means, variances = jax.vmap(one)(kerns, z, q_mu, q_sqrt)
        else:
            outs = [one(k, z[i], q_mu[i], q_sqrt[i]) for i, k in enumerate(kerns)]
            means = jnp.stack([o[0] for o in outs])
            variances = jnp.stack([o[1] for o in outs])
        return means.T, variances.T  # (N, S)

    # --------------------------------------------------------------- ELBO
    def prior_kl(self):
        """Sum of per-source KLs (pdgp.py:113-131)."""
        jitter = self.numerics.jitter_value()

        def kl_bank(kerns, stacked, z, q_mu, q_sqrt):
            if self.whiten:
                return jnp.sum(jax.vmap(lambda m, s: gauss_kl(m, s))(q_mu, q_sqrt))
            def one(kern, z_i, mu_i, sq_i):
                return gauss_kl(mu_i, sq_i, kern.K(z_i), jitter)
            if stacked:
                return jnp.sum(jax.vmap(one)(kerns, z, q_mu, q_sqrt))
            return sum(one(k, z[i], q_mu[i], q_sqrt[i]) for i, k in enumerate(kerns))

        kl_a = kl_bank(self.kern_act, self.stacked_act, self.za.value,
                       self.q_mu_act.value, self.q_sqrt_act.value)
        kl_c = kl_bank(self.kern_com, self.stacked_com, self.zc.value,
                       self.q_mu_com.value, self.q_sqrt_com.value)
        return kl_a + kl_c

    def elbo(self, x, y, num_data: int | None = None):
        """Minibatch-scaled ELBO (pdgp.py:133-170 build_likelihood)."""
        if self._can_join():
            fmu, fvar = self._banks_joint(x)
        else:
            mean_a, var_a = self._bank("act", x)
            mean_c, var_c = self._bank("com", x)
            fmu = jnp.concatenate([mean_a, mean_c], axis=1)   # (N, 2S)
            fvar = jnp.concatenate([var_a, var_c], axis=1)
        var_exp = self.likelihood.variational_expectations(fmu, fvar, y)
        n = x.shape[0]
        scale = 1.0 if num_data is None else num_data / n
        return jnp.sum(var_exp) * scale - self.prior_kl()

    def build_prior_kl(self):
        """Reference name (pdgp.py:113-131)."""
        return self.prior_kl()

    def build_likelihood(self, x, y, num_data: int | None = None):
        """Reference name for the ELBO (pdgp.py:133-170)."""
        return self.elbo(x, y, num_data)

    def loss(self, x, y, num_data: int | None = None):
        return -self.elbo(x, y, num_data)

    # --------------------------------------------------------- prediction
    def predict_act(self, xnew):
        """(mean, var) each (N, S) — pdgp.py:172-179."""
        return self._bank("act", xnew)

    def predict_com(self, xnew):
        """pdgp.py:181-188."""
        return self._bank("com", xnew)

    def predict_act_n_com(self, xnew):
        """pdgp.py:190-208; source mean = nlin(m_a) * m_c per source."""
        mean_a, var_a = self._bank("act", xnew)
        mean_c, var_c = self._bank("com", xnew)
        mean_src = self.likelihood.nlinfun(mean_a) * mean_c
        return mean_a, var_a, mean_c, var_c, mean_src

    def predict_source(self, xnew):
        return self.predict_act_n_com(xnew)[4]


def _maybe_stack(kerns):
    """Stack homogeneous kernel banks for vmapped evaluation."""
    try:
        return True, stack_modules(kerns)
    except (ValueError, TypeError):
        return False, tuple(kerns)


def predict_windowed(model, xnew, ws: int = 1600, predict_fn=None):
    """Chunked prediction over long inputs (pdgp.py:17-44).

    Evaluates ``predict_act_n_com`` on ws-sized chunks via one lax.map (padded
    final chunk) instead of a per-chunk session round-trip; returns
    (m_a, v_a, m_c, v_c, m_s) each (N, S).
    """
    predict_fn = predict_fn or (lambda m, x: m.predict_act_n_com(x))
    n = xnew.shape[0]
    nchunks = -(-n // ws)
    pad = nchunks * ws - n
    xp = jnp.concatenate([xnew, jnp.repeat(xnew[-1:], pad, 0)], 0) if pad else xnew
    chunks = xp.reshape(nchunks, ws, xnew.shape[1])
    outs = jax.lax.map(lambda x: predict_fn(model, x), chunks)
    flat = [o.reshape(nchunks * ws, -1)[:n] for o in outs]
    return tuple(flat)
