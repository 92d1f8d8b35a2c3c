"""Gaussian-process regression models: GPR, SGPR (Titsias) and the
source-separation variant SGPRSS.

Rebuilds /root/reference/gpitch/sgpr_ss.py:10-114 (which itself re-implements
gpflow's collapsed SGPR bound at lines 29-71) plus the dense GPR the reference
takes from gpflow (used by KernelGPR, kernels.py:522-556).

TPU-first details:
* every bound/predict is a pure function over a pytree model -> one jit'd
  Cholesky + triangular-solve pipeline;
* an optional data mask makes the bound exact for zero-padded windows, which is
  what lets the separation/AMT pipelines vmap a *batch of windows* through a
  single compiled step (replacing the sequential per-window loop of
  separation.py:289) — padded points contribute nothing to any term;
* per-source prediction batches the S cross-covariance solves as one stacked
  triangular solve.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..config import NumericsConfig
from ..core.params import Param, module, static_field
from ..core.transforms import Positive
from ..linalg.ops import safe_chol_inv, safe_cholesky, solve_lower

__all__ = ["GPR", "SGPR", "SGPRSS"]

_LOG2PI = 1.8378770664093453


@module
class GPR:
    """Dense GP regression (gpflow.gpr.GPR equivalent; consumed by
    kernels.KernelGPR — reference kernels.py:526-553)."""

    kern: Any = None
    variance: Any = None          # likelihood noise
    X: Any = None                 # training inputs (N, D), fixed
    Y: Any = None                 # training targets (N, 1), fixed
    numerics: NumericsConfig = static_field(NumericsConfig())

    @classmethod
    def create(cls, X, Y, kern, noise_variance=1.0, numerics=NumericsConfig()):
        return cls(kern=kern, variance=Param.create(noise_variance, Positive()),
                   X=Param.create(X, trainable=False),
                   Y=Param.create(Y, trainable=False), numerics=numerics)

    def _chol(self):
        K = self.kern.K(self.X.value)
        Ky = K + self.variance.value * jnp.eye(K.shape[0], dtype=K.dtype)
        return safe_cholesky(Ky, self.numerics.jitter_value())

    def log_marginal_likelihood(self):
        y = self.Y.value
        L = self._chol()
        alpha = solve_lower(L, y)
        n = y.shape[0]
        return (-0.5 * jnp.sum(jnp.square(alpha))
                - jnp.sum(jnp.log(jnp.diag(L)))
                - 0.5 * n * _LOG2PI)

    def build_likelihood(self):
        """Reference (gpflow GPR) name for the training objective."""
        return self.log_marginal_likelihood()

    def loss(self):
        return -self.log_marginal_likelihood()

    def predict_f(self, Xnew):
        L = self._chol()
        Kx = self.kern.K(self.X.value, Xnew)
        A = solve_lower(L, Kx)
        V = solve_lower(L, self.Y.value)
        mean = A.T @ V
        var = self.kern.Kdiag(Xnew) - jnp.sum(jnp.square(A), 0)
        return mean, var[:, None]


@module
class SGPR:
    """Collapsed sparse GP regression (Titsias bound) — reference
    sgpr_ss.py:29-71.

    ``mask`` (optional, (N,) in {0,1}) marks valid data points; with zero-padded
    (x, y) rows and the mask, the bound equals the unpadded bound exactly:
    masked columns of A and rows of err vanish, and num_data counts the mask.
    """

    kern: Any = None
    variance: Any = None          # likelihood noise
    X: Any = None
    Y: Any = None
    Z: Any = None                 # inducing inputs (M, 1)
    mask: Any = None              # (N,) float or None
    reg: bool = static_field(False)
    reg_beta: float = static_field(1000.0)
    grid_dt: Any = static_field(None)   # uniform-grid spacing or None
    num_lags: int = static_field(0)     # static lag-table length (grid mode)
    numerics: NumericsConfig = static_field(NumericsConfig())

    @classmethod
    def create(cls, X, Y, kern, Z, noise_variance=1.0, mask=None, reg=False,
               numerics=NumericsConfig(), grid_dt=None, num_lags=None):
        """``grid_dt``: if every X and Z value is an integer multiple of
        grid_dt (windowed audio — consecutive samples + on-grid inducing
        points), the hot covariance builds become a single stationary lag
        table of length N+M gathered by integer lag, instead of O(N*M)
        transcendental evaluations per pitch.  Exact, not an approximation:
        k(|x-x'|) only takes span+1 distinct values on a uniform grid.
        Requires ``kern.k_r``; validated here (concrete numpy) so jit never
        sees it.  The table length covers the concrete index *span* of X∪Z, so
        sparse/decimated on-grid inputs are handled correctly (not just
        contiguous samples).

        Gradient caveat: on the grid path, covariances are gathered by rounded
        integer lag, so d(bound)/dX and d(bound)/dZ are structurally zero —
        the direct path differentiates K(Z, X) through those buffers.  X/Z are
        non-trainable, and every fit loop applies ``zero_untrainable_grads``,
        so training is identical; only raw full-pytree gradients differ.
        """
        if grid_dt is not None:
            import numpy as _np
            xv = _np.asarray(X).reshape(-1) / grid_dt
            zv = _np.asarray(Z).reshape(-1) / grid_dt
            if (_np.max(_np.abs(xv - _np.round(xv))) > 1e-3
                    or _np.max(_np.abs(zv - _np.round(zv))) > 1e-3):
                raise ValueError("grid_dt: inputs are not on the grid")
            kern.k_r(jnp.zeros(()))  # raises NotImplementedError if unsupported
            allv = _np.concatenate([xv, zv])
            span = int(_np.round(allv.max() - allv.min())) + 1
            if num_lags is None:
                num_lags = span
            elif num_lags < span:
                # a too-short table would make lag gathers clamp out of
                # bounds, silently corrupting kuf/kuu (JAX clips OOB indices)
                raise ValueError(
                    f"num_lags={num_lags} < index span {span} of X union Z")
        else:
            num_lags = 0
        return cls(kern=kern, variance=Param.create(noise_variance, Positive()),
                   X=Param.create(X, trainable=False),
                   Y=Param.create(Y, trainable=False),
                   Z=Param.create(jnp.asarray(Z).reshape(-1, 1), trainable=False),
                   mask=None if mask is None else Param.create(jnp.asarray(mask),
                                                               trainable=False),
                   reg=reg, grid_dt=grid_dt, num_lags=num_lags,
                   numerics=numerics)

    @property
    def mask_value(self):
        return None if self.mask is None else self.mask.value

    # ------------------------------------------------- grid (lag-table) path
    def _grid_indices(self):
        """Integer grid positions of X and Z, offset to start at 0."""
        x, z = self.X.value[:, 0], self.Z.value[:, 0]
        t0 = jnp.minimum(jnp.min(x), jnp.min(z))
        ix = jnp.round((x - t0) / self.grid_dt).astype(jnp.int32)
        iz = jnp.round((z - t0) / self.grid_dt).astype(jnp.int32)
        return ix, iz

    def _lag_table(self):
        """k(l * grid_dt) for l = 0..num_lags-1 — one table for the whole
        (possibly 88-pitch summed) kernel."""
        dtype = self.X.value.dtype
        r = jnp.arange(self.num_lags, dtype=dtype) * jnp.asarray(self.grid_dt, dtype)
        return self.kern.k_r(r)

    # ------------------------------------------------------------- bound
    def _common(self):
        x, y, z = self.X.value, self.Y.value, self.Z.value
        sigma2 = self.variance.value
        err = y
        if self.grid_dt is not None:
            ix, iz = self._grid_indices()
            table = self._lag_table()
            kuf = table[jnp.abs(iz[:, None] - ix[None, :])]
            kuu = table[jnp.abs(iz[:, None] - iz[None, :])]
            kdiag = jnp.full((x.shape[0],), table[0], dtype=x.dtype)
        else:
            kdiag = self.kern.Kdiag(x)
            kuf = self.kern.K(z, x)
            kuu = self.kern.K(z)
        if self.mask is not None:
            mv = self.mask_value
            err = err * mv[:, None]
            kdiag = kdiag * mv
            kuf = kuf * mv[None, :]
        # chol_inv: downstream solves and the whole VJP become MXU matmuls
        _, L_inv = safe_chol_inv(kuu, self.numerics.jitter_value())
        A = (L_inv @ kuf) / jnp.sqrt(sigma2)
        AAT = A @ A.T
        B = AAT + jnp.eye(A.shape[0], dtype=A.dtype)
        LB, LB_inv = safe_chol_inv(B, 0.0)
        Aerr = A @ err
        c = (LB_inv @ Aerr) / jnp.sqrt(sigma2)
        return err, kdiag, L_inv, A, AAT, (LB, LB_inv), c, sigma2

    def elbo(self):
        """The collapsed bound, term-for-term sgpr_ss.py:56-62."""
        err, kdiag, _, _, AAT, (LB, _), c, sigma2 = self._common()
        num_data = (jnp.sum(self.mask_value) if self.mask is not None
                    else jnp.asarray(err.shape[0], err.dtype))
        outdim = err.shape[1]
        bound = -0.5 * num_data * outdim * _LOG2PI
        bound -= outdim * jnp.sum(jnp.log(jnp.diag(LB)))
        bound -= 0.5 * num_data * outdim * jnp.log(sigma2)
        bound -= 0.5 * jnp.sum(jnp.square(err)) / sigma2
        bound += 0.5 * jnp.sum(jnp.square(c))
        bound -= 0.5 * outdim * jnp.sum(kdiag) / sigma2
        bound += 0.5 * outdim * jnp.trace(AAT)
        if self.reg:
            bound = bound - self.reg_beta * self._l1_variances()
        return bound

    def build_likelihood(self):
        """Reference name for the collapsed Titsias bound (sgpr_ss.py:29-71)."""
        return self.elbo()

    def _l1_variances(self):
        """L1 penalty over per-pitch kernel variances (sgpr_ss.py:17-27, 64-68)."""
        stacked = getattr(self.kern, "stacked", None)
        if stacked is not None:  # StackedSum: one batched leaf
            return jnp.sum(jnp.abs(stacked.variance.value))
        total = 0.0
        for k in getattr(self.kern, "kern_list", [self.kern]):
            total = total + jnp.sum(jnp.abs(k.variance.value))
        return total

    def loss(self):
        return -self.elbo()

    # ----------------------------------------------------------- predict
    def predict_f(self, Xnew):
        """Titsias posterior at Xnew (gpflow SGPR.build_predict equivalent)."""
        err, _, L_inv, A, _, (_, LB_inv), c, sigma2 = self._common()
        kus = self.kern.K(self.Z.value, Xnew)
        tmp1 = L_inv @ kus
        tmp2 = LB_inv @ tmp1
        mean = tmp2.T @ c
        var = (self.kern.Kdiag(Xnew)
               + jnp.sum(jnp.square(tmp2), 0)
               - jnp.sum(jnp.square(tmp1), 0))
        return mean, var[:, None]


@module
class SGPRSS(SGPR):
    """SGPR with per-source posterior prediction (sgpr_ss.py:73-114).

    The model kernel is a Sum over per-pitch kernels; ``predict_s`` returns the
    posterior of each additive component given the observed mixture, via the
    full-data Cholesky of K + sigma^2 I (sgpr_ss.py:88-90).
    """

    def predict_s(self, Xnew):
        """[(N,1) means], [(N,1) vars] per source — sgpr_ss.py:92-106."""
        x, y = self.X.value, self.Y.value
        sigma2 = self.variance.value
        if self.grid_dt is not None:
            ix, _ = self._grid_indices()
            kxx = self._lag_table()[jnp.abs(ix[:, None] - ix[None, :])]
        else:
            kxx = self.kern.K(x)
        if self.mask is not None:
            m = self.mask_value
            # padded rows/cols become unit-diagonal noise, decoupled from data
            kxx = kxx * (m[:, None] * m[None, :])
            y = y * m[:, None]
        ky = kxx + sigma2 * jnp.eye(kxx.shape[0], dtype=kxx.dtype)
        _, L_inv = safe_chol_inv(ky, self.numerics.jitter_value())
        V = L_inv @ y

        if hasattr(self.kern, "K_terms"):  # StackedSum: one batched solve
            kx = self.kern.K_terms(x, Xnew)            # (S, N, Nnew)
            if self.mask is not None:
                kx = kx * self.mask_value[None, :, None]
            A = L_inv[None] @ kx                       # (S, N, Nnew)
            mean = jnp.einsum("snm,nq->smq", A, V)     # (S, Nnew, 1)
            svar = self.kern.Kdiag_terms(Xnew) - jnp.sum(jnp.square(A), 1)
            s = mean.shape[0]
            return ([mean[i] for i in range(s)],
                    [svar[i][:, None] for i in range(s)])

        kerns = list(self.kern.kern_list)
        means, variances = [], []
        for k in kerns:
            kx = k.K(x, Xnew)
            if self.mask is not None:
                kx = kx * self.mask_value[:, None]
            A = L_inv @ kx
            means.append(A.T @ V)
            svar = k.Kdiag(Xnew) - jnp.sum(jnp.square(A), 0)
            variances.append(svar[:, None])
        return means, variances
