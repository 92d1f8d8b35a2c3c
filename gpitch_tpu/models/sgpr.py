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
    x0: Any = None                # per-window time offset, high part, ()
    x0_lo: Any = None             # low part (double-single split, see create)
    mask: Any = None              # (N,) float or None
    reg: bool = static_field(False)
    reg_beta: float = static_field(1000.0)
    grid_dt: Any = static_field(None)   # uniform-grid spacing or None
    num_lags: int = static_field(0)     # static lag-table length (grid mode)
    lag_table: bool = static_field(False)  # opt-in lag-table compute path
    numerics: NumericsConfig = static_field(NumericsConfig())

    @classmethod
    def create(cls, X, Y, kern, Z, noise_variance=1.0, mask=None, reg=False,
               numerics=NumericsConfig(), grid_dt=None, num_lags=None,
               center=True, lag_table=False):
        """``grid_dt``: if every X and Z value is an integer multiple of
        grid_dt (windowed audio — consecutive samples + on-grid inducing
        points), it is recorded and validated (a loud error if inputs are off
        the grid), and with ``lag_table=True`` the covariance builds become a
        single stationary lag table of length span(X∪Z) gathered by integer
        lag.  Exact, not an approximation: k(|x-x'|) only takes span+1
        distinct values on a uniform grid.  Requires ``kern.k_r``; validated
        here (concrete numpy) so jit never sees it.

        ``lag_table`` is **off by default**: on TPU the (M, N) integer gather
        lowers catastrophically (round-3 measurement, docs/LAG_TABLE.md:
        135 ms/gather vs 0.68 ms for the direct cos/sin feature-matmul build
        of the same matrix — the gather made the whole separation bank step
        42x slower).  The direct Mercer build rides the MXU and is the
        TPU-native form; the table remains available for gather-friendly
        backends and as an exactness oracle in tests.

        Gradient caveat: on the grid path, covariances are gathered by rounded
        integer lag, so d(bound)/dX and d(bound)/dZ are structurally zero —
        the direct path differentiates K(Z, X) through those buffers.  X/Z are
        non-trainable, and every fit loop applies ``zero_untrainable_grads``,
        so training is identical; only raw full-pytree gradients differ.

        f32 accuracy: X and Z are stored *centered* (shifted by ``x0 = min``
        of the valid inputs, subtracted in f64 before casting).  The kernels
        are stationary, so this is an exact-arithmetic identity, but in f32 it
        is load-bearing for the direct path: a ws=2001 window starting 13 s
        into a recording otherwise computes r = |x - x'| with ~1e-6 s
        cancellation error and cos(2*pi*f*x) at ~1e5-rad arguments (f32 ulp
        there ~1e-2 rad) — see docs/F32_ACCURACY.md for measurements.
        Prediction entry points subtract ``x0`` from Xnew automatically.
        """
        import numpy as _np
        xarr = _np.asarray(X, dtype=_np.float64).reshape(-1)
        zarr = _np.asarray(Z, dtype=_np.float64).reshape(-1)
        if mask is not None:
            mvalid = _np.asarray(mask).reshape(-1) > 0
            xvalid = xarr[mvalid] if mvalid.any() else xarr
        else:
            xvalid = xarr
        # x0 = exact f64 min of the inputs: centering then preserves the
        # on-grid property for any grid phase (x0 is itself an input value).
        # f32 model leaves cannot hold x0 losslessly at t0 ~ 14 s, so it is
        # stored as a double-single (hi, lo) pair: hi = f32(x0), lo = x0 - hi.
        # Device-side `Xnew - hi - lo` is then exact to f32, and hosts recover
        # the f64 value as hi + lo (windowed_sgpr._centered_windows).
        x0 = float(min(xvalid.min(), zarr.min())) if center else 0.0
        x0_hi = float(_np.float32(x0))
        x0_lo = x0 - x0_hi
        X = (_np.asarray(X, dtype=_np.float64) - x0).reshape(-1, 1)
        Z = zarr.reshape(-1, 1) - x0
        if grid_dt is not None:
            xv = _np.asarray(X).reshape(-1) / grid_dt
            zv = _np.asarray(Z).reshape(-1) / grid_dt
            if (_np.max(_np.abs(xv - _np.round(xv))) > 1e-3
                    or _np.max(_np.abs(zv - _np.round(zv))) > 1e-3):
                raise ValueError("grid_dt: inputs are not on the grid")
            allv = _np.concatenate([xv, zv])
            span = int(_np.round(allv.max() - allv.min())) + 1
            if num_lags is not None and num_lags < span:
                # a too-short table would make lag gathers clamp out of
                # bounds, silently corrupting kuf/kuu (JAX clips OOB indices)
                raise ValueError(
                    f"num_lags={num_lags} < index span {span} of X union Z")
            if lag_table:
                kern.k_r(jnp.zeros(()))  # NotImplementedError if unsupported
                if num_lags is None:
                    num_lags = span
            else:
                # num_lags is static metadata; keep it 0 when the table is
                # unused so stacked window banks stay structurally homogeneous
                # (per-window spans differ by a few padded-inducing steps)
                num_lags = 0
        else:
            num_lags = 0
        return cls(kern=kern, variance=Param.create(noise_variance, Positive()),
                   X=Param.create(X, trainable=False),
                   Y=Param.create(Y, trainable=False),
                   Z=Param.create(Z, trainable=False),
                   x0=Param.create(x0_hi, trainable=False),
                   x0_lo=Param.create(x0_lo, trainable=False),
                   mask=None if mask is None else Param.create(mask,
                                                               trainable=False),
                   reg=reg, grid_dt=grid_dt, num_lags=num_lags,
                   lag_table=bool(lag_table and grid_dt is not None),
                   numerics=numerics)

    @property
    def mask_value(self):
        return None if self.mask is None else self.mask.value

    # ------------------------------------------------- grid (lag-table) path
    def _grid_t0(self):
        x, z = self.X.value[:, 0], self.Z.value[:, 0]
        return jnp.minimum(jnp.min(x), jnp.min(z))

    def _grid_index(self, v, t0):
        return jnp.round((v - t0) / self.grid_dt).astype(jnp.int32)

    def _grid_indices(self):
        """Integer grid positions of X and Z, offset to start at 0."""
        t0 = self._grid_t0()
        return (self._grid_index(self.X.value[:, 0], t0),
                self._grid_index(self.Z.value[:, 0], t0))

    def _lag_table(self):
        """k(l * grid_dt) for l = 0..num_lags-1 — one table for the whole
        (possibly 88-pitch summed) kernel."""
        dtype = self.X.value.dtype
        r = jnp.arange(self.num_lags, dtype=dtype) * jnp.asarray(self.grid_dt, dtype)
        return self.kern.k_r(r)

    # ------------------------------------------------------------- bound
    def _covs(self):
        """(err, kdiag, kuf, kuu) with masks applied — shared by the loss and
        predict paths."""
        x, y, z = self.X.value, self.Y.value, self.Z.value
        err = y
        if self.lag_table:
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
        return err, kdiag, kuf, kuu

    def _common(self):
        err, kdiag, kuf, kuu = self._covs()
        sigma2 = self.variance.value
        # chol_inv: downstream solves and the whole VJP become MXU matmuls
        _, L_inv = safe_chol_inv(kuu, self.numerics.jitter_value())
        # The 1/sigma2 scaling is applied to the (M, M)/(M, 1) products, not
        # to A itself: scaling the (M, N) whitened covariance elementwise is
        # a full extra HBM pass over the step's largest live buffer (the bank
        # step is bandwidth-bound, docs/ROOFLINE.md), while AAT/Aerr are
        # ~N/M times smaller.  c = LB_inv (A0/sqrt(s2)) err / sqrt(s2)
        # composes to LB_inv A0 err / s2 exactly.
        A = L_inv @ kuf
        AAT = (A @ A.T) / sigma2
        B = AAT + jnp.eye(A.shape[0], dtype=A.dtype)
        # B = AAT + I has eigenvalues >= 1 by construction: no jitter, and
        # explicitly no relative jitter either (diag(B) can be huge when
        # sigma2 is small — a trace-scaled floor would perturb the bound)
        LB, LB_inv = safe_chol_inv(B, 0.0, jitter_rel=0.0)
        Aerr = A @ err
        c = (LB_inv @ Aerr) / sigma2
        return err, kdiag, L_inv, A, AAT, (LB, LB_inv), c, sigma2

    def elbo(self):
        """The collapsed bound, term-for-term sgpr_ss.py:56-62.

        Stays in the whitened (A = Linv Kuf) form: the normal-equations form
        (G = Kuf Kuf^T contracted once, AAT = Linv G Linv^T) was measured
        14% faster per bank step (10.05 vs 11.74 ms at separation quality
        shapes) but costs 380x bound accuracy in f32 (f64-arbitrated rel err
        6.0e-7 -> 2.3e-4 — squaring Kuf before whitening doubles the
        condition number's bite); rejected, see docs/ROOFLINE.md section 4.
        """
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
            pen = self.reg_beta * self._l1_variances()
            if self.mask is not None:
                # a fully-masked window (mesh padding, pad_bank_windows) must
                # contribute exactly zero to loss AND gradients
                pen = jnp.where(num_data > 0, pen, 0.0)
            bound = bound - pen
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
    def predict_f(self, Xnew, pre_centered: bool = False):
        """Titsias posterior at Xnew (gpflow SGPR.build_predict equivalent).

        ``pre_centered``: Xnew was already shifted by ``x0`` on the host (in
        f64) — the pipelines do this so f32 prediction accuracy doesn't hinge
        on a device-side big-value subtraction."""
        if not pre_centered:
            # stored X/Z are centered (see create); two-step subtraction keeps
            # f32 exactness via the double-single (hi, lo) split
            Xnew = (Xnew - self.x0.value) - self.x0_lo.value
        err, _, L_inv, A, _, (_, LB_inv), c, sigma2 = self._common()
        kus = self.kern.K(self.Z.value, Xnew)
        tmp1 = L_inv @ kus
        tmp2 = LB_inv @ tmp1
        mean = tmp2.T @ c
        var = (self.kern.Kdiag(Xnew)
               + jnp.sum(jnp.square(tmp2), 0)
               - jnp.sum(jnp.square(tmp1), 0))
        return mean, var[:, None]


def _source_chunked(fn, per_source, kdiags, s: int, source_batch: int):
    """Apply ``fn(per_source_chunk, kdiag_chunk)`` over the source axis in
    lax.map chunks of ``source_batch``: peak memory is one chunk's worth of
    (cs, N, Nnew) intermediates instead of the full (S, N, Nnew) batch."""
    cs = max(1, min(source_batch, s))
    nc = -(-s // cs)
    pad = nc * cs - s

    def prep(t):
        def reshape(a):
            if pad:
                a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)], 0)
            return a.reshape((nc, cs) + a.shape[1:])
        return jax.tree_util.tree_map(reshape, t)

    out = jax.lax.map(lambda args: fn(args[0], args[1]),
                      (prep(per_source), prep(kdiags)))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((nc * cs,) + a.shape[2:])[:s], out)


@module
class SGPRSS(SGPR):
    """SGPR with per-source posterior prediction (sgpr_ss.py:73-114).

    The model kernel is a Sum over per-pitch kernels; ``predict_s`` returns the
    posterior of each additive component given the observed mixture, via the
    full-data Cholesky of K + sigma^2 I (sgpr_ss.py:88-90).
    """

    def predict_s(self, Xnew, pre_centered: bool = False,
                  source_batch: int = 8, xnew_is_x: bool = False):
        """[(N,1) means], [(N,1) vars] per source — sgpr_ss.py:92-106.

        ``source_batch``: sources are processed in chunks of this size
        (lax.map over chunks, vmap inside), bounding peak memory at
        (source_batch, N, Nnew) — at AMT's 88 pitches the unchunked batch is
        a 1.4 GB intermediate per window.

        ``xnew_is_x``: caller asserts Xnew IS the training input x (the
        pipeline case: windows predict at their own samples for overlap-add).
        Then the per-source cross-covariances K_i(x, Xnew) = K_i(x, x) are
        built ONCE and summed for the full Gram kxx instead of building the
        Grams twice — this path is HBM-bandwidth-bound on (N, N) buffers
        (docs/ROOFLINE.md), so saving a build pass is a real win.  Only taken
        when all sources fit one chunk (the buffers must stay live).

        All covariances are built directly (cos-feature matmul on the MXU)
        unless ``lag_table=True``: X/Z are stored centered so the f32 build is
        accurate (docs/F32_ACCURACY.md), and TPU XLA lowers integer-lag
        gathers catastrophically — a per-source (N, Nnew) gather needed
        >15 GB scratch (round 2), and even the single summed-kernel gather is
        ~200x slower than the equivalent matmul build (docs/LAG_TABLE.md).
        """
        if not pre_centered:
            # stored X/Z are centered (see create); double-single subtraction
            Xnew = (Xnew - self.x0.value) - self.x0_lo.value
        x, y = self.X.value, self.Y.value
        sigma2 = self.variance.value
        stacked = getattr(self.kern, "stacked", None)
        s = self.kern.num_terms if stacked is not None else None
        reuse = (xnew_is_x and not self.lag_table and stacked is not None
                 and s <= source_batch)

        kis = None
        if reuse:
            kis = jax.vmap(lambda k: k.K(x, Xnew))(stacked)  # (S, N, N)
            kxx = jnp.sum(kis, axis=0)
        elif self.lag_table:
            t0 = self._grid_t0()
            ix = self._grid_index(x[:, 0], t0)
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
        mv = None if self.mask is None else self.mask_value

        def finish(kxi, kdiag_i):
            """(N, Nnew) cross-cov + (Nnew,) prior diag -> mean, var."""
            if mv is not None:
                kxi = kxi * mv[:, None]
            A = L_inv @ kxi
            mean = A.T @ V                                   # (Nnew, 1)
            svar = kdiag_i - jnp.sum(jnp.square(A), 0)
            return mean, svar

        if stacked is not None:  # StackedSum bank
            kdiags = self.kern.Kdiag_terms(Xnew)             # (S, Nnew)
            if reuse:
                mean, svar = jax.vmap(finish)(kis, kdiags)
            else:
                mean, svar = _source_chunked(
                    lambda chunk, kd: jax.vmap(finish)(
                        jax.vmap(lambda k: k.K(x, Xnew))(chunk[0]), kd),
                    (stacked,), kdiags, s, source_batch)
            return ([mean[i] for i in range(s)],
                    [svar[i][:, None] for i in range(s)])

        kerns = list(self.kern.kern_list)
        means, variances = [], []
        for k in kerns:
            mean, svar = finish(k.K(x, Xnew), k.Kdiag(Xnew))
            means.append(mean)
            variances.append(svar[:, None])
        return means, variances
