"""Kernel learning from isolated-note recordings (the "training" stage).

Rebuilds /root/reference/gpitch/samplecov.py, covsamp.py and kernelfit.py:

* ``sample_cov`` — Monte-Carlo covariance from random windows.  The reference
  runs one TF session call *per sample* (samplecov.py:28-33, 10k round trips);
  here all samples gather into an (S, size) matrix and the covariance is a
  single X^T X matmul.  It runs in host BLAS, deliberately: the windows are
  host-resident (this is data preprocessing), the matmul is ~2 GFLOP, and
  shipping the 35 MB sample matrix across the device link costs orders of
  magnitude more than computing the 441x441 product where the data lives
  (measured 62 s host->device transfer on the relayed TPU vs 0.1 s of BLAS).
* ``autocorr`` — autocorrelation kernel estimate (samplecov.py:56-74) as one
  FFT-based correlation.
* ``fit_kernel`` — fit the parametric Matern-spectral-mixture form to the
  sampled kernel (kernelfit.py:28-87).  The reference uses scipy L-BFGS-B on
  CPU; here the same RMSE objective runs through optax L-BFGS under jit, with
  the same sqrt(p^2) reparameterization trick for positivity.
"""

from __future__ import annotations

import functools

import jax

from ..config import jit as _cfg_jit  # precision-scoped jax.jit
import jax.numpy as jnp
import numpy as np

from ..audio.spectrum import init_cparam
from ..models.fit import fit_lbfgs
from ..utils.math import find_ideal_f0

__all__ = ["sample_cov", "autocorr", "approximate_kernel", "fit_kernel",
           "gabor_sum", "fit_kernel_gabor", "get_samples", "comatrix",
           "get_cov", "fit", "fit2", "sample_cov_psd",
           "approximate_kernel_expdecay", "optimize_kern"]


def sample_cov(y, num_sam: int = 10000, size: int = 441, seed: int = 0):
    """(cov, kern, samples): Monte-Carlo covariance of ``num_sam`` random
    windows of length ``size`` (samplecov.py:5-53).  kern = first row of cov,
    peak-normalized (samplecov.py:51-52)."""
    y = np.asarray(y).reshape(-1)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, y.size - size, size=num_sam)
    windows = y[idx[:, None] + np.arange(size)[None, :]]  # (S, size)
    # host BLAS on purpose — see module docstring (data-local compute)
    cov = np.matmul(windows.T, windows) / num_sam
    kern = cov[0, :].copy().reshape(-1, 1)
    kern /= np.max(np.abs(kern))
    return cov, kern, windows


def get_samples(y, num_sam: int = 10000, size: int = 441, seed: int = 0):
    """(num_sam, size) matrix of random windows (samplecov.py:5-14)."""
    y = np.asarray(y).reshape(-1)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, y.size - size, size=num_sam)
    return y[idx[:, None] + np.arange(size)[None, :]]


def comatrix(samples):
    """Average outer product of sample windows (samplecov.py:17-37) as one
    host-BLAS X^T X matmul instead of the reference's per-sample session
    loop (data-local compute; see module docstring)."""
    w = np.asarray(samples)
    return np.matmul(w.T, w) / w.shape[0]


def get_cov(y, num_sam: int = 10000, size: int = 441, seed: int = 0):
    """(cov, kern, samples): sampled covariance, its normalized first row, and
    the sample-window matrix — the reference's public entry point returns all
    three (samplecov.py:40-53)."""
    return sample_cov(y, num_sam=num_sam, size=size, seed=seed)


def autocorr(y, size: int):
    """Autocorrelation kernel estimate (samplecov.py:56-74), via FFT instead of
    the reference's O(n*size) Python loop."""
    y = np.asarray(y).reshape(-1)
    n = y.size
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    spec = np.fft.rfft(y, nfft)
    r_full = np.fft.irfft(spec * np.conj(spec), nfft)[:size]
    r = r_full / np.max(np.abs(r_full))
    return r.reshape(-1, 1)


def approximate_kernel(p, x):
    """Matern-3/2-enveloped cosine sum with sqrt(p^2) positivity
    (kernelfit.py:36-51).  p = [bias, lengthscale, v_1..v_P, f_1..f_P]."""
    p = jnp.asarray(p)
    x = jnp.abs(jnp.asarray(x).reshape(-1))
    npartials = (p.shape[0] - 2) // 2
    ell = jnp.sqrt(p[1] * p[1])
    k_env = (1.0 + jnp.sqrt(3.0) * x / ell) * jnp.exp(-jnp.sqrt(3.0) * x / ell)
    v = jnp.sqrt(jnp.square(p[2:2 + npartials]))
    f = jnp.sqrt(jnp.square(p[2 + npartials:2 + 2 * npartials]))
    mix = jnp.sum(v[None, :] * jnp.cos(2.0 * jnp.pi * f[None, :] * x[:, None]), axis=1)
    return k_env * mix


def _rmse_loss(p, x, target):
    return jnp.sqrt(jnp.mean(jnp.square(approximate_kernel(p, x) - target)))


@functools.lru_cache(maxsize=16)
def _kernelfit_runner(num_steps: int, psize: int, xsize: int, dtype: str):
    """One compiled L-BFGS executable per (schedule, shapes) — the sampled
    kernel/x enter as ARGUMENTS, so fitting P pitches compiles once, not P
    times (each per-pitch closure previously recompiled the zoom-linesearch
    scan: ~25 s/pitch; an 88-pitch 'train'-mode dictionary would have spent
    ~37 min compiling)."""
    import optax

    optimizer = optax.lbfgs(memory_size=20)

    @_cfg_jit
    def run(p0, x, target):
        def loss(p):
            return _rmse_loss(p, x, target)

        value_and_grad = optax.value_and_grad_from_state(loss)
        opt_state = optimizer.init(p0)

        def body(carry, _):
            p, st = carry
            value, grads = value_and_grad(p, state=st)
            updates, st2 = optimizer.update(grads, st, p, value=value,
                                            grad=grads, value_fn=loss)
            p2 = optax.apply_updates(p, updates)
            # same freeze rule as models/fit.fit_lbfgs: a flat objective makes
            # the zoom linesearch produce unbounded steps — stop once the
            # gradient vanishes or any update goes non-finite
            gnorm = optax.global_norm(grads)
            finite = jnp.all(jnp.isfinite(updates))
            ok = (gnorm > 1e-9) & finite
            keep = lambda a, b: jax.tree_util.tree_map(
                lambda u, v: jnp.where(ok, u, v), a, b)
            return (keep(p2, p), keep(st2, st)), value

        (p, _), losses = jax.lax.scan(body, (p0, opt_state), None,
                                      length=num_steps)
        return p, losses

    return run


def fit_kernel(kern, audio, file_name, max_par: int, fs: float,
               num_steps: int = 250, device: str | None = "cpu"):
    """Mirror of kernelfit.fit (kernelfit.py:61-87): init (f, v) from the FFT,
    minimize RMSE to the sampled kernel, return [lengthscale, variances,
    frequencies] plus the initial/fitted kernels.

    ``device="cpu"`` pins the solve to the host backend (data-local compute,
    same rationale as ``sample_cov``): the objective touches ~5 KB of data
    and ~12 parameters, so the zoom-linesearch while-loops are pure latency —
    a relayed TPU executes those tiny sequential ops orders of magnitude
    slower than the host core that already holds the sampled kernel.  Pass
    ``device=None`` to use the default backend."""
    import contextlib

    kern = np.asarray(kern).reshape(-1)
    n = kern.size
    xkern = np.linspace(0.0, (n - 1.0) / fs, n)

    if0 = find_ideal_f0([file_name])[0]
    init_f, init_v = init_cparam(np.asarray(audio).reshape(-1), fs=fs, maxh=max_par,
                                 ideal_f0=if0, scaled=False)[0:2]

    ctx = contextlib.nullcontext()
    if device is not None:
        try:
            ctx = jax.default_device(jax.devices(device)[0])
        except RuntimeError:
            pass
    with ctx:
        p0 = jnp.asarray(np.hstack([[0.0, 1.0], init_v, init_f]))
        target = jnp.asarray(kern)
        xj = jnp.asarray(xkern)
        run = _kernelfit_runner(num_steps, int(p0.shape[0]), int(xj.shape[0]),
                                str(p0.dtype))
        pstar, losses = run(p0, xj, target)
        pstar = jnp.sqrt(jnp.square(pstar))  # kernelfit.py:57

    npartials = (pstar.shape[0] - 2) // 2
    params = [np.asarray(pstar[1]),
              np.asarray(pstar[2:npartials + 2]),
              np.asarray(pstar[npartials + 2:])]
    kern_init = np.asarray(approximate_kernel(p0, xj))
    kern_approx = np.asarray(approximate_kernel(pstar, xj))
    return params, kern_init, kern_approx


def gabor_sum(x, p):
    """Sum of Gabor atoms v*exp(-|x|/l)*cos(2 pi f x) (kernelfit.py:7-16);
    p reshaped to (P, 3) rows [v, l, f]."""
    p = jnp.asarray(p).reshape(-1, 3)
    x = jnp.asarray(x).reshape(-1)
    v, l, f = p[:, 0], p[:, 1], p[:, 2]
    atoms = v[None, :] * jnp.exp(-jnp.abs(x)[:, None] / l[None, :]) \
        * jnp.cos(2.0 * jnp.pi * f[None, :] * x[:, None])
    return jnp.sum(atoms, axis=1)


def fit_kernel_gabor(kern, audio, file_name, max_par: int, fs: float,
                     num_steps: int = 250):
    """Gabor-sum variant (kernelfit.fit2, kernelfit.py:90-122)."""
    kern = np.asarray(kern).reshape(-1)
    n = kern.size
    xkern = jnp.asarray(np.linspace(0.0, (n - 1.0) / fs, n))
    if0 = find_ideal_f0([file_name])[0]
    init_f, init_v = init_cparam(np.asarray(audio).reshape(-1), fs=fs, maxh=max_par,
                                 ideal_f0=if0, scaled=False)[0:2]
    p0 = jnp.asarray(np.stack([init_v, 0.1 * np.ones_like(init_v), init_f], 1).reshape(-1))
    target = jnp.asarray(kern)
    loss = lambda p: jnp.sqrt(jnp.mean(jnp.square(gabor_sum(xkern, p) - target)))
    popt, _ = fit_lbfgs(p0, loss, num_steps=num_steps)
    popt = jnp.sqrt(jnp.square(popt))
    return (np.asarray(popt), np.asarray(gabor_sum(xkern, p0)),
            np.asarray(gabor_sum(xkern, popt)))


# Reference entry-point names (kernelfit.py:61-87 ``fit``, 90-122 ``fit2``).
fit = fit_kernel
fit2 = fit_kernel_gabor


def sample_cov_psd(y, niter: int = 1000, msize: int = 441, seed: int = 0):
    """Sampled covariance with explicit PSD projection via Cholesky of the
    jittered estimate (covsamp.py:5-18).  One batched matmul instead of the
    reference's per-sample outer-product loop."""
    s = get_samples(y, num_sam=niter, size=msize, seed=seed)
    cov = comatrix(s) * niter  # reference accumulates without the 1/niter mean
    cov = cov / np.max(cov)
    lower = np.linalg.cholesky(cov + 1e-6 * np.eye(msize))
    return lower @ lower.T, list(s)


def approximate_kernel_expdecay(p, x):
    """Exponential-decay (Matern-1/2) envelope variant of the spectral-mixture
    fit form (covsamp.py:29-52): exp(-|x|/l) * sum v_i cos(2 pi f_i |x|)."""
    p = jnp.asarray(p)
    x = jnp.abs(jnp.asarray(x).reshape(-1))
    npartials = (p.shape[0] - 2) // 2
    ell = jnp.sqrt(p[1] * p[1])
    v = jnp.sqrt(jnp.square(p[2:2 + npartials]))
    f = jnp.sqrt(jnp.square(p[2 + npartials:2 + 2 * npartials]))
    mix = jnp.sum(v[None, :] * jnp.cos(2.0 * jnp.pi * f[None, :] * x[:, None]), axis=1)
    return jnp.exp(-x / ell) * mix


def optimize_kern(x, y, p0, num_steps: int = 250):
    """Fit the exp-decay kernel form to observations (covsamp.py:55-58):
    L-BFGS over RMSE with the sqrt(p^2) positivity trick, jitted end-to-end
    instead of scipy on the host."""
    xj = jnp.asarray(np.asarray(x).reshape(-1))
    target = jnp.asarray(np.asarray(y).reshape(-1))
    loss = lambda p: jnp.sqrt(jnp.mean(jnp.square(
        approximate_kernel_expdecay(p, xj) - target)))
    pstar, _ = fit_lbfgs(jnp.asarray(p0), loss, num_steps=num_steps)
    return np.sqrt(np.asarray(pstar) ** 2)
