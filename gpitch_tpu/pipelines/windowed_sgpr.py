"""Batched windowed-SGPR engine — the compute core of separation + AMT.

The reference processes overlap windows *sequentially*: for each of ~223
windows it resets a single SGPRSS model, runs scipy L-BFGS-B (a Python<->TF
round trip per objective evaluation), then predicts
(/root/reference/gpitch/separation.py:279-313, transcription.py:265-298).

Here the window axis is a *batch axis*: one stacked SGPRSS pytree holds every
window's data, inducing points and free hyperparameters; the total loss is a
vmapped sum of per-window collapsed bounds, and a fixed-iteration Adam (or
L-BFGS) schedule optimizes all windows simultaneously inside one jit.  This is
also the axis the multi-chip path shards (parallel/) — windows are
conditionally independent by model design (SURVEY.md section 5).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.base import StackedSum, Sum, stack_modules, unstack_modules
from ..models.fit import fit_adam, fit_adam_segmented, fit_adam_timed, fit_lbfgs
from ..models.sgpr import SGPRSS

__all__ = ["pad_inducing", "build_window_bank", "bank_loss", "optimize_bank",
           "predict_bank_sources", "predict_bank_mixture", "pitch_variances",
           "chunked_vmap", "sum_kernel"]


def sum_kernel(kerns):
    """Sum over per-pitch kernels (``np.sum(kern_pitches)``, separation.py:257).

    Homogeneous kernel lists become a ``StackedSum`` (single vmapped op — no
    per-pitch graph unrolling, essential at AMT's 88 pitches); heterogeneous
    lists fall back to ``Sum``.
    """
    kerns = list(kerns)
    if len(kerns) > 1:
        try:
            return StackedSum.create(kerns)
        except (ValueError, TypeError):
            pass
    return Sum(kern_list=tuple(kerns))


def pad_inducing(z_list, m: int | None = None, grid_dt=None):
    """Pad ragged per-window inducing sets to a common size (nw, M, 1).

    Extrema-based inducing sets have per-window counts (init_models.py:9-51);
    fixed shapes are required for batching.  Padding repeats the last point
    with tiny offsets — with jitter the extra near-duplicate points add no
    capacity and leave the bound unchanged to numerical precision.  With
    ``grid_dt`` the offsets are whole grid steps, keeping the padded set on
    the sample grid so the lag-table fast path stays exact.
    """
    z_list = [np.asarray(z).reshape(-1, 1) for z in z_list]
    for i, z in enumerate(z_list):
        if z.shape[0] == 0:
            raise ValueError(
                f"window {i}: empty inducing set — silent windows need the "
                "uniform fallback (pipelines.init.init_liv_robust)")
    m = m or max(z.shape[0] for z in z_list)
    step = grid_dt if grid_dt is not None else 1e-4
    out = []
    for z in z_list:
        k = z.shape[0]
        if k > m:
            sel = np.linspace(0, k - 1, m).astype(int)
            z = z[sel]
        elif k < m:
            pad = z[-1:] + step * np.arange(1, m - k + 1).reshape(-1, 1)
            z = np.concatenate([z, pad], 0)
        out.append(z)
    return np.stack(out)


def build_window_bank(x_windows, y_windows, z_windows, kern_builder: Callable,
                      noise_variance: float = 1.0, masks=None, reg: bool = False,
                      y_scale: float = 1.0, grid_dt=None):
    """Stacked SGPRSS over all windows.

    kern_builder() -> fresh Sum kernel (per-pitch components); each window gets
    its own copy so hyperparameters are free per window, matching the
    reset-per-window scheme (separation.py:265-277).  ``y_scale`` mirrors the
    AMT's y*20 (transcription.py:255-256).

    ``grid_dt`` (typically 1/fs): audio windows are consecutive samples and
    inducing points sit on the sample grid, so pass the sample spacing to turn
    every covariance build into a lag-table gather (see SGPR.create) — at AMT
    scale (88 pitches) this removes >95%% of the transcendental work per step.
    """
    nw = np.asarray(x_windows).shape[0]
    # Stacked models share static metadata, so the lag table must cover the
    # *largest* per-window index span of X union Z (padded inducing points may
    # extend a few grid steps past the window edge).
    num_lags = None
    if grid_dt is not None:
        span = 0
        for i in range(nw):
            allv = np.concatenate([np.asarray(x_windows[i]).reshape(-1),
                                   np.asarray(z_windows[i]).reshape(-1)]) / grid_dt
            span = max(span, int(np.round(allv.max() - allv.min())) + 1)
        num_lags = span
    models = []
    for i in range(nw):
        # x stays f64 numpy into create: centering (X - x0) happens in f64
        # there, which is what makes the direct path f32-accurate for windows
        # deep into a recording (docs/F32_ACCURACY.md)
        m = SGPRSS.create(np.asarray(x_windows[i], dtype=np.float64).reshape(-1, 1),
                          y_scale * jnp.asarray(y_windows[i]).reshape(-1, 1),
                          kern_builder(), Z=np.asarray(z_windows[i]),
                          noise_variance=noise_variance,
                          mask=None if masks is None else jnp.asarray(masks[i]),
                          reg=reg, grid_dt=grid_dt, num_lags=num_lags)
        models.append(m)
    return stack_modules(models)


def bank_loss(bank):
    """Sum of per-window negative bounds (windows are independent)."""
    return jnp.sum(jax.vmap(lambda m: m.loss())(bank))


def optimize_bank(bank, num_steps: int = 500, learning_rate: float = 0.01,
                  method: str = "adam", timed: bool = False,
                  segment: int | None = 50):
    """Optimize every window simultaneously; returns (bank, losses).

    ``timed=True`` (adam only) additionally returns (compile_s, run_s) —
    XLA compilation vs execution of the whole schedule.

    ``segment``: Adam runs as re-invocations of one compiled segment-length
    scan (fit_adam_segmented) so no single device dispatch exceeds a few
    seconds — a whole-schedule scan over a reference-scale bank (~223 windows
    x 500 steps) is minutes of device time in one XLA execution, long enough
    to trip RPC deadlines on relayed TPU runtimes.  ``segment=None`` restores
    the single-dispatch scan.
    """
    if method == "adam":
        if segment is not None:
            bank, losses, compile_s, run_s = fit_adam_segmented(
                bank, lambda b: bank_loss(b), num_steps=num_steps,
                learning_rate=learning_rate,
                segment=min(segment, num_steps))
            if timed:
                return bank, losses, (compile_s, run_s)
            return bank, losses
        if timed:
            bank, losses, compile_s, run_s = fit_adam_timed(
                bank, lambda b: bank_loss(b), num_steps=num_steps,
                learning_rate=learning_rate)
            return bank, losses, (compile_s, run_s)
        return fit_adam(bank, lambda b: bank_loss(b), num_steps=num_steps,
                        learning_rate=learning_rate)
    return fit_lbfgs(bank, bank_loss, num_steps=num_steps)


def chunked_vmap(fn: Callable, bank, batch_size: int = 8):
    """vmap(fn) over the window axis in lax.map chunks of ``batch_size`` —
    bounds peak memory for predictions that build (ws, ws) Grams per window."""
    nw = jax.tree_util.tree_leaves(bank)[0].shape[0]
    nb = -(-nw // batch_size)
    pad = nb * batch_size - nw

    def pad_leaf(x):
        if pad == 0:
            return x
        reps = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
        return reps

    padded = jax.tree_util.tree_map(pad_leaf, bank)
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((nb, batch_size) + x.shape[1:]), padded)
    out = jax.lax.map(lambda c: jax.vmap(fn)(c), chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((nb * batch_size,) + x.shape[2:])[:nw], out)


def _centered_windows(bank, x_windows):
    """Per-window Xnew - x0 computed on host in f64, so f32 prediction
    accuracy never depends on a device-side big-minus-big subtraction.

    x0 is stored as a double-single (hi, lo) pair of f32 leaves (SGPR.create);
    hi + lo recovers the exact f64 offset used at build time."""
    x0s = (np.asarray(bank.x0.value, dtype=np.float64)
           + np.asarray(bank.x0_lo.value, dtype=np.float64)).reshape(-1)
    xc = np.asarray(x_windows, dtype=np.float64)
    xc = xc.reshape(xc.shape[0], -1) - x0s[:, None]
    return jnp.asarray(xc)


def predict_bank_sources(bank, x_windows, batch_size: int = 8, y_scale: float = 1.0):
    """Per-window per-source posteriors: (smean, svar) each (S, nw, ws).

    Equivalent of the per-window model.predict_s calls (separation.py:311-313),
    memory-bounded by chunking.
    """
    xw = _centered_windows(bank, x_windows)

    def one(args):
        m, x = args
        means, variances = m.predict_s(x.reshape(-1, 1), pre_centered=True)
        return (jnp.stack([mm[:, 0] for mm in means]),
                jnp.stack([vv[:, 0] for vv in variances]))

    means, variances = chunked_vmap(lambda mx: one(mx), (bank, xw), batch_size)
    # means: (nw, S, ws) -> (S, nw, ws); undo the AMT y-scaling
    return (jnp.swapaxes(means, 0, 1) / y_scale,
            jnp.swapaxes(variances, 0, 1) / (y_scale ** 2))


def predict_bank_mixture(bank, x_windows, batch_size: int = 8, y_scale: float = 1.0):
    """Per-window mixture posterior (nw, ws) mean/var (separation.py:306-308)."""
    xw = _centered_windows(bank, x_windows)

    def one(args):
        m, x = args
        mean, var = m.predict_f(x.reshape(-1, 1), pre_centered=True)
        return mean[:, 0], var[:, 0]

    mean, var = chunked_vmap(lambda mx: one(mx), (bank, xw), batch_size)
    return mean / y_scale, var / (y_scale ** 2)


def pitch_variances(bank):
    """matrix_var: learned per-pitch variance envelope, (num_pitches, nw) —
    the transcription output (separation.py:301-303, transcription.py:286-288)."""
    stacked = getattr(bank.kern, "stacked", None)
    if stacked is not None:
        # StackedSum inside a window bank: variance leaf is (nw, S)
        return jnp.swapaxes(stacked.variance.value, 0, 1)
    rows = [k.variance.value for k in bank.kern.kern_list]
    return jnp.stack(rows)
