"""Source-separation pipeline (SoSp equivalent).

Rebuilds /root/reference/gpitch/separation.py:14-423.  Differences by design:

* Data flows through explicit arrays — no hardcoded dataset paths or TF
  sessions (separation.py:22-29); loading helpers accept directories but the
  pipeline itself takes (train signals, mixture) arrays.
* The per-window optimize loop (separation.py:289-313) is replaced by the
  batched window bank (windowed_sgpr.py): every window optimizes and predicts
  in parallel on device, and the window axis is shardable across chips.
* Checkpoints are numpy archives instead of pickle+h5py (separation.py:315-330).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..audio.io import Audio, readaudio
from ..audio.spectrum import init_cparam
from ..audio.windowing import merged_mean, merged_variance, window_stack
from ..kernels import Sum  # noqa: F401 (re-export compat)
from ..utils.math import find_ideal_f0
from .init import init_kern_com, init_liv, init_liv_robust  # noqa: F401
from .kernel_learning import fit_kernel, sample_cov
from .windowed_sgpr import (build_window_bank, optimize_bank, pad_inducing,
                            pitch_variances, predict_bank_mixture,
                            predict_bank_sources, sum_kernel)

__all__ = ["SoSp", "learn_pitch_params", "load_mixture_from_sources"]


def learn_pitch_params(train_signals, names, fs, mode: str = "fft",
                       covsize: int = 441, num_sam: int = 10000, max_par: int = 1,
                       saved=None, timings: dict | None = None):
    """Per-pitch (lengthscale, energies, frequencies) — the three
    initialization modes of init_kernel (separation.py:179-236):
    'train' = sampled covariance + parametric fit, 'fft' = FFT peak init,
    'load' = previously saved params.

    Returns (params=[lengthscales, energies, frequencies], kern_sampled).
    ``timings``: pass a dict to receive per-pitch per-stage seconds
    ('sample_cov' and 'fit' lists) — the train mode's cost breakdown.
    """
    import time as _time

    params = [[], [], []]
    xk, sk = [], []
    if mode == "load":
        if saved is None:
            raise ValueError("mode='load' requires saved params")
        return saved, None

    for i, y in enumerate(train_signals):
        y = np.asarray(y).reshape(-1)
        if mode == "train":
            t0 = _time.perf_counter()
            _, kern_sampled, _ = sample_cov(y, num_sam=num_sam, size=covsize)
            t1 = _time.perf_counter()
            p, _, _ = fit_kernel(kern_sampled, y, names[i], max_par=max_par, fs=fs)
            t2 = _time.perf_counter()
            if timings is not None:
                timings.setdefault("sample_cov", []).append(round(t1 - t0, 3))
                timings.setdefault("fit", []).append(round(t2 - t1, 3))
            params[0].append(p[0])
            params[1].append(p[1])
            params[2].append(p[2])
            sk.append(kern_sampled)
        else:  # fft init (separation.py:213-229)
            f0 = find_ideal_f0([names[i]])[0]
            p = init_cparam(y, fs=fs, maxh=max_par, ideal_f0=f0)
            params[0].append(np.array(0.1))
            params[1].append(p[1])
            params[2].append(p[0])
            spec = np.fft.ifft(np.abs(np.fft.fft(y)))[:covsize].real
            sk.append((spec / np.max(spec)).reshape(-1, 1))
        xk.append(np.linspace(0.0, (covsize - 1.0) / fs, covsize).reshape(-1, 1))
    return params, [xk, sk]


def load_mixture_from_sources(test_path, instrument, names=("_C_", "_E_", "_G_"),
                              window_size: int = 2001):
    """Reference test mixture = sum of 3 isolated source recordings
    (separation.py:83-99)."""
    import fnmatch
    sources = []
    for tag in names:
        cands = fnmatch.filter(os.listdir(test_path), f"*{instrument}{tag}*.wav")
        a = Audio(path=test_path + os.sep, filename=cands[0],
                  window_size=window_size)
        sources.append(a)
    mix = sum(s.y for s in sources)
    return sources[0].x.copy(), mix, sources


class SoSp:
    """Source separation over overlap windows (reference SoSp).

    Construct from arrays:
        SoSp(train_signals=[y60, y64, y67], train_names=[...], fs=16000,
             mixture=(x, y))
    """

    def __init__(self, train_signals, train_names, fs, mixture,
                 window_size: int = 2001, kernel_mode: str = "fft",
                 max_par: int = 1, num_inducing: int | None = None,
                 saved_params=None, reg: bool = False, dec: int = 1):
        self.fs = fs
        self.window_size = window_size
        self.train_names = list(train_names)
        self.num_pitches = len(train_signals)

        # kernel learning (separation.py:179-236)
        self.params, self.kern_sampled = learn_pitch_params(
            train_signals, train_names, fs, mode=kernel_mode, max_par=max_par,
            saved=saved_params)

        # test data windows
        self.x, self.y = np.asarray(mixture[0]).reshape(-1, 1), \
            np.asarray(mixture[1]).reshape(-1, 1)
        self.xw = window_stack(self.x, window_size)      # (nw, ws)
        self.yw = window_stack(self.y, window_size)
        self.nwin = self.xw.shape[0]

        # inducing points at signal extrema per window (separation.py:238-250),
        # uniform-grid fallback for silent windows (gaps between notes)
        z_list = [init_liv_robust(self.xw[i], self.yw[i], dec=dec)
                  for i in range(self.nwin)]
        self.grid_dt = 1.0 / fs
        self.z = pad_inducing(z_list, num_inducing,
                              grid_dt=self.grid_dt)      # (nw, M, 1)

        self.reg = reg
        self.bank = self._build_bank()
        self.matrix_var = None
        self.esource = None
        self.mean = None
        self.var = None

    def _kern_builder(self):
        kerns = init_kern_com(self.num_pitches, self.params[0], self.params[1],
                              self.params[2], len_fixed=True)
        return sum_kernel(kerns)

    def _build_bank(self):
        # audio windows are consecutive samples -> validate the on-grid
        # property (covariances build directly as MXU feature matmuls either
        # way; grid metadata keeps inducing-pad offsets exact)
        try:
            return build_window_bank(self.xw, self.yw, self.z,
                                     self._kern_builder, noise_variance=1.0,
                                     reg=self.reg, grid_dt=self.grid_dt)
        except (ValueError, NotImplementedError) as e:
            import warnings
            warnings.warn(
                f"SoSp: on-grid (uniform-sampling) property unavailable ({e}); "
                "continuing without grid metadata — equivalent result",
                RuntimeWarning, stacklevel=2)
            return build_window_bank(self.xw, self.yw, self.z,
                                     self._kern_builder, noise_variance=1.0,
                                     reg=self.reg)

    # ------------------------------------------------------------- training
    def optimize(self, maxiter: int = 500, learning_rate: float = 0.01,
                 method: str = "adam", timed: bool = False,
                 window_chunk: int | None = None, mesh=None,
                 mesh_axis: str = "w"):
        """All windows at once (replaces separation.py:279-313).

        ``timed=True`` also returns (compile_s, run_s) for the schedule.
        ``mesh``: shard the window axis over a jax.sharding.Mesh — windows are
        the data-parallel axis (SURVEY.md section 2.10); N chips optimize the
        bank ~N times faster with zero per-step collectives.  ``method`` may
        be "adam" or "lbfgs" (independent per-window solvers, the reference's
        optimizer, separation.py:298).
        """
        out = optimize_bank(self.bank, num_steps=maxiter,
                            learning_rate=learning_rate, method=method,
                            timed=timed, window_chunk=window_chunk,
                            mesh=mesh, mesh_axis=mesh_axis)
        if timed:
            self.bank, losses, timing = out
        else:
            self.bank, losses = out
        self.matrix_var = np.asarray(pitch_variances(self.bank))
        return (losses, timing) if timed else losses

    # ------------------------------------------------------------ prediction
    def predict_f(self, batch_size: int = 8):
        mean, var = predict_bank_mixture(self.bank, self.xw, batch_size)
        self.mean, self.var = np.asarray(mean), np.asarray(var)
        return self.mean, self.var

    def predict_s(self, batch_size: int = 8):
        """Per-source Hann overlap-add merge (separation.py:341-379).
        Returns esource = [[mean, var] per source], each (n, 1)."""
        smean, svar = predict_bank_sources(self.bank, self.xw, batch_size)
        n = self.x.shape[0]
        self.esource = []
        for i in range(smean.shape[0]):
            m = merged_mean(np.asarray(smean[i]), self.window_size, n)
            v = merged_variance(np.asarray(svar[i]), self.window_size, n)
            self.esource.append([m, v])
        return self.esource

    # -------------------------------------------------------------- metrics
    def compute_rmse(self, real_sources: Sequence[np.ndarray]):
        """Mean per-source RMSE vs ground truth (separation.py:418-423)."""
        if self.esource is None:
            self.predict_s()
        out = []
        for est, real in zip(self.esource, real_sources):
            r = np.asarray(real).reshape(-1, 1)[: est[0].shape[0]]
            out.append(np.sqrt(np.mean((r - est[0]) ** 2)))
        return float(np.mean(out))

    def save_results(self, path, real_sources=None):
        """npz checkpoint of sources/envelopes (separation.py:412-416)."""
        np.savez(path,
                 esrc=np.stack([e[0] for e in self.esource]),
                 vsrc=np.stack([e[1] for e in self.esource]),
                 matrix_var=self.matrix_var,
                 src=None if real_sources is None else np.stack(
                     [np.asarray(s).reshape(-1, 1) for s in real_sources]))
