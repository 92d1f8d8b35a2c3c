"""Model/kernel initialization helpers.

Rebuilds /root/reference/gpitch/init_models.py and init_kernels.py: extrema and
uniform inducing-point selection, and the standard activation/component kernel
constructors used by the demos and pipelines.
"""

from __future__ import annotations

import numpy as np

from ..audio.spectrum import init_cparam
from ..audio.windowing import hann
from ..kernels import (Matern12, Matern32, Matern52, Matern32sm, MercerCosMix,
                       MercerMatern12sm)
from ..utils.math import find_ideal_f0

__all__ = ["init_liv", "init_liv_robust", "init_iv", "init_kernel_training",
           "init_kern_act",
           "init_kern_com", "init_kern", "init_kern_mercer_product",
           "init_kernel_with_trained_models"]


def _smooth(y, win):
    w = hann(win) if win > 1 else np.ones(1)
    return np.convolve(y, w, mode="same") / np.sum(w)


def init_liv(x, y, num_sources: int = 1, win_size: int = 9, thres: float = 0.0025,
             dec: int = 1):
    """Inducing points at signal extrema (init_models.py:9-51): Hann-smoothed
    energy gate + gradient zero crossings, decimated by ``dec``.

    Returns ([za list, zc list], u values at the extrema).

    Dispatches through the native C++ extrema finder
    (gpitch_tpu.native.find_extrema, parity pinned in tests/test_native.py
    modulo one-off boundary points); GPITCH_TPU_NATIVE=0 or a missing
    toolchain falls back to the numpy path below.
    """
    from .. import native

    x = np.asarray(x).reshape(-1)
    y = np.asarray(y).reshape(-1)

    if native.enabled():
        idx = native.find_extrema(y, smooth_win=win_size, energy_win=1600,
                                  thres=thres, dec=dec)
        x_final = x[idx].reshape(-1, 1)
        za = [x_final.copy() for _ in range(num_sources)]
        zc = [x_final.copy() for _ in range(num_sources)]
        return [za, zc], y[idx].reshape(-1, 1)

    return _init_liv_numpy(x, y, num_sources, win_size, thres, dec)


def _init_liv_numpy(x, y, num_sources: int, win_size: int, thres: float,
                    dec: int):
    """The numpy reference path of ``init_liv`` — also the parity oracle for
    the native extrema finder (tests/test_native.py)."""
    x = np.asarray(x).reshape(-1)
    y = np.asarray(y).reshape(-1)
    energy = _smooth(np.abs(y), 1600)
    peak = np.max(energy)
    energy = energy / (peak if peak > 0 else 1.0)  # silent window: keep zeros
    y_smooth = _smooth(y, win_size)

    sign = np.sign(np.gradient(y_smooth))
    idx = np.where(np.diff(sign) != 0)[0]

    x_all, y_all, e_all = x[idx], y[idx], energy[idx]
    keep = np.where(e_all > thres)[0]
    x_final = x_all[keep].reshape(-1, 1)
    y_final = y_all[keep].reshape(-1, 1)

    za = [x_final[::dec].copy() for _ in range(num_sources)]
    zc = [x_final[::dec].copy() for _ in range(num_sources)]
    return [za, zc], y_final[::dec]


def init_liv_robust(x, y, dec: int = 1, min_points: int = 8, **kw):
    """``init_liv`` for one window, with a uniform-grid fallback for (near-)
    silent windows: a real recording's gaps between notes have no extrema
    above the energy gate, and a windowed bank needs >=1 inducing point per
    window (pad_inducing cannot pad an empty set).  The fallback subset is
    taken from the window's own samples, so the lag-table path stays exact.
    Returns an (M, 1) array."""
    z, _ = init_liv(x, y, num_sources=1, dec=dec, **kw)
    zi = z[0][0]
    if zi.shape[0] < min_points:
        x = np.asarray(x).reshape(-1, 1)
        count = max(min_points, 16)
        step = max(1, x.shape[0] // count)
        zi = x[::step][:count].copy()
    return zi


def init_iv(x, num_sources: int, nivps_a: int, nivps_c: int, fs: float):
    """Uniform inducing grids, nivps per second (init_models.py:54-71); this is
    the batching-friendly mode (fixed count per window)."""
    x = np.asarray(x).reshape(-1, 1)
    dec_a = max(int(fs / nivps_a), 1)
    dec_c = max(int(fs / nivps_c), 1)
    za = [np.vstack([x[::dec_a].copy(), x[-1:].copy()]) for _ in range(num_sources)]
    zc = [np.vstack([x[::dec_c].copy(), x[-1:].copy()]) for _ in range(num_sources)]
    return [za, zc]


def init_kernel_training(y, list_files, fs, maxh: int = 25):
    """Per pitch: Matern12 activation + Matern32sm component initialized from
    the FFT (init_models.py:74-89); component vars fixed, freqs trainable."""
    if0 = find_ideal_f0(list_files)
    kern_act, kern_com, iparam = [], [], []
    for i in range(len(list_files)):
        p = init_cparam(np.asarray(y[i]).reshape(-1), fs=fs, maxh=maxh,
                        ideal_f0=if0[i])
        iparam.append(p)
        kern_act.append(Matern12.create(variance=3.5, lengthscales=1.0))
        kc = Matern32sm.create(lengthscales=1.0, variances=np.clip(p[1], 1e-4, 0.2495),
                               frequencies=p[0])
        kern_com.append(kc.vars_n_freqs_fixed(fix_var=True, fix_freq=False))
    return [kern_act, kern_com], iparam


def init_kernel_with_trained_models(models, option_two: bool = False):
    """Transfer hyperparameters from trained single-pitch ModGP models into
    fresh detection kernels (init_models.py:92-120).

    ``option_two`` uses the fixed fallback hypers of init_models.py:106-108.
    Returns [kern_act list, kern_com list] with component vars fixed and
    frequencies trainable (init_models.py:103).
    """
    kern_act, kern_com = [], []
    for m in models:
        # ModGP stores stacked per-source kernel banks; scalar hypers are read
        # from source 0 via reshape(-1)[0], per-partial arrays via reshape(-1)
        src_act = m.kern_act if not isinstance(m.kern_act, (list, tuple)) else m.kern_act[0]
        src_com = m.kern_com if not isinstance(m.kern_com, (list, tuple)) else m.kern_com[0]
        if option_two:
            ka = Matern12.create(variance=4.0, lengthscales=0.5)
            lc = 1.0
        else:
            ka = Matern12.create(
                variance=float(np.asarray(src_act.variance.value).reshape(-1)[0]),
                lengthscales=float(np.asarray(src_act.lengthscales.value).reshape(-1)[0]))
            lc = float(np.asarray(src_com.lengthscales.value).reshape(-1)[0])
        freqs = np.asarray(src_com.frequency.value).reshape(-1)
        if hasattr(src_com, "energy"):
            vars_ = np.asarray(src_com.energy.value).reshape(-1)
            kc = MercerMatern12sm.create(variance=1.0, lengthscales=lc,
                                         energy=vars_, frequency=freqs,
                                         train_energy=False, train_frequency=True)
        else:
            vars_ = np.clip(np.asarray(src_com.variance.value).reshape(-1),
                            1e-4, 0.2495)
            kc = Matern32sm.create(lengthscales=lc, variances=vars_,
                                   frequencies=freqs, train_vars=False,
                                   train_freqs=True)
        kern_act.append(ka)
        kern_com.append(kc)
    return [kern_act, kern_com]


def init_kern_act(num_pitches: int):
    """Matern32(l=1, v=3.5) activations (init_kernels.py:6-13)."""
    return [Matern32.create(variance=3.5, lengthscales=1.0) for _ in range(num_pitches)]


def init_kern_com(num_pitches: int, lengthscale, energy, frequency,
                  len_fixed: bool = True):
    """MercerMatern12sm components from learned (l, e, f) (init_kernels.py:16-38)."""
    return [MercerMatern12sm.create(variance=1.0,
                                    lengthscales=float(np.asarray(lengthscale[i]).reshape(-1)[0]),
                                    energy=np.asarray(energy[i]).reshape(-1),
                                    frequency=np.asarray(frequency[i]).reshape(-1),
                                    len_fixed=len_fixed)
            for i in range(num_pitches)]


def init_kern(num_pitches: int, lengthscale, energy, frequency):
    """init_kernels.py:41-47."""
    return [init_kern_act(num_pitches),
            init_kern_com(num_pitches, lengthscale, energy, frequency)]


def init_kern_mercer_product(num_pitches: int, energy, frequency):
    """Matern32 activation + (Matern52 x MercerCosMix) component products
    (init_models.py:183-198)."""
    k_act, k_com = [], []
    for i in range(num_pitches):
        k_act.append(Matern32.create(variance=3.5, lengthscales=0.25))
        base = Matern52.create(variance=1.0, lengthscales=0.25)
        base = base.replace(variance=base.variance.with_trainable(False))
        mix = MercerCosMix.create(energy=np.asarray(energy[i]).reshape(-1),
                                  frequency=np.asarray(frequency[i]).reshape(-1),
                                  variance=0.25)
        k_com.append(base * mix)
    return [k_act, k_com]
