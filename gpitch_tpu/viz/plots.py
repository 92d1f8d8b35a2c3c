"""Plotting utilities (myplots.py equivalent).

Rebuilds the plotting surface of /root/reference/gpitch/myplots.py:8-265 that
the demos/pipelines use: GP posterior bands, latent/sigmoid-transformed
activation views with inducing marks, FFT panels, pianoroll images.  Matplotlib
is imported lazily so headless/TPU jobs never pay for it.
"""

from __future__ import annotations

import numpy as np

from ..utils.math import logistic

__all__ = ["plotgp", "plot_predict", "plot_fft", "plot_pianoroll",
           "plot_sources", "plot_kernel_fit", "plot_pdgp"]


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def plotgp(x, y, xnew, mean, variance, ax=None):
    """Data + posterior mean with a 2-sigma band (myplots.py:47-57)."""
    plt = _plt()
    ax = ax or plt.gca()
    xnew = np.asarray(xnew).reshape(-1)
    mean = np.asarray(mean).reshape(-1)
    sd = 2.0 * np.sqrt(np.maximum(np.asarray(variance).reshape(-1), 0.0))
    if x is not None:
        ax.plot(np.asarray(x).reshape(-1), np.asarray(y).reshape(-1), "k.", ms=2)
    ax.plot(xnew, mean, "C0", lw=1.5)
    ax.fill_between(xnew, mean - sd, mean + sd, color="C0", alpha=0.2)
    return ax


def plot_predict(x, mean, var, z=None, latent=False, ax=None):
    """Posterior of an activation/component GP, optionally squashed through the
    model nonlinearity, with inducing-point marks (myplots.py:60-79)."""
    plt = _plt()
    ax = ax or plt.gca()
    x = np.asarray(x).reshape(-1)
    mean = np.asarray(mean).reshape(-1)
    sd = 2.0 * np.sqrt(np.maximum(np.asarray(var).reshape(-1), 0.0))
    if latent:
        lo, mid, hi = mean - sd, mean, mean + sd
    else:
        lo, mid, hi = (np.asarray(logistic(v)) for v in (mean - sd, mean, mean + sd))
    ax.plot(x, mid, "C0", lw=1.5)
    ax.fill_between(x, lo, hi, color="C0", alpha=0.2)
    if z is not None:
        z = np.asarray(z).reshape(-1)
        ax.plot(z, np.full_like(z, float(np.min(lo))), "C1|", ms=10)
    return ax


def plot_fft(F, S, peaks=None, ax=None):
    """Spectral density with detected peaks (myplots.py:201-214)."""
    plt = _plt()
    ax = ax or plt.gca()
    ax.plot(np.asarray(F), np.asarray(S), "C0", lw=0.8)
    if peaks is not None:
        freqs, energies = peaks
        ax.plot(freqs, energies, "C3x", ms=8)
    ax.set_xlabel("frequency (Hz)")
    return ax


def plot_pianoroll(matrix, fs=20.0, ax=None):
    """88 x T binary roll image (transcription.py:124-126 usage)."""
    plt = _plt()
    ax = ax or plt.gca()
    ax.imshow(np.asarray(matrix), cmap="binary", aspect="auto",
              extent=[0, matrix.shape[1] / fs, 21, 109])
    ax.set_xlabel("time (s)")
    ax.set_ylabel("MIDI pitch")
    return ax


def plot_sources(x, y, sources, fig=None):
    """Mixture vs per-source estimates, one row each (window_overlap.py:140-154)."""
    plt = _plt()
    n = len(sources)
    fig = fig or plt.figure(figsize=(12, 2.5 * n))
    for i, s in enumerate(sources):
        ax = fig.add_subplot(n, 1, i + 1)
        ax.plot(np.asarray(x).reshape(-1), np.asarray(y).reshape(-1), "C0", lw=0.5)
        ax.plot(np.asarray(x).reshape(-1), np.asarray(s).reshape(-1), "C1", lw=0.8)
        ax.set_ylim(-1, 1)
    return fig


def plot_kernel_fit(xkern, sampled, fitted, ax=None):
    """Sampled vs fitted kernel (separation.py:134-160)."""
    plt = _plt()
    ax = ax or plt.gca()
    ax.plot(np.asarray(xkern).reshape(-1), np.asarray(sampled).reshape(-1), "C0")
    ax.plot(np.asarray(xkern).reshape(-1), np.asarray(fitted).reshape(-1), "C1")
    ax.legend(["sampled kernel", "approx kernel"])
    return ax


def plot_pdgp(x, y, xtest, results, z=None, fig=None):
    """3-panel modulated-GP summary: source, activation, component
    (myplots.py:247-265, demos/scripts/demo-modgp.py:52-71)."""
    plt = _plt()
    mean_a, var_a, mean_c, var_c, mean_s = results
    fig = fig or plt.figure(figsize=(12, 8))
    ax1 = fig.add_subplot(3, 1, 1)
    ax1.plot(np.asarray(x).reshape(-1), np.asarray(y).reshape(-1), "k--", lw=0.5)
    ax1.plot(np.asarray(xtest).reshape(-1), np.asarray(mean_s)[:, 0], lw=2)
    ax1.legend(["data", "prediction"])
    ax2 = fig.add_subplot(3, 1, 2)
    plot_predict(xtest, np.asarray(mean_a)[:, 0], np.asarray(var_a)[:, 0],
                 z=None if z is None else z[0], latent=True, ax=ax2)
    ax2.set_title("activation (latent)")
    ax3 = fig.add_subplot(3, 1, 3)
    plot_predict(xtest, np.asarray(mean_c)[:, 0], np.asarray(var_c)[:, 0],
                 z=None if z is None else z[1], latent=True, ax=ax3)
    ax3.set_title("component")
    return fig
