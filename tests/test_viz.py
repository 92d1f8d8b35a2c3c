"""Smoke tests for the full plotting surface (myplots.py parity).

Every function must produce a figure on the Agg backend without touching a
display; numerical content is checked only where cheap (axis counts)."""

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest

from gpitch_tpu import viz
from gpitch_tpu.kernels import Matern32, MercerMatern12sm
from gpitch_tpu.models import ModGP


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    import matplotlib.pyplot as plt
    plt.close("all")


def _small_model(s=2, m=6):
    z = np.linspace(0.0, 1.0, m).reshape(-1, 1)
    ka = [Matern32.create(1.0, 1.0) for _ in range(s)]
    kc = [MercerMatern12sm.create(1.0, 0.5, [1.0, 0.5], [100.0 * (i + 1), 200.0 * (i + 1)])
          for i in range(s)]
    return ModGP.create(z=[[z] * s, [z] * s], kern=[ka, kc])


def _xy(n=64):
    x = np.linspace(0, 1, n).reshape(-1, 1)
    y = np.sin(2 * np.pi * 5 * x)
    return x, y


def test_plotgp_and_predict():
    x, y = _xy()
    mean, var = y.reshape(-1), np.full(x.shape[0], 0.01)
    ax = viz.plotgp(x, y, x, mean, var)
    assert ax is not None
    ax = viz.plot_predict(x, mean, var, z=x[::8], latent=True)
    assert ax is not None


def test_plot_zoom_in():
    x, y = _xy(256)
    fig = viz.plot_zoom_in(x, y, x, y.reshape(-1), np.full(256, 1e-3),
                           limits=(0.2, 0.3, -1, 1))
    assert len(fig.axes) >= 2  # main + inset


def test_plot_data_grid():
    x, y = _xy()
    fig = viz.plot_data(x, y, sources=[y, y, y])
    assert len(fig.axes) == 4  # 1 data row + 3 sources
    fig2 = viz.plot_data(x, y)
    assert len(fig2.axes) == 1


def test_plot_predict_all_and_sources_all():
    x, y = _xy()
    s = 3
    mean = np.tile(y, (1, s))
    var = np.full((x.shape[0], s), 0.01)
    z = (np.tile(x[::8][None], (s, 1, 1)), np.tile(x[::8][None], (s, 1, 1)))
    fig = viz.plot_predict_all(x, mean, var, mean, var, z=z)
    assert len(fig.axes) == 2 * s
    fig2 = viz.plot_sources_all(x, y, [y[:, 0]] * s, sources=[y[:, 0]] * s)
    assert len(fig2.axes) == 1 + s


def test_plot_training_and_trained_models():
    x, y = _xy()
    m = _small_model()
    mean = y.reshape(-1)
    var = np.full(x.shape[0], 0.01)
    fig = viz.plot_training_all(x, y, y, mean, var, mean, var)
    assert len(fig.axes) == 4
    pred = (np.tile(y, (1, 2)), np.full((64, 2), 0.01),
            np.tile(y, (1, 2)), np.full((64, 2), 0.01))
    figs = viz.plot_trained_models([m], [(x, y)], [pred], instr_name="piano")
    assert len(figs) == 1


def test_plot_parameters():
    models = [_small_model() for _ in range(3)]
    fig = viz.plot_parameters(models)
    assert len(fig.axes) == 5


def test_plot_patches():
    x, y = _xy(40)
    xw = [x[:20], x[20:]]
    yw = [y[:20], y[20:]]
    sw = [[y[:20], y[20:]], [y[:20], y[20:]]]
    fig = viz.plot_patches(xw, yw, sw)
    assert len(fig.axes) == 2


def test_plot_fft_all():
    rng = np.random.default_rng(0)
    y1, y2 = rng.standard_normal(128), rng.standard_normal(256)
    F1 = np.linspace(0, 8000, 64)
    F2 = np.linspace(0, 8000, 128)
    iparam = [(np.array([440.0, 880.0]), np.array([1.0, 0.5]))]
    fig = viz.plot_fft_all(F1, F2, [y1], [y2], iparam)
    assert len(fig.axes) >= 1


def test_plot_fft_and_pianoroll_and_kernel_fit():
    F = np.linspace(0, 8000, 100)
    S = np.exp(-F / 1000)
    ax = viz.plot_fft(F, S, peaks=(np.array([440.0]), np.array([0.6])))
    assert ax is not None
    roll = np.zeros((88, 40))
    roll[39, 5:20] = 1
    ax = viz.plot_pianoroll(roll)
    assert ax is not None
    xk = np.linspace(0, 0.01, 50)
    ax = viz.plot_kernel_fit(xk, np.exp(-xk * 300), np.exp(-xk * 280))
    assert ax is not None
