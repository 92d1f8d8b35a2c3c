"""Auxiliary subsystems: checkpoint/resume, profiling, metrics, file helpers,
mvhermgauss, viz imports."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpitch_tpu.core.quadrature import mvhermgauss
from gpitch_tpu.utils.checkpoint import (list_checkpoints, load_model,
                                         load_params, save_model, save_params)
from gpitch_tpu.utils.files import append_sources, load_filenames, merge_all_results
from gpitch_tpu.utils.profiling import (MetricsLogger, Timer, flops_svgp_step,
                                        utilization_report)


def test_mvhermgauss_matches_1d_moments(rng):
    n, d, h = 4, 2, 15
    means = jnp.asarray(rng.standard_normal((n, d)))
    A = rng.standard_normal((n, d, d)) * 0.3
    covs = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 0.5 * np.eye(d))
    X, w = mvhermgauss(means, covs, h, d)
    # E[x] and E[x x^T] from the quadrature grid
    m_est = jnp.einsum("k,knd->nd", w, X)
    np.testing.assert_allclose(np.asarray(m_est), np.asarray(means), atol=1e-8)
    second = jnp.einsum("k,knd,kne->nde", w, X, X)
    want = np.asarray(covs) + np.einsum("nd,ne->nde", means, means)
    np.testing.assert_allclose(np.asarray(second), want, atol=1e-7)


def test_save_load_params(tmp_path):
    p = os.path.join(tmp_path, "hypers")
    ls = [np.array(0.1), np.array(0.2)]
    en = [np.array([1.0, 0.5]), np.array([0.3])]
    fr = [np.array([100.0, 200.0]), np.array([150.0])]
    save_params(p, ls, en, fr)
    got = load_params(p)
    np.testing.assert_allclose(got[0][0], 0.1)
    np.testing.assert_allclose(got[1][0], [1.0, 0.5])
    np.testing.assert_allclose(got[2][1], [150.0])


def test_save_load_model_roundtrip(tmp_path):
    from gpitch_tpu.kernels import Matern32
    kern = Matern32.create(1.7, 0.23)
    d = os.path.join(tmp_path, "ckpt")
    save_model(d, kern, step=5)
    assert list_checkpoints(d) == [5]
    kern2 = load_model(d, Matern32.create(1.0, 1.0), step=5)
    np.testing.assert_allclose(float(kern2.variance.value), 1.7, rtol=1e-6)
    np.testing.assert_allclose(float(kern2.lengthscales.value), 0.23, rtol=1e-6)


def test_optimize_bank_resumable(tmp_path):
    from gpitch_tpu.kernels import Matern12sm, Sum
    from gpitch_tpu.pipelines import build_window_bank, optimize_bank_resumable
    rng = np.random.default_rng(0)
    nw, ws = 3, 48
    xw = np.stack([np.linspace(0, 1, ws).reshape(-1, 1) + i for i in range(nw)])
    yw = rng.standard_normal((nw, ws, 1)) * 0.3
    zw = xw[:, ::8]

    def builder():
        return Sum(kern_list=(Matern12sm.create(1.0, 0.2, [1.0], [8.0]),))

    bank = build_window_bank(xw, yw, zw, builder)
    d = os.path.join(tmp_path, "run")
    b1, losses1, s1 = optimize_bank_resumable(bank, num_steps=20,
                                              checkpoint_dir=d,
                                              checkpoint_every=10)
    assert s1 == 0 and len(losses1) == 20
    assert list_checkpoints(d) == [10, 20]
    # resume: no extra steps needed
    b2, losses2, s2 = optimize_bank_resumable(bank, num_steps=20,
                                              checkpoint_dir=d,
                                              checkpoint_every=10)
    assert s2 == 20 and len(losses2) == 0
    for a, b in zip(jax.tree_util.tree_leaves(b1), jax.tree_util.tree_leaves(b2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_profiling_helpers():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((64, 64))
    t = Timer.time_fn(f, x, iters=3, warmup=1)
    assert t > 0
    rep = utilization_report(flops_svgp_step(100, 128, 1, 3), t)
    assert 0 <= rep["mfu"]
    log = MetricsLogger()
    log.log(step=1, elbo=-5.0)
    assert log.summary()["elbo"] == -5.0


def test_load_filenames(tmp_path):
    for name in ["011PF_M60_train.wav", "011PF_M64_train.wav", "other_M60.txt"]:
        open(os.path.join(tmp_path, name), "w").close()
    got = load_filenames(tmp_path, "011PF", pitches=[60, 64])
    assert list(got) == ["011PF_M60_train.wav", "011PF_M64_train.wav"]


def test_merge_all_and_append_sources():
    # 2 segments, 3 quantities, 3 sources
    seg = lambda s: [[np.full((2, 1), 10 * q + src + s * 100) for src in range(3)]
                     for q in range(3)]
    merged = merge_all_results([seg(0), seg(1)])
    assert len(merged) == 3 and len(merged[0]) == 3 and len(merged[0][0]) == 2
    np.testing.assert_allclose(merged[2][1], [np.full((2, 1), 21.0),
                                              np.full((2, 1), 121.0)])
    out = append_sources(merged)
    assert len(out) == 3 and len(out[0]) == 2
    from gpitch_tpu.utils.math import logistic
    want = np.asarray(logistic(np.full((2, 1), 0.0))) * np.full((2, 1), 20.0)
    np.testing.assert_allclose(out[0][0], want)


def test_viz_imports_and_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from gpitch_tpu.viz import plot_fft, plot_pianoroll, plot_predict, plotgp
    import matplotlib.pyplot as plt
    x = np.linspace(0, 1, 50)
    plotgp(x, np.sin(x), x, np.sin(x), 0.01 * np.ones(50))
    plt.figure()
    plot_predict(x, np.sin(x), 0.01 * np.ones(50), z=x[::10])
    plt.figure()
    plot_fft(np.linspace(0, 8000, 100), np.random.rand(100))
    plt.figure()
    plot_pianoroll(np.zeros((88, 40)))
    plt.close("all")
