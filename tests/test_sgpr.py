"""SGPR tests: Titsias bound vs dense GPR evidence (Z=X limit), masked-padding
exactness (the property that enables batched windows), per-source prediction
vs brute-force multi-output conditioning."""

import jax
import jax.numpy as jnp
import numpy as np

from gpitch_tpu.kernels import Matern12sm, Matern32, RBF
from gpitch_tpu.models import GPR, SGPR, SGPRSS, fit_lbfgs


def _data(rng, n=30):
    x = np.sort(rng.random((n, 1)), axis=0)
    y = np.sin(6 * x) + 0.1 * rng.standard_normal((n, 1))
    return jnp.asarray(x), jnp.asarray(y)


def test_gpr_log_marginal_matches_formula(rng):
    x, y = _data(rng, 20)
    kern = RBF.create(1.0, 0.3)
    m = GPR.create(x, y, kern, noise_variance=0.05)
    K = np.asarray(kern.K(x)) + 0.05 * np.eye(20) + m.numerics.jitter_value() * np.eye(20)
    _, logdet = np.linalg.slogdet(K)
    want = -0.5 * (np.asarray(y).T @ np.linalg.inv(K) @ np.asarray(y))[0, 0] \
        - 0.5 * logdet - 0.5 * 20 * np.log(2 * np.pi)
    np.testing.assert_allclose(float(m.log_marginal_likelihood()), want, rtol=1e-8)


def test_gpr_predict_interpolates(rng):
    # smooth target: a GP mean interpolates functions representable by the
    # kernel (white noise never is, regardless of the noise variance)
    x = jnp.asarray(np.linspace(0, 1, 25).reshape(-1, 1))
    y = jnp.sin(6 * x)
    m = GPR.create(x, y, RBF.create(1.0, 0.2), noise_variance=1e-5)
    mean, var = m.predict_f(x)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(y), atol=5e-3)
    assert (np.asarray(var) >= -1e-9).all()


def test_sgpr_bound_tight_when_z_equals_x(rng):
    """Titsias bound equals exact evidence at Z = X."""
    x, y = _data(rng, 25)
    kern = Matern32.create(1.0, 0.3)
    gpr = GPR.create(x, y, kern, noise_variance=0.05)
    sgpr = SGPR.create(x, y, kern, Z=np.asarray(x), noise_variance=0.05)
    np.testing.assert_allclose(float(sgpr.elbo()), float(gpr.log_marginal_likelihood()),
                               rtol=1e-4)


def test_sgpr_bound_is_lower_bound(rng):
    x, y = _data(rng, 40)
    kern = Matern32.create(1.0, 0.3)
    gpr = GPR.create(x, y, kern, noise_variance=0.05)
    z = np.asarray(x)[::4]
    sgpr = SGPR.create(x, y, kern, Z=z, noise_variance=0.05)
    assert float(sgpr.elbo()) <= float(gpr.log_marginal_likelihood()) + 1e-6


def test_masked_bound_equals_unpadded(rng):
    """Zero-padding plus mask must reproduce the unpadded bound exactly —
    the property that lets pipelines vmap ragged windows (SURVEY.md section 7)."""
    x, y = _data(rng, 30)
    kern = Matern32.create(1.0, 0.3)
    z = np.asarray(x)[::3]
    plain = SGPR.create(x, y, kern, Z=z, noise_variance=0.1)

    pad = 10
    xp = jnp.concatenate([x, jnp.zeros((pad, 1))], 0)
    yp = jnp.concatenate([y, jnp.zeros((pad, 1))], 0)
    mask = jnp.concatenate([jnp.ones(30), jnp.zeros(pad)])
    masked = SGPR.create(xp, yp, kern, Z=z, noise_variance=0.1, mask=mask)
    np.testing.assert_allclose(float(masked.elbo()), float(plain.elbo()), rtol=1e-10)


def test_sgprss_predict_sources_brute_force(rng):
    """Per-source posterior vs dense joint-Gaussian conditioning:
    s_i* | y ~ N(K_i*x (K+s2 I)^-1 y, K_i** - K_i*x (K+s2I)^-1 K_ix*)."""
    n, m = 25, 25
    x = jnp.asarray(np.sort(rng.random((n, 1)), axis=0))
    k1 = Matern12sm.create(1.0, 0.2, [1.0], [8.0])
    k2 = Matern12sm.create(1.0, 0.3, [1.0], [16.0])
    kern = k1 + k2
    y = jnp.asarray(rng.standard_normal((n, 1)))
    model = SGPRSS.create(x, y, kern, Z=np.asarray(x), noise_variance=0.1)
    xnew = jnp.asarray(np.linspace(0, 1, 15).reshape(-1, 1))
    means, variances = model.predict_s(xnew)

    Kxx = np.asarray(kern.K(x)) + (0.1 + model.numerics.jitter_value()) * np.eye(n)
    Kinv = np.linalg.inv(Kxx)
    for i, ki in enumerate([k1, k2]):
        Kix = np.asarray(ki.K(x, xnew))
        m_want = Kix.T @ Kinv @ np.asarray(y)
        v_want = np.asarray(ki.Kdiag(xnew)) - np.einsum("nm,nk,km->m", Kix, Kinv, Kix)
        np.testing.assert_allclose(np.asarray(means[i]), m_want, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(variances[i])[:, 0], v_want,
                                   rtol=1e-5, atol=1e-8)


def test_sgprss_sources_sum_to_mixture(rng):
    """Sum of per-source posterior means equals the mixture posterior mean."""
    n = 20
    x = jnp.asarray(np.sort(rng.random((n, 1)), axis=0))
    k1 = Matern12sm.create(1.0, 0.2, [1.0], [5.0])
    k2 = Matern12sm.create(1.0, 0.25, [1.0], [11.0])
    y = jnp.asarray(rng.standard_normal((n, 1)))
    model = SGPRSS.create(x, y, k1 + k2, Z=np.asarray(x), noise_variance=0.05)
    means, _ = model.predict_s(x)
    total = np.asarray(means[0]) + np.asarray(means[1])
    # dense posterior mean of f = K (K + s2 I)^-1 y
    K = np.asarray((k1 + k2).K(x))
    mix = K @ np.linalg.inv(K + (0.05 + model.numerics.jitter_value()) * np.eye(n)) @ np.asarray(y)
    np.testing.assert_allclose(total, mix, rtol=1e-5, atol=1e-7)


def test_sgpr_reg_l1_penalty(rng):
    x, y = _data(rng, 20)
    k1 = Matern12sm.create(1.0, 0.2, [1.0], [5.0])
    k2 = Matern12sm.create(1.0, 0.25, [1.0], [11.0])
    z = np.asarray(x)[::2]
    plain = SGPRSS.create(x, y, k1 + k2, Z=z, noise_variance=0.1)
    reg = SGPRSS.create(x, y, k1 + k2, Z=z, noise_variance=0.1, reg=True)
    # beta * (|v1| + |v2|) = 1000 * 2 at unit variances (sgpr_ss.py:64-68)
    np.testing.assert_allclose(float(plain.elbo()) - float(reg.elbo()), 2000.0,
                               rtol=1e-6)


def test_lbfgs_improves_bound(rng):
    x, y = _data(rng, 40)
    kern = Matern32.create(1.0, 1.0)
    z = np.asarray(x)[::4]
    model = SGPR.create(x, y, kern, Z=z, noise_variance=1.0)
    loss0 = float(model.loss())
    model2, losses = fit_lbfgs(model, lambda m: m.loss(), num_steps=40)
    assert float(model2.loss()) < loss0 - 1.0
    # best-visited contract (round 5): the returned loss is <= every loss
    # the solver evaluated, including the final state's
    assert float(model2.loss()) <= float(np.min(np.asarray(losses))) + 1e-9


def test_lbfgs_segment_resume_exact(rng):
    """Threading (opt_state, best) across bounded segments reproduces the
    single-call solve exactly (round 5: the vmapped bank L-BFGS runs as
    step segments to stay under relayed-TPU RPC deadlines)."""
    from gpitch_tpu.models.fit import lbfgs_solve

    x, y = _data(rng, 40)
    kern = Matern32.create(1.0, 1.0)
    z = np.asarray(x)[::4]
    model = SGPR.create(x, y, kern, Z=z, noise_variance=1.0)

    m_one, l_one = lbfgs_solve(model, lambda m: m.loss(), num_steps=30)

    m_seg, st, best = model, None, None
    l_segs = []
    import optax
    for k, active in ((0, 10), (1, 10), (2, 10)):
        if st is None:
            st = optax.lbfgs(memory_size=20).init(m_seg)
        m_seg, ls, st, best = lbfgs_solve(
            m_seg, lambda m: m.loss(), num_steps=10, opt_state=st,
            return_state=True, best_in=best)
        l_segs.append(np.asarray(ls))
    np.testing.assert_allclose(np.concatenate(l_segs), np.asarray(l_one),
                               rtol=1e-12)
    # the single-call return is the best-visited state; compare against the
    # threaded best
    np.testing.assert_allclose(float(best[1]),
                               float(m_one.loss()), rtol=1e-10)


def test_sgprss_stacked_sum_matches_sum(rng):
    """SGPRSS with StackedSum: identical bound and per-source posteriors."""
    from gpitch_tpu.kernels import StackedSum
    n = 25
    x = jnp.asarray(np.sort(rng.random((n, 1)), axis=0))
    y = jnp.asarray(rng.standard_normal((n, 1)))
    kerns = [Matern12sm.create(1.0, 0.2, [1.0], [8.0]),
             Matern12sm.create(1.0, 0.3, [1.0], [16.0]),
             Matern12sm.create(0.5, 0.25, [1.0], [24.0])]
    z = np.asarray(x)[::2]
    plain = SGPRSS.create(x, y, kerns[0] + kerns[1] + kerns[2], Z=z,
                          noise_variance=0.1, reg=True)
    stacked = SGPRSS.create(x, y, StackedSum.create(kerns), Z=z,
                            noise_variance=0.1, reg=True)
    np.testing.assert_allclose(float(stacked.elbo()), float(plain.elbo()),
                               rtol=1e-10)
    xnew = jnp.asarray(np.linspace(0, 1, 11).reshape(-1, 1))
    m1, v1 = plain.predict_s(xnew)
    m2, v2 = stacked.predict_s(xnew)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8,
                                   atol=1e-10)
    for a, b in zip(v1, v2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8,
                                   atol=1e-10)


def test_kr_matches_K_all_stationary():
    """k_r(absdist) == K for every stationary kernel (the lag-table premise)."""
    from gpitch_tpu.kernels import (RBF, Cosine, Gammaexponential, LogisticHat,
                                    Matern12, Matern12sm, Matern32, Matern32sm,
                                    Matern32sml, Matern52, MercerCosMix,
                                    MercerMatern12sm, Spectrum, StackedSum, Sum)
    from gpitch_tpu.kernels.base import absdist

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(0, 0.01, (7, 1)))
    X2 = jnp.asarray(rng.uniform(0, 0.01, (5, 1)))
    kerns = [
        RBF.create(1.3, 0.004), Matern12.create(0.7, 0.003),
        Matern32.create(1.1, 0.002), Matern52.create(0.9, 0.005),
        Cosine.create(0.8, 440.0), Gammaexponential.create(1.0, 0.003, 1.5),
        LogisticHat.create(1.0, 0.002),
        Matern12sm.create(1.2, 0.01, [1.0, 0.5], [440.0, 880.0]),
        MercerMatern12sm.create(0.8, 0.02, [0.7, 0.2], [220.0, 660.0]),
        Matern32sm.create(lengthscales=0.5, variances=[0.1, 0.2],
                          frequencies=[330.0, 990.0]),
        Matern32sml.create(lengthscales=[0.5, 0.8], variances=[0.1, 0.2],
                           frequencies=[330.0, 990.0]),
        MercerCosMix.create([0.5, 0.5], [100.0, 200.0], 0.2),
        Spectrum.create([100.0, 300.0], [0.6, 0.4], 1.1),
    ]
    for k in kerns:
        got = k.k_r(absdist(X, X2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(k.K(X, X2)),
                                   rtol=1e-9, atol=1e-11,
                                   err_msg=type(k).__name__)
    # combinations
    s = Sum(kern_list=(kerns[0], kerns[7]))
    np.testing.assert_allclose(np.asarray(s.k_r(absdist(X, X2))),
                               np.asarray(s.K(X, X2)), rtol=1e-9)
    st = StackedSum.create([
        Matern12sm.create(1.0, 0.01, [1.0], [440.0 * (i + 1)]) for i in range(4)])
    np.testing.assert_allclose(np.asarray(st.k_r(absdist(X, X2))),
                               np.asarray(st.K(X, X2)), rtol=1e-9)


def test_sgpr_grid_path_exact():
    """Lag-table SGPR bound, gradient, and predict_s equal the direct path."""
    from gpitch_tpu.kernels import Matern12sm, StackedSum
    from gpitch_tpu.models.sgpr import SGPRSS

    fs = 16000.0
    n, m, s = 160, 16, 5
    x = (np.arange(n) / fs).reshape(-1, 1)
    rng = np.random.default_rng(3)
    y = rng.standard_normal((n, 1)) * 0.3
    z = x[:: n // m][:m]

    def kern():
        return StackedSum.create([
            Matern12sm.create(1.0, 0.05, [1.0, 0.4], [220.0 * (i + 1), 440.0 * (i + 1)],
                              train_energy=True, train_frequency=True)
            for i in range(s)])

    direct = SGPRSS.create(x, y, kern(), Z=z, noise_variance=0.1)
    grid = SGPRSS.create(x, y, kern(), Z=z, noise_variance=0.1, grid_dt=1.0 / fs,
                       lag_table=True)

    np.testing.assert_allclose(float(grid.elbo()), float(direct.elbo()),
                               rtol=1e-10)
    # Compare only *trainable* gradients: the grid path builds covariances from
    # rounded integer indices, so d(loss)/dX and d(loss)/dZ are structurally
    # zero there while the direct path differentiates K(Z, X) through the
    # (non-trainable) X/Z buffers.  Training is identical either way — fit
    # loops apply zero_untrainable_grads before any update.
    from gpitch_tpu.core.params import zero_untrainable_grads
    g1 = zero_untrainable_grads(jax.grad(lambda mdl: mdl.loss())(direct))
    g2 = zero_untrainable_grads(jax.grad(lambda mdl: mdl.loss())(grid))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-9)

    xnew = x[:40]
    m1, v1 = direct.predict_s(xnew)
    m2, v2 = grid.predict_s(xnew)
    # source chunking with a ragged final chunk (source_batch=2, s=5) must
    # reproduce the same values
    m3, v3 = grid.predict_s(xnew, source_batch=2)
    for a, b, c in zip(m1, m2, m3):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-8,
                                   atol=1e-10)
    for a, b, c in zip(v1, v2, v3):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-7,
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-7,
                                   atol=1e-10)

    # off-grid inputs are rejected
    with np.testing.assert_raises(ValueError):
        SGPRSS.create(x + 1e-5, y, kern(), Z=z, noise_variance=0.1,
                      grid_dt=1.0 / fs)


def test_grid_and_direct_agree_in_f32():
    """Late-window fixture (t0 = 13 s) in f32: grid and centered-direct paths
    must agree with each other AND with the f64 value to 2e-4 relative — the
    committed tolerance of docs/F32_ACCURACY.md (round-1 weak #2: the paths
    disagreed by 0.65% before X/Z centering)."""
    from gpitch_tpu.kernels import Matern12sm, StackedSum

    fs = 16000.0
    ws, m = 512, 64
    x = ((int(13 * fs) + np.arange(ws)) / fs).reshape(-1, 1)  # f64 numpy
    rng = np.random.default_rng(9)
    y = (0.2 * np.cos(2 * np.pi * 261.63 * x)
         + 0.01 * rng.standard_normal((ws, 1)))
    z = x[::8][:m]

    def kern():
        return StackedSum.create([
            Matern12sm.create(1.0, 0.05, [1.0, 0.5, 0.25],
                              [f0, 2 * f0, 3 * f0], train_energy=True)
            for f0 in (261.63, 329.63, 392.0)])

    def to_f32(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, t)

    direct = SGPRSS.create(x, y, kern(), Z=z, noise_variance=0.1)
    grid = SGPRSS.create(x, y, kern(), Z=z, noise_variance=0.1,
                         grid_dt=1.0 / fs, lag_table=True)
    truth = float(direct.elbo())  # f64 (x64 on in tests)
    e_direct32 = float(to_f32(direct).elbo())
    e_grid32 = float(to_f32(grid).elbo())
    np.testing.assert_allclose(e_direct32, truth, rtol=2e-4)
    np.testing.assert_allclose(e_grid32, truth, rtol=2e-4)
    np.testing.assert_allclose(e_grid32, e_direct32, rtol=2e-4)


def test_grid_path_survives_late_windows_at_44k():
    """Windows deep into a 44.1 kHz recording must keep the lag-table path:
    round-2 regression — f32-rounding the centering offset x0 pushed inputs
    off-grid by ~1e-6 s at t0 ~ 13 s and silently demoted pipelines to the
    direct path.  x0 is now a double-single (hi, lo) pair."""
    from gpitch_tpu.kernels import Matern12sm

    fs = 44100.0
    start = int(13.5 * fs)
    ws = 256
    x = ((start + np.arange(ws)) / fs).reshape(-1, 1)
    rng = np.random.default_rng(12)
    y = 0.3 * rng.standard_normal((ws, 1))
    z = x[::8][:24]
    kern = Matern12sm.create(1.0, 0.05, [1.0], [440.0])
    grid = SGPRSS.create(x, y, kern, Z=z, noise_variance=0.1, grid_dt=1.0 / fs,
                         lag_table=True)
    direct = SGPRSS.create(x, y, kern, Z=z, noise_variance=0.1)
    np.testing.assert_allclose(float(grid.elbo()), float(direct.elbo()),
                               rtol=1e-10)
    # the double-single split reconstructs the exact f64 offset
    x0 = float(np.asarray(grid.x0.value, np.float64)
               + np.asarray(grid.x0_lo.value, np.float64))
    assert abs(x0 - start / fs) < 1e-12
    # and a phase-shifted grid still centers onto itself (x0 = min input)
    shifted = SGPRSS.create(x + 0.37 / fs, y, kern, Z=z + 0.37 / fs,
                            noise_variance=0.1, grid_dt=1.0 / fs,
                            lag_table=True)
    np.testing.assert_allclose(float(shifted.elbo()), float(grid.elbo()),
                               rtol=1e-9)


def test_sgpr_grid_path_sparse_on_grid_inputs():
    """Decimated (sparse but on-grid) X: the lag table must cover the index
    *span*, not just N+M — previously OOB gathers clamped and silently
    corrupted kuf/kuu (ADVICE round 1)."""
    from gpitch_tpu.kernels import Matern12sm

    fs = 16000.0
    n = 64
    x = (np.arange(n)[::4] / fs).reshape(-1, 1)  # span 61 >> N+M = 16+4
    rng = np.random.default_rng(5)
    y = rng.standard_normal((x.shape[0], 1)) * 0.3
    z = x[::4]
    kern = Matern12sm.create(1.0, 0.05, [1.0, 0.4], [220.0, 440.0])
    direct = SGPRSS.create(x, y, kern, Z=z, noise_variance=0.1)
    grid = SGPRSS.create(x, y, kern, Z=z, noise_variance=0.1, grid_dt=1.0 / fs,
                         lag_table=True)
    np.testing.assert_allclose(float(grid.elbo()), float(direct.elbo()),
                               rtol=1e-10)
    # explicit num_lags shorter than the span is rejected loudly
    with np.testing.assert_raises(ValueError):
        SGPRSS.create(x, y, kern, Z=z, noise_variance=0.1, grid_dt=1.0 / fs,
                      num_lags=20)


def test_window_bank_grid_matches_direct():
    """Whole-bank loss with grid_dt equals the direct bank loss."""
    from gpitch_tpu.kernels import Matern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (bank_loss, build_window_bank,
                                                    pad_inducing, sum_kernel)

    fs = 16000.0
    ws, nw = 96, 3
    rng = np.random.default_rng(4)
    xw = np.stack([(np.arange(ws) + i * ws // 2) / fs for i in range(nw)])
    xw = xw.reshape(nw, ws, 1)
    yw = rng.standard_normal((nw, ws, 1)) * 0.2
    z_list = [xw[i, ::7, 0].reshape(-1, 1)[:10 + i] for i in range(nw)]
    z = pad_inducing(z_list, 14, grid_dt=1.0 / fs)

    def builder():
        return sum_kernel([Matern12sm.create(1.0, 0.05, [1.0], [220.0 * (i + 1)])
                           for i in range(3)])

    b_direct = build_window_bank(xw, yw, z, builder)
    b_grid = build_window_bank(xw, yw, z, builder, grid_dt=1.0 / fs,
                               lag_table=True)
    np.testing.assert_allclose(float(bank_loss(b_grid)),
                               float(bank_loss(b_direct)), rtol=1e-10)


def test_fast_bank_build_matches_loop():
    """Vectorized build_window_bank must be leaf-identical to the per-window
    SGPRSS.create loop it replaced (round-2 VERDICT weak #3), including masks,
    y_scale, per-window centering offsets, and the lag-table variant."""
    from gpitch_tpu.kernels import Matern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (_build_window_bank_loop,
                                                    bank_loss,
                                                    build_window_bank,
                                                    pad_inducing, sum_kernel)

    fs = 16000.0
    ws, nw = 96, 4
    rng = np.random.default_rng(7)
    start = int(13.0 * fs)  # deep window: exercises the double-single x0
    xw = np.stack([(start + np.arange(ws) + i * ws // 2) / fs
                   for i in range(nw)]).reshape(nw, ws, 1)
    yw = rng.standard_normal((nw, ws, 1)) * 0.2
    masks = (rng.uniform(size=(nw, ws)) > 0.2).astype(float)
    masks[:, 40:44] = 1.0  # keep some valid points everywhere
    # window 0: LEADING samples masked out, so the centering offset (min of
    # the *valid* inputs) exceeds the true min and masked-out entries sit at
    # negative grid indices — the lag-table span must be max-min, not max
    # (round-3 ADVICE medium: a max-only span silently clamped gathers OOB)
    masks[0, :8] = 0.0
    z_list = [xw[i, 8::7, 0].reshape(-1, 1)[:10 + i] for i in range(nw)]
    z = pad_inducing(z_list, 14, grid_dt=1.0 / fs)

    def builder():
        return sum_kernel([Matern12sm.create(1.0, 0.05, [1.0], [220.0 * (i + 1)])
                           for i in range(3)])

    for kw in ({}, {"grid_dt": 1.0 / fs}, {"grid_dt": 1.0 / fs, "lag_table": True}):
        fast = build_window_bank(xw, yw, z, builder, masks=masks, reg=True,
                                 y_scale=20.0, **kw)
        loop = _build_window_bank_loop(xw, yw, z, builder, masks=masks,
                                       reg=True, y_scale=20.0, **kw)
        fl = jax.tree_util.tree_leaves(fast)
        ll = jax.tree_util.tree_leaves(loop)
        assert (jax.tree_util.tree_structure(fast)
                == jax.tree_util.tree_structure(loop)), kw
        for a, b in zip(fl, ll):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12, err_msg=str(kw))
        np.testing.assert_allclose(float(bank_loss(fast)),
                                   float(bank_loss(loop)), rtol=1e-10)


def test_optimize_bank_window_chunk_exact():
    """window_chunk optimization (one executable per chunk) must produce the
    same optimized bank and per-step total losses as the unchunked run —
    windows are independent and Adam state is per-window, so chunking is
    exact, including a ragged final chunk."""
    from gpitch_tpu.kernels import Matern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (build_window_bank,
                                                    optimize_bank,
                                                    pad_inducing, sum_kernel)

    fs = 16000.0
    ws, nw = 64, 5
    rng = np.random.default_rng(6)
    xw = np.stack([(np.arange(ws) + i * ws // 2) / fs
                   for i in range(nw)]).reshape(nw, ws, 1)
    yw = rng.standard_normal((nw, ws, 1)) * 0.2
    z = pad_inducing([xw[i, ::6, 0].reshape(-1, 1) for i in range(nw)], 11,
                     grid_dt=1.0 / fs)

    def builder():
        return sum_kernel([Matern12sm.create(1.0, 0.05, [1.0], [220.0 * (i + 1)])
                           for i in range(2)])

    b1, l1 = optimize_bank(build_window_bank(xw, yw, z, builder),
                           num_steps=12, learning_rate=0.02, segment=5)
    b2, l2 = optimize_bank(build_window_bank(xw, yw, z, builder),
                           num_steps=12, learning_rate=0.02, segment=5,
                           window_chunk=2)  # 3 chunks, last one ragged
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=1e-8, atol=1e-8)
    for a, b in zip(jax.tree_util.tree_leaves(b1),
                    jax.tree_util.tree_leaves(b2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-8, atol=1e-10)


def test_predict_s_gram_reuse_matches():
    """predict_s(xnew_is_x=True) (Gram-reuse fast path) must equal the
    general path when Xnew == X, and predict_bank_sources must auto-detect
    the at-x case."""
    from gpitch_tpu.kernels import Matern12sm
    from gpitch_tpu.models.sgpr import SGPRSS
    from gpitch_tpu.pipelines.windowed_sgpr import (build_window_bank,
                                                    pad_inducing,
                                                    predict_bank_sources,
                                                    sum_kernel)

    fs = 16000.0
    ws, nw = 96, 3
    rng = np.random.default_rng(11)
    xw = np.stack([(np.arange(ws) + i * ws // 2) / fs
                   for i in range(nw)]).reshape(nw, ws, 1)
    yw = rng.standard_normal((nw, ws, 1)) * 0.2
    z = pad_inducing([xw[i, ::9, 0].reshape(-1, 1) for i in range(nw)], 11,
                     grid_dt=1.0 / fs)

    def builder():
        return sum_kernel([Matern12sm.create(1.0, 0.05, [1.0],
                                             [220.0 * (i + 1)])
                           for i in range(3)])

    bank = build_window_bank(xw, yw, z, builder, grid_dt=1.0 / fs)
    one = jax.tree_util.tree_map(lambda a: a[0], bank)
    x = one.X.value
    m_gen, v_gen = one.predict_s(x, pre_centered=True, xnew_is_x=False)
    m_fast, v_fast = one.predict_s(x, pre_centered=True, xnew_is_x=True)
    for a, b in zip(m_gen + v_gen, m_fast + v_fast):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                                   atol=1e-8)

    sm, sv = predict_bank_sources(bank, xw)
    np.testing.assert_allclose(np.asarray(sm[:, 0, :]),
                               np.asarray(jnp.stack(
                                   [mm[:, 0] for mm in m_gen])),
                               rtol=1e-6, atol=1e-8)
