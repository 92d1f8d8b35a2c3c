"""ModGP (Pdgp equivalent) tests: ELBO sanity, conditional consistency,
training step, and a fast synthetic-recovery check (the reference's
demo-as-test, demos/scripts/demo-modgp.py:19-71, shrunk)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpitch_tpu as gt
from gpitch_tpu.kernels import Matern32, MercerMatern12sm
from gpitch_tpu.models import ModGP, fit_adam, minibatch_fn, predict_windowed


def make_model(s=1, m=10, whiten=True):
    z = np.linspace(0.0, 1.0, m).reshape(-1, 1)
    kern_act = [Matern32.create(1.0, 1.0) for _ in range(s)]
    kern_com = [MercerMatern12sm.create(1.0, 0.5, [1.0, 0.5], [10.0 * (i + 1), 20.0 * (i + 1)])
                for i in range(s)]
    model = ModGP.create(z=[[z] * s, [z] * s], kern=[kern_act, kern_com],
                         whiten=whiten)
    return model


def synth_data(n=400, noise=1e-3, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 1.0, n).reshape(-1, 1)
    comp = sum(np.sin(2 * np.pi * x * k * 10.0) for k in range(1, 3))
    comp /= np.max(np.abs(comp))
    env = np.exp(-25 * (x - 0.33) ** 2) + np.exp(-75 * (x - 0.66) ** 2)
    env /= np.max(np.abs(env))
    y = comp * env + np.sqrt(noise) * rng.standard_normal((n, 1))
    return jnp.asarray(x), jnp.asarray(y), comp, env


@pytest.mark.parametrize("s", [1, 2])
@pytest.mark.parametrize("whiten", [True, False])
def test_elbo_finite_and_kl_nonnegative(s, whiten):
    model = make_model(s=s, whiten=whiten)
    x, y, _, _ = synth_data(100)
    elbo = float(model.elbo(x, y))
    assert np.isfinite(elbo)
    assert float(model.prior_kl()) >= -1e-8


def test_initial_kl_zero_whitened():
    # q = N(0, I) against whitened prior N(0, I) -> KL = 0 (pdgp.py:99-103 init)
    model = make_model(s=2, whiten=True)
    np.testing.assert_allclose(float(model.prior_kl()), 0.0, atol=1e-10)


def test_bank_matches_direct_conditional():
    from gpitch_tpu.linalg import conditional
    model = make_model(s=2)
    x = jnp.linspace(0, 1, 37).reshape(-1, 1)
    mean, var = model.predict_com(x)
    for i in range(2):
        kern_i = jax.tree_util.tree_map(lambda a: a[i], model.kern_com)
        m_i, v_i = conditional(x, model.zc.value[i], kern_i,
                               model.q_mu_com.value[i], model.q_sqrt_com.value[i],
                               whiten=True, jitter=model.numerics.jitter_value())
        np.testing.assert_allclose(mean[:, i], m_i[:, 0], rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(var[:, i], v_i[:, 0], rtol=1e-7, atol=1e-9)


def test_elbo_is_lower_bound_after_training():
    """ELBO should increase under Adam and stay finite."""
    model = make_model(s=1, m=12)
    x, y, _, _ = synth_data(200)
    loss0 = float(model.loss(x, y))
    model2, losses = fit_adam(model, lambda m, xb, yb: m.loss(xb, yb, num_data=200),
                              num_steps=60, learning_rate=0.05,
                              batch_fn=minibatch_fn(x, y, 64))
    assert float(losses[-1]) < loss0
    assert np.isfinite(np.asarray(losses)).all()


def test_fit_adam_timed_matches_fit_adam():
    from gpitch_tpu.models import fit_adam_timed
    model = make_model(s=1, m=8)
    x, y, _, _ = synth_data(100)
    loss_fn = lambda m, xb, yb: m.loss(xb, yb, num_data=100)
    bf = minibatch_fn(x, y, 32)
    _, l1 = fit_adam(model, loss_fn, num_steps=5, batch_fn=bf)
    _, l2, compile_s, run_s = fit_adam_timed(model, loss_fn, num_steps=5,
                                             batch_fn=bf)
    np.testing.assert_allclose(l1, l2, rtol=1e-12)
    assert compile_s >= 0.0 and run_s > 0.0


def test_joint_bank_matches_separate():
    """The batched act+com linalg path must agree with the per-bank path."""
    model = make_model(s=2, m=9)
    x, y, _, _ = synth_data(120)
    assert model._can_join()
    fmu_j, fvar_j = model._banks_joint(x)
    ma, va = model._bank("act", x)
    mc, vc = model._bank("com", x)
    np.testing.assert_allclose(np.asarray(fmu_j),
                               np.concatenate([ma, mc], 1), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(fvar_j),
                               np.concatenate([va, vc], 1), rtol=1e-7, atol=1e-9)
    # and the elbo (which routes through the joint path) matches a manual one
    e_joint = float(model.elbo(x, y))
    fmu = jnp.concatenate([ma, mc], 1)
    fvar = jnp.concatenate([va, vc], 1)
    ve = model.likelihood.variational_expectations(fmu, fvar, y)
    e_sep = float(jnp.sum(ve) - model.prior_kl())
    np.testing.assert_allclose(e_joint, e_sep, rtol=1e-9)


def test_predict_act_n_com_shapes():
    model = make_model(s=3)
    x = jnp.linspace(0, 1, 50).reshape(-1, 1)
    ma, va, mc, vc, ms = model.predict_act_n_com(x)
    for arr in (ma, va, mc, vc, ms):
        assert arr.shape == (50, 3)
    assert (np.asarray(va) > 0).all() and (np.asarray(vc) > 0).all()


def test_predict_windowed_matches_direct():
    model = make_model(s=1)
    x = jnp.linspace(0, 1, 64).reshape(-1, 1)
    direct = model.predict_act_n_com(x)
    chunked = predict_windowed(model, x, ws=16)
    for d, c in zip(direct, chunked):
        np.testing.assert_allclose(np.asarray(c), np.asarray(d), rtol=1e-6, atol=1e-8)


def test_synthetic_recovery_small():
    """Shrunk demo-modgp: posterior source estimate must track the signal."""
    x, y, comp, env = synth_data(n=600, noise=1e-4)
    z = np.asarray(x)[::30].reshape(-1, 1)
    kern_act = [Matern32.create(1.0, 1.0)]
    kern_com = [MercerMatern12sm.create(1.0, 0.5, [1.0, 1.0], [10.0, 20.0])]
    model = ModGP.create(z=[[z], [z]], kern=[kern_act, kern_com])
    model, losses = fit_adam(model, lambda m, xb, yb: m.loss(xb, yb, num_data=600),
                             num_steps=400, learning_rate=0.02,
                             batch_fn=minibatch_fn(x, y, 128))
    ms = model.predict_source(x)
    err = np.sqrt(np.mean((np.asarray(ms)[:, 0:1] - np.asarray(y)) ** 2))
    assert err < 0.25, f"recovery RMSE too high: {err}"
    assert float(losses[-1]) < float(losses[0])


def test_ragged_padding_matches_unpadded_conditionals():
    """Padded-z ModGP == per-source unpadded conditionals (round-1 VERDICT #8).

    With whitened q(u), the Cholesky of the padded Gram nests the unpadded
    one, so extending z with extra points while keeping q_mu zero and q_sqrt
    identity on the padding block leaves every per-source conditional
    (and the KL) EXACTLY unchanged.  This is the property `_stack_z` relies
    on (models/svgp.py:41-58)."""
    rng = np.random.default_rng(2)
    ms = [14, 9]  # ragged per-source inducing counts
    za = [np.sort(rng.uniform(0, 1, (m, 1)), 0) for m in ms]
    zc = [np.sort(rng.uniform(0, 1, (m, 1)), 0) for m in ms]
    kern_act = [Matern32.create(1.0, 0.3) for _ in range(2)]
    kern_com = [MercerMatern12sm.create(1.0, 0.5, [1.0, 0.5],
                                        [10.0 * (i + 1), 20.0 * (i + 1)])
                for i in range(2)]
    padded = ModGP.create(z=[za, zc], kern=[kern_act, kern_com])
    mp = padded.za.value.shape[1]
    assert mp == max(ms)

    def rand_tril(m):
        a = rng.standard_normal((m, m)) * 0.3 + np.eye(m)
        return np.tril(a)

    q_mu = [rng.standard_normal((m, 1)) * 0.5 for m in ms]
    q_sq = [rand_tril(m) for m in ms]

    # padded model: real entries + zero/identity padding block
    def pad_mu(mu):
        out = np.zeros((mp, 1))
        out[: mu.shape[0]] = mu
        return out

    def pad_sq(sq):
        out = np.eye(mp)
        out[: sq.shape[0], : sq.shape[0]] = sq
        return out

    padded = padded.replace(
        q_mu_act=padded.q_mu_act.with_value(np.stack([pad_mu(q) for q in q_mu])),
        q_mu_com=padded.q_mu_com.with_value(np.stack([pad_mu(q) for q in q_mu])),
        q_sqrt_act=padded.q_sqrt_act.with_value(np.stack([pad_sq(q) for q in q_sq])),
        q_sqrt_com=padded.q_sqrt_com.with_value(np.stack([pad_sq(q) for q in q_sq])))

    xnew = jnp.asarray(np.linspace(0, 1, 33).reshape(-1, 1))
    ma_p, va_p = padded.predict_act(xnew)
    mc_p, vc_p = padded.predict_com(xnew)

    kl_single = 0.0
    for i in range(2):
        single = ModGP.create(z=[[za[i]], [zc[i]]],
                              kern=[[kern_act[i]], [kern_com[i]]])
        single = single.replace(
            q_mu_act=single.q_mu_act.with_value(q_mu[i][None]),
            q_mu_com=single.q_mu_com.with_value(q_mu[i][None]),
            q_sqrt_act=single.q_sqrt_act.with_value(q_sq[i][None]),
            q_sqrt_com=single.q_sqrt_com.with_value(q_sq[i][None]))
        ma_s, va_s = single.predict_act(xnew)
        mc_s, vc_s = single.predict_com(xnew)
        np.testing.assert_allclose(np.asarray(ma_p[:, i]), np.asarray(ma_s[:, 0]),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(va_p[:, i]), np.asarray(va_s[:, 0]),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(mc_p[:, i]), np.asarray(mc_s[:, 0]),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(vc_p[:, i]), np.asarray(vc_s[:, 0]),
                                   rtol=1e-6, atol=1e-9)
        kl_single += float(single.prior_kl())

    # padding adds nothing to the whitened KL either
    np.testing.assert_allclose(float(padded.prior_kl()), kl_single,
                               rtol=1e-8, atol=1e-9)


def test_fit_adam_segmented_matches_fit_adam():
    """Deterministic (no-minibatch) path: segment-of-scans == one scan, and the
    caller's model buffers survive donation."""
    from gpitch_tpu.models import fit_adam_segmented
    model = make_model(s=1, m=8)
    x, y, _, _ = synth_data(100)
    loss_fn = lambda m: m.loss(x, y, num_data=100)
    m1, l1 = fit_adam(model, lambda m, : loss_fn(m), num_steps=12)
    m2, l2, compile_s, run_s = fit_adam_segmented(model, loss_fn, num_steps=12,
                                                  segment=5)
    np.testing.assert_allclose(l1, l2, rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(m1), jax.tree_util.tree_leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    # donation must not have consumed the caller's arrays
    assert np.isfinite(float(loss_fn(model)))
    assert compile_s >= 0.0 and run_s > 0.0


def test_fit_modgp_dispatcher():
    """fit_modgp: one entry point for adam / natgrad_adam / lbfgs (the
    reference's Model.optimize surface, demos/scripts/demo-modgp.py:44-45)."""
    from gpitch_tpu.models import fit_modgp
    x, y, _, _ = synth_data(120)
    for method, kw in (("adam", dict(minibatch_size=32, segment=5)),
                       ("natgrad_adam", dict(minibatch_size=32, segment=5,
                                             gamma=0.05)),
                       ("lbfgs", dict(minibatch_size=None))):
        model = make_model(s=1, m=8)
        m2, losses = fit_modgp(model, x, y, num_steps=10, method=method,
                               learning_rate=0.01, **kw)
        assert np.isfinite(np.asarray(losses)).all(), method
        assert float(losses[-1]) < float(losses[0]), method
