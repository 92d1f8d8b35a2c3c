"""Natural-gradient and HMC sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpitch_tpu.models.hmc import hmc_sample
from gpitch_tpu.models.natgrad import fit_natgrad_adam, natgrad_step
from tests.test_svgp import make_model, synth_data


def test_natgrad_step_increases_elbo():
    model = make_model(s=1, m=10)
    x, y, _, _ = synth_data(150)
    e0 = float(model.elbo(x, y))
    m2 = natgrad_step(model, x, y, gamma=0.05)
    e1 = float(m2.elbo(x, y))
    assert np.isfinite(e1) and e1 > e0
    # q_sqrt stays lower-triangular
    L = np.asarray(m2.q_sqrt_act.value)
    np.testing.assert_allclose(L, np.tril(L), atol=1e-12)


def test_natgrad_adam_training():
    model = make_model(s=1, m=10)
    x, y, _, _ = synth_data(200)
    m2, losses = fit_natgrad_adam(model, x, y, num_steps=30, gamma=0.05,
                                  learning_rate=0.02, num_data=200)
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses[-1]) < float(losses[0])


def test_natgrad_one_step_optimal_in_conjugate_case():
    """With a constant modulation (nlin ≡ 1) the model is conjugate in the
    component GP, so a single natural-gradient step with gamma=1 must land on
    the optimal q — a second step leaves the ELBO (numerically) unchanged."""
    import numpy as np
    from gpitch_tpu.kernels import Matern32, MercerMatern12sm
    from gpitch_tpu.models import ModGP

    z = np.linspace(0.0, 1.0, 12).reshape(-1, 1)
    kern_act = [Matern32.create(1.0, 1.0)]
    kern_com = [MercerMatern12sm.create(1.0, 0.5, [1.0, 0.5], [10.0, 20.0])]
    model = ModGP.create(z=[[z], [z]], kern=[kern_act, kern_com],
                         nlinfun=lambda v: jnp.ones_like(v))
    x, y, _, _ = synth_data(150)

    e0 = float(model.elbo(x, y))
    m1 = natgrad_step(model, x, y, gamma=1.0)
    e1 = float(m1.elbo(x, y))
    m2 = natgrad_step(m1, x, y, gamma=1.0)
    e2 = float(m2.elbo(x, y))
    assert e1 > e0 + 1.0
    assert abs(e2 - e1) < 1e-3 * abs(e1)


def test_hmc_gaussian_target():
    """HMC must recover mean/std of a correlated 2-D Gaussian."""
    cov = jnp.asarray([[1.0, 0.6], [0.6, 1.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([1.0, -2.0])

    def logprob(q):
        d = q["theta"] - mean
        return -0.5 * d @ prec @ d

    init = {"theta": jnp.zeros(2)}
    samples, rates = hmc_sample(logprob, init, jax.random.PRNGKey(0),
                                num_samples=1500, num_warmup=500,
                                num_leapfrog=12, num_chains=4)
    th = np.asarray(samples["theta"]).reshape(-1, 2)
    assert float(np.min(rates)) > 0.5
    np.testing.assert_allclose(th.mean(0), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(np.cov(th.T), np.asarray(cov), atol=0.2)


def test_hmc_mass_adaptation_anisotropic():
    """Diagonal mass adaptation must make a badly-scaled Gaussian (std 0.05
    vs 20, a 400x scale ratio like frequency-vs-lengthscale raws) mix: with
    an identity metric the step size is throttled by the stiff direction and
    the loose one barely moves in 60 leapfrog steps."""
    std = jnp.asarray([0.05, 20.0])
    mean = jnp.asarray([2.0, -30.0])

    def logprob(q):
        return -0.5 * jnp.sum(jnp.square((q["theta"] - mean) / std))

    init = {"theta": mean + jnp.asarray([0.1, 5.0])}
    samples, rates = hmc_sample(logprob, init, jax.random.PRNGKey(3),
                                num_samples=800, num_warmup=400,
                                num_leapfrog=12, num_chains=4,
                                jitter_init=0.01)
    th = np.asarray(samples["theta"]).reshape(-1, 2)
    assert float(np.min(rates)) > 0.5
    err = np.abs(th.mean(0) - np.asarray(mean)) / np.asarray(std)
    assert (err < 0.25).all(), err  # mean within 0.25 posterior sd per axis
    np.testing.assert_allclose(th.std(0), np.asarray(std), rtol=0.35)


def test_hmc_over_kernel_hypers():
    """Sample the component-kernel lengthscale raw of a tiny ModGP."""
    model = make_model(s=1, m=8)
    x, y, _, _ = synth_data(80)

    def substitute(m, leaves):
        kc = m.kern_com
        new_ls = kc.lengthscales.with_value(jnp.exp(leaves["log_ls"]))
        return m.replace(kern_com=kc.replace(lengthscales=new_ls))

    def logprob(leaves):
        return substitute(model, leaves).elbo(x, y) \
            - 0.5 * jnp.sum(jnp.square(leaves["log_ls"]))

    init = {"log_ls": jnp.log(model.kern_com.lengthscales.value)}
    samples, rates = hmc_sample(logprob, init, jax.random.PRNGKey(1),
                                num_samples=60, num_warmup=60,
                                num_leapfrog=8, num_chains=2)
    ls = np.exp(np.asarray(samples["log_ls"]))
    assert np.isfinite(ls).all()
    assert (ls > 0).all()
    assert float(np.min(rates)) > 0.2
