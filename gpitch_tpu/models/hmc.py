"""Hamiltonian Monte Carlo over model hyperparameters.

The project north star (BASELINE.json) calls for optional HMC/NUTS over kernel
hyperparameters with per-chain vectorized leapfrog.  This module provides a
jit-compiled HMC with dual-averaging step-size adaptation; chains are a vmapped
batch axis, so C chains cost one chain's wall-clock on TPU.  Works on any
pytree of unconstrained parameters (Param raws), e.g. a ModGP's kernel hypers
with the variational banks held fixed.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax

from ..config import jit as _cfg_jit  # precision-scoped jax.jit
import jax.numpy as jnp

__all__ = ["hmc_sample", "model_logprob_fn"]


class _DAState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    step: jnp.ndarray


def _leapfrog(logprob_grad, q, p, eps, num_steps, inv_mass):
    def body(i, carry):
        q, p = carry
        _, g = logprob_grad(q)
        p = jax.tree_util.tree_map(lambda p_, g_: p_ + 0.5 * eps * g_, p, g)
        q = jax.tree_util.tree_map(lambda q_, p_, v_: q_ + eps * v_ * p_,
                                   q, p, inv_mass)
        _, g = logprob_grad(q)
        p = jax.tree_util.tree_map(lambda p_, g_: p_ + 0.5 * eps * g_, p, g)
        return q, p

    return jax.lax.fori_loop(0, num_steps, body, (q, p))


def _tree_randn_scaled(key, tree, inv_mass):
    """p ~ N(0, M) with M = 1/inv_mass (diagonal): std = 1/sqrt(inv_mass)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    vleaves = jax.tree_util.tree_leaves(inv_mass)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape, l.dtype) / jnp.sqrt(v)
                  for k, l, v in zip(keys, leaves, vleaves)])


def _kinetic(p, inv_mass):
    """0.5 p^T M^{-1} p with diagonal M^{-1} = inv_mass."""
    return 0.5 * sum(jnp.sum(jnp.square(l) * v)
                     for l, v in zip(jax.tree_util.tree_leaves(p),
                                     jax.tree_util.tree_leaves(inv_mass)))


def hmc_sample(logprob_fn: Callable, init_params, key, num_samples: int = 500,
               num_warmup: int = 200, num_leapfrog: int = 16,
               init_step_size: float = 0.01, target_accept: float = 0.8,
               num_chains: int = 4, jitter_init: float = 0.1,
               mass_adapt: bool = True):
    """Run ``num_chains`` vectorized HMC chains.

    logprob_fn(params_pytree) -> scalar log density (unnormalized).
    Returns (samples pytree with leading (num_chains, num_samples) axes,
    accept_rate (num_chains,)).

    ``mass_adapt``: Stan-style diagonal mass-matrix adaptation — warmup runs
    in two halves: half A adapts the step size under an identity metric while
    accumulating Welford estimates of the per-parameter posterior variance;
    the regularized variances become the diagonal inverse mass for half B,
    which re-adapts the step size under the new metric.  Essential when raw
    parameters live on very different scales (e.g. kernel frequency raws
    O(100) next to lengthscale raws O(0.1)): a single scalar step size under
    an identity metric is throttled by the stiffest direction and the loose
    directions never mix.
    """
    logprob_grad = jax.value_and_grad(logprob_fn)

    def one_chain(key, q0):
        def hmc_step(q, key, eps, inv_mass):
            k1, k2 = jax.random.split(key)
            p0 = _tree_randn_scaled(k1, q, inv_mass)
            lp0, _ = logprob_grad(q)
            h0 = -lp0 + _kinetic(p0, inv_mass)
            q1, p1 = _leapfrog(logprob_grad, q, p0, eps, num_leapfrog,
                               inv_mass)
            lp1, _ = logprob_grad(q1)
            h1 = -lp1 + _kinetic(p1, inv_mass)
            log_alpha = jnp.minimum(0.0, h0 - h1)
            log_alpha = jnp.where(jnp.isfinite(log_alpha), log_alpha, -jnp.inf)
            accept = jnp.log(jax.random.uniform(k2)) < log_alpha
            q_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), q1, q)
            return q_new, jnp.exp(log_alpha), accept

        # dual averaging (Hoffman & Gelman 2014, alg. 5 constants)
        def adapt_scan(q, keys, inv_mass, eps0, welford: bool):
            mu = jnp.log(10.0 * eps0)
            da0 = _DAState(jnp.log(eps0), jnp.log(eps0),
                           jnp.asarray(0.0), jnp.asarray(0.0))
            w0 = (jax.tree_util.tree_map(jnp.zeros_like, q),
                  jax.tree_util.tree_map(jnp.zeros_like, q))

            def body(carry, k):
                q, da, (wmean, wm2) = carry
                q, alpha, _ = hmc_step(q, k, jnp.exp(da.log_eps), inv_mass)
                t = da.step + 1.0
                h_avg = (1.0 - 1.0 / (t + 10.0)) * da.h_avg \
                    + (target_accept - alpha) / (t + 10.0)
                log_eps = mu - jnp.sqrt(t) / 0.05 * h_avg
                w = t ** -0.75
                log_eps_avg = w * log_eps + (1.0 - w) * da.log_eps_avg
                if welford:
                    delta = jax.tree_util.tree_map(
                        lambda x, m: x - m, q, wmean)
                    wmean = jax.tree_util.tree_map(
                        lambda m, d: m + d / t, wmean, delta)
                    wm2 = jax.tree_util.tree_map(
                        lambda m2, d, x, m: m2 + d * (x - m),
                        wm2, delta, q, wmean)
                return (q, _DAState(log_eps, log_eps_avg, h_avg, t),
                        (wmean, wm2)), None

            (q, da, (wmean, wm2)), _ = jax.lax.scan(body, (q, da0, w0), keys)
            return q, jnp.exp(da.log_eps_avg), wm2, da

        keys_all = jax.random.split(key, num_warmup + num_samples + 1)
        keys_w, keys_s = keys_all[:num_warmup], keys_all[num_warmup:-1]
        identity = jax.tree_util.tree_map(jnp.ones_like, q0)

        if mass_adapt and num_warmup >= 20:
            wa = num_warmup // 2
            q, eps_a, wm2, _ = adapt_scan(q0, keys_w[:wa], identity,
                                          init_step_size, welford=True)
            n = jnp.asarray(float(wa))
            # Stan regularization: shrink toward 1e-3 with pseudo-count 5
            inv_mass = jax.tree_util.tree_map(
                lambda m2: (n / ((n + 5.0) * jnp.maximum(n - 1.0, 1.0))) * m2
                + 5e-3 / (n + 5.0), wm2)
            q, eps, _, _ = adapt_scan(q, keys_w[wa:], inv_mass, eps_a,
                                      welford=False)
        else:
            inv_mass = identity
            q, eps, _, _ = adapt_scan(q0, keys_w, identity, init_step_size,
                                      welford=False)

        def samp_body(q, k):
            q, _, accept = hmc_step(q, k, eps, inv_mass)
            return q, (q, accept)

        _, (samples, accepts) = jax.lax.scan(samp_body, q, keys_s)
        return samples, jnp.mean(accepts.astype(jnp.float32))

    keys = jax.random.split(key, num_chains + 1)
    inits = jax.vmap(lambda k: jax.tree_util.tree_map(
        lambda x: x + jitter_init * jax.random.normal(k, x.shape, x.dtype),
        init_params))(keys[1:])
    samples, rates = _cfg_jit(jax.vmap(one_chain))(keys[1:], inits)
    return samples, rates


def model_logprob_fn(model, loss_leaves: Callable, x=None, y=None,
                     num_data=None, prior_scale: float = 10.0):
    """Build logprob(raw_leaves) = ELBO(model with leaves) + N(0, prior_scale)
    prior on the unconstrained hypers.

    loss_leaves(model, leaves) -> model with the hyper leaves substituted;
    typical use selects kernel hypers (see tests/test_hmc.py).
    """

    def logprob(leaves):
        m = loss_leaves(model, leaves)
        elbo = m.elbo(x, y, num_data) if x is not None else -m.loss()
        prior = -0.5 * sum(jnp.sum(jnp.square(l / prior_scale))
                           for l in jax.tree_util.tree_leaves(leaves))
        return elbo + prior

    return logprob
