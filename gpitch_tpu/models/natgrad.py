"""Natural-gradient updates for Gaussian variational parameters.

The reference optimizes q(u) = N(m, LL^T) with plain Adam through GPflow's
Model.optimize (demos/scripts/demo-modgp.py:44-45).  The TPU-native engine adds
the standard natural-gradient step (Salimbeni et al. 2018) for the variational
banks, combined with Adam on hyperparameters — the configuration named in the
project north star (BASELINE.json).

Math: with expectation parameters xi = (m, S + m m^T) and natural parameters
(lambda1, lambda2) = (S^{-1} m, -1/2 S^{-1}), the natural gradient ascent step
on the ELBO F is

    lambda1 <- lambda1 + gamma * dF/dm|_xi ,   where
    dF/dxi1 = dF/dm - 2 (dF/dS) m,   dF/dxi2 = dF/dS,
    lambda2 <- lambda2 + gamma * dF/dxi2,

then S' = -1/2 lambda2'^{-1}, m' = S' lambda1'.  Gradients w.r.t. (m, S) are
taken by AD through a Cholesky of S, so the whole step jits.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.params import Param
from ..linalg.ops import add_jitter, solve_lower

__all__ = ["natgrad_step", "fit_natgrad_adam"]


def _sym(a):
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def _nat_update_bank(q_mu, q_sqrt, grad_m, grad_S, gamma, jitter=1e-8):
    """One natural-gradient step for a stacked bank.

    q_mu: (S, M, 1); q_sqrt: (S, M, M) lower tri; grad_m/grad_S: gradients of
    the ELBO w.r.t. m and (symmetric) S.  Returns new (q_mu, q_sqrt).
    """
    L = jnp.tril(q_sqrt)
    Svar = L @ jnp.swapaxes(L, -1, -2)
    Sinv = _batch_inv_psd(Svar, jitter)

    lam1 = Sinv @ q_mu
    lam2 = -0.5 * Sinv

    dxi1 = grad_m - 2.0 * (grad_S @ q_mu)
    dxi2 = grad_S

    lam1 = lam1 + gamma * dxi1
    lam2 = lam2 + gamma * dxi2

    S_new = _batch_inv_psd(-2.0 * _sym(lam2), jitter)
    m_new = S_new @ lam1
    L_new = jnp.linalg.cholesky(add_jitter(_sym(S_new), jitter))
    return m_new, L_new


def _batch_inv_psd(A, jitter):
    L = jnp.linalg.cholesky(add_jitter(_sym(A), jitter))
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.swapaxes(Linv, -1, -2) @ Linv


def natgrad_step(model, x, y, gamma: float = 0.1, num_data: int | None = None):
    """One natural-gradient step on all four variational banks of a ModGP.

    Hyperparameters are untouched; combine with Adam via fit_natgrad_adam.
    """

    def elbo_of(q_mu_a, S_a, q_mu_c, S_c):
        m2 = model.replace(
            q_mu_act=model.q_mu_act.with_value(q_mu_a),
            q_sqrt_act=model.q_sqrt_act.with_value(jnp.linalg.cholesky(S_a)),
            q_mu_com=model.q_mu_com.with_value(q_mu_c),
            q_sqrt_com=model.q_sqrt_com.with_value(jnp.linalg.cholesky(S_c)),
        )
        return m2.elbo(x, y, num_data)

    mu_a = model.q_mu_act.value
    mu_c = model.q_mu_com.value
    La = jnp.tril(model.q_sqrt_act.value)
    Lc = jnp.tril(model.q_sqrt_com.value)
    Sa = La @ jnp.swapaxes(La, -1, -2)
    Sc = Lc @ jnp.swapaxes(Lc, -1, -2)
    Sa = add_jitter(Sa, 1e-10)
    Sc = add_jitter(Sc, 1e-10)

    grads = jax.grad(elbo_of, argnums=(0, 1, 2, 3))(mu_a, Sa, mu_c, Sc)
    g_ma, g_Sa, g_mc, g_Sc = grads
    g_Sa, g_Sc = _sym(g_Sa), _sym(g_Sc)

    mu_a2, La2 = _nat_update_bank(mu_a, La, g_ma, g_Sa, gamma)
    mu_c2, Lc2 = _nat_update_bank(mu_c, Lc, g_mc, g_Sc, gamma)

    return model.replace(
        q_mu_act=model.q_mu_act.with_value(mu_a2),
        q_sqrt_act=model.q_sqrt_act.with_value(La2),
        q_mu_com=model.q_mu_com.with_value(mu_c2),
        q_sqrt_com=model.q_sqrt_com.with_value(Lc2),
    )


def fit_natgrad_adam(model, x, y, num_steps: int, gamma: float = 0.1,
                     learning_rate: float = 0.01, num_data: int | None = None,
                     batch_fn: Callable | None = None, key=None,
                     segment: int | None = None, gamma_warmup: int = 100):
    """Alternate natural-gradient (variational banks) and Adam (hypers) steps.

    ``segment=None``: the whole loop is one jitted scan.  ``segment=k``: one
    k-step scan is compiled once and re-invoked ceil(num_steps/k) times —
    same reasoning as models/fit.py:fit_adam_segmented (compile cost scales
    with the traced scan body only, and long single dispatches trip RPC
    deadlines on relayed TPU runtimes).  Returns (model, losses).

    Stability (long minibatch runs): gamma ramps linearly from gamma/50 to
    gamma over ``gamma_warmup`` steps — a full-size natural step from a cold
    q(u) under minibatch noise can push S outside the PSD cone.  Any step
    producing a non-finite model is skipped (the carry keeps the previous
    state) AND halves an adaptive gamma scale, which recovers by 5%% per
    finite step; near convergence S is ill-conditioned in f32 and the
    full-size natural step intermittently overshoots, so the backoff keeps
    the run productive instead of frozen.  Recorded losses substitute the
    last finite value on skipped steps.
    """
    import optax
    from ..core.params import zero_untrainable_grads

    optimizer = optax.adam(learning_rate)

    def freeze_variational(grads):
        zeros = lambda p: Param(jnp.zeros_like(p.raw), p.transform, p.trainable)
        return grads.replace(q_mu_act=zeros(grads.q_mu_act),
                             q_mu_com=zeros(grads.q_mu_com),
                             q_sqrt_act=zeros(grads.q_sqrt_act),
                             q_sqrt_com=zeros(grads.q_sqrt_com))

    opt_state = optimizer.init(model)
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, k):
        m, st, step_i, gscale, prev_loss = carry
        xb, yb = batch_fn(k) if batch_fn is not None else (x, y)
        ramp = jnp.minimum(1.0, (step_i + 1.0) / max(gamma_warmup, 1))
        # 1/sqrt decay after ~20x warmup: a fixed-size natural step under
        # minibatch noise oscillates around the optimum once converged
        decay = jax.lax.rsqrt(1.0 + step_i / (20.0 * max(gamma_warmup, 1)))
        gamma_t = gamma * (0.02 + 0.98 * ramp) * gscale * decay
        m2 = natgrad_step(m, xb, yb, gamma_t, num_data)
        loss, grads = jax.value_and_grad(
            lambda mm: mm.loss(xb, yb, num_data))(m2)
        grads = freeze_variational(zero_untrainable_grads(grads))
        updates, st2 = optimizer.update(grads, st, m2)
        m2 = optax.apply_updates(m2, updates)
        finite = jnp.isfinite(loss)
        for leaf in jax.tree_util.tree_leaves(m2):
            finite = finite & jnp.all(jnp.isfinite(leaf))

        def pick(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new, old)

        gscale = jnp.where(finite, jnp.minimum(gscale * 1.05, 1.0),
                           jnp.maximum(gscale * 0.5, 1e-3))
        loss_rec = jnp.where(finite, loss, prev_loss)
        return (pick(m2, m), pick(st2, st), step_i + 1.0, gscale,
                loss_rec), loss_rec

    carry0 = (model, opt_state, jnp.asarray(0.0), jnp.asarray(1.0),
              jnp.asarray(jnp.inf))

    if segment is None:
        @jax.jit
        def run(carry):
            keys = jax.random.split(key, num_steps)
            (m, *_), losses = jax.lax.scan(body, carry, keys)
            return m, losses

        return run(carry0)

    import numpy as np

    def make_run(length):
        @jax.jit
        def run(carry, key):
            keys = jax.random.split(key, length)
            carry, losses = jax.lax.scan(body, carry, keys)
            return carry, losses
        return run

    lengths = [segment] * (num_steps // segment)
    if num_steps % segment:
        lengths.append(num_steps % segment)
    run_full = make_run(segment)
    losses_out = []
    carry = carry0
    for length in lengths:
        run = run_full if length == segment else make_run(length)
        key, sub = jax.random.split(key)
        carry, losses = run(carry, sub)
        losses_out.append(np.asarray(losses))
    return carry[0], jnp.asarray(np.concatenate(losses_out))
