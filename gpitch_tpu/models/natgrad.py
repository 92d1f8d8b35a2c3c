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

from ..config import jit as _cfg_jit  # precision-scoped jax.jit
import jax.numpy as jnp

from ..core.params import Param
from ..linalg.ops import add_jitter, solve_lower

__all__ = ["natgrad_step", "natgrad_polish", "fit_natgrad_adam"]


def _sym(a):
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def _nat_update_bank(q_mu, q_sqrt, grad_m, grad_S, gamma, jitter=1e-8):
    """One natural-gradient step for a stacked bank.

    q_mu: (S, M, 1); q_sqrt: (S, M, M) lower tri; grad_m/grad_S: gradients of
    the ELBO w.r.t. m and (symmetric) S.  Returns new (q_mu, q_sqrt).

    Whitened-frame formulation (f32-critical).  The textbook update inverts
    S = LL^T and then inverts -2*lambda2' — both at kappa(S)^2, which NaNs in
    f32 near convergence where S is ill-conditioned (the round-5 real-audio
    natgrad run skipped 93% of its steps this way once scoped f32-exact
    matmuls removed the bf16 rounding that had masked it).  Algebraically
    identical but conditioned like the identity:

        C     = I - 2 gamma L^T grad_S L          (~ I for natgrad-size steps)
        S_new = L C^{-1} L^T
        m_new = L C^{-1} (L^{-1} m + gamma L^T dxi1)

    since -2*lambda2' = L^{-T} C L^{-1} and lambda1' = L^{-T} L^{-1} m +
    gamma dxi1.  Every solve is triangular on L or on chol(C); no explicit
    S^{-1} appears anywhere.  Equality with the textbook form is pinned by
    the f64 conjugate-case test (tests/test_hmc_natgrad.py).
    """
    L = jnp.tril(q_sqrt)
    Lt = jnp.swapaxes(L, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(L.shape[-1], dtype=L.dtype), L.shape)

    dxi1 = grad_m - 2.0 * (grad_S @ q_mu)
    C = eye - 2.0 * gamma * _sym(Lt @ grad_S @ L)
    Lc = jnp.linalg.cholesky(add_jitter(C, jitter))

    # W = L Lc^{-T}: solve Lc X = L^T (lower), then W = X^T; S_new = W W^T
    X = jax.scipy.linalg.solve_triangular(Lc, Lt, lower=True)
    W = jnp.swapaxes(X, -1, -2)
    S_new = W @ jnp.swapaxes(W, -1, -2)

    # m_new = L C^{-1} (L^{-1} m + gamma L^T dxi1)
    b = (jax.scipy.linalg.solve_triangular(L, q_mu, lower=True)
         + gamma * (Lt @ dxi1))
    c = jax.scipy.linalg.solve_triangular(Lc, b, lower=True)
    c = jax.scipy.linalg.solve_triangular(jnp.swapaxes(Lc, -1, -2), c,
                                          lower=False)
    m_new = L @ c
    L_new = jnp.linalg.cholesky(add_jitter(_sym(S_new), jitter))
    return m_new, L_new


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


def natgrad_polish(model, x, y, num_steps: int = 200, gamma: float = 0.05,
                   num_data: int | None = None):
    """Full-batch natural-gradient-only refinement (hypers frozen).

    Salimbeni-style finishing phase: from a (near-)converged state, fixed-size
    natural steps on the exact (full-data) ELBO walk the variational
    distribution to the optimum for the current hypers — no minibatch noise,
    so no decay schedule is needed.  Non-finite steps are skipped with the
    same halving backoff as the main loop.  Returns (model, losses) with NaN
    recorded on skipped steps.
    """

    @_cfg_jit
    def run(model):
        def body(carry, _):
            m, gscale = carry
            m2 = natgrad_step(m, x, y, gamma * gscale, num_data)
            loss = m2.loss(x, y, num_data)
            finite = jnp.isfinite(loss)
            for leaf in jax.tree_util.tree_leaves(m2):
                finite = finite & jnp.all(jnp.isfinite(leaf))
            keep = jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), m2, m)
            gscale = jnp.where(finite, jnp.minimum(gscale * 1.05, 1.0),
                               jnp.maximum(gscale * 0.5, 1e-3))
            return (keep, gscale), jnp.where(finite, loss, jnp.nan)

        (m, _), losses = jax.lax.scan(body, (model, jnp.asarray(1.0)), None,
                                      length=num_steps)
        return m, losses

    return run(model)


def fit_natgrad_adam(model, x, y, num_steps: int, gamma: float = 0.1,
                     learning_rate: float = 0.01, num_data: int | None = None,
                     batch_fn: Callable | None = None, key=None,
                     segment: int | None = None, gamma_warmup: int = 100,
                     polish_steps: int = 0, polish_gamma: float = 0.05,
                     return_info: bool = False):
    """Alternate natural-gradient (variational banks) and Adam (hypers) steps.

    ``segment=None``: the whole loop is one jitted scan.  ``segment=k``: one
    k-step scan is compiled once and re-invoked ceil(num_steps/k) times —
    same reasoning as models/fit.py:fit_adam_segmented (compile cost scales
    with the traced scan body only, and long single dispatches trip RPC
    deadlines on relayed TPU runtimes).  Returns (model, losses), or
    (model, losses, info) with ``return_info=True`` where info records
    n_skipped (non-finite steps), the full-data ELBO trajectory at segment
    boundaries, and which state was returned.

    Stability (long minibatch runs): gamma ramps linearly from gamma/50 to
    gamma over ``gamma_warmup`` steps — a full-size natural step from a cold
    q(u) under minibatch noise can push S outside the PSD cone.  Any step
    producing a non-finite model is skipped (the carry keeps the previous
    state) AND halves an adaptive gamma scale, which recovers by 5%% per
    finite step; near convergence S is ill-conditioned in f32 and the
    full-size natural step intermittently overshoots, so the backoff keeps
    the run productive instead of frozen.  Skipped steps record NaN in the
    loss trace (round-3 ADVICE: substituting the last finite value hid
    divergence), so ``np.isnan(losses).sum()`` counts them.

    Best-state selection (segmented path): the returned model is the best of
    (a) the final state, (b) the segment-boundary state with the best
    FULL-DATA ELBO, (c) — with ``polish_steps`` > 0 — state (b) refined by a
    full-batch natural-gradient-only phase (``natgrad_polish``).  Rationale:
    under a decaying minibatch schedule the run can wander away from an
    optimum it already found (the round-3 quality run peaked at 61.1k and
    ended at 48.2k); selecting on the training objective keeps that optimum.
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
        m, st, step_i, gscale = carry
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
        return (pick(m2, m), pick(st2, st), step_i + 1.0,
                gscale), jnp.where(finite, loss, jnp.nan)

    carry0 = (model, opt_state, jnp.asarray(0.0), jnp.asarray(1.0))

    if segment is None:
        @_cfg_jit
        def run(carry):
            keys = jax.random.split(key, num_steps)
            (m, *_), losses = jax.lax.scan(body, carry, keys)
            return m, losses

        model, losses = run(carry0)
        if return_info:
            import numpy as np
            info = {"n_skipped": int(np.isnan(np.asarray(losses)).sum()),
                    "returned": "final"}
            return model, losses, info
        return model, losses

    import numpy as np

    full_loss = _cfg_jit(lambda mm: mm.loss(x, y, num_data))

    def make_run(length):
        @_cfg_jit
        def run(carry, key):
            keys = jax.random.split(key, length)
            carry, losses = jax.lax.scan(body, carry, keys)
            return carry, losses
        return run

    lengths = [segment] * (num_steps // segment)
    if num_steps % segment:
        lengths.append(num_steps % segment)
    run_full = make_run(segment)
    losses_out, full_trace = [], []
    carry = carry0
    best_model, best_full = None, np.inf
    for length in lengths:
        run = run_full if length == segment else make_run(length)
        key, sub = jax.random.split(key)
        carry, losses = run(carry, sub)
        losses_out.append(np.asarray(losses))
        # best-state selection on the FULL-data objective (exact, not the
        # noisy minibatch estimate) at segment granularity
        fl = float(full_loss(carry[0]))
        full_trace.append(fl)
        if np.isfinite(fl) and fl < best_full:
            best_full, best_model = fl, carry[0]
    losses = jnp.asarray(np.concatenate(losses_out))
    final_model = carry[0]
    final_full = full_trace[-1] if full_trace else float(full_loss(final_model))

    returned, out = "final", final_model
    if best_model is not None and best_full < final_full:
        returned, out = "best_segment", best_model
    polish_info = None
    if polish_steps and best_model is not None:
        pol, pol_losses = natgrad_polish(out, x, y, num_steps=polish_steps,
                                         gamma=polish_gamma,
                                         num_data=num_data)
        pol_full = float(full_loss(pol))
        polish_info = {"steps": polish_steps, "gamma": polish_gamma,
                       "full_loss_before": min(best_full, final_full),
                       "full_loss_after": pol_full,
                       "n_skipped": int(np.isnan(np.asarray(pol_losses)).sum())}
        if np.isfinite(pol_full) and pol_full < min(best_full, final_full):
            returned, out = "polished", pol
    if return_info:
        info = {"n_skipped": int(np.isnan(np.asarray(losses)).sum()),
                "full_loss_at_segments": [round(v, 2) for v in full_trace],
                "returned": returned, "polish": polish_info}
        return out, losses, info
    return out, losses
