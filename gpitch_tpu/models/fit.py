"""Jit-compiled training loops.

Replaces gpflow 0.x ``Model.optimize`` (used at
/root/reference/demos/scripts/demo-modgp.py:44-45 with AdamOptimizer, and at
separation.py:298 / transcription.py:283 with scipy L-BFGS-B): the reference
pays a Python<->TF session round-trip per optimizer step; here the *entire*
optimization (minibatch sampling, ELBO, gradients, update) is one
``lax.scan`` inside a single jit — one device dispatch for the whole run.

Non-trainable parameters (the reference's ``.fixed = True``) are handled by
masking gradient leaves (core.params.zero_untrainable_grads).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..core.params import zero_untrainable_grads

__all__ = ["fit_adam", "fit_adam_timed", "fit_lbfgs", "adam_step_fn",
           "minibatch_fn"]


def minibatch_fn(x, y, minibatch_size: int):
    """Uniform minibatch sampler (MinibatchData equivalent, pdgp.py:76-77).

    Returns batch_fn(key) -> (xb, yb); sampling is with replacement (the
    fixed-seed permutation of the reference is an implementation detail, not a
    contract).
    """
    n = x.shape[0]

    def batch_fn(key):
        idx = jax.random.randint(key, (minibatch_size,), 0, n)
        return x[idx], y[idx]

    return batch_fn


def adam_step_fn(loss_fn: Callable, optimizer) -> Callable:
    """Builds step((model, opt_state), batch) -> ((model, opt_state), loss)."""

    def step(carry, batch):
        model, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(model, *batch)
        grads = zero_untrainable_grads(grads)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return (model, opt_state), loss

    return step


def _adam_runner(loss_fn, optimizer, num_steps, batch_fn, key):
    """One jitted scan over the whole Adam schedule."""
    if batch_fn is None:
        step = adam_step_fn(lambda m: loss_fn(m), optimizer)

        @jax.jit
        def run(model, opt_state):
            def body(carry, _):
                return step(carry, ())
            return jax.lax.scan(body, (model, opt_state), None, length=num_steps)
    else:
        step = adam_step_fn(loss_fn, optimizer)

        @jax.jit
        def run(model, opt_state):
            keys = jax.random.split(key, num_steps)

            def body(carry, k):
                return step(carry, batch_fn(k))
            return jax.lax.scan(body, (model, opt_state), keys)

    return run


def fit_adam(model, loss_fn: Callable, num_steps: int, learning_rate: float = 0.005,
             batch_fn: Callable | None = None, key=None, optimizer=None):
    """Run ``num_steps`` of Adam fully inside one jit.

    loss_fn(model, *batch) -> scalar.  With ``batch_fn`` (key -> batch tuple),
    a fresh minibatch is drawn every step; otherwise loss_fn(model) is used.
    Returns (model, losses[num_steps]).
    """
    optimizer = optimizer or optax.adam(learning_rate)
    opt_state = optimizer.init(model)
    key = key if key is not None else jax.random.PRNGKey(0)
    run = _adam_runner(loss_fn, optimizer, num_steps, batch_fn, key)
    (model, _), losses = run(model, opt_state)
    return model, losses


def fit_adam_timed(model, loss_fn: Callable, num_steps: int,
                   learning_rate: float = 0.005, batch_fn: Callable | None = None,
                   key=None, optimizer=None):
    """fit_adam that separates compile time from execution time.

    The first call of the jitted scan includes XLA compilation (tens of
    seconds for a window bank, while the compiled run itself is milliseconds);
    quoting their sum as "training time" is off by orders of magnitude.  This
    executes the same compiled program a second time from the same initial
    state and times it.  Returns (model, losses, compile_s, run_s).
    """
    import time

    optimizer = optimizer or optax.adam(learning_rate)
    opt_state = optimizer.init(model)
    key = key if key is not None else jax.random.PRNGKey(0)
    run = _adam_runner(loss_fn, optimizer, num_steps, batch_fn, key)

    # fence with a host transfer, NOT block_until_ready: remote-device relays
    # can mark buffers ready before execution finishes, and a dependent scalar
    # read is the only fence that cannot lie
    def fenced():
        t0 = time.perf_counter()
        out = run(model, opt_state)
        float(out[1][-1])
        return out, time.perf_counter() - t0

    out, first_s = fenced()
    out, run_s = fenced()

    (model, _), losses = out
    return model, losses, max(first_s - run_s, 0.0), run_s


def fit_lbfgs(model, loss_fn: Callable, num_steps: int = 1000, memory_size: int = 20,
              grad_tol: float = 1e-9):
    """L-BFGS with zoom linesearch over the full model pytree.

    Replaces the scipy L-BFGS-B the reference uses for the per-window
    separation/AMT optimizations (separation.py:298) — here the whole solver
    runs on-device inside one jit.  loss_fn(model) -> scalar.
    Returns (model, losses).

    Iterations freeze once the (masked) gradient norm drops below ``grad_tol``
    or an update goes non-finite: running the zoom linesearch on an exactly
    flat objective produces unbounded steps, so a fixed-length scan needs this
    guard (scipy's L-BFGS-B stops on the same criterion).
    """
    optimizer = optax.lbfgs(memory_size=memory_size)

    def masked_loss(m):
        return loss_fn(m)

    value_and_grad = optax.value_and_grad_from_state(masked_loss)

    @jax.jit
    def run(model):
        opt_state = optimizer.init(model)

        def body(carry, _):
            m, st = carry
            value, grads = value_and_grad(m, state=st)
            grads = zero_untrainable_grads(grads)
            updates, st2 = optimizer.update(grads, st, m, value=value, grad=grads,
                                            value_fn=masked_loss)
            m2 = optax.apply_updates(m, updates)
            gnorm = optax.global_norm(grads)
            finite = jnp.all(jnp.asarray(
                [jnp.all(jnp.isfinite(u)) for u in jax.tree_util.tree_leaves(updates)]))
            ok = (gnorm > grad_tol) & finite

            def pick(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), new, old)

            return (pick(m2, m), pick(st2, st)), value

        (m, _), losses = jax.lax.scan(body, (model, opt_state), None,
                                      length=num_steps)
        return m, losses

    return run(model)
