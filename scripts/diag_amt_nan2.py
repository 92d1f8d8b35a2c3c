"""Step-level instrumentation of the AMT stage-2 NaN (see diag_amt_nan.py).

Reproduces stage 1 (500 steps) then walks stage 2 step by step around the
failure, recording per-step: loss, global max |grad| (after the untrainable
mask), max Adam second moment, and which leaf carries the max gradient.
Distinguishes (a) forward NaN (cholesky failure) from (b) gradient-spike ->
Adam nu overflow -> NaN update.

Run: python scripts/diag_amt_nan2.py [--steps 170]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=170)
    ap.add_argument("--chunk", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from diag_amt_nan import build_model
    from gpitch_tpu.config import enable_persistent_compilation_cache
    from gpitch_tpu.config import jit as cfg_jit
    from gpitch_tpu.core.params import zero_untrainable_grads

    enable_persistent_compilation_cache()
    model = build_model()
    l1, _ = model.optimize(maxiter=500, learning_rate=0.01, timed=True,
                           window_chunk=args.chunk)
    print(f"stage1 -> {np.asarray(l1)[-1]:.1f}", flush=True)

    bank = model.bank
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(bank)

    @cfg_jit
    def step(m, st):
        lw, grads = jax.vmap(jax.value_and_grad(lambda mm: mm.loss()))(m)
        grads = zero_untrainable_grads(grads)
        # diagnostics BEFORE the update
        leaves = jax.tree_util.tree_leaves_with_path(grads)
        gmax = jnp.asarray([jnp.max(jnp.abs(l)) for _, l in leaves
                            if hasattr(l, "dtype")])
        loss_w_max = jnp.max(lw)
        loss_w_min = jnp.min(lw)
        updates, st2 = optimizer.update(grads, st, m)
        m2 = optax.apply_updates(m, updates)
        numax = jnp.max(jnp.asarray(
            [jnp.max(jnp.abs(l)) for l in jax.tree_util.tree_leaves(st2)
             if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]))
        return m2, st2, jnp.sum(lw), gmax, numax, loss_w_max, loss_w_min

    names = [jax.tree_util.keystr(p) for p, l in
             jax.tree_util.tree_leaves_with_path(
                 jax.tree_util.tree_map(lambda x: x, bank))
             if hasattr(l, "dtype")]

    for i in range(args.steps):
        bank, opt_state, loss, gmax, numax, lwmax, lwmin = step(bank, opt_state)
        loss = float(loss)
        g = np.asarray(gmax)
        k = int(np.nanargmax(g)) if np.isfinite(g).any() else -1
        if i % 10 == 0 or not np.isfinite(loss) or np.nanmax(g) > 1e15:
            print(f"step {i:4d} loss {loss:14.1f} gmax {np.nanmax(g):9.2e} "
                  f"({names[k] if 0 <= k < len(names) else '?'}) "
                  f"numax {float(numax):9.2e} "
                  f"lw[min,max] [{float(lwmin):.1f},{float(lwmax):.1f}] "
                  f"finite_g={np.isfinite(g).all()}", flush=True)
        if not np.isfinite(loss):
            print("loss went non-finite — stopping", flush=True)
            break


if __name__ == "__main__":
    main()
