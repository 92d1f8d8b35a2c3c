"""Identify WHICH quantity NaNs in the AMT stage-2 forward (see diag_amt_nan2):
walk to the failing step keeping the pre-step bank, then eigen-analyze the
offending window's Grams in f64 on the host.

Run: python scripts/diag_amt_nan3.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np


def main():
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
                           window_chunk=64)
    print(f"stage1 -> {np.asarray(l1)[-1]:.1f}", flush=True)

    bank = model.bank
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(bank)

    @cfg_jit
    def step(m, st):
        lw, grads = jax.vmap(jax.value_and_grad(lambda mm: mm.loss()))(m)
        grads = zero_untrainable_grads(grads)
        updates, st2 = optimizer.update(grads, st, m)
        return optax.apply_updates(m, updates), st2, lw

    prev = bank
    for i in range(200):
        prev = bank
        bank, opt_state, lw = step(bank, opt_state)
        lw = np.asarray(lw)
        if not np.isfinite(lw).all():
            bad = np.nonzero(~np.isfinite(lw))[0]
            print(f"step {i}: non-finite windows {bad[:10]} "
                  f"({len(bad)} total)", flush=True)
            break
    else:
        print("no NaN in 200 steps", flush=True)
        return

    w = int(bad[0])
    mm = jax.tree_util.tree_map(lambda x: x[w], prev)  # pre-step model
    # forward pieces at the pre-step state (still finite?)
    loss_before = float(jax.jit(lambda m: m.loss())(mm))
    print(f"window {w}: loss at PRE-step state {loss_before:.2f}", flush=True)

    err, kdiag, kuf, kuu = jax.jit(lambda m: m._covs())(mm)
    kuu = np.asarray(kuu, dtype=np.float64)
    sigma2 = float(mm.variance.value)
    jit_abs = float(mm.numerics.jitter_value())
    from gpitch_tpu.config import default_jitter_rel
    rel = default_jitter_rel()
    mean_diag = float(np.mean(np.diag(kuu)))
    jit_total = jit_abs + rel * mean_diag
    ev = np.linalg.eigvalsh(kuu)
    print(f"window {w}: sigma2 {sigma2:.3e}; Kuu mean diag {mean_diag:.4f}; "
          f"abs jitter {jit_abs:.1e}; rel jitter {rel:.1e} -> total floor "
          f"{jit_total:.3e}", flush=True)
    print(f"Kuu eigs: min {ev[0]:.4e} max {ev[-1]:.4e}; "
          f"#eigs < 0: {(ev < 0).sum()}; #eigs < -floor: "
          f"{(ev < -jit_total).sum()}; min+floor = {ev[0] + jit_total:.4e}",
          flush=True)
    # does the f32 cholesky of the jittered Gram succeed?
    kj = (kuu + jit_total * np.eye(kuu.shape[0])).astype(np.float32)
    ch = np.linalg.cholesky(kj.astype(np.float64))
    print("f64 chol of f32-rounded jittered Kuu: ok", flush=True)
    try:
        np.linalg.cholesky(kj.astype(np.float32).astype(np.float64)
                           - 3e-7 * mean_diag * np.eye(kuu.shape[0]))
        print("chol with -3e-7*scale perturbation: ok", flush=True)
    except np.linalg.LinAlgError:
        print("chol FAILS under a 3e-7*scale negative perturbation -> "
              "margin is inside f32 matmul noise", flush=True)
    # hypers of this window
    st = mm.kern.stacked
    print("window hypers:",
          {"kern_var": np.asarray(st.variance.value).round(5).tolist(),
           "lengthscale": np.asarray(st.lengthscales.value).round(5).tolist(),
           "energy_min": float(np.min(np.asarray(st.energy.value))),
           "energy_max": float(np.max(np.asarray(st.energy.value)))},
        flush=True)
    # B-side check at the pre-step state
    common = jax.jit(lambda m: m._common())(mm)
    AAT = np.asarray(common[4], dtype=np.float64)
    evb = np.linalg.eigvalsh(AAT + np.eye(AAT.shape[0]))
    print(f"B = I + AAT eigs: min {evb[0]:.4e} max {evb[-1]:.4e}; "
          f"AAT finite: {np.isfinite(AAT).all()}", flush=True)


if __name__ == "__main__":
    main()
