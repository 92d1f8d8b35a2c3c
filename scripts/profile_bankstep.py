"""Ablation profile of one windowed-SGPR bank training step.

Round-3 VERDICT weak #1/#3: bank-step MFU is 1-4% with no statement of where
the time goes or what is achievable.  This measures, at separation and AMT
quality shapes, the amortized per-step cost of nested subsets of the step:

    build      per-window covariance builds only (kuu, kuf, kdiag sums)
    chol       + chol_inv of Kuu (batched M x M)
    bound      + the full collapsed bound (A, B, chol B, quad terms)
    grad       + backward pass (value_and_grad, the real training step)

Each stage is measured with Timer.time_fn_loop (on-device fori_loop, data
dependence threaded through a parameter perturbation, full-output reduction
kept live) so neither dispatch latency nor XLA CSE biases the numbers.

Usage: python scripts/profile_bankstep.py [--workload sep|amt|amt88]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = {
    # nw, ws, M, S sources, P partials, fs
    "sep": (222, 2001, 112, 3, 5, 16000.0),
    "amt": (439, 2001, 160, 8, 10, 44100.0),
    "amt88": (16, 2001, 160, 88, 8, 44100.0),
}


def build(workload):
    from gpitch_tpu.kernels import MercerMatern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (build_window_bank,
                                                    pad_inducing, sum_kernel)

    nw, ws, m, s, p, fs = SHAPES[workload]
    rng = np.random.default_rng(0)
    hop = (ws - 1) // 2
    xw = np.stack([(np.arange(ws) + i * hop) / fs
                   for i in range(nw)]).reshape(nw, ws, 1)
    yw = rng.standard_normal((nw, ws, 1)) * 0.1
    z = pad_inducing([xw[i, :: max(1, ws // m), 0].reshape(-1, 1)[:m]
                      for i in range(nw)], m, grid_dt=1.0 / fs)

    def builder():
        kerns = []
        for i in range(s):
            f0 = 65.4 * 2 ** (i * 1.0 / 12)
            freqs = np.minimum(f0 * np.arange(1, p + 1), 0.45 * fs)
            energy = 1.0 / np.arange(1, p + 1)
            kerns.append(MercerMatern12sm.create(1.0, 0.5, energy, freqs))
        return sum_kernel(kerns)

    return build_window_bank(xw, yw, z, builder, grid_dt=1.0 / fs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="sep", choices=list(SHAPES))
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gpitch_tpu.core.params import Param
    from gpitch_tpu.core.params import zero_untrainable_grads as _zug
    from gpitch_tpu.linalg.ops import safe_chol_inv
    from gpitch_tpu.utils.profiling import Timer, flops_sgpr_bank_step

    nw, ws, m, s, p, fs = SHAPES[args.workload]
    print(f"workload={args.workload} nw={nw} ws={ws} M={m} S={s} P={p} "
          f"backend={jax.default_backend()}", flush=True)
    bank = build(args.workload)

    def perturbed(eps):
        v = bank.variance
        return bank.replace(variance=Param(jnp.asarray(v.raw) + eps,
                                           v.transform, v.trainable))

    def one_build(mdl):
        kuu = mdl.kern.K(mdl.Z.value)
        kuf = mdl.kern.K(mdl.Z.value, mdl.X.value)
        kdiag = mdl.kern.Kdiag(mdl.X.value)
        return (jnp.sum(kuu) + jnp.sum(kuf) + jnp.sum(kdiag))

    def one_chol(mdl):
        kuu = mdl.kern.K(mdl.Z.value)
        _, L_inv = safe_chol_inv(kuu, mdl.numerics.jitter_value())
        kuf = mdl.kern.K(mdl.Z.value, mdl.X.value)
        return jnp.sum(L_inv) + jnp.sum(kuf)

    def one_achain(mdl):
        """build + chol_inv + the A = Linv Kuf / AAT matmul chain."""
        kuu = mdl.kern.K(mdl.Z.value)
        _, L_inv = safe_chol_inv(kuu, mdl.numerics.jitter_value())
        kuf = mdl.kern.K(mdl.Z.value, mdl.X.value)
        A = (L_inv @ kuf) / jnp.sqrt(mdl.variance.value)
        AAT = A @ A.T
        return jnp.sum(AAT) + jnp.sum(A)

    stages = {
        "build": lambda b: jnp.sum(jax.vmap(one_build)(b)),
        "chol": lambda b: jnp.sum(jax.vmap(one_chol)(b)),
        "achain": lambda b: jnp.sum(jax.vmap(one_achain)(b)),
        "bound": lambda b: jnp.sum(jax.vmap(lambda mm: mm.loss())(b)),
        # keep ALL trainable grads live — reducing one leaf lets XLA DCE the
        # spectral-mixture parameter VJP (~40% of the real step, round-5)
        "grad": lambda b: (lambda lg: lg[0] + sum(
            jnp.sum(jnp.asarray(l)) * 1e-20 for l in
            jax.tree_util.tree_leaves(_zug(lg[1])) if hasattr(l, "dtype")))(
                jax.value_and_grad(
                    lambda bb: jnp.sum(jax.vmap(
                        lambda mm: mm.loss())(bb)))(b)),
    }
    results = {}
    for name, fn in stages.items():
        t = Timer.time_fn_loop(lambda eps, fn=fn: fn(perturbed(eps)),
                               loop_iters=args.iters, reps=3)
        results[name] = t
        print(f"  {name:8s} {t * 1e3:9.2f} ms/step", flush=True)

    fl = flops_sgpr_bank_step(nw, ws, m, s, p)
    t = results["grad"]
    print(f"modeled step FLOPs {fl / 1e9:.1f} GF -> achieved "
          f"{fl / t / 1e12:.2f} TF/s at grad stage", flush=True)


if __name__ == "__main__":
    main()
