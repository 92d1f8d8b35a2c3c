"""Diagnose the 44.1 kHz AMT bank Gram conditioning (round-5 VERDICT item 1).

Builds the exact quality-AMT bank at a reduced duration on the CPU backend in
f32 (CPU f32 matmuls are exact-f32 — the same arithmetic TPU 'highest'
produces, and stricter than 'high'), then:
  1. reports the Kuu spectrum per window vs the shipped jitter,
  2. runs Adam steps and reports where/if the loss goes non-finite.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/diag_amt_conditioning.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import numpy as np
import jax
import jax.numpy as jnp

from run_quality import _amt_piece
from gpitch_tpu.pipelines import AMT


def main(seconds=2.0, fs=44100.0, steps=500):
    note_c, pitches, notes, events, mix, x = _amt_piece(seconds, fs)
    model = AMT(train_signals=[notes[p][: int(2 * fs)] for p in pitches],
                train_names=[f"piano_M{p}_train.wav" for p in pitches],
                fs=fs, test=(x, mix), pitches=pitches, window_size=2001,
                kernel_mode="fft", max_par=10, num_inducing=160, dec=3)
    bank = model.bank
    z = bank.Z.value  # (nw, M, 1)
    print("bank windows:", z.shape[0], "M:", z.shape[1])

    # Kuu spectrum at init
    def kuu_fn(b):
        return b.kern.K(b.Z.value)
    kuu = jax.vmap(kuu_fn)(bank)
    kuu = np.asarray(kuu, dtype=np.float64)
    diag_mean = kuu.diagonal(axis1=-2, axis2=-1).mean(axis=-1)
    eigs = np.linalg.eigvalsh(kuu)
    print(f"diag mean: min {diag_mean.min():.4g} max {diag_mean.max():.4g}")
    print(f"min eig: {eigs[:, 0].min():.4g}  (rel to diag: "
          f"{(eigs[:, 0] / diag_mean).min():.4g})")
    print(f"windows with min-eig < 1e-4 (shipped jitter): "
          f"{(eigs[:, 0] < 1e-4).sum()} / {eigs.shape[0]}")
    print(f"windows with min-eig < 0: {(eigs[:, 0] < 0).sum()}")
    # distribution of the smallest relative eigenvalue
    rel = eigs[:, 0] / diag_mean
    print("rel min-eig percentiles:", {p: float(np.percentile(rel, p))
                                       for p in (0, 1, 5, 50)})

    # padded-point distances
    zz = np.asarray(z)[..., 0]
    dmin = np.min(np.diff(np.sort(zz, axis=-1), axis=-1), axis=-1)
    print(f"min adjacent z spacing (in grid steps): "
          f"{(dmin * fs).min():.3g} .. {(dmin * fs).max():.3g}")

    # train
    losses, _ = model.optimize(maxiter=steps, learning_rate=0.01, timed=True)
    losses = np.asarray(losses)
    bad = np.nonzero(~np.isfinite(losses))[0]
    print(f"loss[0]={losses[0]:.6g} loss[-1]={losses[-1]:.6g} "
          f"first non-finite step: {bad[0] if bad.size else 'none'}")

    # Kuu spectrum at the final (possibly diverged) hypers
    kuu2 = np.asarray(jax.vmap(kuu_fn)(model.bank), dtype=np.float64)
    fin = np.isfinite(kuu2).all(axis=(-2, -1))
    print(f"final kuu finite windows: {fin.sum()}/{len(fin)}")
    if fin.any():
        e2 = np.linalg.eigvalsh(kuu2[fin])
        d2 = kuu2[fin].diagonal(axis1=-2, axis2=-1).mean(axis=-1)
        print(f"final min eig: {e2[:, 0].min():.4g} rel {(e2[:, 0]/d2).min():.4g}")
        print(f"final diag mean max: {d2.max():.4g}")


if __name__ == "__main__":
    sec = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    st = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    main(seconds=sec, steps=st)
