"""Bisect the round-5 AMT stage-2 NaN (QUALITY_r05 amt: stage 1 of 500 Adam
steps reaches F=0.709 finite; the stage-2 restart of 1000 more steps goes
NaN).  Reproduces the exact quality workload, locates the first non-finite
step, then re-runs to just before it and dumps the model state statistics
that matter for conditioning (per-source kernel variances, noise variance,
Gram trace/jitter margins).

Run: python scripts/diag_amt_nan.py [--stage2 1000] [--chunk 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np


def build_model():
    import run_quality as rq
    from gpitch_tpu.pipelines import AMT

    seconds, fs = 10.0, 44100.0
    note_c, pitches, notes, events, mix, x = rq._amt_piece(seconds, fs)
    model = AMT(train_signals=[notes[p][: int(2 * fs)] for p in pitches],
                train_names=[f"piano_M{p}_train.wav" for p in pitches],
                fs=fs, test=(x, mix), pitches=pitches, window_size=2001,
                kernel_mode="fft", max_par=10, num_inducing=160, dec=3)
    return model


def bank_stats(bank):
    import jax.numpy as jnp
    st = bank.kern.stacked if hasattr(bank.kern, "stacked") else None
    out = {}
    out["noise_var"] = {
        "min": float(jnp.min(bank.variance.value)),
        "max": float(jnp.max(bank.variance.value)),
        "median": float(jnp.median(bank.variance.value))}
    if st is not None:
        v = st.variance.value  # (nw?, S) raw batched
        out["kern_var"] = {"min": float(jnp.min(v)), "max": float(jnp.max(v))}
        ls = st.lengthscales.value
        out["lengthscale"] = {"min": float(jnp.min(ls)),
                              "max": float(jnp.max(ls))}
        en = st.energy.value
        out["energy"] = {"min": float(jnp.min(en)), "max": float(jnp.max(en))}
        fr = st.frequency.value
        out["frequency"] = {"min": float(jnp.min(fr)),
                            "max": float(jnp.max(fr))}
    # raw (pre-transform) leaves: overflow shows here first
    raws = {}
    for name in ("variance",):
        raws[name] = float(np.max(np.abs(np.asarray(getattr(bank, name).raw))))
    out["raw_absmax"] = raws
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1", type=int, default=500)
    ap.add_argument("--stage2", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--probe", type=int, default=50,
                    help="stage-2 probe granularity (steps)")
    args = ap.parse_args()

    from gpitch_tpu.config import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    model = build_model()
    print(f"windows={model.nwin}", flush=True)

    l1, _ = model.optimize(maxiter=args.stage1, learning_rate=0.01,
                           timed=True, window_chunk=args.chunk)
    l1 = np.asarray(l1)
    print(f"stage1: loss {l1[0]:.1f} -> {l1[-1]:.1f} "
          f"finite={np.isfinite(l1).all()}", flush=True)
    print("stage1 state:", json.dumps(bank_stats(model.bank)), flush=True)

    # stage 2 exactly as the quality schedule runs it: ONE restart, 1000
    # steps, per-step total-loss trace.  Everything is deterministic (no
    # minibatching), so the trace locates the first non-finite step exactly.
    l2, _ = model.optimize(maxiter=args.stage2, learning_rate=0.01,
                           timed=True, window_chunk=args.chunk)
    l2 = np.asarray(l2)
    bad = ~np.isfinite(l2)
    if not bad.any():
        print(f"stage 2 FINITE: loss {l2[0]:.1f} -> {l2[-1]:.1f} — "
              "divergence did not reproduce", flush=True)
        print("final state:", json.dumps(bank_stats(model.bank)), flush=True)
        return
    first_nan = int(np.nonzero(bad)[0][0])
    print(f"FIRST NON-FINITE at stage-2 step {first_nan}", flush=True)
    print("pre-NaN losses:", l2[max(0, first_nan - 8): first_nan], flush=True)
    print("post-NaN state:", json.dumps(bank_stats(model.bank)), flush=True)

    # deterministic re-run to just before the failure, dump the state there
    model2 = build_model()
    model2.optimize(maxiter=args.stage1, learning_rate=0.01, timed=True,
                    window_chunk=args.chunk)
    stop = max(1, first_nan - 5)
    l2b, _ = model2.optimize(maxiter=stop, learning_rate=0.01, timed=True,
                             window_chunk=args.chunk)
    l2b = np.asarray(l2b)
    print(f"re-run to stage-2 step {stop}: loss {l2b[-1]:.1f} "
          f"finite={np.isfinite(l2b).all()}", flush=True)
    print("state 5 steps before NaN:", json.dumps(bank_stats(model2.bank)),
          flush=True)


if __name__ == "__main__":
    main()
