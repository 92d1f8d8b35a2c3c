"""Reference-scale quality workloads -> QUALITY_r03.json + plots.

Round-1 VERDICT item 2: the reference's real workloads were never run.  This
harness runs them at reference scale on the default backend (TPU):

1. real_audio  — the flagship single-pitch fit on the ACTUAL reference
   recording /root/reference/demos/data/011PFNOF_M60_train.wav (loaded at
   runtime, never copied), matching demo_modgp-real-audio.ipynb
   (Adam lr=0.0025, minibatch 100, dec=9, 5 partials).
2. separation  — 14-s 3-source mixture @ 16 kHz, ws=2001 (~223 windows),
   matching /root/reference/gpitch/separation.py:92-99.  Sources are built
   from the real MAPS piano note: C4 = the recording itself, E4/G4 =
   pitch-shifted (resampled) copies, each placed at known onsets, so exact
   ground-truth source tracks exist for compute_rmse
   (separation.py:418-423).
3. amt         — multi-pitch transcription @ 44.1 kHz, ws=2001, with a
   ground-truth pianoroll and frame P/R/F-measure
   (transcription.py:56,170,265-298; evaluation per arXiv:1705.07104);
   thresholds fixed a priori (MAD rule), never tuned on ground truth.
4. amt88_dict  — the same piece transcribed with the FULL 88-pitch piano
   dictionary (reference setting, transcription.py:30-33,56,170): the model
   must also NOT detect the 80 silent pitches.
5. hmc         — north-star optional inference mode: vectorized-chain HMC
   over the component-kernel hypers of the real-note fit, with acceptance
   and split-R-hat diagnostics.

Usage: python scripts/run_quality.py [--quick]  (quick: shrunken sizes, CI)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_WAV = "/root/reference/demos/data/011PFNOF_M60_train.wav"
OUT_JSON = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "QUALITY_r05.json")


# ---------------------------------------------------------------- audio build

def pitch_shift(y: np.ndarray, semitones: float) -> np.ndarray:
    """Resample-based pitch shift of an isolated note (duration shrinks for
    upward shifts — fine for note events)."""
    y = np.asarray(y).reshape(-1)
    factor = 2.0 ** (semitones / 12.0)
    pos = np.arange(0.0, len(y) - 1.0, factor)
    return np.interp(pos, np.arange(len(y)), y)


def place_notes(note: np.ndarray, onsets_s, total_s: float, fs: float,
                amp: float = 1.0) -> np.ndarray:
    """A source track: the note event placed at each onset (samples)."""
    track = np.zeros(int(round(total_s * fs)))
    n = len(note)
    for t in onsets_s:
        i0 = int(round(t * fs))
        seg = note[: max(0, len(track) - i0)]
        track[i0:i0 + len(seg)] += amp * seg
    return track


def load_ref_note(fs_out: float | None = None):
    """The real MAPS note (mono, peak-normalized).  Returns (y, fs)."""
    from gpitch_tpu.audio import readaudio
    _, y, fs = readaudio(REF_WAV, scaled=True)
    y = y.reshape(-1)
    if fs_out and fs_out != fs:
        pos = np.arange(0.0, len(y) - 1.0, fs / fs_out)
        y = np.interp(pos, np.arange(len(y)), y)
        fs = fs_out
    return y, fs


# ----------------------------------------------------------------- workloads

def _real_audio_setup():
    import jax.numpy as jnp
    from gpitch_tpu.audio import init_cparam, readaudio
    from gpitch_tpu.kernels import Matern32, MercerMatern12sm
    from gpitch_tpu.models import ModGP
    from gpitch_tpu.pipelines import init_liv
    from gpitch_tpu.utils import midi2freq

    x, y, fs = readaudio(REF_WAV, frames=32000, scaled=True)
    f0 = midi2freq(60)
    freqs, energies, _, _, _ = init_cparam(y, fs=fs, maxh=5, ideal_f0=f0)
    z, _ = init_liv(x=x, y=y, win_size=31, thres=0.05, dec=9)

    kact = Matern32.create(variance=3.5, lengthscales=0.2)
    kcom = MercerMatern12sm.create(variance=1.0, lengthscales=0.5,
                                   energy=energies, frequency=freqs)
    model = ModGP.create(z=z, kern=[[kact], [kcom]])
    return model, x, y, jnp.asarray(x), jnp.asarray(y), freqs


def run_real_audio(steps: int) -> dict:
    """Workload 1: the reference notebook's real-audio single-pitch fit.

    Runs the same workload under BOTH training configurations the north star
    names: plain Adam and natural-gradient (variational banks) + Adam
    (hypers), recording both ELBO trajectories.  Adam runs via the segmented
    scan (models/fit.py:fit_adam_segmented): the 10k-step single-scan jit of
    round 2 spent 194 s compiling vs 1.3 s running (round-2 VERDICT weak #2).
    """
    from gpitch_tpu.models import (fit_adam_segmented, minibatch_fn,
                                   predict_windowed)
    from gpitch_tpu.models.natgrad import fit_natgrad_adam

    model0, x, y, xj, yj, freqs = _real_audio_setup()
    n = y.shape[0]
    batch_fn = minibatch_fn(xj, yj, 100)

    model, losses, compile_s, run_s = fit_adam_segmented(
        model0, lambda m, xb, yb: m.loss(xb, yb, num_data=n),
        num_steps=steps, learning_rate=0.0025, batch_fn=batch_fn,
        segment=max(1, min(500, steps // 2)))
    losses = np.asarray(losses)

    # natural-gradient + Adam on the identical init (north star config).
    # Round-4: best-state selection on the full-data ELBO at segment
    # boundaries + a full-batch natgrad polish phase (round-3 VERDICT weak
    # #4: the decaying minibatch schedule wandered away from a 61k optimum
    # it had already found, ending below plain Adam).
    t0 = time.perf_counter()
    ng_model, ng_losses, ng_info = fit_natgrad_adam(
        model0, xj, yj, num_steps=steps, gamma=0.05, learning_rate=0.0025,
        num_data=n, batch_fn=batch_fn, segment=min(500, steps),
        polish_steps=min(300, steps), polish_gamma=0.05, return_info=True)
    ng_losses = np.asarray(ng_losses)
    float(ng_losses[-1])
    ng_wall = time.perf_counter() - t0

    # the minibatch ELBO estimates above are noisy (scale n/100); the honest
    # comparison is the FULL-data ELBO of each final model
    import jax
    full_elbo = jax.jit(lambda m: m.elbo(xj, yj, n))
    elbo_full_adam = float(full_elbo(model))
    elbo_full_ng = float(full_elbo(ng_model))

    results = predict_windowed(model, xj, ws=1600)
    m_src = np.asarray(results[4])
    rmse = float(np.sqrt(np.mean((m_src[:, 0:1] - y) ** 2)))

    _plot_real_audio(x, y, results)
    return {
        "workload": "real 2.0 s MAPS note 011PFNOF_M60 @ 16 kHz (loaded from "
                    "the reference at runtime)",
        "steps": steps, "elbo_start": float(-losses[0]),
        "elbo_final": float(-losses[-1]),
        "elbo_full_data": elbo_full_adam,
        "reconstruction_rmse": rmse,
        "compile_s": round(compile_s, 2), "run_s": round(run_s, 2),
        "steps_per_s": round(steps / max(run_s, 1e-9), 1),
        "natgrad_adam": {
            "gamma": 0.05, "elbo_start": float(-ng_losses[0]),
            "elbo_at_adam_half": float(-ng_losses[min(steps // 2,
                                                      len(ng_losses) - 1)]),
            # guard the degenerate all-NaN trace (round-4 ADVICE: indexing
            # an empty finite subset crashed the whole quality run)
            "elbo_best": (float(-np.nanmin(ng_losses))
                          if np.isfinite(ng_losses).any() else None),
            "elbo_final": (float(-ng_losses[np.isfinite(ng_losses)][-1])
                           if np.isfinite(ng_losses).any() else None),
            "elbo_full_data": elbo_full_ng,
            "n_skipped_steps": ng_info["n_skipped"],
            "returned_state": ng_info["returned"],
            "elbo_full_at_segments": [-v for v in
                                      ng_info["full_loss_at_segments"]],
            "polish": ng_info["polish"],
            "beats_adam_full_data": bool(elbo_full_ng >= elbo_full_adam),
            "wall_s": round(ng_wall, 2),
            "steps_per_s": round(steps / ng_wall, 1)},
        "partials_hz": np.round(freqs, 1).tolist(),
    }


def _plot_real_audio(x, y, results):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from gpitch_tpu.utils.math import logistic
    m_a, v_a, m_c, _, m_s = [np.asarray(r) for r in results]
    fig, axes = plt.subplots(3, 1, figsize=(11, 7), sharex=True)
    axes[0].plot(x[:, 0], y[:, 0], "C0", lw=0.4, label="data")
    axes[0].plot(x[:, 0], m_s[:, 0], "C1", lw=0.4, label="posterior source")
    axes[0].legend(loc="upper right")
    axes[0].set_title("real MAPS note 011PFNOF_M60: data vs modulated-GP fit")
    axes[1].plot(x[:, 0], logistic(m_a[:, 0]), "C2", lw=0.8)
    axes[1].set_title("activation envelope sigma(g)")
    axes[2].plot(x[:, 0], m_c[:, 0], "C3", lw=0.4)
    axes[2].set_title("component f")
    axes[2].set_xlabel("time (s)")
    fig.tight_layout()
    fig.savefig("demo-real-audio-quality.png", dpi=90)
    plt.close(fig)


def run_separation(maxiter: int, seconds: float = 14.0,
                   mesh_devices: int = 1, method: str = "adam",
                   window_chunk: int | None = None) -> dict:
    """Workload 2: 14-s 3-source separation, ws=2001 (~223 windows).

    ``mesh_devices=1``: the optimize runs through the SHARDED pipeline path
    (SoSp.optimize(mesh=...)) on a 1-device mesh — the same code a pod would
    run, required to be zero-overhead vs the unsharded path (round-3 VERDICT
    item 1 proof (b)).  ``method="lbfgs"`` runs the reference's actual
    optimizer (scipy L-BFGS-B per window, separation.py:298) as vmapped
    per-window L-BFGS (VERDICT item 7)."""
    from gpitch_tpu.parallel import make_mesh
    from gpitch_tpu.pipelines import SoSp

    fs = 16000.0
    note_c, _ = load_ref_note()
    notes = {
        "M60": note_c,
        "M64": pitch_shift(note_c, 4.0),
        "M67": pitch_shift(note_c, 7.0),
    }
    onsets = {
        "M60": [0.2, 4.7, 9.3],
        "M64": [1.6, 6.4, 10.9],
        "M67": [3.0, 7.8, 12.4],
    }
    sources = [place_notes(notes[k], onsets[k], seconds, fs) for k in notes]
    mix = sum(sources)
    x = (np.arange(len(mix)) / fs).reshape(-1, 1)

    t0 = time.perf_counter()
    model = SoSp(train_signals=[notes[k][: int(2 * fs)] for k in notes],
                 train_names=[f"piano_{k}_train.wav" for k in notes],
                 fs=fs, mixture=(x, mix), window_size=2001,
                 kernel_mode="fft", max_par=5, num_inducing=112, dec=2)
    build_s = time.perf_counter() - t0
    mesh = make_mesh(mesh_devices) if mesh_devices else None
    losses, (compile_s, run_s) = model.optimize(maxiter=maxiter,
                                                learning_rate=0.01,
                                                method=method, timed=True,
                                                mesh=mesh,
                                                window_chunk=window_chunk)
    unsharded_s = None
    if mesh is not None:
        # zero-overhead proof (round-3 VERDICT item 1b): the same optimize
        # through the plain (unsharded) path, steady-state comparison
        model2 = SoSp(train_signals=[notes[k][: int(2 * fs)] for k in notes],
                      train_names=[f"piano_{k}_train.wav" for k in notes],
                      fs=fs, mixture=(x, mix), window_size=2001,
                      kernel_mode="fft", max_par=5, num_inducing=112, dec=2)
        _, (_, unsharded_s) = model2.optimize(maxiter=maxiter,
                                              learning_rate=0.01,
                                              method=method, timed=True)
    # the loss TRACE records the solver's visited states; the returned bank
    # is the best-visited state per window (L-BFGS, models/fit.lbfgs_solve),
    # so score the returned model explicitly
    import jax as _jax
    from gpitch_tpu.pipelines.windowed_sgpr import bank_loss
    loss_returned = float(_jax.jit(bank_loss)(model.bank))

    # first call includes any compile not yet in the on-disk cache; the
    # second is the steady-state prediction cost
    t0 = time.perf_counter()
    model.predict_s()
    predict_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    model.predict_s()
    predict_s_time = time.perf_counter() - t0
    rmse = model.compute_rmse(sources)

    _plot_separation(x, mix, sources, model)
    audio_s = len(mix) / fs
    return {
        "workload": f"{seconds:.0f} s 3-source mixture @ 16 kHz, ws=2001, "
                    f"{model.nwin} windows (real MAPS note + pitch-shifted "
                    "copies; exact ground-truth tracks)",
        "num_windows": int(model.nwin), "maxiter": maxiter,
        "optimizer": method, "mesh_devices": mesh_devices,
        "loss_start": float(losses[0]), "loss_final": float(losses[-1]),
        "loss_returned_model": loss_returned,
        "rmse": float(rmse),
        "compile_s": round(compile_s, 2), "optimize_s": round(run_s, 2),
        "optimize_s_unsharded": (None if unsharded_s is None
                                 else round(unsharded_s, 2)),
        "predict_first_s": round(predict_first, 2),
        "predict_s": round(predict_s_time, 2), "build_s": round(build_s, 2),
        "audio_seconds_per_s_optimize": round(audio_s / max(run_s, 1e-9), 3),
        "audio_seconds_per_s_total": round(
            audio_s / max(run_s + predict_s_time, 1e-9), 3),
    }


def _plot_separation(x, mix, sources, model):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(4, 1, figsize=(12, 8), sharex=True)
    axes[0].plot(x[:, 0], mix, "k", lw=0.3)
    axes[0].set_title("mixture (14 s, 3 sources from the real MAPS note)")
    for i, name in enumerate(("C4 (M60)", "E4 (M64)", "G4 (M67)")):
        est = model.esource[i][0][:, 0]
        axes[i + 1].plot(x[: len(est), 0], sources[i][: len(est)], "C0",
                         lw=0.3, label="truth")
        axes[i + 1].plot(x[: len(est), 0], est, "C1", lw=0.3, label="estimate")
        axes[i + 1].set_title(f"source {name}")
        axes[i + 1].legend(loc="upper right")
    axes[-1].set_xlabel("time (s)")
    fig.tight_layout()
    fig.savefig("demo-separation-quality.png", dpi=90)
    plt.close(fig)


def _amt_piece(seconds: float, fs: float):
    """The synthetic 'piece': 8 sounding pitches, events at known times."""
    note_c, _ = load_ref_note(fs_out=fs)
    pitches = [60, 62, 64, 65, 67, 69, 71, 72]  # C major scale
    rng = np.random.default_rng(3)
    notes, events = {}, []
    for p in pitches:
        notes[p] = pitch_shift(note_c, p - 60.0)
    # a simple "piece": each pitch plays 2-3 times at known times
    t = 0.25
    order = rng.permutation(np.repeat(pitches, 3))
    for p in order:
        if t > seconds - 1.0:
            break
        dur = min(2.0 * (len(note_c) / len(notes[p])) * 0.45, 0.9)
        events.append((t, t + dur, int(p)))
        t += float(rng.uniform(0.28, 0.55))
    tracks = {p: place_notes(notes[p],
                             [on for on, off, q in events if q == p],
                             seconds, fs) for p in pitches}
    mix = sum(tracks.values())
    x = (np.arange(len(mix)) / fs).reshape(-1, 1)
    return note_c, pitches, notes, events, mix, x


def run_amt(maxiter: int, seconds: float = 10.0, fs: float = 44100.0,
            dictionary: str = "sounding", reg: bool = False,
            window_chunk: int | None = None, mesh_devices: int = 0) -> dict:
    """Workload 3: transcription @ 44.1 kHz with ground-truth pianoroll.

    ``dictionary="sounding"``: the model carries exactly the 8 sounding
    pitches.  ``dictionary="piano88"``: the model carries the FULL 88-pitch
    piano dictionary (the reference AMT setting, transcription.py:30-33, 56,
    170) of which the 8 sounding pitches are a subset — the evaluation then
    also scores the 80 silent rows, so min-max-rescale thresholding would
    fabricate detections (round-2 VERDICT weak #4).

    ``reg=True`` enables the reference's own sparsity device for exactly this
    problem: the beta=1000 L1 penalty on per-pitch variances
    (/root/reference/gpitch/sgpr_ss.py:17-27,64-68 -> models/sgpr.py).

    Ground truth is round-tripped through a MAPS-style .txt annotation file
    and parsed by ``read_note_table``/``Pianoroll(path=..., filename=...)``
    (round-3 VERDICT item 10: the file parser must be exercised by a flagship
    run, not only unit tests).

    Thresholds are fixed A PRIORI — mad (k=4) and minmax (0.1) — never chosen
    against ground truth.  The headline metric is the MAD rule.
    """
    import tempfile

    from gpitch_tpu.audio.pianoroll import Pianoroll
    from gpitch_tpu.pipelines import AMT

    note_c, pitches, notes, events, mix, x = _amt_piece(seconds, fs)
    # MAPS-format annotation round-trip (reference pianoroll.py:21-24 format)
    tdir = tempfile.mkdtemp(prefix="maps_gt_")
    with open(os.path.join(tdir, "quality_piece.txt"), "w") as fh:
        fh.write("OnsetTime\tOffsetTime\tMidiPitch\n")
        for on, off, p in events:
            fh.write(f"{on:.6f}\t{off:.6f}\t{p}\n")
    roll = Pianoroll(path=tdir, filename="quality_piece.wav", fs=20,
                     duration=seconds)
    assert roll.pitch_list == sorted({p for _, _, p in events})

    if dictionary == "piano88":
        model_pitches = list(range(21, 109))
        train = {p: (notes[p] if p in notes
                     else pitch_shift(note_c, p - 60.0))
                 for p in model_pitches}
    else:
        model_pitches = pitches
        train = notes

    mesh = None
    if mesh_devices:
        from gpitch_tpu.parallel import make_mesh
        mesh = make_mesh(mesh_devices)

    t0 = time.perf_counter()
    model = AMT(train_signals=[train[p][: int(2 * fs)] for p in model_pitches],
                train_names=[f"piano_M{p}_train.wav" for p in model_pitches],
                fs=fs, test=(x, mix), pitches=model_pitches, window_size=2001,
                kernel_mode="fft",
                max_par=10 if dictionary == "sounding" else 8,
                num_inducing=160, dec=3, pianoroll=roll, reg=reg)
    build_s = time.perf_counter() - t0
    if window_chunk is None:
        # cap the traced window count in both settings: XLA compile scales
        # superlinearly with it (the unchunked 439-window sounding program
        # cold-compiled 376 s; a 64-window chunk compiles in seconds and
        # chunking is exact)
        window_chunk = 16 if dictionary == "piano88" else 64
    # staged optimization: evaluate F at 1/3 of the budget and at the full
    # budget (fresh Adam state per stage — a restart schedule).  The early
    # checkpoint is the evidence for the throughput operating point: if
    # F(maxiter/3) ~ F(maxiter), audio-s/s at equal quality is 3x the
    # full-budget number (round-3 VERDICT weak #3).
    stages = [max(1, maxiter // 3), maxiter - max(1, maxiter // 3)]
    # one segment length for BOTH stages (one executable, fit_adam_segmented
    # length-independence) that divides both stage budgets (500/1000 full,
    # 13-as-its-own-segment quick) so masked-tail no-op steps stay
    # negligible, while keeping dispatches few (chunked banks dispatch
    # nc x nseg times and the relayed chip costs ~0.3 s per dispatch)
    seg = min(250, max(1, stages[0]))
    losses_all, stage_evals = [], []
    compile_s = run_s = 0.0
    for cum, st_steps in zip(np.cumsum(stages), stages):
        losses, (c_s, r_s) = model.optimize(
            maxiter=int(st_steps), learning_rate=0.01, timed=True,
            window_chunk=window_chunk, mesh=mesh, segment=seg)
        losses_all.append(np.asarray(losses))
        compile_s += c_s
        run_s += r_s
        p_i, r_i, f_i = model.evaluate(mode="mad", k=4.0)
        stage_evals.append({"steps": int(cum),
                            "f_measure": round(f_i, 4),
                            "precision": round(p_i, 4),
                            "recall": round(r_i, 4),
                            "optimize_s_cum": round(run_s, 2)})
    losses = np.concatenate(losses_all)
    p_mad, r_mad, f_mad = model.evaluate(mode="mad", k=4.0)
    p_mm, r_mm, f_mm = model.evaluate(threshold=0.1)

    out = {
        "workload": f"{seconds:.0f} s piece, 8 sounding pitches @ 44.1 kHz, "
                    f"ws=2001, {model.nwin} windows, "
                    f"{len(model_pitches)}-pitch dictionary (pitch-shifted "
                    "real MAPS note; ground-truth pianoroll via MAPS .txt "
                    "annotation round-trip)",
        "num_windows": int(model.nwin), "num_pitches": len(model_pitches),
        "maxiter": maxiter, "reg_l1_variances": bool(reg),
        "loss_start": float(losses[0]), "loss_final": float(losses[-1]),
        "threshold_rule": "mad k=4 (a priori; minmax 0.1 secondary)",
        "precision": round(p_mad, 4), "recall": round(r_mad, 4),
        "f_measure": round(f_mad, 4),
        "stage_evals": stage_evals,
        "minmax_thr0.1": {"precision": round(p_mm, 4),
                          "recall": round(r_mm, 4),
                          "f_measure": round(f_mm, 4)},
        "compile_s": round(compile_s, 2), "optimize_s": round(run_s, 2),
        "build_s": round(build_s, 2),
        "window_chunk": window_chunk, "mesh_devices": mesh_devices,
        "audio_seconds_per_s_optimize": round(
            len(mix) / fs / max(run_s, 1e-9), 3),
    }
    if dictionary == "piano88":
        # the 80 silent rows are where sparsity matters: how much envelope
        # mass and how many MAD-rule detections land on never-sounding pitches
        est = model.pianoroll_estimate(mode="mad", k=4.0)
        silent = np.asarray([p not in pitches for p in model_pitches])
        out["silent_rows"] = {
            "count": int(silent.sum()),
            "false_detections": int(est[silent].sum()),
            "detections_on_sounding": int(est[~silent].sum()),
            "mean_var_silent": float(model.matrix_var[silent].mean()),
            "mean_var_sounding": float(model.matrix_var[~silent].mean()),
        }
    if dictionary == "sounding":
        _plot_amt(model, roll, pitches, seconds)
    return out


def _plot_amt(model, roll, pitches, seconds):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(3, 1, figsize=(12, 8), sharex=True)
    nwin = model.nwin
    centers = (np.arange(nwin) * 1000 + model.window_size // 2) / model.fs
    mv = model.matrix_var
    axes[0].imshow(mv, aspect="auto", origin="lower", cmap="magma",
                   extent=[0, centers[-1], 0, len(pitches)])
    axes[0].set_title("learned per-pitch variance envelope (matrix_var)")
    est = model.pianoroll_estimate(threshold=0.1)
    axes[1].imshow(est, aspect="auto", origin="lower", cmap="gray_r",
                   extent=[0, centers[-1], 0, len(pitches)])
    axes[1].set_title("thresholded pianoroll estimate")
    gt = np.stack([roll.pr_dic[str(p)][:, 0] for p in pitches])
    axes[2].imshow(gt, aspect="auto", origin="lower", cmap="gray_r",
                   extent=[0, seconds, 0, len(pitches)])
    axes[2].set_title("ground truth")
    axes[2].set_xlabel("time (s)")
    for ax in axes:
        ax.set_yticks(np.arange(len(pitches)) + 0.5)
        ax.set_yticklabels([str(p) for p in pitches], fontsize=7)
    fig.tight_layout()
    fig.savefig("demo-amt-quality.png", dpi=90)
    plt.close(fig)


def _split_rhat(x) -> float:
    """Split-chain R-hat (Gelman et al.) of (chains, samples) draws."""
    x = np.asarray(x, dtype=float)
    c, s = x.shape
    half = s // 2
    xs = x[:, : 2 * half].reshape(c * 2, half)
    w = xs.var(axis=1, ddof=1).mean()
    b = half * xs.mean(axis=1).var(ddof=1)
    var = (half - 1) / half * w + b / half
    return float(np.sqrt(var / max(w, 1e-30)))


def run_hmc(num_samples: int = 200, num_warmup: int = 100,
            num_chains: int = 4) -> dict:
    """Workload 4 (north star): HMC over the FULL component-kernel
    hyperposterior of the real-note ModGP fit — lengthscale, variance, and
    the 5 partial energies + 5 partial frequencies (12 parameters; round-3
    VERDICT weak #7 sampled only 2) — per-chain vectorized leapfrog,
    full-data ELBO as the (unnormalized) log density, variational banks held
    at the Adam-fitted posterior (models/hmc.py)."""
    import jax
    import jax.numpy as jnp
    from gpitch_tpu.core.params import Param
    from gpitch_tpu.models import (fit_adam_segmented, hmc_sample,
                                   minibatch_fn)

    model0, x, y, xj, yj, freqs = _real_audio_setup()
    n = y.shape[0]
    model, _, _, _ = fit_adam_segmented(
        model0, lambda m, xb, yb: m.loss(xb, yb, num_data=n),
        num_steps=2000, learning_rate=0.0025,
        batch_fn=minibatch_fn(xj, yj, 100), segment=500)

    kc = model.kern_com
    sampled = ("lengthscales", "variance", "energy", "frequency")

    def substitute(leaves):
        reps = {name: Param(leaves[name], getattr(kc, name).transform,
                            getattr(kc, name).trainable)
                for name in sampled}
        return model.replace(kern_com=kc.replace(**reps))

    # frequency raws are O(100) (Positive ~ softplus is ~identity there), so
    # a shared N(0, 10^2) prior would pin them; scale each raw's prior to its
    # init magnitude (a weakly-informative prior centered at the FFT init)
    init = {name: jnp.asarray(getattr(kc, name).raw) for name in sampled}
    prior_scale = {name: jnp.maximum(10.0, 0.25 * jnp.abs(init[name]))
                   for name in sampled}

    def logprob(leaves):
        prior = -0.5 * sum(
            jnp.sum(jnp.square((leaves[name] - init[name])
                               / prior_scale[name]))
            for name in sampled)
        return substitute(leaves).elbo(xj, yj, n) + prior

    t0 = time.perf_counter()
    samples, rates = hmc_sample(logprob, init, jax.random.PRNGKey(2),
                                num_samples=num_samples,
                                num_warmup=num_warmup, num_leapfrog=8,
                                num_chains=num_chains, jitter_init=0.05)
    rates = np.asarray(jax.device_get(rates))
    wall = time.perf_counter() - t0

    out = {
        "workload": "HMC over ALL component-kernel hypers (lengthscale, "
                    "variance, 5 energies, 5 frequencies = 12 params) of the "
                    "real-note ModGP fit; full-data ELBO target, "
                    f"{num_chains} vectorized chains",
        "num_chains": num_chains, "num_warmup": num_warmup,
        "num_samples": num_samples, "num_leapfrog": 8,
        "accept_rate": [round(float(r), 3) for r in rates],
        "wall_s": round(wall, 1),
    }
    rhats = {}
    for name in sampled:
        tf = getattr(kc, name).transform
        vals = np.asarray(tf.forward(np.asarray(samples[name],
                                                dtype=np.float64)))
        vals = vals.reshape(num_chains, num_samples, -1)
        per_param = [round(_split_rhat(vals[..., j]), 4)
                     for j in range(vals.shape[-1])]
        rhats[name] = per_param
        out[f"{name}_mean"] = [float(v) for v in
                               np.round(vals.mean(axis=(0, 1)), 5)]
        out[f"{name}_sd"] = [float(v) for v in
                             np.round(vals.std(axis=(0, 1)), 6)]
    out["rhat"] = rhats
    out["rhat_max"] = max(v for r in rhats.values() for v in r)
    # Identified-quantity diagnostics: the kernel is
    # variance * env * sum_p e_p cos(...), so (variance, energy) enter ONLY
    # through the products variance*e_p — a scale ridge along which chains
    # wander freely (variance up, energies down).  Raw-coordinate R-hat is
    # large on that ridge even when every quantity the model cares about has
    # converged; report R-hat of the identified products alongside.
    tf_v = getattr(kc, "variance").transform
    tf_e = getattr(kc, "energy").transform
    v_all = np.asarray(tf_v.forward(np.asarray(samples["variance"],
                                               dtype=np.float64)))
    e_all = np.asarray(tf_e.forward(np.asarray(samples["energy"],
                                               dtype=np.float64)))
    v_all = v_all.reshape(num_chains, num_samples, -1)
    e_all = e_all.reshape(num_chains, num_samples, -1)
    prod = v_all[..., :1] * e_all                       # (C, S, P) identified
    out["rhat_identified_var_x_energy"] = [
        round(_split_rhat(prod[..., j]), 4) for j in range(prod.shape[-1])]
    out["var_x_energy_mean"] = [float(v) for v in
                                np.round(prod.mean(axis=(0, 1)), 5)]
    out["rhat_max_identified"] = max(
        [v for v in out["rhat_identified_var_x_energy"]]
        + rhats["lengthscales"] + rhats["frequency"])
    return out


def run_kernel_train(maxiter: int = 300, num_sam: int = 10000,
                     seconds: float = 4.0) -> dict:
    """Workload 6: the reference's 'train' kernel-learning mode at reference
    scale (separation.py:186-212: sampled covariance over 10k random windows
    + parametric Matern-SM fit, kernelfit.py:61-87) — round-2 VERDICT weak
    #8: this path had no reference-scale evidence.  Learns per-pitch kernels
    from the real MAPS note in BOTH modes and runs the same small separation
    with each, comparing fit quality and end RMSE."""
    from gpitch_tpu.pipelines import SoSp
    from gpitch_tpu.pipelines.separation import learn_pitch_params

    fs = 16000.0
    note_c, _ = load_ref_note()
    notes = {"M60": note_c, "M64": pitch_shift(note_c, 4.0),
             "M67": pitch_shift(note_c, 7.0)}
    train = [notes[k][: int(2 * fs)] for k in notes]
    names = [f"piano_{k}_train.wav" for k in notes]

    t0 = time.perf_counter()
    stage_timings: dict = {}
    params_train, kern_sampled = learn_pitch_params(
        train, names, fs, mode="train", num_sam=num_sam, max_par=5,
        timings=stage_timings)
    learn_s = time.perf_counter() - t0

    # fit quality: RMSE between the sampled kernel and the fitted parametric
    # form, per pitch (kernelfit's own objective, kernelfit.py:54-58);
    # approximate_kernel packs p = [bias, lengthscale, v_1..P, f_1..P]
    from gpitch_tpu.pipelines.kernel_learning import approximate_kernel
    fit_rmse = []
    for i in range(3):
        ks = np.asarray(kern_sampled[1][i]).reshape(-1)
        x = np.asarray(kern_sampled[0][i]).reshape(-1)
        p = np.hstack([[0.0], np.atleast_1d(params_train[0][i]),
                       np.asarray(params_train[1][i]).reshape(-1),
                       np.asarray(params_train[2][i]).reshape(-1)])
        approx = np.asarray(approximate_kernel(p, x)).reshape(-1)
        fit_rmse.append(float(np.sqrt(np.mean((approx - ks) ** 2))))

    onsets = {"M60": [0.2], "M64": [1.0], "M67": [1.9]}
    sources = [place_notes(notes[k], onsets[k], seconds, fs) for k in notes]
    mix = sum(sources)
    x = (np.arange(len(mix)) / fs).reshape(-1, 1)

    out = {"workload": "sampled-cov (10k windows) + parametric Matern-SM fit "
                       "per pitch on the real MAPS note, then a "
                       f"{seconds:.0f}-s separation with the learned kernels "
                       "vs the fft-init kernels",
           "learn_s": round(learn_s, 2),
           "stage_seconds": stage_timings,
           "lengthscales": [float(np.asarray(v)) for v in params_train[0]],
           "kernel_fit_rmse": [round(v, 4) for v in fit_rmse]}
    for mode, saved in (("train", params_train), ("fft", None)):
        model = SoSp(train_signals=train, train_names=names, fs=fs,
                     mixture=(x, mix), window_size=2001,
                     kernel_mode="load" if saved else "fft",
                     saved_params=saved, max_par=5, num_inducing=112, dec=2)
        model.optimize(maxiter=maxiter, learning_rate=0.01)
        model.predict_s(batch_size=8)
        out[f"rmse_{mode}"] = float(model.compute_rmse(sources))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="shrunken sizes (smoke test)")
    ap.add_argument("--only", choices=["real_audio", "separation",
                                       "separation_lbfgs", "amt",
                                       "amt88_dict", "amt88_dict_reg", "hmc",
                                       "kernel_train"],
                    default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (harness debugging)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        # config update beats the env var (axon sitecustomize force-registers)
        jax.config.update("jax_platforms", "cpu")
    from gpitch_tpu.config import enable_persistent_compilation_cache
    cache_dir = enable_persistent_compilation_cache()
    # provenance is stored PER JOB (ADVICE round 2: a later --cpu/--only run
    # must not relabel stale sections from a different backend)
    provenance = {"backend": jax.default_backend(),
                  "device": jax.devices()[0].device_kind,
                  "x64": bool(jax.config.jax_enable_x64),
                  "compilation_cache": cache_dir}
    report = {}

    jobs = {
        "real_audio": lambda: run_real_audio(steps=500 if args.quick else 10000),
        "separation": lambda: run_separation(
            maxiter=40 if args.quick else 500,
            seconds=2.0 if args.quick else 14.0),
        # window_chunk=64: a 222-window x 1000-step vmapped L-BFGS solve in
        # ONE dispatch is minutes of device time — past the relayed TPU's RPC
        # deadline (the worker crashed mid-matrix without it); chunking is
        # exact (windows are independent solvers)
        "separation_lbfgs": lambda: run_separation(
            maxiter=20 if args.quick else 1000,
            seconds=2.0 if args.quick else 14.0, method="lbfgs",
            mesh_devices=0, window_chunk=None if args.quick else 64),
        "amt": lambda: run_amt(maxiter=40 if args.quick else 1500,
                               seconds=2.0 if args.quick else 10.0),
        "amt88_dict": lambda: run_amt(maxiter=40 if args.quick else 500,
                                      seconds=2.0 if args.quick else 10.0,
                                      dictionary="piano88"),
        "amt88_dict_reg": lambda: run_amt(maxiter=40 if args.quick else 500,
                                          seconds=2.0 if args.quick else 10.0,
                                          dictionary="piano88", reg=True),
        "hmc": lambda: run_hmc(num_samples=20 if args.quick else 400,
                               num_warmup=10 if args.quick else 300,
                               num_chains=2 if args.quick else 4),
        "kernel_train": lambda: run_kernel_train(
            maxiter=30 if args.quick else 300,
            num_sam=500 if args.quick else 10000,
            seconds=2.0 if args.quick else 4.0),
    }
    for name, job in jobs.items():
        if args.only and name != args.only:
            continue
        t0 = time.perf_counter()
        report[name] = job()
        report[name]["wall_s"] = round(time.perf_counter() - t0, 1)
        report[name].update(provenance)
        print(json.dumps({name: report[name]}, indent=1))
        if not args.quick:
            # merge incrementally so partial/`--only` runs update the record;
            # provenance lives inside each job section, so sections from
            # different backends coexist honestly
            merged = {}
            if os.path.exists(OUT_JSON):
                with open(OUT_JSON) as fh:
                    merged = json.load(fh)
            merged = {k: v for k, v in merged.items() if isinstance(v, dict)}
            merged.update(report)
            with open(OUT_JSON, "w") as fh:
                json.dump(merged, fh, indent=1)
            print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
