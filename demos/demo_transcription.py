"""Transcription (AMT) demo — the reference AMT pipeline
(/root/reference/gpitch/transcription.py) end-to-end on the TPU-native stack.

A short "piece" of three piano-like notes (C4, E4, G4 at staggered onsets)
is transcribed: per-pitch kernels from isolated training notes, batched
window-bank optimization, per-pitch variance envelopes (matrix_var) as the
pianoroll estimate, frame-level F-measure vs the known ground truth.

Run:  python demos/demo_transcription.py [--seconds 3] [--maxiter 300] [--plot]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIDIS = (60, 64, 67)
ONSETS = (0.0, 1.0, 2.0)
DUR = 0.5  # audible length of each note (s), for ground truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--maxiter", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--max-par", type=int, default=5)
    ap.add_argument("--dec", type=int, default=4)
    ap.add_argument("--num-inducing", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.15)
    ap.add_argument("--model-pitches", type=int, default=len(MIDIS),
                    help="size of the pitch dictionary the model carries "
                         "(3 = only the sounding notes; 88 = full piano, the "
                         "reference AMT setting, transcription.py:30-33)")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    from gpitch_tpu.pipelines import AMT, f_measure
    from gpitch_tpu.audio import synth_piano_note
    from gpitch_tpu.utils import midi2freq

    fs = 16000
    # pitch dictionary: the sounding MIDIS plus (optionally) the rest of the
    # 88-key piano range, as in the reference's 88-pitch MAPS setting
    if args.model_pitches > len(MIDIS):
        extra = [m for m in range(21, 109) if m not in MIDIS]
        model_midis = sorted(list(MIDIS) + extra[:args.model_pitches - len(MIDIS)])
    else:
        model_midis = list(MIDIS)
    train = [synth_piano_note(fs=fs, seconds=2.0, f0=midi2freq(m), seed=m)[1]
             for m in model_midis]
    names = [f"demo_M{m}_train.wav" for m in model_midis]

    notes = [synth_piano_note(fs=fs, seconds=args.seconds, f0=midi2freq(m),
                              onset=o, noise=0.0, seed=200 + m)[1]
             for m, o in zip(MIDIS, ONSETS)]
    n = notes[0].shape[0]
    x = np.linspace(0.0, (n - 1.0) / fs, n).reshape(-1, 1)
    rng = np.random.default_rng(0)
    y = sum(notes) / 3.0 + 1e-3 * rng.standard_normal(x.shape)

    t0 = time.perf_counter()
    model = AMT(train_signals=train, train_names=names, fs=fs, test=(x, y),
                pitches=model_midis, kernel_mode="fft", max_par=args.max_par,
                dec=args.dec, num_inducing=args.num_inducing)
    print(f"built {model.nwin}-window bank in {time.perf_counter() - t0:.1f}s "
          f"({len(model_midis)}-pitch dictionary)")

    losses, (compile_s, run_s) = model.optimize(maxiter=args.maxiter,
                                                learning_rate=args.lr,
                                                timed=True)
    losses = np.asarray(losses)
    print(f"{args.maxiter} bank Adam steps: compile {compile_s:.1f}s, "
          f"run {run_s*1e3:.1f}ms ({args.maxiter/run_s:.0f} steps/s over "
          f"{model.nwin} windows), loss {losses[0]:.1f} -> {losses[-1]:.1f}")
    print(f"throughput: {args.seconds * args.maxiter / run_s:.0f} "
          f"audio-seconds optimized per second")

    # ground-truth roll at window centers (silent rows for non-sounding pitches)
    hop = (model.window_size - 1) // 2
    centers = (np.arange(model.nwin) * hop + model.window_size // 2) / fs
    onset_of = dict(zip(MIDIS, ONSETS))
    ref = np.stack([(centers >= onset_of[m]) & (centers <= onset_of[m] + DUR)
                    if m in onset_of else np.zeros_like(centers, dtype=bool)
                    for m in model_midis])
    # per-pitch row normalization amplifies noise on silent rows; use the
    # global scale when the dictionary is larger than the sounding set
    est = model.pianoroll_estimate(threshold=args.threshold,
                                   per_pitch=len(model_midis) == len(MIDIS))
    p, r, f = f_measure(est, ref)
    print(f"frame-level precision {p:.3f}  recall {r:.3f}  F-measure {f:.3f}")

    if args.plot:
        from gpitch_tpu.viz import plot_pianoroll
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 1, figsize=(12, 6))
        win_fs = 1.0 / (hop / fs)
        for ax, mat, title in ((axes[0], model.matrix_var, "variance envelope"),
                               (axes[1], est, "pianoroll estimate")):
            ax.imshow(np.asarray(mat), aspect="auto", origin="lower",
                      extent=[0, model.nwin / win_fs, 0, len(model_midis)])
            if len(model_midis) <= 12:
                ax.set_yticks(np.arange(len(model_midis)) + 0.5)
                ax.set_yticklabels([str(m) for m in model_midis])
            ax.set_title(title)
        axes[1].set_xlabel("time (s)")
        fig.savefig("demo-transcription.png", dpi=100)
        print("saved demo-transcription.png")


if __name__ == "__main__":
    main()
