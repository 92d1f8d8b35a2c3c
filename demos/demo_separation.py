"""Source-separation demo — the reference SoSp pipeline
(/root/reference/gpitch/separation.py) end-to-end on the TPU-native stack.

Three isolated piano-like notes (C4/E4/G4) act as training recordings; the
test mixture is the sum of three fresh takes with different onsets.  Per-pitch
spectral-mixture kernels are initialized from the training FFTs, the whole
window bank optimizes in parallel on device (replacing the reference's
sequential per-window L-BFGS loop), per-source posteriors are Hann
overlap-add merged, and RMSE vs the known sources is reported.

Run:  python demos/demo_separation.py [--seconds 3] [--maxiter 300] [--plot]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIDIS = (60, 64, 67)        # C4, E4, G4 — the reference's _C_/_E_/_G_ trio
ONSETS = (0.0, 0.8, 1.6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--maxiter", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--max-par", type=int, default=5)
    ap.add_argument("--dec", type=int, default=4)
    ap.add_argument("--num-inducing", type=int, default=64)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    from gpitch_tpu.audio import synth_piano_note
    from gpitch_tpu.pipelines import SoSp
    from gpitch_tpu.utils import midi2freq

    fs = 16000
    # isolated training notes (2 s each) + mixture of fresh takes
    train = [synth_piano_note(fs=fs, seconds=2.0, f0=midi2freq(m), seed=m)[1]
             for m in MIDIS]
    names = [f"demo_M{m}_train.wav" for m in MIDIS]

    sources = [synth_piano_note(fs=fs, seconds=args.seconds, f0=midi2freq(m),
                                onset=o, noise=0.0, seed=100 + m)[1]
               for m, o in zip(MIDIS, ONSETS)]
    x = np.linspace(0.0, (sources[0].shape[0] - 1.0) / fs,
                    sources[0].shape[0]).reshape(-1, 1)
    rng = np.random.default_rng(0)
    mix = sum(sources) / 3.0 + 1e-3 * rng.standard_normal(x.shape)
    sources = [s / 3.0 for s in sources]

    t0 = time.perf_counter()
    model = SoSp(train_signals=train, train_names=names, fs=fs,
                 mixture=(x, mix), kernel_mode="fft", max_par=args.max_par,
                 dec=args.dec, num_inducing=args.num_inducing)
    print(f"built {model.nwin}-window bank in {time.perf_counter() - t0:.1f}s "
          f"({model.num_pitches} pitches, M={model.z.shape[1]})")

    losses, (compile_s, run_s) = model.optimize(maxiter=args.maxiter,
                                                learning_rate=args.lr,
                                                timed=True)
    losses = np.asarray(losses)
    print(f"{args.maxiter} bank Adam steps: compile {compile_s:.1f}s, "
          f"run {run_s*1e3:.1f}ms ({args.maxiter/run_s:.0f} steps/s over "
          f"{model.nwin} windows), loss {losses[0]:.1f} -> {losses[-1]:.1f}")
    audio_s = args.seconds * args.maxiter / run_s
    print(f"throughput: {audio_s:.0f} audio-seconds optimized per second")

    model.predict_s()
    rmse = model.compute_rmse(sources)
    print(f"mean per-source RMSE: {rmse:.4f}")

    if args.plot:
        from gpitch_tpu.viz import plot_sources_all
        fig = plot_sources_all(x, mix, [e[0] for e in model.esource],
                               sources=sources)
        fig.savefig("demo-separation.png", dpi=100)
        print("saved demo-separation.png")


if __name__ == "__main__":
    main()
