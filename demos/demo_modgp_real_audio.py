"""Real-audio modulated-GP demo — the reference's
demos/notebooks/demo_modgp-real-audio.ipynb flow on the TPU-native stack.

Loads a 2-second isolated piano note (or synthesizes a realistic piano-like
note when no WAV is given), learns the component-kernel partials from the FFT
(init_cparam), places inducing points at signal extrema (dec=9), and fits the
single-source ModGP with minibatch Adam — the whole loop in one jit — then
predicts activation/component posteriors and saves a 3-panel figure.

Run:  python demos/demo_modgp_real_audio.py [--wav file.wav] [--midi 60]
      [--steps 2000] [--partials 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", type=str, default=None,
                    help="isolated-note WAV file; synthetic note if omitted")
    ap.add_argument("--midi", type=int, default=60)
    ap.add_argument("--frames", type=int, default=32000)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=0.0025)
    ap.add_argument("--minibatch", type=int, default=100)
    ap.add_argument("--partials", type=int, default=5)
    ap.add_argument("--dec", type=int, default=9,
                    help="inducing-point decimation (notebook cell 6)")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    from gpitch_tpu.audio import init_cparam, readaudio, synth_piano_note
    from gpitch_tpu.kernels import Matern32, MercerMatern12sm
    from gpitch_tpu.models import (ModGP, fit_adam_timed, minibatch_fn,
                                   predict_windowed)
    from gpitch_tpu.pipelines import init_liv
    from gpitch_tpu.utils import midi2freq

    f0 = midi2freq(args.midi)
    if args.wav:
        x, y, fs = readaudio(args.wav, frames=args.frames, scaled=True)
        print(f"loaded {args.wav}: {y.shape[0]} samples @ {fs} Hz")
    else:
        fs = 16000
        x, y = synth_piano_note(fs=fs, seconds=args.frames / fs, f0=f0)
        print(f"synthesized piano-like note: {y.shape[0]} samples @ {fs} Hz, "
              f"f0 {f0:.1f} Hz")
    n = y.shape[0]

    # component-kernel features from the FFT (notebook cell 5 / init_cparam)
    freqs, energies, F, S, _ = init_cparam(y, fs=fs, maxh=args.partials,
                                           ideal_f0=f0)
    print("partials (Hz):", np.round(freqs, 1).tolist())

    # inducing points at signal extrema, decimated (notebook cell 6)
    z, _ = init_liv(x=x, y=y, win_size=31, thres=0.05, dec=args.dec)

    kact = Matern32.create(variance=3.5, lengthscales=0.2)
    kcom = MercerMatern12sm.create(variance=1.0, lengthscales=0.5,
                                   energy=energies, frequency=freqs)
    model = ModGP.create(z=z, kern=[[kact], [kcom]])
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    model, losses, compile_s, run_s = fit_adam_timed(
        model, lambda m, xb, yb: m.loss(xb, yb, num_data=n),
        num_steps=args.steps, learning_rate=args.lr,
        batch_fn=minibatch_fn(xj, yj, args.minibatch))
    losses = np.asarray(losses)
    print(f"{args.steps} Adam steps: compile {compile_s:.1f}s, run {run_s:.2f}s "
          f"({args.steps/run_s:.0f} steps/s), "
          f"ELBO {-losses[-1]:.1f} (start {-losses[0]:.1f})")

    # windowed prediction over the full signal (pdgp.py:17-44 equivalent)
    results = predict_windowed(model, xj, ws=1600)
    m_src = np.asarray(results[4])
    rmse = np.sqrt(np.mean((m_src[:, 0:1] - y) ** 2))
    print(f"reconstruction RMSE: {rmse:.4f}")

    if args.plot:
        from gpitch_tpu.viz import plot_pdgp
        fig = plot_pdgp(x, y, x, results, z=(z[0][0], z[1][0]))
        fig.savefig("demo-modgp-real-audio.png", dpi=100)
        print("saved demo-modgp-real-audio.png")


if __name__ == "__main__":
    main()
