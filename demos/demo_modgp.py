"""Synthetic modulated-GP demo — the reference's end-to-end smoke test
(/root/reference/demos/scripts/demo-modgp.py) on the TPU-native stack.

Generates a 3-harmonic component modulated by a two-bump envelope, fits the
single-source ModGP with minibatch Adam (whole loop in one jit), predicts, and
saves demo-modgp.png.

Run:  python demos/demo_modgp.py  [--steps 1000] [--n 16000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--n", type=int, default=16000)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--minibatch", type=int, default=100)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import gpitch_tpu as gt
    from gpitch_tpu.kernels import Matern32, MercerMatern12sm
    from gpitch_tpu.models import ModGP, fit_adam_timed, minibatch_fn
    from gpitch_tpu.pipelines import init_liv

    # data generation (reference demo lines 19-26)
    n, fs = args.n, 16000
    x = np.linspace(0.0, (n - 1.0) / fs, n).reshape(-1, 1)
    component = sum(np.sin(2 * np.pi * x * (k + 1) * 15.0) for k in range(3))
    component /= np.max(np.abs(component))
    envelope = np.exp(-25 * (x - 0.33) ** 2) + np.exp(-75 * (x - 0.66) ** 2)
    envelope /= np.max(np.abs(envelope))
    rng = np.random.default_rng(0)
    y = component * envelope + np.sqrt(1e-6) * rng.standard_normal((n, 1))

    # extrema inducing points (line 29)
    z, u = init_liv(x=x, y=y, win_size=31, thres=0.05, dec=1)

    # kernels (lines 32-36)
    kact = Matern32.create(variance=1.0, lengthscales=1.0)
    kcom = MercerMatern12sm.create(energy=[1.0, 1.0, 1.0],
                                   frequency=[15.0, 30.0, 45.0])

    model = ModGP.create(z=z, kern=[[kact], [kcom]])
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    model, losses, compile_s, run_s = fit_adam_timed(
        model, lambda m, xb, yb: m.loss(xb, yb, num_data=n),
        num_steps=args.steps, learning_rate=args.lr,
        batch_fn=minibatch_fn(xj, yj, args.minibatch))
    elbo = -float(losses[-1]) if args.steps > 0 else float("nan")
    print(f"{args.steps} Adam steps: compile {compile_s:.1f}s, run {run_s:.2f}s "
          f"({args.steps/run_s:.0f} steps/s), ELBO {elbo:.1f}")

    # prediction (lines 48-49)
    xtest = jnp.asarray(x[::4].copy())
    results = model.predict_act_n_com(xtest)
    m_src = np.asarray(results[4])
    rmse = np.sqrt(np.mean((m_src[:, 0:1] - (component * envelope)[::4]) ** 2))
    print(f"source recovery RMSE: {rmse:.4f}")

    if args.plot:
        from gpitch_tpu.viz import plot_pdgp
        fig = plot_pdgp(x, y, np.asarray(xtest), results,
                        z=(z[0][0], z[1][0]))
        fig.savefig("demo-modgp.png", dpi=100)
        print("saved demo-modgp.png")


if __name__ == "__main__":
    main()
