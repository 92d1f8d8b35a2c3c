"""Measured CPU TensorFlow baseline for the >=10x-vs-CPU-GPflow target.

gpflow itself is not installable in this environment (zero egress), but the
reference delegates ALL its numerics to TF ops (SURVEY.md section 0:
tf.cholesky, tf.matrix_triangular_solve, tf.matmul via GPflow 0.x); this
script re-implements the reference's per-step computation with those same TF
ops on CPU, at the same workload shapes as bench.py, and measures steps/s:

1. svgp step — the modulated-GP minibatch ELBO step of Pdgp/ModLik
   (reference pdgp.py:133-170, likelihoods.py:152-179): whitened conditional
   per (act, com) bank, 20-point Gauss-Hermite expectations, Adam update.
   The spectral-mixture kernel is built with the reference's per-partial
   broadcast-op loop (kernels.py:244-246), not our vectorized form.
2. sgpr window bound — the collapsed Titsias bound of SGPRSS
   (sgpr_ss.py:29-71) + gradient for ONE window (the reference optimizes
   windows sequentially, separation.py:289).

Notes for honest comparison: this is TF2 tf.function graph execution, which
replaces the reference's TF1 session loop (same kernels, lower Python
overhead per step — favorable to the baseline).  jit_compile (XLA-CPU) is
reported separately; the reference never used XLA.

Run: python scripts/baseline_cpu_tf.py  (CPU only; writes one JSON line)
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # keep jax (if imported) off TPU

import numpy as np


def build_svgp_step(tf, jit_compile=False, n=16000, m=128, minibatch=100,
                    p=3, h=20):
    f64 = tf.float64  # reference runs float64 (pdgp.py:172 AutoFlow sigs)
    rng = np.random.default_rng(0)
    x = np.linspace(0.0, (n - 1.0) / 16000.0, n).reshape(-1, 1)
    y = np.sin(2 * np.pi * 440 * x) * np.exp(-((x - 0.5) ** 2) * 20) \
        + 0.01 * rng.standard_normal((n, 1))
    z = x[:: n // m][:m]

    xt = tf.constant(x, f64)
    yt = tf.constant(y, f64)
    zt = tf.constant(z, f64)

    # trainables, mirroring Pdgp init (pdgp.py:92-111) + kernel hypers
    va = {
        "q_mu_a": tf.Variable(tf.zeros((m, 1), f64)),
        "q_sqrt_a": tf.Variable(tf.eye(m, dtype=f64)),
        "q_mu_c": tf.Variable(tf.zeros((m, 1), f64)),
        "q_sqrt_c": tf.Variable(tf.eye(m, dtype=f64)),
        "log_noise": tf.Variable(tf.constant(-2.0, f64)),
        "log_ls_a": tf.Variable(tf.constant(0.0, f64)),
        "log_var_a": tf.Variable(tf.constant(1.0, f64)),
        "log_ls_c": tf.Variable(tf.constant(-2.0, f64)),
        "log_var_c": tf.Variable(tf.constant(0.0, f64)),
        # per-partial energies/frequencies (trainable, like MercerMatern12sm)
        "log_e": tf.Variable(tf.zeros((p,), f64)),
        "log_f": tf.Variable(tf.constant(np.log(440.0 * np.arange(1, p + 1)), f64)),
    }
    gh_x, gh_w = np.polynomial.hermite.hermgauss(h)
    gh_xt = tf.constant(gh_x, f64)
    gh_wt = tf.constant(gh_w / np.sqrt(np.pi), f64)
    jitter = 1e-6

    def sqdist(a, b):
        return (tf.reduce_sum(a * a, 1)[:, None]
                + tf.reduce_sum(b * b, 1)[None, :] - 2.0 * a @ tf.transpose(b))

    def k_matern32(a, b, ls, var):
        r = tf.sqrt(tf.maximum(sqdist(a, b), 1e-36)) / ls
        return var * (1.0 + np.sqrt(3.0) * r) * tf.exp(-np.sqrt(3.0) * r)

    def k_specmix(a, b, ls, var, e, f):
        # the reference's per-partial loop (kernels.py:244-246)
        r = tf.abs(a - tf.transpose(b))
        out = tf.zeros_like(r)
        for i in range(p):
            out = out + e[i] * tf.cos(2.0 * np.pi * f[i] * r)
        return var * tf.exp(-r / ls) * out

    def conditional(kfn, xb, q_mu, q_sqrt):
        kuu = kfn(zt, zt) + jitter * tf.eye(m, dtype=f64)
        kuf = kfn(zt, xb)
        L = tf.linalg.cholesky(kuu)
        A = tf.linalg.triangular_solve(L, kuf, lower=True)
        mean = tf.transpose(A) @ q_mu
        sq = tf.linalg.band_part(q_sqrt, -1, 0)
        LTA = tf.transpose(sq) @ A
        kdiag = kfn(xb[:1], xb[:1])[0, 0]
        var = kdiag - tf.reduce_sum(A * A, 0) + tf.reduce_sum(LTA * LTA, 0)
        return mean[:, 0], var

    def kl(q_mu, q_sqrt):
        sq = tf.linalg.band_part(q_sqrt, -1, 0)
        logdet = 2.0 * tf.reduce_sum(tf.math.log(tf.abs(tf.linalg.diag_part(sq))))
        return 0.5 * (tf.reduce_sum(q_mu * q_mu) + tf.reduce_sum(sq * sq)
                      - float(m) - logdet)

    opt = tf.keras.optimizers.Adam(0.005)

    def step_fn(xb, yb):
        with tf.GradientTape() as tape:
            ls_a, var_a = tf.exp(va["log_ls_a"]), tf.exp(va["log_var_a"])
            ls_c, var_c = tf.exp(va["log_ls_c"]), tf.exp(va["log_var_c"])
            e, f = tf.exp(va["log_e"]), tf.exp(va["log_f"])
            noise = tf.exp(va["log_noise"])
            ka = lambda A, B: k_matern32(A, B, ls_a, var_a)
            kc = lambda A, B: k_specmix(A, B, ls_c, var_c, e, f)
            mg, vg = conditional(ka, xb, va["q_mu_a"], va["q_sqrt_a"])
            mf, vf = conditional(kc, xb, va["q_mu_c"], va["q_sqrt_c"])
            # ModLik var-exp via 1-D GH (likelihoods.py:152-179)
            g = mg[:, None] + tf.sqrt(2.0 * tf.maximum(vg, 1e-12))[:, None] * gh_xt
            sg = 1.0 / (1.0 + tf.exp(-2.0 * (g - np.pi)))
            e1 = tf.reduce_sum(gh_wt * sg, 1)
            e2 = tf.reduce_sum(gh_wt * sg * sg, 1)
            yb0 = yb[:, 0]
            esq = (yb0 * yb0 - 2.0 * yb0 * e1 * mf + e2 * (vf + mf * mf))
            varexp = -0.5 * tf.math.log(2.0 * np.pi * noise) - esq / (2.0 * noise)
            scale = float(n) / float(minibatch)
            elbo = (scale * tf.reduce_sum(varexp)
                    - kl(va["q_mu_a"], va["q_sqrt_a"])
                    - kl(va["q_mu_c"], va["q_sqrt_c"]))
            loss = -elbo
        tvars = list(va.values())
        grads = tape.gradient(loss, tvars)
        opt.apply_gradients(zip(grads, tvars))
        return loss

    step = tf.function(step_fn, jit_compile=jit_compile)
    rng2 = np.random.default_rng(1)

    def run(num_steps):
        last = None
        for _ in range(num_steps):
            idx = rng2.integers(0, n, minibatch)
            last = step(tf.constant(x[idx], f64), tf.constant(y[idx], f64))
        return float(last)

    return run


def build_sgpr_window_step(tf, jit_compile=False, n=2001, m=112, s=3, p=5):
    """One window of the separation bound (sgpr_ss.py:29-71) + grads."""
    f64 = tf.float64
    rng = np.random.default_rng(0)
    x = (np.arange(n) / 16000.0).reshape(-1, 1)
    y = rng.standard_normal((n, 1)) * 0.3
    z = x[:: n // m][:m]
    xt, yt, zt = (tf.constant(v, f64) for v in (x, y, z))

    va = {
        "log_noise": tf.Variable(tf.constant(-2.0, f64)),
        "log_ls": tf.Variable(tf.zeros((s,), f64) - 2.0),
        "log_var": tf.Variable(tf.zeros((s,), f64)),
        "log_e": tf.Variable(tf.zeros((s, p), f64)),
    }
    freqs = tf.constant(261.0 * np.outer(2.0 ** (np.arange(s) * 4 / 12.0),
                                         np.arange(1, p + 1)), f64)
    jitter = 1e-6
    opt = tf.keras.optimizers.Adam(0.01)

    def kern(a, b):
        r = tf.abs(a - tf.transpose(b))
        total = tf.zeros_like(r)
        ls, var, e = tf.exp(va["log_ls"]), tf.exp(va["log_var"]), tf.exp(va["log_e"])
        for i in range(s):  # per-pitch sum (np.sum(kern_pitches), separation.py:257)
            mix = tf.zeros_like(r)
            for j in range(p):  # per-partial loop, reference style
                mix = mix + e[i, j] * tf.cos(2.0 * np.pi * freqs[i, j] * r)
            total = total + var[i] * tf.exp(-r / ls[i]) * mix
        return total

    def step_fn():
        with tf.GradientTape() as tape:
            sigma2 = tf.exp(va["log_noise"])
            kuf = kern(zt, xt)
            kuu = kern(zt, zt) + jitter * tf.eye(m, dtype=f64)
            L = tf.linalg.cholesky(kuu)
            A = tf.linalg.triangular_solve(L, kuf, lower=True) / tf.sqrt(sigma2)
            B = A @ tf.transpose(A) + tf.eye(m, dtype=f64)
            LB = tf.linalg.cholesky(B)
            Aerr = A @ yt
            c = tf.linalg.triangular_solve(LB, Aerr, lower=True) / tf.sqrt(sigma2)
            kdiag = kern(xt[:1], xt[:1])[0, 0] * tf.cast(n, f64)
            bound = (-0.5 * n * np.log(2 * np.pi)
                     - tf.reduce_sum(tf.math.log(tf.linalg.diag_part(LB)))
                     - 0.5 * n * tf.math.log(sigma2)
                     - 0.5 * tf.reduce_sum(yt * yt) / sigma2
                     + 0.5 * tf.reduce_sum(c * c)
                     - 0.5 * kdiag / sigma2
                     + 0.5 * tf.linalg.trace(A @ tf.transpose(A)))
            loss = -bound
        tvars = list(va.values())
        grads = tape.gradient(loss, tvars)
        opt.apply_gradients(zip(grads, tvars))
        return loss

    step = tf.function(step_fn, jit_compile=jit_compile)

    def run(num_steps):
        last = None
        for _ in range(num_steps):
            last = step()
        return float(last)

    return run


def timeit(run, steps):
    run(3)  # trace + warmup
    t0 = time.perf_counter()
    run(steps)
    return steps / (time.perf_counter() - t0)


def main():
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")

    out = {"tf_version": tf.__version__, "device": "cpu",
           "note": "reference-equivalent TF ops (gpflow not installable); "
                   "TF2 tf.function graphs, f64, per-partial kernel loops "
                   "as in reference kernels.py:244-246"}

    svgp = build_svgp_step(tf, jit_compile=False)
    out["svgp_steps_per_s"] = round(timeit(svgp, 60), 2)
    svgp_x = build_svgp_step(tf, jit_compile=True)
    out["svgp_steps_per_s_xla_cpu"] = round(timeit(svgp_x, 60), 2)

    sgpr = build_sgpr_window_step(tf, jit_compile=False)
    out["sgpr_window_steps_per_s"] = round(timeit(sgpr, 40), 2)
    sgpr_x = build_sgpr_window_step(tf, jit_compile=True)
    out["sgpr_window_steps_per_s_xla_cpu"] = round(timeit(sgpr_x, 40), 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
