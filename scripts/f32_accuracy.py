"""f32 accuracy study: lag-table (grid) vs direct SGPRSS covariance paths.

VERDICT round 1 flagged that the grid and direct paths disagree by ~0.65% in
f32 without establishing which one is *accurate*.  This script measures both
against f64 truth on a reference-scale window (ws=2001) placed LATE in a
recording (t0 ~ 13 s, the hard case for f32), at fs=16 kHz (separation,
/root/reference/gpitch/separation.py:92-99) and fs=44.1 kHz (AMT,
transcription.py:56).

Error sources it isolates:
* direct path: r = |x - x'| loses ~log2(t0/ws_seconds) bits to cancellation at
  absolute times t0 >> window length, and cos(2*pi*f*x) is evaluated at huge
  arguments (f ~ kHz, x ~ 10 s => 1e5 rad, f32 ulp ~ 1e-2 rad);
* grid path: lags are exact small integers, r = lag/fs exact to 1 ulp, and the
  cosine arguments stay < 2*pi*f*ws/fs ~ 1e3 rad.

Usage:
    python scripts/f32_accuracy.py            # runs both dtypes per fs, prints a table
    python scripts/f32_accuracy.py --inner 16000 {f32|f64}   # one measurement (JSON)

Results are committed in docs/F32_ACCURACY.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_fixture(fs: float):
    import jax.numpy as jnp
    import numpy as np

    from gpitch_tpu.kernels import Matern12sm, StackedSum
    from gpitch_tpu.models.sgpr import SGPRSS

    ws = 2001
    t0_samples = int(13.0 * fs)  # window starts 13 s into the piece
    x = ((t0_samples + np.arange(ws)) / fs).reshape(-1, 1)

    f0s = [261.63, 329.63, 392.0]                      # C4/E4/G4
    n_par = 5 if fs <= 20000 else 10
    rng = np.random.default_rng(7)
    sig = sum(np.exp(-0.5 * k) * np.cos(2 * np.pi * f0 * (k + 1) * x)
              for f0 in f0s for k in range(3))
    y = 0.2 * sig + 0.01 * rng.standard_normal((ws, 1))

    z = x[::16][:125]

    def kern():
        return StackedSum.create([
            Matern12sm.create(1.0, 0.05,
                              [float(np.exp(-0.4 * k)) for k in range(n_par)],
                              [f0 * (k + 1) for k in range(n_par)],
                              train_energy=True, train_frequency=False)
            for f0 in f0s])

    # x/z stay f64 numpy into SGPRSS.create (as the pipelines do): the f32
    # contrast must come from the model computation, not corrupted inputs
    return x, jnp.asarray(y), z, kern


def measure(fs: float):
    """ELBO, trainable-gradient vector, and predict_s mean for both paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpitch_tpu.core.params import zero_untrainable_grads
    from gpitch_tpu.models.sgpr import SGPRSS

    x, y, z, kern = build_fixture(fs)
    out = {}
    for name, kw in [("direct_uncentered", {"center": False}),
                     ("direct", {}),
                     ("grid", {"grid_dt": 1.0 / fs})]:
        m = SGPRSS.create(x, y, kern(), Z=np.asarray(z), noise_variance=0.1, **kw)
        elbo = float(m.elbo())
        g = zero_untrainable_grads(jax.grad(lambda mdl: mdl.loss())(m))
        gvec = jnp.concatenate([jnp.ravel(l) for l in jax.tree_util.tree_leaves(g)])
        # center Xnew on host in f64, exactly as predict_bank_sources does
        xc = jnp.asarray(np.asarray(x[:256], dtype=np.float64)
                         - float(m.x0.value))
        means, _ = m.predict_s(xc, pre_centered=True)
        out[name] = {
            "elbo": elbo,
            "grad": np.asarray(gvec, dtype=np.float64).tolist(),
            "mean0": np.asarray(means[0][:, 0], dtype=np.float64).tolist(),
        }
    return out


def run_inner():
    fs = float(sys.argv[2])
    dtype = sys.argv[3]
    import jax
    # the axon sitecustomize force-registers the TPU backend via
    # jax.config.update("jax_platforms", ...), which beats the env var —
    # pin CPU the same way (this is a CPU f64-truth study by design)
    jax.config.update("jax_platforms", "cpu")
    if dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    print(json.dumps(measure(fs)))


def rel_err(a, b):
    import numpy as np
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-300))


def run_outer():
    import numpy as np

    env = dict(os.environ, JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    report = {}
    for fs in (16000.0, 44100.0):
        res = {}
        for dtype in ("f64", "f32"):
            p = subprocess.run(
                [sys.executable, __file__, "--inner", str(fs), dtype],
                capture_output=True, text=True, env=env, check=True)
            res[dtype] = json.loads(p.stdout.strip().splitlines()[-1])
        truth = res["f64"]["direct"]
        # sanity: both f64 paths agree (same math, exact-arithmetic identity)
        assert rel_err(res["f64"]["grid"]["elbo"], truth["elbo"]) < 1e-9
        rows = {}
        for path in ("direct_uncentered", "direct", "grid"):
            f32 = res["f32"][path]
            rows[path] = {
                "elbo_rel_err": rel_err(f32["elbo"], truth["elbo"]),
                "grad_rel_err": rel_err(f32["grad"], truth["grad"]),
                "mean0_rel_err": rel_err(f32["mean0"], truth["mean0"]),
            }
        report[f"fs={int(fs)}"] = rows
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--inner":
        run_inner()
    else:
        run_outer()
