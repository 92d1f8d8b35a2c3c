"""TPU timing: Pallas fused specmix kernel vs the XLA feature-matmul path.

Round-1 VERDICT item 4: the Pallas kernel existed but was wired into nothing
and never timed on hardware.  This script times both implementations of

    K[i,j] = variance * env(|xi-xj|/l) * sum_p e_p cos(2*pi*f_p*(xi-xj))

at the sizes the framework actually builds (demo SVGP conditionals, windowed
SGPR direct path, AMT-scale predict), in f32 on the default backend.  Results
are committed in docs/PALLAS_SPECMIX.md; the winner is the default for
``gpitch_tpu.kernels.spectral`` (see ``use_pallas`` there).

Usage: python scripts/bench_specmix.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# (label, N, M, P) — the dense covariance builds that exist in the framework
CASES = [
    ("svgp_kuu_demo", 128, 128, 3),          # ModGP Kuu, demo (bench.py)
    ("svgp_kuf_demo", 128, 16000, 3),        # ModGP Kuf full-signal predict
    ("sgpr_kuf_window", 125, 2001, 10),      # direct-path kuf, one window
    ("sgpr_kxx_window", 2001, 2001, 10),     # predict_s kxx, one window
    ("amt_kxx_20p", 2001, 2001, 20),         # AMT: 20 partials
    ("amt_kterms_88x", 2001, 2001, 20, 8),   # batched per-source cross-cov (8 of 88)
]


def main():
    import jax
    import jax.numpy as jnp

    from gpitch_tpu.linalg.pallas.specmix import (specmix_matrix,
                                                  specmix_matrix_xla)
    from gpitch_tpu.utils.profiling import Timer, flops_specmix

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    rows = []
    for case in CASES:
        label, n, m, p = case[0], case[1], case[2], case[3]
        batch = case[4] if len(case) > 4 else 1
        rng = np.random.default_rng(0)
        x = jnp.asarray((np.arange(n) / 16000.0).reshape(-1, 1), jnp.float32)
        x2 = jnp.asarray((np.arange(m) / 16000.0).reshape(-1, 1), jnp.float32)
        energy = jnp.asarray(rng.uniform(0.1, 1.0, (batch, p)), jnp.float32)
        freq = jnp.asarray(rng.uniform(100.0, 4000.0, (batch, p)), jnp.float32)
        var = jnp.asarray(rng.uniform(0.5, 1.5, (batch,)), jnp.float32)
        ls = jnp.asarray(rng.uniform(0.01, 0.1, (batch,)), jnp.float32)

        # eps is a data-dependent scalar threaded by Timer.time_fn_loop so the
        # loop body can't be hoisted/CSE'd; it perturbs variance by ~1e-20.
        def xla_fn(eps, e=energy, f=freq, v=var, l=ls):
            if batch == 1:
                return specmix_matrix_xla(x, x2, e[0], f[0], v[0] + eps, l[0])
            return jax.vmap(lambda ei, fi, vi, li: specmix_matrix_xla(
                x, x2, ei, fi, vi, li))(e, f, v + eps, l)

        def pallas_fn(eps, e=energy, f=freq, v=var, l=ls):
            if batch == 1:
                return specmix_matrix(x, x2, e[0], f[0], v[0] + eps, l[0],
                                      interpret=not on_tpu)
            return jax.vmap(lambda ei, fi, vi, li: specmix_matrix(
                x, x2, ei, fi, vi, li, interpret=not on_tpu))(e, f, v + eps, l)

        # loop enough iterations that per-call amortized dispatch overhead is
        # negligible: the ~27 ms relayed-TPU dispatch spread over the loop
        # must be << the kernel time itself.  fori_loop compile cost does not
        # grow with trip count, so small cases get many iterations (a 400-iter
        # cap left ~67 us/call of overhead dominating sub-GFLOP cases —
        # ADVICE round 2).
        loop_iters = max(10, min(4000, int(2e9 / (4 * n * m * p * batch))))
        t_xla = Timer.time_fn_loop(xla_fn, loop_iters=loop_iters)
        try:
            # correctness guard before timing
            zero = jnp.float32(0.0)
            a = np.asarray(jax.jit(pallas_fn)(zero))
            b = np.asarray(jax.jit(xla_fn)(zero))
            err = float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-30))
            t_pal = Timer.time_fn_loop(pallas_fn, loop_iters=loop_iters)
        except Exception as e:  # pallas lowering may fail off-TPU
            t_pal, err = float("nan"), float("nan")
            print(f"  {label}: pallas failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

        gflop = batch * flops_specmix(n, m, p) / 1e9
        rows.append({
            "case": label, "n": n, "m": m, "p": p, "batch": batch,
            "xla_us": round(t_xla * 1e6, 1),
            "pallas_us": round(t_pal * 1e6, 1),
            "speedup_pallas": round(t_xla / t_pal, 3) if t_pal == t_pal else None,
            "rel_err": err,
            "xla_gflops": round(gflop / t_xla, 1),
        })
        print(json.dumps(rows[-1]))
    print(json.dumps({"backend": backend, "device": jax.devices()[0].device_kind,
                      "rows": rows}))


if __name__ == "__main__":
    main()
