"""Hardware verification of the Pallas batched Cholesky (linalg/pallas/chol).

The kernel's failure modes are TPU-lowering-specific (interpret mode cannot
catch them — round 4 found lane-offset slab slices miscompiling at m=64 and
selection-matrix panel extraction silently truncating through the MXU's bf16
multiply), so this script is the device-side regression: run it on real TPU
hardware after touching the kernel.

Checks, per size in the production range: no NaNs and relative error vs XLA
< 1e-5 on well-conditioned random batches, plus an ill-conditioned
near-duplicate-inducing-point Gram (the demo-separation matrix class that
exposed the m=64 miscompile).

Usage: python scripts/verify_pallas_chol.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ill_conditioned_gram(m: int) -> np.ndarray:
    """Near-duplicate-row spectral Gram like pad_inducing produces."""
    t = np.sort(np.r_[np.linspace(0, 0.04, m - m // 4),
                      np.linspace(0, 0.04, m - m // 4)[: m // 4] + 1e-4])
    r = np.abs(t[:, None] - t[None, :])
    k = np.exp(-r / 0.1) * sum(np.cos(2 * np.pi * 261.0 * (p + 1) * r) / (p + 1)
                               for p in range(5))
    return (k + 1e-4 * np.eye(m)).astype(np.float32)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gpitch_tpu.linalg.pallas.chol import cholesky_batched

    rng = np.random.default_rng(0)
    failures = 0
    for m in (48, 64, 96, 112, 128, 160, 224):
        A = rng.standard_normal((8, m, m)).astype(np.float32) * 0.1
        cases = {
            "random": A @ np.swapaxes(A, 1, 2) + np.eye(m, dtype=np.float32) * m,
            "ill": np.broadcast_to(ill_conditioned_gram(m), (8, m, m)).copy(),
        }
        for tag, K in cases.items():
            K = jnp.asarray(K)
            Lx = np.asarray(jnp.linalg.cholesky(K))
            Lp = np.asarray(cholesky_batched(K))
            tol = 1e-5 if tag == "random" else 5e-4
            nan = bool(np.isnan(Lp).any())
            err = float(np.nanmax(np.abs(Lp - Lx)) / np.nanmax(np.abs(Lx)))
            ok = (not nan) and err < tol
            failures += 0 if ok else 1
            print(f"m={m:4d} {tag:6s}: nan={nan} relerr={err:.2e} "
                  f"{'OK' if ok else 'FAIL'}", flush=True)
    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
