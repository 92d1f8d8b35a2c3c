"""Profile the separation prediction path (round-3 VERDICT weak #2).

QUALITY_r03: 222-window predict_s cost 24.2 s vs 10.0 s optimize at ~0.1% MFU.
This script isolates where the time goes at exactly the quality shapes
(nw=222, ws=2001, M=112, S=3 sources x 5 partials):

  * per-chunk stage costs: Gram build, Cholesky, triangular inverse,
    per-source cross-cov + GEMM chain;
  * the window batch-size lever (latency-bound batched linalg amortizes);
  * end-to-end predict_bank_sources across variants.

Usage: python scripts/profile_predict.py [--nw 222]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_bank(nw: int, ws: int = 2001, m: int = 112, fs: float = 16000.0,
               max_par: int = 5):
    from gpitch_tpu.kernels import MercerMatern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (build_window_bank,
                                                    pad_inducing, sum_kernel)

    rng = np.random.default_rng(0)
    hop = (ws - 1) // 2
    xw = np.stack([(np.arange(ws) + i * hop) / fs for i in range(nw)])
    xw = xw.reshape(nw, ws, 1)
    yw = rng.standard_normal((nw, ws, 1)) * 0.1
    z = pad_inducing([xw[i, :: ws // m, 0].reshape(-1, 1)[:m]
                      for i in range(nw)], m, grid_dt=1.0 / fs)

    def builder():
        kerns = []
        for i in range(3):
            f0 = 261.6 * 2 ** (i * 4 / 12)
            freqs = f0 * np.arange(1, max_par + 1)
            energy = 1.0 / np.arange(1, max_par + 1)
            kerns.append(MercerMatern12sm.create(1.0, 0.5, energy, freqs))
        return sum_kernel(kerns)

    return build_window_bank(xw, yw, z, builder, grid_dt=1.0 / fs), xw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nw", type=int, default=222)
    ap.add_argument("--stages", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gpitch_tpu.linalg.ops import safe_chol_inv
    from gpitch_tpu.pipelines.windowed_sgpr import predict_bank_sources
    from gpitch_tpu.utils.profiling import Timer

    print(f"backend={jax.default_backend()} dev={jax.devices()[0].device_kind}",
          flush=True)
    bank, xw = build_bank(args.nw)
    nw, ws = xw.shape[0], xw.shape[1]

    # ---- stage costs on one window batch ------------------------------------
    def chunk(bs):
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x[:bs]), bank)

    for bs in (8, 32):
        c = chunk(bs)
        x = c.X.value  # (bs, ws, 1) already centered

        def gram(c=c, x=x):
            return jax.vmap(lambda m, xx: m.kern.K(xx))(c, x)

        K = jax.jit(gram)()
        K.block_until_ready()
        t_gram = Timer.time_fn(jax.jit(gram), iters=5, warmup=1)

        Ky = K + 1.0 * jnp.eye(ws)

        t_chol = Timer.time_fn(jax.jit(jnp.linalg.cholesky), Ky, iters=3,
                               warmup=1)
        t_cholinv = Timer.time_fn(jax.jit(lambda A: safe_chol_inv(A, 1e-6)),
                                  Ky, iters=3, warmup=1)
        L = jnp.linalg.cholesky(Ky)
        Linv = safe_chol_inv(Ky, 1e-6)[1]

        # per-source GEMM chain: A_i = Linv @ K_i  (the N^3 matmuls)
        def gemms(Linv=Linv, K=K):
            A = Linv @ K  # stand-in for one source's (ws, ws) GEMM
            return jnp.sum(A * A, axis=-2)

        t_gemm = Timer.time_fn(jax.jit(gemms), iters=5, warmup=1)

        # triangular solve against K directly (the alternative to chol_inv)
        import jax.scipy.linalg as jsl
        t_solve = Timer.time_fn(
            jax.jit(lambda L, K: jsl.solve_triangular(L, K, lower=True)),
            L, K, iters=3, warmup=1)

        n_chunks = -(-nw // bs)
        print(f"\n-- batch {bs} (x{n_chunks} chunks to cover {nw} windows) --")
        for name, t in (("gram build (S-sum)", t_gram),
                        ("cholesky", t_chol),
                        ("chol+tri_inv", t_cholinv),
                        ("one (ws,ws) GEMM+sq", t_gemm),
                        ("tri_solve vs K", t_solve)):
            print(f"  {name:22s} {t * 1e3:9.1f} ms/chunk "
                  f"-> {t * n_chunks:6.2f} s total", flush=True)

    # ---- end-to-end predict at two window batch sizes -----------------------
    for bs in (8, 32):
        t0 = time.perf_counter()
        sm, sv = predict_bank_sources(bank, xw, batch_size=bs)
        float(jnp.sum(sm))  # host fence
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        sm, sv = predict_bank_sources(bank, xw, batch_size=bs)
        float(jnp.sum(sm))
        second = time.perf_counter() - t0
        print(f"predict_bank_sources bs={bs:3d}: first={first:7.2f}s "
              f"steady={second:7.2f}s", flush=True)


if __name__ == "__main__":
    main()
