"""Attribute windowed-SGPR bank step time across its components on TPU.

Round-3 VERDICT item 1: the separation bank runs at ~0.04% MFU and nobody
profiled why.  This script times, all in single-dispatch fori_loops (dispatch
latency on the relayed TPU is ~27 ms, so per-op timing must amortize):

  A. full bank loss+grad step, grid (lag-table gather) path
  B. full bank loss+grad step, direct (Mercer feature matmul) path
  C. components: lag-table k_r, (M,N) lag gather, batched chol_inv,
     the A/AAT/B matmul chain, elementwise exp envelope
  D. shape variants: M=112 vs 128, f32 vs bf16 matmul inputs

Usage: python scripts/profile_bank.py [--windows 62] [--steps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def fence(x):
    """Host-scalar fence (block_until_ready can lie on relayed devices)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def time_scan(step_fn, carry, steps, reps=3):
    """Seconds per step of `carry -> carry` step_fn, scanned on device."""
    @jax.jit
    def run(c):
        def body(c, _):
            return step_fn(c), ()
        out, _ = jax.lax.scan(body, c, None, length=steps)
        return out

    out = run(carry)
    fence(out)  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(carry)
        fence(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / steps


def build_bank(nw, ws, m, grid):
    from gpitch_tpu.audio import synth_piano_note
    from gpitch_tpu.audio.windowing import window_stack
    from gpitch_tpu.kernels import MercerMatern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (build_window_bank,
                                                    pad_inducing, sum_kernel)
    from gpitch_tpu.utils import midi2freq

    fs = 16000
    seconds = ((nw - 1) * ((ws - 1) // 2) + ws) / fs
    sources = [synth_piano_note(fs=fs, seconds=seconds, f0=midi2freq(mm),
                                onset=o, noise=0.0, seed=mm)[1]
               for mm, o in zip((60, 64, 67), (0.0, 0.9, 1.8))]
    mix = sum(sources) / 3.0
    x = np.arange(mix.shape[0]).reshape(-1, 1) / fs
    xw, yw = window_stack(x, ws), window_stack(mix, ws)
    xw, yw = xw[:nw], yw[:nw]
    dec = ws // m + 1
    z = pad_inducing([xw[i, ::dec][:m].reshape(-1, 1) for i in range(nw)],
                     m, grid_dt=1.0 / fs)

    def builder():
        return sum_kernel([
            MercerMatern12sm.create(1.0, 0.1,
                                    [1.0 / (k + 1) for k in range(5)],
                                    [midi2freq(mm) * (k + 1) for k in range(5)])
            for mm in (60, 64, 67)])

    return build_window_bank(xw, yw, z, builder,
                             grid_dt=(1.0 / fs) if grid else None)


def adam_step(loss_fn, lr=0.01):
    from gpitch_tpu.core.params import zero_untrainable_grads
    opt = optax.adam(lr)

    def step(carry):
        model, st = carry
        loss, grads = jax.value_and_grad(loss_fn)(model)
        grads = zero_untrainable_grads(grads)
        updates, st = opt.update(grads, st, model)
        return optax.apply_updates(model, updates), st

    return step, opt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=62)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--m", type=int, default=112)
    ap.add_argument("--ws", type=int, default=2001)
    args = ap.parse_args()

    from gpitch_tpu.pipelines.windowed_sgpr import bank_loss

    out = {"backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "nw": args.windows, "ws": args.ws, "m": args.m}

    # ---- A/B: full step, grid vs direct --------------------------------
    for name, grid in (("grid", True), ("direct", False)):
        bank = build_bank(args.windows, args.ws, args.m, grid)
        step, opt = adam_step(bank_loss)
        st = opt.init(bank)
        t0 = time.perf_counter()
        sps = time_scan(step, (bank, st), args.steps)
        out[f"step_{name}_s"] = round(sps, 5)
        out[f"step_{name}_steps_per_s"] = round(1.0 / sps, 1)
        print(f"[{name}] {1/sps:.1f} steps/s ({sps*1e3:.1f} ms/step)  "
              f"wall {time.perf_counter()-t0:.1f}s", flush=True)

    # ---- C: component timings on the grid bank -------------------------
    bank = build_bank(args.windows, args.ws, args.m, True)
    nw, m, n = args.windows, args.m, args.ws

    def loop_time(fn, carry, iters=50):
        return time_scan(fn, carry, iters)

    # lag-table build: vmapped k_r over windows
    def tab_step(c):
        t = jax.vmap(lambda mm: mm._lag_table())(bank)
        return c + jnp.sum(t) * 1e-20
    out["lag_table_s"] = round(loop_time(tab_step, jnp.float32(0.0)), 6)

    # (M,N) gather from the table
    tables = jax.vmap(lambda mm: mm._lag_table())(bank)
    ixs = jax.vmap(lambda mm: mm._grid_indices()[0])(bank)
    izs = jax.vmap(lambda mm: mm._grid_indices()[1])(bank)

    def gather_step(c):
        def one(tab, ix, iz):
            return tab[jnp.abs(iz[:, None] - ix[None, :])]
        kuf = jax.vmap(one)(tables + c * 1e-20, ixs, izs)
        return c + jnp.sum(kuf) * 1e-20
    out["kuf_gather_s"] = round(loop_time(gather_step, jnp.float32(0.0)), 6)

    # direct Mercer kuf build (vmapped over windows)
    def direct_step(c):
        def one(mm):
            return mm.kern.K(mm.Z.value + c * 1e-20, mm.X.value)
        kuf = jax.vmap(one)(bank)
        return c + jnp.sum(kuf) * 1e-20
    out["kuf_direct_s"] = round(loop_time(direct_step, jnp.float32(0.0)), 6)

    # batched chol_inv (nw, M, M)
    from gpitch_tpu.linalg.ops import chol_inv
    key = jax.random.PRNGKey(0)
    A0 = jax.random.normal(key, (nw, m, m), jnp.float32)
    K0 = A0 @ jnp.swapaxes(A0, -1, -2) + 10.0 * jnp.eye(m)

    def chol_step(c):
        L, Li = chol_inv(K0 + c * 1e-20)
        return c + jnp.sum(Li) * 1e-20
    out["chol_inv_s"] = round(loop_time(chol_step, jnp.float32(0.0)), 6)

    def chol_only_step(c):
        L = jnp.linalg.cholesky(K0 + c * 1e-20)
        return c + jnp.sum(L) * 1e-20
    out["cholesky_only_s"] = round(loop_time(chol_only_step, jnp.float32(0.0)), 6)

    # matmul chain: A = Linv@kuf; AAT; B cholesky excluded
    Li0 = jnp.linalg.inv(jnp.linalg.cholesky(K0))
    kuf0 = jax.random.normal(key, (nw, m, n), jnp.float32)

    def mm_step(c):
        A = Li0 @ (kuf0 + c * 1e-20)
        AAT = A @ jnp.swapaxes(A, -1, -2)
        return c + jnp.sum(AAT) * 1e-20
    out["matmul_chain_s"] = round(loop_time(mm_step, jnp.float32(0.0)), 6)

    # bf16 variant of the matmul chain
    Li0b, kuf0b = Li0.astype(jnp.bfloat16), kuf0.astype(jnp.bfloat16)

    def mm_bf16_step(c):
        A = jnp.matmul(Li0b, kuf0b + c.astype(jnp.bfloat16) * 1e-20,
                       preferred_element_type=jnp.float32)
        AAT = jnp.matmul(A.astype(jnp.bfloat16), jnp.swapaxes(A, -1, -2).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return c + jnp.sum(AAT) * 1e-20
    out["matmul_chain_bf16_s"] = round(loop_time(mm_bf16_step, jnp.float32(0.0)), 6)

    # elementwise exp envelope (nw, M, N)
    r0 = jnp.abs(jax.random.normal(key, (nw, m, n), jnp.float32))

    def exp_step(c):
        e = jnp.exp(-(r0 + c * 1e-20) * 10.0)
        return c + jnp.sum(e) * 1e-20
    out["exp_envelope_s"] = round(loop_time(exp_step, jnp.float32(0.0)), 6)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
