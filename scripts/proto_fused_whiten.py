"""Prototype: fused Pallas build->whiten->accumulate forward for the SGPR
bank step (docs/ROOFLINE.md section 4.5 — the remaining structural perf item).

Per window, computes in ONE kernel without materializing kuf or A in HBM:

    kuf_t = sum_s var_s * exp(-|z - x_t|/l_s) * sum_p e_sp cos(2 pi f_sp (z - x_t))
    A_t   = Linv @ kuf_t
    U    += A_t A_t^T          (M, M)
    v    += A_t err_t          (M, 1)

HBM traffic: read x/err once + write (M,M)+(M,1) per window, vs the XLA
path's ~5 kuf-sized passes (build write, sum read, A write, A read x2).
The cosine mixture is accumulated from rank-2 cos/sin edge products
(cos w(z-x) = cos wz cos wx + sin wz sin wx), so transcendentals stay
O((M+T)PS) per tile like the XLA feature path; the O(MT) work is VPU
multiply-adds plus the envelope exp (which the XLA path also pays).

FORWARD prototype for measurement only: no custom VJP, not wired into the
models.  Correctness pinned against the XLA composition; both paths timed
with the dispatch-free Timer.time_fn_loop at separation quality shapes.

Run:  python scripts/proto_fused_whiten.py [--check-only]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 6.283185307179586


def _kernel(zc_ref, xc_ref, err_ref, linv_ref, par_ref, u_ref, v_ref, *,
            num_partials: int, num_sources: int):
    """Grid (nw, nt), accumulating over the second (tile) dimension.

    zc_ref: (1, M, 1); xc_ref/err_ref: (1, 1, T); linv_ref: (1, M, M);
    par_ref: SMEM (1, S*(2P+2)) flat [e..., f..., var, inv_l] per source;
    u_ref: (1, M, M); v_ref: (1, M, 1).
    """
    jt = pl.program_id(1)
    z = zc_ref[...]                               # (1, M, 1)
    x = xc_ref[...]                               # (1, 1, T)
    stride = 2 * num_partials + 2

    acc = None
    for s in range(num_sources):
        base = s * stride
        mix = None
        for p in range(num_partials):
            e = par_ref[0, base + p]
            w = TWO_PI * par_ref[0, base + num_partials + p]
            term = e * (jnp.cos(w * z) * jnp.cos(w * x)
                        + jnp.sin(w * z) * jnp.sin(w * x))   # (1, M, T)
            mix = term if mix is None else mix + term
        var = par_ref[0, base + 2 * num_partials]
        inv_l = par_ref[0, base + 2 * num_partials + 1]
        env = jnp.exp(-jnp.abs(z - x) * inv_l)
        contrib = var * env * mix
        acc = contrib if acc is None else acc + contrib      # (1, M, T)

    a = jax.lax.dot_general(linv_ref[...], acc,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (1, M, T)

    @pl.when(jt == 0)
    def _init():
        u_ref[...] = jnp.zeros_like(u_ref)
        v_ref[...] = jnp.zeros_like(v_ref)

    u_ref[...] += jax.lax.dot_general(
        a, a, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    v_ref[...] += jax.lax.dot_general(
        a, err_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _kernel_mxu(zc_ref, xc_ref, err_ref, linv_ref, frr_ref, frc_ref,
                ser_ref, sec_ref, sc_ref, u_ref, v_ref, *,
                num_sources: int):
    """MXU-mix variant: per-source phi features built in VMEM and contracted
    on the MXU (K = 2P), VPU only for the envelope — the design rule from
    docs/PALLAS_SPECMIX.md applied inside the fused chain.

    frr_ref/ser_ref: (S, 1, P) freq / sqrt(energy) row-oriented;
    frc_ref/sec_ref: (S, P, 1) column-oriented; sc_ref: SMEM (1, 2S)
    [var..., inv_l...].
    """
    jt = pl.program_id(1)
    z = zc_ref[...]                               # (bt, M, 1)
    x = xc_ref[...]                               # (bt, 1, T)

    acc = None
    for s in range(num_sources):
        wr = TWO_PI * frr_ref[s]                  # (1, P) -> bcast (bt,M,P)
        ang_z = z * wr                            # (bt, M, P)
        ez = ser_ref[s]                           # (1, P)
        phi_z = jnp.concatenate([ez * jnp.cos(ang_z), ez * jnp.sin(ang_z)],
                                axis=2)           # (bt, M, 2P)
        wc = TWO_PI * frc_ref[s]                  # (P, 1)
        ang_x = wc * x                            # (bt, P, T)
        ec = sec_ref[s]                           # (P, 1)
        phi_x = jnp.concatenate([ec * jnp.cos(ang_x), ec * jnp.sin(ang_x)],
                                axis=1)           # (bt, 2P, T)
        mix = jax.lax.dot_general(
            phi_z, phi_x, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (bt, M, T)
        var = sc_ref[0, s]
        inv_l = sc_ref[0, num_sources + s]
        env = jnp.exp(-jnp.abs(z - x) * inv_l)
        contrib = var * env * mix
        acc = contrib if acc is None else acc + contrib

    a = jax.lax.dot_general(linv_ref[...], acc,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)

    @pl.when(jt == 0)
    def _init():
        u_ref[...] = jnp.zeros_like(u_ref)
        v_ref[...] = jnp.zeros_like(v_ref)

    u_ref[...] += jax.lax.dot_general(
        a, a, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    v_ref[...] += jax.lax.dot_general(
        a, err_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def make_fused_mxu(s_src: int, p_par: int):
    """MXU-mix fused kernel (see _kernel_mxu)."""
    @functools.partial(jax.jit, static_argnames=("tile_t", "win_tile",
                                                 "interpret"))
    def fused(zc, xc, err, linv, energy, freq, var, inv_l,
              tile_t: int = 512, win_tile: int = 4, interpret: bool = False):
        nw, m = zc.shape[0], zc.shape[1]
        n = xc.shape[2]
        bt = max(1, min(win_tile, nw))
        nb = pl.cdiv(nw, bt)
        if nb * bt != nw:
            padw = nb * bt - nw

            def padw_fn(a):
                return jnp.concatenate(
                    [a, jnp.zeros((padw,) + a.shape[1:], a.dtype)], 0)
            zc, xc, err, linv = map(padw_fn, (zc, xc, err, linv))
        nt = pl.cdiv(n, tile_t)
        se = jnp.sqrt(energy).astype(jnp.float32)
        frr = freq.astype(jnp.float32)[:, None, :]        # (S, 1, P)
        frc = freq.astype(jnp.float32)[:, :, None]        # (S, P, 1)
        ser = se[:, None, :]
        sec = se[:, :, None]
        sc = jnp.concatenate([var, inv_l]).astype(jnp.float32)[None, :]
        s, p = energy.shape
        kernel = functools.partial(_kernel_mxu, num_sources=s)
        full = lambda shape: pl.BlockSpec(shape, lambda w, t: (0,) * len(shape),
                                          memory_space=pltpu.VMEM)
        u, v = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((nb * bt, m, m), jnp.float32),
                       jax.ShapeDtypeStruct((nb * bt, m, 1), jnp.float32)),
            grid=(nb, nt),
            in_specs=[
                pl.BlockSpec((bt, m, 1), lambda w, t: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1, tile_t), lambda w, t: (w, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1, tile_t), lambda w, t: (w, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, m, m), lambda w, t: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                full((s, 1, p)), full((s, p, 1)),
                full((s, 1, p)), full((s, p, 1)),
                pl.BlockSpec((1, 2 * s), lambda w, t: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(pl.BlockSpec((bt, m, m), lambda w, t: (w, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((bt, m, 1), lambda w, t: (w, 0, 0),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )(zc, xc, err, linv, frr, frc, ser, sec, sc)
        return u[:nw], v[:nw]
    return fused


def make_fused(s_src: int, p_par: int):
    """U = A0 A0^T, v = A0 err for a batch of windows.

    zc: (nw, M, 1); xc/err: (nw, 1, N); linv: (nw, M, M);
    params: (1, S*(2P+2)) flat per-source [energies, freqs, var, inv_l]
    (shared across windows in this prototype).  ``win_tile`` windows per
    grid program — one-window programs drowned in per-program overhead
    (888 programs measured 9.6 ms vs XLA 4.6)."""
    @functools.partial(jax.jit, static_argnames=("tile_t", "win_tile",
                                                 "interpret"))
    def fused(zc, xc, err, linv, params, tile_t: int = 512,
              win_tile: int = 4, interpret: bool = False):
        nw, m = zc.shape[0], zc.shape[1]
        n = xc.shape[2]
        bt = max(1, min(win_tile, nw))
        nb = pl.cdiv(nw, bt)
        if nb * bt != nw:
            padw = nb * bt - nw

            def padw_fn(a):
                return jnp.concatenate(
                    [a, jnp.zeros((padw,) + a.shape[1:], a.dtype)], 0)
            zc, xc, err, linv = map(padw_fn, (zc, xc, err, linv))
        nt = pl.cdiv(n, tile_t)
        kernel = functools.partial(_kernel, num_partials=p_par,
                                   num_sources=s_src)
        u, v = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((nb * bt, m, m), jnp.float32),
                       jax.ShapeDtypeStruct((nb * bt, m, 1), jnp.float32)),
            grid=(nb, nt),
            in_specs=[
                pl.BlockSpec((bt, m, 1), lambda w, t: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1, tile_t), lambda w, t: (w, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1, tile_t), lambda w, t: (w, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, m, m), lambda w, t: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, params.shape[1]), lambda w, t: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(pl.BlockSpec((bt, m, m), lambda w, t: (w, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((bt, m, 1), lambda w, t: (w, 0, 0),
                                    memory_space=pltpu.VMEM)),
            cost_estimate=pl.CostEstimate(
                flops=nw * (2 * m * n * (2 * p_par * s_src + m + m + 1)),
                bytes_accessed=nw * (n * 8 + m * m * 8),
                transcendentals=nw * n * s_src * (m + 2 * p_par),
            ),
            interpret=interpret,
        )(zc, xc, err, linv, params)
        return u[:nw], v[:nw]
    return fused


def xla_reference(zc, xc, err, linv, energy, freq, var, inv_l,
                  precision="highest"):
    """The current production composition (build -> sum -> whiten -> Gram).

    ``precision``: the correctness check runs both paths at 'highest'
    (f32-exact MXU) so the comparison isn't dominated by the TPU's bf16
    default; timing uses 'high' for XLA (the shipped policy) vs the
    kernel's HIGHEST."""
    import contextlib
    ctx = (jax.default_matmul_precision(precision) if precision
           else contextlib.nullcontext())
    with ctx:
        return _xla_reference_inner(zc, xc, err, linv, energy, freq, var,
                                    inv_l)


def _xla_reference_inner(zc, xc, err, linv, energy, freq, var, inv_l):

    def one(z2, x2, e2, li):
        z = z2                                        # (M, 1)
        x = x2.reshape(-1, 1)                         # (N, 1)
        d = jnp.abs(z - x.T)
        kuf = 0.0
        for si in range(energy.shape[0]):
            se = jnp.sqrt(energy[si])
            phi_z = jnp.concatenate(
                [se * jnp.cos(TWO_PI * z * freq[si]),
                 se * jnp.sin(TWO_PI * z * freq[si])], axis=1)   # (M, 2P)
            phi_x = jnp.concatenate(
                [se * jnp.cos(TWO_PI * x * freq[si]),
                 se * jnp.sin(TWO_PI * x * freq[si])], axis=1)   # (N, 2P)
            mix = phi_z @ phi_x.T
            kuf = kuf + var[si] * jnp.exp(-d * inv_l[si]) * mix
        a = li @ kuf
        return a @ a.T, a @ e2.reshape(-1, 1)

    return jax.vmap(one)(zc, xc, err, linv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--win-tile", type=int,
                    default=int(os.environ.get("PROTO_WT", "4")))
    args = ap.parse_args()

    from gpitch_tpu.config import enable_persistent_compilation_cache
    from gpitch_tpu.utils.profiling import Timer

    enable_persistent_compilation_cache()

    # separation quality shapes; M padded 112 -> 128 with ZERO Linv rows so
    # padded lanes contribute nothing; N padded to a tile multiple with the
    # padded x placed at +1e6 s (envelope exp(-1e6/l) == 0 in f32) and err 0
    nw, n, m_real, m = 222, 2001, 112, 128
    npad = -(-n // args.tile) * args.tile
    s_src, p_par = 3, 5
    rng = np.random.default_rng(0)
    fs = 16000.0
    xc = np.broadcast_to((np.arange(npad) / fs), (nw, npad)).copy()
    xc[:, n:] = 1.0e6
    zc = np.stack([np.linspace(0, (n - 1) / fs, m_real) for _ in range(nw)])
    zc = zc + rng.uniform(0, 1e-4, zc.shape)
    zc = np.concatenate([zc, np.full((nw, m - m_real), (n - 1) / fs)], 1)
    err = rng.standard_normal((nw, npad)) * 0.1
    err[:, n:] = 0.0
    linv_small = np.tril(rng.standard_normal((nw, m_real, m_real)) * 0.05
                         + np.eye(m_real)[None] * 1.0)
    linv = np.zeros((nw, m, m))
    linv[:, :m_real, :m_real] = linv_small

    f0s = [261.6 * 2 ** (i / 12) for i in (0, 4, 7)]
    energy = np.stack([1.0 / np.arange(1, p_par + 1) for _ in f0s])
    freq = np.stack([f0 * np.arange(1, p_par + 1) for f0 in f0s])
    var = np.ones(s_src)
    inv_l = 1.0 / np.array([0.1, 0.1, 0.1])

    to32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    zcj = to32(zc)[:, :, None]
    xcj = to32(xc)[:, None, :]
    errj = to32(err)[:, None, :]
    linvj = to32(linv)
    params = np.concatenate(
        [np.concatenate([energy[s], freq[s], [var[s]], [inv_l[s]]])
         for s in range(s_src)])
    paramsj = to32(params)[None, :]

    fused = make_fused(s_src, p_par)
    u_p, v_p = jax.block_until_ready(
        fused(zcj, xcj, errj, linvj, paramsj, tile_t=args.tile, win_tile=args.win_tile))
    u_x, v_x = jax.block_until_ready(
        xla_reference(zcj[:, :, 0][:, :, None], xcj[:, 0, :], errj[:, 0, :],
                      linvj, to32(energy), to32(freq), to32(var),
                      to32(inv_l)))
    du = float(jnp.max(jnp.abs(u_p - u_x)) / (jnp.max(jnp.abs(u_x)) + 1e-30))
    dv = float(jnp.max(jnp.abs(v_p - v_x)) / (jnp.max(jnp.abs(v_x)) + 1e-30))
    print(f"rel err vs XLA composition: U {du:.2e}  v {dv:.2e}", flush=True)
    if not (np.isfinite(du) and np.isfinite(dv)) or du > 1e-4 or dv > 1e-4:
        print("MISMATCH — prototype incorrect on this backend", flush=True)
        return
    if args.check_only:
        return

    # perturb zc: EVERY output depends on it, so neither path can hoist any
    # stage out of the timing loop
    def run_pallas(eps):
        u, v = fused(zcj + eps, xcj, errj, linvj, paramsj, tile_t=args.tile, win_tile=args.win_tile)
        return jnp.sum(u) * 1e-6 + jnp.sum(v)

    def run_xla(eps):
        # shipped policy for the production path ('high' = bf16_3x)
        u, v = xla_reference(zcj + eps, xcj[:, 0, :],
                             errj[:, 0, :], linvj, to32(energy),
                             to32(freq), to32(var), to32(inv_l),
                             precision="high")
        return jnp.sum(u) * 1e-6 + jnp.sum(v)

    t_p = Timer.time_fn_loop(run_pallas, loop_iters=20, reps=3)
    t_x = Timer.time_fn_loop(run_xla, loop_iters=20, reps=3)
    print(f"fused Pallas forward (VPU mix): {t_p * 1e3:8.2f} ms", flush=True)
    print(f"XLA composition:                {t_x * 1e3:8.2f} ms", flush=True)
    print(f"speedup: {t_x / t_p:.2f}x", flush=True)

    # MXU-mix variant
    fusedm = make_fused_mxu(s_src, p_par)
    u_m, v_m = jax.block_until_ready(
        fusedm(zcj, xcj, errj, linvj, to32(energy), to32(freq), to32(var),
               to32(inv_l), tile_t=args.tile, win_tile=args.win_tile))
    dum = float(jnp.max(jnp.abs(u_m - u_x)) / (jnp.max(jnp.abs(u_x)) + 1e-30))
    dvm = float(jnp.max(jnp.abs(v_m - v_x)) / (jnp.max(jnp.abs(v_x)) + 1e-30))
    print(f"MXU-mix rel err vs XLA: U {dum:.2e}  v {dvm:.2e}", flush=True)
    if np.isfinite(dum) and np.isfinite(dvm) and dum < 1e-4 and dvm < 1e-4:
        def run_mxu(eps):
            u, v = fusedm(zcj + eps, xcj, errj, linvj, to32(energy),
                          to32(freq), to32(var), to32(inv_l),
                          tile_t=args.tile, win_tile=args.win_tile)
            return jnp.sum(u) * 1e-6 + jnp.sum(v)
        t_m = Timer.time_fn_loop(run_mxu, loop_iters=20, reps=3)
        print(f"fused Pallas forward (MXU mix): {t_m * 1e3:8.2f} ms "
              f"(speedup {t_x / t_m:.2f}x)", flush=True)
    else:
        print("MXU-mix variant MISCOMPILES on this backend", flush=True)


if __name__ == "__main__":
    main()
