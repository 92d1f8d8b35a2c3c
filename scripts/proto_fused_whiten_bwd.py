"""Prototype: fused Pallas BACKWARD for the build->whiten->accumulate chain
(companion to proto_fused_whiten.py; docs/ROOFLINE.md 4.5).

Given cotangents (dU, dv) of U = A K-form Gram and v = A err, recomputes
K/A tiles in VMEM and accumulates every trainable gradient without
materializing kuf/A/dA/dK in HBM:

    dA  = (dU + dU^T) A + dv err^T
    dLinv = sum_t dA_t K_t^T                      (M, M)
    dK  = Linv^T dA
    per source s (K = sum_s v_s E_s . (P_s Q_s^T), E = exp(-d/l)):
      dvar_s  = <dK, E_s . P_s Q_s^T>
      dinvl_s = -v_s <dK . P_s Q_s^T . E_s, d>
      dM_s    = v_s E_s . dK
      de_p    = [ <dot(dM, Q), P>_pairs + <dot(dM^T, P), Q>_pairs ] / (2 e_p)
      df_p    = 2 pi [ <z . (-dP.P~ + dP~.P)> + x-side ]   (P~ = sin column)

Validated against jax.grad of the XLA composition; timed vs the XLA
backward at separation quality shapes.

Run: python scripts/proto_fused_whiten_bwd.py
"""

from __future__ import annotations

import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 6.283185307179586
HI = jax.lax.Precision.HIGHEST


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                               precision=HI)


def _kernel_bwd(zc_ref, xc_ref, err_ref, linv_ref, du_ref, dv_ref,
                frr_ref, frc_ref, ser_ref, sec_ref, sc_ref,
                dlinv_ref, dvar_ref, dinvl_ref, de_ref, df_ref, *,
                num_sources: int, num_partials: int):
    """Grid (nb, nt); accumulates over the tile dimension.

    zc: (bt, M, 1); xc/err: (bt, 1, T); linv/du: (bt, M, M); dv: (bt, M, 1);
    frr/ser: (S, 1, P); frc/sec: (S, P, 1); sc: SMEM (1, 2S) [var..., invl...].
    Outputs: dlinv (bt, M, M); dvar/dinvl (bt, 1, S); de/df (bt, S, P).
    """
    jt = pl.program_id(1)
    z = zc_ref[...]                               # (bt, M, 1)
    x = xc_ref[...]                               # (bt, 1, T)
    d = jnp.abs(z - x)                            # (bt, M, T)
    p_par = num_partials

    # ---- recompute K tile (per-source features kept for reuse)
    phis_z, phis_x, envs, mixes = [], [], [], []
    k_t = None
    for s in range(num_sources):
        wr = TWO_PI * frr_ref[s]
        ang_z = z * wr                            # (bt, M, P)
        ez = ser_ref[s]
        pz = jnp.concatenate([ez * jnp.cos(ang_z), ez * jnp.sin(ang_z)],
                             axis=2)              # (bt, M, 2P)
        wc = TWO_PI * frc_ref[s]
        ang_x = wc * x                            # (bt, P, T)
        ec = sec_ref[s]
        qx = jnp.concatenate([ec * jnp.cos(ang_x), ec * jnp.sin(ang_x)],
                             axis=1)              # (bt, 2P, T)
        mix = _dot(pz, qx, (((2,), (1,)), ((0,), (0,))))  # (bt, M, T)
        env = jnp.exp(-d * sc_ref[0, num_sources + s])
        phis_z.append(pz)
        phis_x.append(qx)
        envs.append(env)
        mixes.append(mix)
        contrib = sc_ref[0, s] * env * mix
        k_t = contrib if k_t is None else k_t + contrib

    a = _dot(linv_ref[...], k_t, (((2,), (1,)), ((0,), (0,))))  # (bt, M, T)

    # ---- dA, dLinv, dK
    s_du = du_ref[...] + jnp.swapaxes(du_ref[...], 1, 2)        # (bt, M, M)
    da = (_dot(s_du, a, (((2,), (1,)), ((0,), (0,))))
          + dv_ref[...] * err_ref[...])                          # (bt, M, T)
    dlinv_t = _dot(da, k_t, (((2,), (2,)), ((0,), (0,))))        # (bt, M, M)
    dk = _dot(jnp.swapaxes(linv_ref[...], 1, 2), da,
              (((2,), (1,)), ((0,), (0,))))                      # (bt, M, T)

    dvars, dinvls, des, dfs = [], [], [], []
    if os.environ.get("PROTO_DLINV_ONLY"):
        @pl.when(jt == 0)
        def _init0():
            dlinv_ref[...] = jnp.zeros_like(dlinv_ref)
            dvar_ref[...] = jnp.zeros_like(dvar_ref)
            dinvl_ref[...] = jnp.zeros_like(dinvl_ref)
            de_ref[...] = jnp.zeros_like(de_ref)
            df_ref[...] = jnp.zeros_like(df_ref)
        dlinv_ref[...] += dlinv_t
        return
    for s in range(num_sources):
        pm = mixes[s] * envs[s]                                  # (bt, M, T)
        dvars.append(jnp.sum(dk * pm, axis=(1, 2),
                             keepdims=True))                     # (bt, 1, 1)
        dinvls.append(-sc_ref[0, s]
                      * jnp.sum(dk * pm * d, axis=(1, 2), keepdims=True))
        dm = sc_ref[0, s] * envs[s] * dk                         # (bt, M, T)
        # z-side: dP = dot(dm, Q^T) -> (bt, M, 2P); pair with P
        dp = _dot(dm, phis_x[s], (((2,), (2,)), ((0,), (0,))))   # (bt, M, 2P)
        # x-side: dQ^T = dot(P^T, dm) -> (bt, 2P, T); pair with Q
        dq = _dot(jnp.swapaxes(phis_z[s], 1, 2), dm,
                  (((2,), (1,)), ((0,), (0,))))                  # (bt, 2P, T)
        pz, qx = phis_z[s], phis_x[s]
        # energy: (sum over pairs of dP.P + dQ.Q) / (2 e_p); since
        # P = sqrt(e) c, the pairing contracts the sqrt(e) factors
        pe_z = jnp.sum(dp * pz, axis=1, keepdims=True)           # (bt, 1, 2P)
        pe_x = jnp.sum(dq * qx, axis=2, keepdims=True)           # (bt, 2P, 1)
        pe_xr = jnp.swapaxes(pe_x, 1, 2)                         # (bt, 1, 2P)
        e_row = ser_ref[s] * ser_ref[s]                          # (1, P)
        de = ((pe_z[:, :, :p_par] + pe_z[:, :, p_par:]
               + pe_xr[:, :, :p_par] + pe_xr[:, :, p_par:])
              / (2.0 * e_row))                                   # (bt, 1, P)
        des.append(de)
        # frequency: 2 pi [ sum_m z_m (-dPc.Ps + dPs.Pc) + x-side ]
        zf = jnp.sum(z * (-dp[:, :, :p_par] * pz[:, :, p_par:]
                          + dp[:, :, p_par:] * pz[:, :, :p_par]),
                     axis=1, keepdims=True)                      # (bt, 1, P)
        xf = jnp.sum(x * (-dq[:, :p_par, :] * qx[:, p_par:, :]
                          + dq[:, p_par:, :] * qx[:, :p_par, :]),
                     axis=2, keepdims=True)                      # (bt, P, 1)
        dfs.append(TWO_PI * (zf + jnp.swapaxes(xf, 1, 2)))       # (bt, 1, P)

    @pl.when(jt == 0)
    def _init():
        dlinv_ref[...] = jnp.zeros_like(dlinv_ref)
        dvar_ref[...] = jnp.zeros_like(dvar_ref)
        dinvl_ref[...] = jnp.zeros_like(dinvl_ref)
        de_ref[...] = jnp.zeros_like(de_ref)
        df_ref[...] = jnp.zeros_like(df_ref)

    dlinv_ref[...] += dlinv_t
    dvar_ref[...] += jnp.concatenate(dvars, axis=2)              # (bt, 1, S)
    dinvl_ref[...] += jnp.concatenate(dinvls, axis=2)
    de_ref[...] += jnp.concatenate(des, axis=1)                  # (bt, S, P)
    df_ref[...] += jnp.concatenate(dfs, axis=1)


def make_fused_bwd(s_src: int, p_par: int):
    @functools.partial(jax.jit, static_argnames=("tile_t", "win_tile",
                                                 "interpret"))
    def fused_bwd(zc, xc, err, linv, du, dv, energy, freq, var, inv_l,
                  tile_t: int = 1024, win_tile: int = 1,
                  interpret: bool = False):
        nw, m = zc.shape[0], zc.shape[1]
        n = xc.shape[2]
        bt = max(1, min(win_tile, nw))
        nb = pl.cdiv(nw, bt)
        if nb * bt != nw:
            padw = nb * bt - nw

            def padw_fn(a):
                return jnp.concatenate(
                    [a, jnp.zeros((padw,) + a.shape[1:], a.dtype)], 0)
            zc, xc, err, linv, du, dv = map(padw_fn,
                                            (zc, xc, err, linv, du, dv))
        nt = pl.cdiv(n, tile_t)
        se = jnp.sqrt(energy).astype(jnp.float32)
        frr = freq.astype(jnp.float32)[:, None, :]
        frc = freq.astype(jnp.float32)[:, :, None]
        ser = se[:, None, :]
        sec = se[:, :, None]
        sc = jnp.concatenate([var, inv_l]).astype(jnp.float32)[None, :]
        s, p = energy.shape
        kernel = functools.partial(_kernel_bwd, num_sources=s,
                                   num_partials=p)
        full = lambda shape: pl.BlockSpec(shape, lambda w, t: (0,) * len(shape),
                                          memory_space=pltpu.VMEM)
        win = lambda shape: pl.BlockSpec(
            shape, lambda w, t: (w,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((nb * bt, m, m), jnp.float32),
                       jax.ShapeDtypeStruct((nb * bt, 1, s), jnp.float32),
                       jax.ShapeDtypeStruct((nb * bt, 1, s), jnp.float32),
                       jax.ShapeDtypeStruct((nb * bt, s, p), jnp.float32),
                       jax.ShapeDtypeStruct((nb * bt, s, p), jnp.float32)),
            grid=(nb, nt),
            in_specs=[
                win((bt, m, 1)),
                pl.BlockSpec((bt, 1, tile_t), lambda w, t: (w, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, 1, tile_t), lambda w, t: (w, 0, t),
                             memory_space=pltpu.VMEM),
                win((bt, m, m)), win((bt, m, m)), win((bt, m, 1)),
                full((s, 1, p)), full((s, p, 1)),
                full((s, 1, p)), full((s, p, 1)),
                pl.BlockSpec((1, 2 * s), lambda w, t: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(win((bt, m, m)), win((bt, 1, s)), win((bt, 1, s)),
                       win((bt, s, p)), win((bt, s, p))),
            interpret=interpret,
        )(zc, xc, err, linv, du, dv, frr, frc, ser, sec, sc)
        return tuple(o[:nw] for o in outs)
    return fused_bwd


def main():
    from proto_fused_whiten import xla_reference
    from gpitch_tpu.config import enable_persistent_compilation_cache
    from gpitch_tpu.utils.profiling import Timer

    enable_persistent_compilation_cache()

    nw, n, m_real, m = 222, 2001, 112, 128
    tile_t = 1024
    npad = tile_t
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
    du = rng.standard_normal((nw, m, m)) * 0.01
    dv = rng.standard_normal((nw, m, 1)) * 0.01

    f0s = [261.6 * 2 ** (i / 12) for i in (0, 4, 7)]
    energy = np.stack([1.0 / np.arange(1, p_par + 1) for _ in f0s])
    freq = np.stack([f0 * np.arange(1, p_par + 1) for f0 in f0s])
    var = np.ones(s_src)
    inv_l = 1.0 / np.array([0.1, 0.1, 0.1])

    to32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    zcj = to32(zc)[:, :, None]
    xcj = to32(xc)[:, None, :]
    errj = to32(err)[:, None, :]
    linvj, duj, dvj = to32(linv), to32(du), to32(dv)
    ej, fj, vj, ilj = map(to32, (energy, freq, var, inv_l))

    # reference grads by AD through the XLA composition at HIGHEST
    def scalar(linv_, e_, f_, v_, il_):
        u, vv = xla_reference(zcj, xcj[:, 0, :], errj[:, 0, :], linv_,
                              e_, f_, v_, il_, precision="highest")
        return jnp.sum(u * duj) + jnp.sum(vv * dvj)

    ref = jax.jit(jax.grad(scalar, argnums=(0, 1, 2, 3, 4)))
    g_linv, g_e, g_f, g_v, g_il = jax.block_until_ready(
        ref(linvj, ej, fj, vj, ilj))

    fused_bwd = make_fused_bwd(s_src, p_par)
    dlinv, dvar, dinvl, de, df = jax.block_until_ready(
        fused_bwd(zcj, xcj, errj, linvj, duj, dvj, ej, fj, vj, ilj,
                  tile_t=tile_t, win_tile=1))

    def rel(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))

    print("rel err vs AD-of-XLA:",
          {"dLinv": f"{rel(dlinv, g_linv):.2e}",
           "dvar": f"{rel(dvar.sum(axis=(0, 1)), g_v):.2e}",
           "dinvl": f"{rel(dinvl.sum(axis=(0, 1)), g_il):.2e}",
           "de": f"{rel(de.sum(axis=0), g_e):.2e}",
           "df": f"{rel(df.sum(axis=0), g_f):.2e}"}, flush=True)

    def run_fused(eps):
        outs = fused_bwd(zcj + eps, xcj, errj, linvj, duj, dvj, ej, fj, vj,
                         ilj, tile_t=tile_t, win_tile=1)
        return sum(jnp.sum(o) * 1e-6 for o in outs)

    def run_xla(eps):
        def scalar_hi(linv_, e_, f_, v_, il_):
            u, vv = xla_reference(zcj + eps, xcj[:, 0, :], errj[:, 0, :],
                                  linv_, e_, f_, v_, il_, precision="high")
            return jnp.sum(u * duj) + jnp.sum(vv * dvj)
        gs = jax.grad(scalar_hi, argnums=(0, 1, 2, 3, 4))(linvj, ej, fj,
                                                          vj, ilj)
        return sum(jnp.sum(g) * 1e-6 for g in gs)

    t_f = Timer.time_fn_loop(run_fused, loop_iters=20, reps=3)
    t_x = Timer.time_fn_loop(run_xla, loop_iters=20, reps=3)
    print(f"fused Pallas backward:    {t_f * 1e3:8.2f} ms", flush=True)
    print(f"XLA AD backward (all grads, incl fwd recompute): "
          f"{t_x * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
