"""Tracing, timing and FLOPs accounting.

The reference's only observability is ``print("optimizing window i")``
(separation.py:297) and an ELBO callback in notebooks (SURVEY.md section 5).
This module provides the production equivalents: jax.profiler trace capture,
blocking step timers, analytical FLOPs models for the dominant kernels
(covariance build, Cholesky, triangular solve, Gauss-Hermite reduction) and a
roofline-style utilization report against per-chip peak.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax

from ..config import jit as _cfg_jit  # precision-scoped jax.jit
import numpy as np

__all__ = ["trace", "Timer", "flops_specmix", "flops_cholesky",
           "flops_trisolve", "flops_gh_expectations", "flops_svgp_step",
           "flops_sgpr_bank_step", "utilization_report", "MetricsLogger"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/gpitch_trace"):
    """jax.profiler trace context; view with TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device results."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0

    @staticmethod
    def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
        """Median seconds per call of a jitted fn.

        Fences via a one-element host read per output leaf (a dependent
        transfer) — NOT block_until_ready, which relayed TPU runtimes can
        satisfy before execution finishes."""
        def block(out):
            for leaf in jax.tree_util.tree_leaves(out):
                if hasattr(leaf, "ndim"):
                    np.asarray(leaf[(0,) * leaf.ndim])
        for _ in range(warmup):
            block(fn(*args))
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            block(fn(*args))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    @staticmethod
    def time_fn_loop(make_fn, loop_iters: int = 50, reps: int = 5,
                     warmup: int = 1):
        """Amortized seconds per call, dispatch-free.

        ``time_fn`` measures one host->device dispatch per call; on a relayed
        (tunneled) TPU that round-trip is ~tens of ms, which swamps any kernel
        under ~1 GFLOP — exactly the regime of single covariance builds.  Here
        ``make_fn(eps)`` must return an array whose value depends on the
        scalar ``eps``; the loop feeds a tiny data-dependent scalar from each
        iteration's output into the next call, so XLA can neither hoist the
        body out of the loop nor CSE the iterations, and all ``loop_iters``
        evaluations run back-to-back on device in ONE dispatch.

        The carry is a FULL reduction of the output, not one element: keeping
        only ``out[0]`` live lets XLA sink the slice through elementwise
        producers and dead-code-eliminate most of the per-iteration work,
        which biased any comparison against opaque custom calls (Pallas) that
        always do full work (ADVICE round 2).  A sum keeps every output
        element live.
        """
        import jax.numpy as jnp
        from jax import lax

        def loop(eps0):
            def body(_, carry):
                out = make_fn(carry)
                return jnp.real(jnp.sum(out)).astype(jnp.float32) * 1e-20
            return lax.fori_loop(0, loop_iters, body, eps0)

        run = _cfg_jit(loop)
        zero = jnp.float32(0.0)
        # fence with a HOST READ of the dependent scalar, never
        # block_until_ready: relayed (tunneled) TPU runtimes can mark buffers
        # ready before execution finishes, silently timing nothing
        for _ in range(warmup):
            float(run(zero))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(zero))
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) / loop_iters


# --- analytical FLOPs models ------------------------------------------------

def flops_specmix(n: int, m: int, p: int) -> int:
    """Spectral-mixture covariance via cos/sin features: feature build
    ~6(N+M)P (trig) + matmul 2*N*M*2P + envelope ~4NM."""
    return 6 * (n + m) * p + 4 * n * m * p + 4 * n * m


def flops_cholesky(m: int, batch: int = 1) -> int:
    return batch * m ** 3 // 3


def flops_trisolve(m: int, k: int, batch: int = 1) -> int:
    return batch * m * m * k


def flops_gh_expectations(n: int, s: int, h: int) -> int:
    """GH moments: evaluate nlin on (N,S,H) (~10 flops) + 2 reductions."""
    return n * s * h * 14


def flops_sgpr_bank_step(nw: int, n: int, m: int, s: int, p: int) -> int:
    """One loss+grad Adam step of a windowed-SGPRSS bank (models/sgpr.py
    ``_common``+``elbo``): per window, S-source covariance builds (Kuu M x M,
    Kuf M x N as cos/sin feature matmuls), chol_inv of Kuu and of B
    (chol ~M^3/3 + explicit triangular inverse ~M^3), the matmul chain
    A = Linv Kuf (2 M^2 N), AAT (2 M^2 N), Aerr (2 M N); backward ~2x the
    forward (the custom chol_inv VJP is matmul-only)."""
    fwd = s * (flops_specmix(m, m, p) + flops_specmix(m, n, p))
    fwd += 2 * (flops_cholesky(m) + flops_trisolve(m, m))   # chol_inv x2
    fwd += 2 * flops_trisolve(m, n)                          # A, AAT
    fwd += 2 * m * n                                         # Aerr
    return 3 * fwd * nw


def flops_svgp_step(n_batch: int, m: int, s: int, p: int, h: int = 20) -> int:
    """One ELBO+grad step of ModGP: 2S conditionals (Kuu build, chol,
    2 trisolves, Kuf build), GH expectations, KL; backward ~2x forward."""
    fwd = 2 * s * (flops_specmix(m, m, p) + flops_cholesky(m)
                   + 2 * flops_trisolve(m, n_batch) + flops_specmix(m, n_batch, p))
    fwd += flops_gh_expectations(n_batch, s, h)
    fwd += 2 * s * flops_cholesky(m)  # KL terms
    return 3 * fwd


# peak f32 MXU throughput per chip (rough public numbers)
PEAK_FLOPS = {"tpu v5 lite": 394e12 / 2, "tpu v4": 275e12 / 2, "cpu": 1e11}

# HBM bandwidth per chip (public numbers)
PEAK_BW = {"tpu v5 lite": 819e9, "tpu v4": 1200e9, "cpu": 5e10}


def bank_step_bytes(nw: int, n: int, m: int, s: int) -> int:
    """HBM traffic model for one bank loss+grad step: the dominant buffers
    are the kuf-shaped (S, M, N) covariance blocks per window — ~3 passes
    forward (build write, A-chain read, AAT read) and ~2x that backward
    (docs/ROOFLINE.md section 1)."""
    kuf = s * m * n * 4
    return nw * kuf * 9


def achievable_report(flops_per_step: int, bytes_per_step: int,
                      seconds_per_step: float,
                      device_kind: str | None = None) -> dict:
    """Roofline 'achievable' utilization: the step's floor time is
    max(bytes/BW, flops/peak); mfu_achievable = floor / measured — how close
    the step runs to ITS OWN roofline, not to the chip's peak FLOPs (the
    bank workloads are memory-bound, so peak-FLOPs MFU is structurally tiny;
    docs/ROOFLINE.md section 2)."""
    kind = (device_kind or jax.devices()[0].device_kind).lower()
    peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), 1e12)
    bw = next((v for k, v in PEAK_BW.items() if k in kind), 1e11)
    t_bw = bytes_per_step / bw
    t_fl = flops_per_step / peak
    floor = max(t_bw, t_fl)
    return {"t_bandwidth_floor_ms": round(t_bw * 1e3, 3),
            "t_flops_floor_ms": round(t_fl * 1e3, 3),
            "bound": "bandwidth" if t_bw >= t_fl else "flops",
            "mfu_achievable": round(floor / seconds_per_step, 4)}


def utilization_report(flops_per_step: int, seconds_per_step: float,
                       device_kind: str | None = None) -> dict:
    kind = (device_kind or jax.devices()[0].device_kind).lower()
    peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), 1e12)
    achieved = flops_per_step / seconds_per_step
    return {"device": kind, "achieved_flops": achieved, "peak_flops": peak,
            "mfu": achieved / peak, "seconds_per_step": seconds_per_step}


@dataclass
class MetricsLogger:
    """Structured JSONL metrics (ELBO curve, steps/s, audio-seconds/s)."""

    path: str | None = None
    records: list = field(default_factory=list)

    def log(self, **kv):
        rec = {"t": time.time(), **kv}
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as fh:
                fh.write(json.dumps(rec) + "\n")

    def summary(self):
        return self.records[-1] if self.records else {}
