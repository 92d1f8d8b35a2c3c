"""Global numerics configuration.

The reference (gpflow `settings`, used at e.g. /root/reference/gpitch/pdgp.py:13-14)
runs float64 with a global jitter level.  On TPU float64 is emulated and slow, so the
default here is float32 with a larger jitter; float64 can be enabled globally via
``jax.config.update("jax_enable_x64", True)`` (the test-suite does this on CPU) and
everything below follows automatically.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

# GP linear algebra at bf16 matmul precision is unsafe: JAX's TPU default
# multiplies f32 operands at bf16 precision, which put ~0.8% relative error
# on the collapsed bound at quality shapes (f64-arbitrated, round 4) and can
# flip near-singular Cholesky pivots negative.  Measured on v5e at quality
# shapes (collapsed-bound rel err vs f64 / AMT-bank grad step):
#   bfloat16 (jax TPU default)  7.7e-3   49.0 ms
#   high     (bf16_3x)          6.7e-5   53.3 ms   <- gpitch_tpu default
#   highest  (f32-equivalent)   3.6e-5   75.1 ms
# "high" restores f32-grade accuracy for ~9% step cost; opt out or up with
# GPITCH_TPU_MATMUL_PRECISION={default,high,highest}.
_prec = os.environ.get("GPITCH_TPU_MATMUL_PRECISION", "high")
if _prec != "default":
    jax.config.update("jax_default_matmul_precision", _prec)

__all__ = [
    "default_float",
    "default_jitter",
    "set_jitter",
    "use_pallas_specmix",
    "set_pallas_specmix",
    "use_pallas_chol",
    "set_pallas_chol",
    "enable_persistent_compilation_cache",
    "NumericsConfig",
    "init_settings",
]


def enable_persistent_compilation_cache(path: str = "/tmp/gpitch_jax_cache",
                                        min_compile_time: float = 1.0) -> str:
    """Turn on XLA's on-disk executable cache (jax persistent compilation
    cache).

    Windowed-bank programs compile for tens of seconds (the 88-pitch AMT
    chunk measured 94 s in round 3) and are recompiled identically by every
    quality/bench process; caching them is the standard production answer —
    a re-run of the same pipeline loads the executable in ~1 s.  Safe to call
    more than once.  Returns the cache directory."""
    import os
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time)
    return path


def init_settings(visible_device: str | None = None, interactive: bool = False,
                  run_on_server: bool = True, allow_growth: bool = True):
    """TPU-native replacement for the reference's session/GPU bootstrap
    (methods.py:155-180, which sets CUDA_VISIBLE_DEVICES and builds a TF1
    session).  JAX needs neither: returns the live device list in place of a
    session, plus the dataset root path the reference derives from
    ``run_on_server`` ('/import/' vs '/'; reference default is True).
    ``visible_device``/``interactive``/``allow_growth`` are accepted for
    signature parity and ignored."""
    del visible_device, interactive, allow_growth
    path = "/import/" if run_on_server else "/"
    return jax.devices(), path


def default_float() -> jnp.dtype:
    """Active float dtype: float64 iff x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


_JITTER = {"value": None}

_PALLAS_SPECMIX = {"value": False}


def use_pallas_specmix() -> bool:
    """Whether spectral-mixture kernels build K via the fused Pallas kernel
    (linalg/pallas/specmix.py) instead of the XLA feature matmul.

    Default False: measured on TPU v5e the MXU feature-matmul path wins at
    every workload size (docs/PALLAS_SPECMIX.md) — the Pallas kernel is
    transcendental-bound on the VPU, the matmul rides the MXU.  The flag
    exists so the comparison stays reproducible on future hardware."""
    return _PALLAS_SPECMIX["value"]


def set_pallas_specmix(enabled: bool) -> None:
    _PALLAS_SPECMIX["value"] = bool(enabled)


_PALLAS_CHOL = {"value": os.environ.get("GPITCH_TPU_PALLAS_CHOL", "1") != "0"}


def use_pallas_chol() -> bool:
    """Whether ``linalg.chol_inv`` factorizes small batched matrices with the
    lanes-batched Pallas Cholesky (linalg/pallas/chol.py) on TPU.

    Default True: XLA's blocked-panel cholesky is latency-bound at gpitch's
    bank shapes (hundreds of M ~ 112-160 matrices per step); the Pallas
    kernel keeps a tile of matrices in VMEM and fills the vector lanes with
    the batch (measured on v5e, see docs/ROOFLINE.md).  Only consulted on the
    TPU backend for M <= 256."""
    return _PALLAS_CHOL["value"]


def set_pallas_chol(enabled: bool) -> None:
    _PALLAS_CHOL["value"] = bool(enabled)


def default_jitter() -> float:
    """Diagonal jitter added to Gram matrices before Cholesky.

    Mirrors gpflow ``settings.numerics.jitter_level`` (reference pdgp.py:14,
    sgpr_ss.py:43).  f32 needs a larger floor than f64.
    """
    if _JITTER["value"] is not None:
        return _JITTER["value"]
    return 1e-6 if jax.config.jax_enable_x64 else 1e-4


def set_jitter(value: float | None) -> None:
    """Override the global jitter level (``None`` restores dtype-based default)."""
    _JITTER["value"] = value


@dataclasses.dataclass(frozen=True)
class NumericsConfig:
    """Per-model numerics overrides."""

    jitter: float | None = None
    gh_points: int = 20  # Gauss-Hermite order, reference likelihoods.py:429

    def jitter_value(self) -> float:
        return self.jitter if self.jitter is not None else default_jitter()
