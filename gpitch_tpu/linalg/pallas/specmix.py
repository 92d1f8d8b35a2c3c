"""Pallas TPU kernel: fused spectral-mixture covariance build.

Builds K[i,j] = variance * exp(-|x_i - x2_j|/l) * sum_p e_p cos(2*pi*f_p*(x_i-x2_j))
(the Matern12sm/MercerMatern12sm covariance, reference
matern12_spectral_mixture.py:38-56) in one pass over (TILE_N, TILE_M) VMEM
tiles: the pairwise difference, the P cosine partials and the exponential
envelope never round-trip through HBM.  The XLA path (kernels/spectral.py)
materializes cos/sin feature matrices and relies on fusion; this kernel is the
bandwidth-optimal alternative — it reads N+M+2P floats and writes N*M.

Grid: (cdiv(N, TILE_N), cdiv(M, TILE_M)); partials unrolled statically (P is a
compile-time constant <= ~32 in all gpitch workloads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["specmix_matrix", "specmix_matrix_xla"]


def _kernel(x_ref, x2_ref, ef_ref, sc_ref, out_ref, *, num_partials: int,
            m32: bool):
    # x_ref: (TN, 1); x2_ref: (1, TM); ef_ref: (2, P) [energy; freq] in VMEM;
    # sc_ref: (1, 2) [variance, inv_lengthscale] in SMEM
    d = x_ref[:] - x2_ref[:]                     # (TN, TM) broadcast diff
    r = jnp.abs(d)
    two_pi = 6.283185307179586
    acc = ef_ref[0, 0] * jnp.cos(two_pi * ef_ref[1, 0] * d)
    for p in range(1, num_partials):
        acc += ef_ref[0, p] * jnp.cos(two_pi * ef_ref[1, p] * d)
    variance = sc_ref[0, 0]
    inv_l = sc_ref[0, 1]
    r1 = r * inv_l
    if m32:
        env = (1.0 + r1) * jnp.exp(-r1)          # Matern-3/2 envelope
    else:
        env = jnp.exp(-r1)                       # Matern-1/2 envelope
    out_ref[:] = variance * env * acc


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "m32",
                                             "interpret"))
def specmix_matrix(x, x2, energy, frequency, variance, lengthscale,
                   tile_n: int = 256, tile_m: int = 128, m32: bool = False,
                   interpret: bool = False):
    """K(x, x2) for the Matern-1/2 (or -3/2 with ``m32``) spectral mixture.

    x: (N, 1); x2: (M, 1); energy/frequency: (P,).  For the Matern-3/2 form,
    ``variance`` should be 1.0 and the per-partial weights folded into
    ``energy`` (kernels/spectral.py Matern32sm convention).
    """
    x = x.reshape(-1, 1)
    x2r = x2.reshape(1, -1)
    n, m = x.shape[0], x2r.shape[1]
    p = energy.shape[0]
    dtype = x.dtype

    ef = jnp.stack([energy.astype(dtype), frequency.astype(dtype)])  # (2, P)
    sc = jnp.array([[1.0, 1.0]], dtype=dtype)
    sc = sc.at[0, 0].set(variance).at[0, 1].set(1.0 / lengthscale)

    grid = (pl.cdiv(n, tile_n), pl.cdiv(m, tile_m))
    kernel = functools.partial(_kernel, num_partials=p, m32=m32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, p), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, tile_m), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * m * p,
            bytes_accessed=(n + m + 2 * p) * 4 + n * m * 4,
            transcendentals=n * m * (p + 1),
        ),
        interpret=interpret,
    )(x, x2r, ef, sc)


def specmix_matrix_xla(x, x2, energy, frequency, variance, lengthscale,
                       m32: bool = False):
    """Reference XLA implementation (feature matmul) for equality tests."""
    from ...kernels.spectral import cos_mixture
    x = x.reshape(-1, 1)
    x2 = x2.reshape(-1, 1)
    r = jnp.abs(x - x2.T)
    mix = cos_mixture(x, x2, energy, frequency)
    r1 = r / lengthscale
    env = (1.0 + r1) * jnp.exp(-r1) if m32 else jnp.exp(-r1)
    return variance * env * mix
