"""Pallas TPU kernel: batched Cholesky of many small matrices.

XLA lowers ``jnp.linalg.cholesky`` on TPU to a While loop over ~16-wide
panels whose per-iteration latency dominates at gpitch's bank shapes —
hundreds of small (M ~ 112-160) matrices factorized per training step
(measured v5e: (439, 160, 160) = 13.8 ms, ~70%% of a bank step together with
the triangular solve; docs/ROOFLINE.md).  This kernel instead keeps a TILE of
``bt`` matrices resident in VMEM and runs the M-step right-looking
factorization with full-width masked vector ops, so the sequential loop's
per-iteration work is ``bt`` matrices wide — the batch, not the matrix,
fills the VPU lanes.

The matrix A stays symmetric through the rank-1 updates, so both the row and
the column of the pivot are extracted by masked reductions — no in-kernel
transposes (minor-dim transposes are slow on TPU).

Exact algorithm (per matrix, j = 0..M-1):
    d_j   = A[j, j]
    L[:, j] = (rows >= j) * A[:, j] / sqrt(d_j)
    A    -= outer((rows > j) * A[:, j], (cols > j) * A[j, :]) / d_j
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cholesky_batched", "pallas_chol_single"]


def _chol_kernel(k_ref, l_ref, *, m: int):
    """Unblocked masked right-looking factorization (v1: every iteration
    works on the full (bt, m, m) tile) — kept as the small-m path."""
    A = k_ref[...]                                       # (bt, m, m)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)  # column mask
    cols_r = jax.lax.broadcasted_iota(jnp.int32, (1, 1, m), 2)  # row mask
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, m, m), 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, m, m), 1)

    def body(j, carry):
        A, L = carry
        # pivot column (bt, m, 1) and pivot row (bt, 1, m) — A is symmetric
        colj = jnp.sum(jnp.where(cols == j, A, 0.0), axis=2, keepdims=True)
        rowj = jnp.sum(jnp.where(rows == j, A, 0.0), axis=1, keepdims=True)
        dj = jnp.sum(jnp.where(cols_r == j, rowj, 0.0), axis=2,
                     keepdims=True)                       # (bt, 1, 1)
        inv_sqrt = 1.0 / jnp.sqrt(dj)
        lj = jnp.where(rows_c >= j, colj * inv_sqrt, 0.0)  # (bt, m, 1)
        L = jnp.where(cols == j, lj, L)
        # symmetric trailing update A -= outer(strict col, strict row) / d
        sc = jnp.where(rows_c > j, colj, 0.0)
        sr = jnp.where(cols_r > j, rowj, 0.0)
        A = A - sc * (sr / dj)
        return A, L

    _, L = jax.lax.fori_loop(0, m, body, (A, jnp.zeros_like(A)))
    l_ref[...] = L


def _chol_kernel_panel(k_ref, l_ref, a_ref, *, m: int, panel: int):
    """Panel-blocked right-looking factorization (v2).

    The scalar recurrence only touches a (bt, m, panel) slab — the inner
    loop's VPU work per iteration is m*panel, not m*m — and each panel's
    trailing update A[k:, k:] -= L21 L21^T is ONE batched MXU GEMM.  Panels
    are a static Python loop; panel reads/writes are STATIC-slice ref
    accesses on the ``a_ref`` scratch (Pallas TPU has no dynamic_update_slice
    on values).

    Verified-correct size range: m >= 96 (hardware-checked at m=112/160,
    max err ~5e-7 vs XLA).  At m=64 the lane-offset slab slices of this
    kernel miscompiled on Mosaic (NaNs from the second panel), and a
    slicing-free variant that extracted panels with selection-matrix matmuls
    lost the matrix to the MXU's bf16 multiply truncation (~1e-3 errors,
    NaNs on ill-conditioned pivots) — so small m uses ``_chol_kernel`` (v1,
    full-width masked ops, no slicing, no matmuls).
    """
    np_panels = m // panel
    assert np_panels * panel == m
    a_ref[...] = k_ref[...]

    rows_s = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    pcols = jax.lax.broadcasted_iota(jnp.int32, (1, m, panel), 2)
    prows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, panel), 2)

    for p in range(np_panels):
        off = p * panel
        slab = a_ref[:, :, off:off + panel]              # (bt, m, panel)

        def body(i, slab, off=off):
            # j = off + i: global pivot; i: column within the slab
            colj = jnp.sum(jnp.where(pcols == i, slab, 0.0), axis=2,
                           keepdims=True)                # (bt, m, 1)
            dj = jnp.sum(jnp.where(rows_s == off + i, colj, 0.0), axis=1,
                         keepdims=True)                  # (bt, 1, 1)
            inv_sqrt = 1.0 / jnp.sqrt(dj)
            lj = jnp.where(rows_s >= off + i, colj * inv_sqrt, 0.0)
            # columns i+1..panel-1 of the slab get the rank-1 update; the
            # pivot row entries of those columns are row off+i of the slab
            rowi = jnp.sum(jnp.where(rows_s == off + i, slab, 0.0), axis=1,
                           keepdims=True)                # (bt, 1, panel)
            upd = jnp.where(prows > i, rowi * inv_sqrt, 0.0)
            slab = jnp.where(pcols == i, lj, slab) - lj * upd
            return slab

        slab = jax.lax.fori_loop(0, panel, body, slab)
        # every slab column is already masked to its lower part by the loop
        l_ref[:, :, off:off + panel] = slab
        if p + 1 < np_panels:
            # trailing symmetric update with the sub-diagonal panel block.
            # precision=HIGHEST is load-bearing: the Mosaic MXU multiplies
            # f32 operands at bf16 precision by default, which corrupts the
            # Schur complement by ~1e-2 on strongly-correlated Grams (NaNs
            # once a pivot goes negative); HIGHEST selects the multi-pass
            # f32-equivalent algorithm.
            l21 = slab[:, off + panel:, :]               # (bt, m', panel)
            upd = jax.lax.dot_general(
                l21, l21, (((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)      # (bt, m', m')
            a_ref[:, off + panel:, off + panel:] = (
                a_ref[:, off + panel:, off + panel:] - upd)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret",
                                             "panel"))
def cholesky_batched(K, batch_tile: int | None = None, interpret: bool = False,
                     panel: int | str = "auto"):
    """Cholesky of (B, M, M) PSD matrices, ``batch_tile`` per grid program.

    Pads the batch with identity matrices (factor = identity, sliced away).
    The default tile targets ~1 MB of matrix data per buffer: the kernel
    holds the in/out blocks (double-buffered), the two loop carries and the
    per-iteration temporaries in the 16 MB VMEM, so bt*M^2*4 must stay well
    under 2 MB (bt=16 at M=160 overflowed the scoped-vmem stack).
    """
    b, m = K.shape[0], K.shape[-1]
    if batch_tile is None:
        # measured optimum on v5e: bt=10 at M=160, bt=8-16 at M=112; larger
        # tiles regress (VMEM pressure), smaller amortize the loop less
        batch_tile = min(16, max(1, (1 << 20) // (m * m * 4)))
    bt = max(1, min(batch_tile, b))
    nb = -(-b // bt)
    pad = nb * bt - b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(m, dtype=K.dtype), (pad, m, m))
        K = jnp.concatenate([K, eye], axis=0)

    if panel == "auto":
        # panel path only in its hardware-verified range (see kernel doc)
        panel = (next((pn for pn in (32, 28, 16) if m % pn == 0), None)
                 if m >= 96 else None)
    if panel is not None:
        kernel = functools.partial(_chol_kernel_panel, m=m, panel=panel)
        scratch = [pltpu.VMEM((bt, m, m), K.dtype)]
    else:
        kernel = functools.partial(_chol_kernel, m=m)
        scratch = []
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * bt, m, m), K.dtype),
        grid=(nb,),
        in_specs=[pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, m, m), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=nb * bt * (m ** 3 // 3),
            bytes_accessed=2 * nb * bt * m * m * 4,
            transcendentals=nb * bt * m,
        ),
        interpret=interpret,
    )(K)
    return out[:b]


@jax.custom_batching.custom_vmap
def pallas_chol_single(K):
    """(M, M) Cholesky routed to the Pallas kernel; under ``jax.vmap`` the
    whole batch goes to ONE batched pallas_call (custom_vmap rule) instead of
    relying on pallas_call's generic batching."""
    return cholesky_batched(K[None])[0]


@pallas_chol_single.def_vmap
def _pallas_chol_vmap(axis_size, in_batched, K):
    del axis_size
    (k_batched,) = in_batched
    if not k_batched:
        return pallas_chol_single(K), False
    if K.ndim > 3:  # nested vmap: flatten leading axes into one batch
        lead = K.shape[:-2]
        out = cholesky_batched(K.reshape((-1,) + K.shape[-2:]))
        return out.reshape(lead + K.shape[-2:]), True
    return cholesky_batched(K), True
