"""Dense GP linear algebra: jittered Cholesky, conditionals, KL terms.

Rebuilds the gpflow machinery the reference calls into:
``gpflow.conditionals.conditional`` (used at /root/reference/gpitch/pdgp.py:147-155)
and ``gpflow.kullback_leiblers.gauss_kl`` (pdgp.py:120-129), on top of
``tf.cholesky``/``tf.matrix_triangular_solve`` (sgpr_ss.py:44-53).  Everything is
a pure function of arrays, batched-friendly (vmap over leading axes) and
lowered by XLA to the TPU's native Cholesky/triangular-solve ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..config import default_jitter, default_jitter_rel

__all__ = ["add_jitter", "safe_cholesky", "solve_lower", "solve_upper",
           "tri_inv_blocked", "chol_inv", "safe_chol_inv", "conditional",
           "base_conditional", "base_conditional_inv", "gauss_kl"]


def add_jitter(K, jitter: float | None = None, jitter_rel: float | None = None):
    """K + (jitter + jitter_rel_eff * mean(diag(K))) * I.

    The relative component scales the floor with the Gram's own magnitude so
    ill-conditioned banks stay factorizable at every kernel-variance scale
    the optimizer visits (round-4 AMT NaN: 1e-4 absolute was ~1e-7 relative
    on the y*20-scaled 44.1 kHz bank — below f32 matmul noise).  Defaults:
    config.default_jitter / config.default_jitter_rel (rel = 0 in f64, so
    f64-arbitrated golden values are unchanged).

    In f32 the relative floor is additionally M-aware:
    rel_eff = max(rel, 8e-7 * M).  An f32 Cholesky loses
    ~eps * lambda_max * sqrt(M) to rounding, and lambda_max <= M * mean(diag),
    so a FIXED relative floor is outrun by the rounding noise as M grows.
    Round-5 bisect (scripts/diag_amt_nan*.py): the 44.1 kHz M=160 AMT bank
    legitimately visits exact-low-rank Grams late in training (a pitch's
    lengthscale grows past the window span, making its block exactly the
    rank-2P Mercer form) — lambda_min(Kuu + floor) = 3.7e-4 sat INSIDE the
    f32 Cholesky noise (eps * lambda_max * sqrt(M) ~ 4e-4) and training
    NaN'd at stage-2 step ~120 from a smoothly-descending loss.
    8e-7 * M ~ 6.7 * eps_f32 * M keeps the floor above the noise bound at
    the measured lambda_max/mean_diag ~ 80-160 of these banks."""
    j = default_jitter() if jitter is None else jitter
    rel = default_jitter_rel() if jitter_rel is None else jitter_rel
    if rel:
        if K.dtype == jnp.float32:
            rel = max(float(rel), 8e-7 * K.shape[-1])
        d = jnp.diagonal(K, axis1=-2, axis2=-1)
        j = j + rel * jnp.mean(d, axis=-1)[..., None, None]
        return K + j * jnp.eye(K.shape[-1], dtype=K.dtype)
    return K + j * jnp.eye(K.shape[-1], dtype=K.dtype)


def safe_cholesky(K, jitter: float | None = None):
    """Cholesky of K + jitter*I (reference pdgp.py:126-127, sgpr_ss.py:43)."""
    return jnp.linalg.cholesky(add_jitter(K, jitter))


def solve_lower(L, B):
    return jsl.solve_triangular(L, B, lower=True)


def solve_upper(L, B):
    """Solves L^T x = B for lower-triangular L."""
    return jsl.solve_triangular(L.T, B, lower=False)


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


def _phi(X):
    """tril with halved diagonal — the projection in the Cholesky VJP."""
    d = jnp.diagonal(X, axis1=-2, axis2=-1)
    eye = jnp.eye(X.shape[-1], dtype=X.dtype)
    return jnp.tril(X, -1) + 0.5 * eye * d[..., None, :]


def tri_inv_blocked(L, block: int = 256):
    """Inverse of a lower-triangular matrix by recursive 2x2 block doubling.

    XLA lowers ``solve_triangular(L, I)`` on TPU to a sequential blocked
    while-loop whose per-panel latency dominates at N ~ 2000 (the separation
    predict path's full-data factorization) — the MXU sits idle between tiny
    dependent panels.  This computes the same inverse as

        inv([[A, 0], [B, C]]) = [[inv(A), 0],
                                 [-inv(C) B inv(A), inv(C)]]

    applied bottom-up: ONE batched ``solve_triangular`` over all diagonal
    ``block x block`` panels (independent -> batched, not sequential), then
    log2(N/block) levels of batched GEMMs — all the O(N^3) work rides the
    MXU.  Pads N up to block * 2^k with an identity tail (exact: the pad
    block's inverse is I and its off-diagonal couplings are zero), slices
    back.  Works on a single (N, N) matrix; vmap for batches.
    """
    n = L.shape[-1]
    if L.ndim != 2:
        raise ValueError("tri_inv_blocked expects (N, N); vmap for batches")
    nb = max(1, -(-n // block))
    p2 = 1 << (nb - 1).bit_length()
    m = p2 * block
    if m != n:
        Lp = jnp.zeros((m, m), dtype=L.dtype)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, m), jnp.arange(n, m)].set(1.0)
        L = Lp

    # base case: all diagonal blocks inverted in ONE batched solve
    blocks = L.reshape(p2, block, p2, block)
    diag = blocks[jnp.arange(p2), :, jnp.arange(p2), :]        # (p2, b, b)
    eye = jnp.broadcast_to(jnp.eye(block, dtype=L.dtype), diag.shape)
    X = jsl.solve_triangular(diag, eye, lower=True)            # (p2, b, b)

    s, cnt = block, p2
    while cnt > 1:
        cnt //= 2
        Xa, Xc = X[0::2], X[1::2]                              # (cnt, s, s)
        Lv = L.reshape(cnt, 2 * s, cnt, 2 * s)
        pair = Lv[jnp.arange(cnt), :, jnp.arange(cnt), :]      # (cnt, 2s, 2s)
        B = pair[:, s:, :s]                                    # (cnt, s, s)
        low = -Xc @ B @ Xa
        top = jnp.concatenate([Xa, jnp.zeros_like(Xa)], axis=-1)
        bot = jnp.concatenate([low, Xc], axis=-1)
        X = jnp.concatenate([top, bot], axis=-2)               # (cnt, 2s, 2s)
        s *= 2
    return X[0][:n, :n]


# triangular inverses at or above this size always use the blocked-GEMM path
# inside chol_inv; below it the blocked path is used on TPU only (measured on
# v5e at bank shapes: (439,160,160) XLA solve 11.0 ms vs blocked 5.6 ms;
# (222,112,112) 3.3 ms vs 1.5 ms — XLA's sequential panel solve is
# latency-bound even at small M, docs/ROOFLINE.md) — on CPU LAPACK wins
_TRI_INV_BLOCK_MIN = 1024


def _tri_inv(L):
    from ..config import use_tri_inv_blocked
    n = L.shape[-1]
    on_tpu = (jax.default_backend() == "tpu") and use_tri_inv_blocked()
    if n >= _TRI_INV_BLOCK_MIN or (on_tpu and n > 32):
        block = 32 if n <= 512 else 256
        f = lambda x: tri_inv_blocked(x, block=block)
        for _ in range(L.ndim - 2):
            f = jax.vmap(f)
        return f(L)
    eye = jnp.eye(n, dtype=L.dtype)
    return jsl.solve_triangular(L, jnp.broadcast_to(eye, L.shape), lower=True)


def _pallas_chol_selfcheck(m: int) -> bool:
    """One-time per (device_kind, M) validation of the Pallas Cholesky.

    The panel kernel's correctness is compiler/hardware-empirical (its own
    docstring records a Mosaic miscompile at one slab layout); it was
    hardware-verified on v5e only.  Before the first production use at a
    given M, factor a strongly-correlated ill-conditioned Gram and compare
    against XLA's cholesky — on mismatch, warn and route every Cholesky at
    that size back to XLA (round-4 ADVICE medium: a different TPU generation
    or Mosaic version must degrade gracefully, not corrupt training).
    """
    import numpy as _np

    from .pallas.chol import cholesky_batched
    i = _np.arange(m, dtype=_np.float64)
    corr = _np.exp(-_np.abs(i[:, None] - i[None, :]) / max(m / 3.0, 1.0))
    gram = (corr + 1e-3 * _np.eye(m)).astype(_np.float32)
    # the check fires from _cholesky at TRACE time; JAX's trace context is
    # thread-local, so a worker thread evaluates these concrete-input calls
    # eagerly instead of having them swallowed into the caller's jaxpr as
    # tracers (ensure_compile_time_eval doesn't work here — it leaks into the
    # pallas kernel's own trace and turns its iota buffers into captured
    # constants)
    import threading
    res: dict = {}

    def _run():
        kb = jnp.asarray(_np.broadcast_to(gram, (3, m, m)))
        res["got"] = _np.asarray(cholesky_batched(kb)[0])
        res["want"] = _np.asarray(jnp.linalg.cholesky(kb[0]))

    def _run_guarded():
        try:
            _run()
        except Exception as e:  # noqa: BLE001 — any failure means "not verified"
            res["error"] = e

    t = threading.Thread(target=_run_guarded, daemon=True)
    t.start()
    t.join()
    if "got" not in res or "want" not in res:
        import warnings
        warnings.warn(
            f"Pallas Cholesky self-check errored at M={m} "
            f"({res.get('error')!r}); falling back to XLA cholesky",
            RuntimeWarning, stacklevel=3)
        return False
    got, want = res["got"], res["want"]
    scale = float(_np.max(_np.abs(want)))
    ok = bool(_np.isfinite(got).all()
              and float(_np.max(_np.abs(got - want))) <= 1e-3 * scale + 1e-5)
    if not ok:
        import warnings
        warnings.warn(
            f"Pallas Cholesky self-check FAILED at M={m} on "
            f"{jax.devices()[0].device_kind!r}; falling back to XLA "
            "cholesky for this size (set GPITCH_TPU_PALLAS_CHOL=0 to "
            "silence)", RuntimeWarning, stacklevel=3)
    return ok


_PALLAS_CHOL_OK: dict[tuple[str, int], bool] = {}


def _pallas_chol_verified(m: int) -> bool:
    key = (jax.devices()[0].device_kind, m)
    if key not in _PALLAS_CHOL_OK:
        _PALLAS_CHOL_OK[key] = _pallas_chol_selfcheck(m)
    return _PALLAS_CHOL_OK[key]


def _cholesky(K):
    """jnp.linalg.cholesky, or the lanes-batched Pallas kernel on TPU when
    enabled (config.set_pallas_chol) — see linalg/pallas/chol.py.  The
    Pallas route is gated by a one-time numerical self-check per device/M
    (_pallas_chol_selfcheck); the check runs on the host at trace time."""
    from ..config import use_pallas_chol
    if (use_pallas_chol() and K.shape[-1] <= 256
            and jax.default_backend() == "tpu"
            and _pallas_chol_verified(int(K.shape[-1]))):
        from .pallas.chol import cholesky_batched, pallas_chol_single
        if K.ndim == 2:
            return pallas_chol_single(K)
        lead = K.shape[:-2]
        out = cholesky_batched(K.reshape((-1,) + K.shape[-2:]))
        return out.reshape(lead + K.shape[-2:])
    return jnp.linalg.cholesky(K)


@jax.custom_vjp
def chol_inv(K):
    """(L, Linv): Cholesky of K and its explicit triangular inverse.

    TPU rationale: XLA lowers ``solve_triangular`` and the autodiff VJPs of
    ``cholesky``/``solve_triangular`` to blocked while-loops whose latency
    dominates the SVGP/SGPR training step at gpitch sizes (M ~ 128).  Paying
    one extra M-wide triangular solve in the forward pass buys (a) every
    downstream "solve" as an MXU matmul ``Linv @ B`` and (b) a backward pass
    that is *pure matmuls* (Murray 2016, arXiv:1602.07527: the Cholesky
    pullback is Linv^T Phi(L^T L_bar) Linv; with Linv in hand no triangular
    solve appears anywhere in the VJP).  Batched over leading axes.
    """
    L = _cholesky(K)
    return L, _tri_inv(L)


def _chol_inv_fwd(K):
    out = chol_inv(K)
    return out, out


def _chol_inv_bwd(res, cots):
    L, Linv = res
    L_bar, Linv_bar = cots
    # dLinv = -Linv dL Linv  =>  contribution to L_bar is -Linv^T Linv_bar Linv^T
    total = L_bar - _mT(Linv) @ Linv_bar @ _mT(Linv)
    K_bar = _mT(Linv) @ _phi(_mT(L) @ total) @ Linv
    K_bar = 0.5 * (K_bar + _mT(K_bar))
    return (K_bar,)


chol_inv.defvjp(_chol_inv_fwd, _chol_inv_bwd)


def safe_chol_inv(K, jitter: float | None = None,
                  jitter_rel: float | None = None):
    """chol_inv of K + (jitter + jitter_rel*mean diag)*I (see add_jitter)."""
    return chol_inv(add_jitter(K, jitter, jitter_rel))


def base_conditional(Kmn, Lm, Knn_diag, q_mu, q_sqrt=None, whiten=True):
    """q(f(Xnew)) given q(u)=N(q_mu, q_sqrt q_sqrt^T) and precomputed chol(Kmm).

    Kmn: (M, N) cross-covariance; Lm: (M, M) Cholesky of Kmm+jitter;
    Knn_diag: (N,); q_mu: (M, Q); q_sqrt: (M, M) lower-triangular or None.
    Returns mean (N, Q), var (N, Q) — the marginal (full_cov=False) path, which
    is the only one the reference exercises (pdgp.py:150).
    """
    A = solve_lower(Lm, Kmn)                       # (M, N)
    fvar = Knn_diag - jnp.sum(jnp.square(A), 0)    # (N,)
    if not whiten:
        A = solve_upper(Lm, A)                     # Kmm^{-1} Kmn path
    fmean = A.T @ q_mu                             # (N, Q)
    if q_sqrt is not None:
        LTA = jnp.tril(q_sqrt).T @ A               # (M, N)
        fvar = fvar + jnp.sum(jnp.square(LTA), 0)
    return fmean, fvar[:, None] * jnp.ones_like(fmean)


def base_conditional_inv(Kmn, Lm_inv, Knn_diag, q_mu, q_sqrt=None, whiten=True):
    """base_conditional with the explicit inverse from ``chol_inv`` — every
    solve becomes an MXU matmul (and the VJP stays matmul-only)."""
    A = Lm_inv @ Kmn                               # (M, N)
    fvar = Knn_diag - jnp.sum(jnp.square(A), 0)    # (N,)
    if not whiten:
        A = _mT(Lm_inv) @ A                        # Kmm^{-1} Kmn path
    fmean = A.T @ q_mu                             # (N, Q)
    if q_sqrt is not None:
        LTA = jnp.tril(q_sqrt).T @ A               # (M, N)
        fvar = fvar + jnp.sum(jnp.square(LTA), 0)
    return fmean, fvar[:, None] * jnp.ones_like(fmean)


def conditional(Xnew, Z, kernel, q_mu, q_sqrt=None, whiten=True,
                jitter: float | None = None):
    """Functional gpflow.conditionals.conditional (pdgp.py:147-155)."""
    Kmm = kernel.K(Z)
    _, Lm_inv = safe_chol_inv(Kmm, jitter)
    Kmn = kernel.K(Z, Xnew)
    Knn = kernel.Kdiag(Xnew)
    return base_conditional_inv(Kmn, Lm_inv, Knn, q_mu, q_sqrt, whiten)


def gauss_kl(q_mu, q_sqrt, K=None, jitter: float | None = None):
    """KL[N(q_mu, S) || N(0, K)] with S = tril(q_sqrt) tril(q_sqrt)^T.

    K=None is the whitened prior N(0, I) — reference pdgp.py:120-121; the
    unwhitened path (pdgp.py:126-129) passes K(Z)+jitter.
    q_mu: (M, Q); q_sqrt: (M, M) (Q=1 in gpitch models).
    """
    M = q_mu.shape[0]
    q = q_mu.shape[1]
    Lq = jnp.tril(q_sqrt)
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diag(Lq)) + 1e-38))
    if K is None:
        mahal = jnp.sum(jnp.square(q_mu))
        trace = jnp.sum(jnp.square(Lq)) * q
        logdet_p = 0.0
    else:
        Lp, Lp_inv = safe_chol_inv(K, jitter)
        alpha = Lp_inv @ q_mu
        mahal = jnp.sum(jnp.square(alpha))
        LiLq = Lp_inv @ Lq
        trace = jnp.sum(jnp.square(LiLq)) * q
        logdet_p = 2.0 * q * jnp.sum(jnp.log(jnp.abs(jnp.diag(Lp))))
    return 0.5 * (mahal + trace - M * q - q * logdet_q + logdet_p)
