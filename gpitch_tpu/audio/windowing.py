"""Windowing and Hann overlap-add merging — the sequence-scaling subsystem.

Rebuilds /root/reference/gpitch/window_overlap.py.  The reference merges
posterior windows with per-window Python loops and in-place slice assignments
(window_overlap.py:19-59); here merging is a vectorized weighted scatter-add
(``overlap_add``) that runs on device, and the window batch axis is exactly the
axis the pipelines shard across chips (see parallel/).

Semantics proved equivalent to the reference (tests/test_windowing.py pins them
against a direct transcription): with hop ll=(ws-1)//2 and a symmetric Hann
window, interior points always see two windows whose weights sum to 1 (COLA),
and the reference's boundary "flattening" (win[:ll]=1 on the first window,
win[-ll:]=1 on the last, lines 23-28/44-50) is applied to the weight matrix.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hann", "windowed", "segmented", "augmentate", "trim_n_merge",
           "ola_weights", "overlap_add", "merged_mean", "merged_variance",
           "merged_x", "merged_y", "window_stack", "num_windows",
           "get_results_arrays", "get_results_arrays_noov"]


def hann(ws: int) -> np.ndarray:
    """Symmetric Hann window (scipy.signal.hann equivalent)."""
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(ws) / (ws - 1.0)))


def num_windows(n: int, ws: int) -> int:
    ll = (ws - 1) // 2
    return (n - ws) // ll + 1


def windowed(x, y, ws: int):
    """50%-overlap framing, hop (ws-1)//2 — window_overlap.py:7-16.
    Returns lists of (ws, 1) windows."""
    x = np.asarray(x).reshape(-1, 1)
    y = np.asarray(y).reshape(-1, 1)
    ll = (ws - 1) // 2
    nw = num_windows(x.shape[0], ws)
    xs = [x[i * ll: i * ll + ws].copy() for i in range(nw)]
    ys = [y[i * ll: i * ll + ws].copy() for i in range(nw)]
    return xs, ys


def window_stack(y, ws: int) -> np.ndarray:
    """(nw, ws) strided view of the overlap windows — the batched-model input.

    Dispatches through the native C++ framer (gpitch_tpu.native.frame_windows,
    parity pinned in tests/test_native.py); GPITCH_TPU_NATIVE=0 or a missing
    toolchain falls back to the numpy gather."""
    from .. import native
    y = np.asarray(y).reshape(-1)
    if native.enabled():
        return native.frame_windows(y, ws).astype(y.dtype, copy=False)
    ll = (ws - 1) // 2
    nw = num_windows(y.shape[0], ws)
    idx = np.arange(nw)[:, None] * ll + np.arange(ws)[None, :]
    return y[idx]


def segmented(x, y, window_size: int = 32000, aug: bool = False):
    """Disjoint segmentation (window_overlap.py:194-211)."""
    x = np.asarray(x).reshape(-1, 1)
    y = np.asarray(y).reshape(-1, 1)
    nw = y.shape[0] // window_size
    xs, ys = [], []
    for i in range(nw):
        xa = x[i * window_size:(i + 1) * window_size].copy()
        ya = y[i * window_size:(i + 1) * window_size].copy()
        if aug:
            xa, ya = augmentate(xa, ya)
        xs.append(xa)
        ys.append(ya)
    return xs, ys


def augmentate(x, y, augment_size: int = 1600, fs: float = 16000.0):
    """Zero-pad both ends and extend the time vector (window_overlap.py:213-220)."""
    zeros = np.zeros((augment_size, 1))
    yaug = np.concatenate([zeros, np.asarray(y).reshape(-1, 1), zeros], axis=0)
    alpha = augment_size / fs
    x = np.asarray(x).reshape(-1)
    xaug = np.linspace(float(x[0]) - alpha, float(x[-1]) + alpha,
                       x.size + 2 * augment_size).reshape(-1, 1)
    return xaug, yaug


def trim_n_merge(windows, trim_size: int = 1600, aug: bool = True):
    """Trim augmentation padding and concatenate (methods.py:57-65)."""
    parts = []
    for w in windows:
        w = np.asarray(w).reshape(-1, 1)
        parts.append(w[trim_size:-trim_size] if aug else w)
    return np.concatenate(parts, axis=0)


def ola_weights(nw: int, ws: int, squared: bool = False,
                flat_boundaries: bool = True, dtype=np.float64) -> np.ndarray:
    """(nw, ws) overlap-add weight matrix.

    Hann everywhere; first/last windows flattened on their outer halves
    (window_overlap.py:23-28).  ``squared`` gives the variance path
    (window_overlap.py:52)."""
    ll = (ws - 1) // 2
    w = hann(ws)
    W = np.tile(w, (nw, 1))
    if flat_boundaries and nw > 0:
        W[0, :ll] = 1.0
        W[-1, -ll:] = 1.0
    if squared:
        W = W ** 2
    return W.astype(dtype)


def overlap_add(windows, n: int, weights=None):
    """Weighted overlap-add of (nw, ws) windows with hop (ws-1)//2 -> (n,).

    Works on numpy or jax arrays (device scatter-add under jit).
    """
    windows = _asarray2d(windows)
    nw, ws = windows.shape
    ll = (ws - 1) // 2
    if weights is None:
        weights = ola_weights(nw, ws)
    contrib = windows * weights
    idx = (np.arange(nw)[:, None] * ll + np.arange(ws)[None, :]).reshape(-1)
    if type(windows).__module__.startswith("jax"):
        import jax.numpy as jnp
        out = jnp.zeros((n,), dtype=windows.dtype)
        return out.at[idx].add(contrib.reshape(-1))
    out = np.zeros((n,), dtype=np.asarray(contrib).dtype)
    np.add.at(out, idx, np.asarray(contrib).reshape(-1))
    return out


def merged_mean(y, ws: int, n: int):
    """Hann overlap-add of posterior means (window_overlap.py:19-37).
    ``y``: list of (ws, 1) windows or (nw, ws) array.  Returns (n, 1)."""
    windows = _asarray2d(y)
    out = overlap_add(windows, n, ola_weights(windows.shape[0], ws))
    return np.asarray(out).reshape(-1, 1)


def merged_variance(y, ws: int, n: int):
    """Hann^2 overlap-add of posterior variances (window_overlap.py:40-59)."""
    windows = _asarray2d(y)
    out = overlap_add(windows, n, ola_weights(windows.shape[0], ws, squared=True))
    return np.asarray(out).reshape(-1, 1)


def merged_x(x, ws: int):
    """Merge the window time vectors back into one (window_overlap.py:62-74)."""
    ll = (ws - 1) // 2
    nw = len(x)
    n = ll * (nw - 1) + ws
    first = np.asarray(x[0]).reshape(-1)
    last = np.asarray(x[-1]).reshape(-1)
    out = np.zeros(n)
    out[:ws] = first
    for i in range(1, nw):
        out[i * ll: i * ll + ws] = np.asarray(x[i]).reshape(-1)
    return out.reshape(-1, 1)


def merged_y(y, ws: int):
    """Hann overlap-add of data/estimate windows back to one signal.

    The reference calls an *undefined* ``merged_y`` from get_results_arrays
    (window_overlap.py:107-112, dead code); this is the working definition —
    COLA reconstruction, so merging the output of ``windowed`` returns the
    original signal exactly (pinned in tests/test_windowing.py)."""
    windows = _asarray2d(y)
    nw = windows.shape[0]
    ll = (ws - 1) // 2
    n = ll * (nw - 1) + ws
    return merged_mean(windows, ws, n)


def get_results_arrays(x, y, sl, ws: int):
    """Merge per-window source estimates into full-length arrays
    (window_overlap.py:106-123, repaired): ``sl`` is a list of per-source
    window lists.  Returns (x, y, [s_i]) trimmed to a common length."""
    s_merged = [merged_y(s, ws) for s in sl]
    x_m = merged_x(x, ws)
    y_m = merged_y(y, ws)
    s_trim = [s[:-1].reshape(-1, 1) for s in s_merged]
    return x_m[:-1].reshape(-1, 1), y_m[:-1].reshape(-1, 1), s_trim


def get_results_arrays_noov(x, y, results, window_size: int):
    """Non-overlapping variant (window_overlap.py:126-137, repaired to actually
    accumulate all five quantities instead of only the last)."""
    out = []
    for quantity in results:
        out.append([np.asarray(src).reshape(-1, 1) for src in quantity])
    x_ar = np.asarray(x).reshape(-1, 1)
    y_ar = np.asarray(y).reshape(-1, 1)
    return x_ar, y_ar, out


def _asarray2d(y):
    if isinstance(y, (list, tuple)):
        mod = type(y[0]).__module__
        if mod.startswith("jax"):
            import jax.numpy as jnp
            return jnp.stack([w.reshape(-1) for w in y])
        return np.stack([np.asarray(w).reshape(-1) for w in y])
    return y if y.ndim == 2 else y.reshape(1, -1)
