"""Overlap-add merging pinned against a direct transcription of the reference
algorithm (window_overlap.py:19-59) and the COLA reconstruction identity."""

import numpy as np
import pytest

from gpitch_tpu.audio import (augmentate, hann, merged_mean, merged_variance,
                              merged_x, num_windows, overlap_add, segmented,
                              trim_n_merge, window_stack, windowed)


def _reference_merged(y_windows, ws, n, squared=False):
    """Direct transcription of reference merged_mean/merged_variance."""
    y = [w.copy() for w in y_windows]
    nw = len(y)
    ll = (ws - 1) // 2
    for i in range(nw):
        win = hann(ws).reshape(-1, 1)
        if i == 0:
            win[0:ll] = 1.0
        elif i == nw - 1:
            win[-ll:] = 1.0
        if squared:
            win = win ** 2
        y[i] = y[i] * win
    out = np.zeros((n, 1))
    out[0:ll] = y[0][0:ll]
    out[-ll:] = y[-1][-ll:]
    for i in range(nw - 1):
        out[(i + 1) * ll: (i + 2) * ll + 1] = y[i][ll:] + y[i + 1][0:ll + 1]
    return out


@pytest.mark.parametrize("ws,nw", [(2001, 5), (101, 8), (51, 3)])
def test_merged_mean_matches_reference(ws, nw, rng):
    ll = (ws - 1) // 2
    n = ll * (nw - 1) + ws
    sig = rng.standard_normal(n)
    xw, yw = windowed(np.arange(n, dtype=float), sig, ws)
    assert len(yw) == nw == num_windows(n, ws)
    got = merged_mean([w.copy() for w in yw], ws, n)
    want = _reference_merged(yw, ws, n)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("ws,nw", [(2001, 4), (101, 6)])
def test_merged_variance_matches_reference(ws, nw, rng):
    ll = (ws - 1) // 2
    n = ll * (nw - 1) + ws
    sig = np.abs(rng.standard_normal(n)) + 0.1
    _, yw = windowed(np.arange(n, dtype=float), sig, ws)
    got = merged_variance([w.copy() for w in yw], ws, n)
    want = _reference_merged(yw, ws, n, squared=True)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_cola_perfect_reconstruction(rng):
    """Windowing a signal then Hann-merging must reproduce it exactly
    (the flat-boundary treatment makes the identity hold at the edges too)."""
    ws, nw = 201, 7
    ll = (ws - 1) // 2
    n = ll * (nw - 1) + ws
    sig = rng.standard_normal(n)
    _, yw = windowed(np.arange(n, dtype=float), sig, ws)
    rec = merged_mean(yw, ws, n)
    np.testing.assert_allclose(rec[:, 0], sig, atol=1e-10)


def test_window_stack_matches_windowed(rng):
    ws = 101
    n = 50 * 9 + ws
    sig = rng.standard_normal(n)
    _, yw = windowed(np.arange(n, dtype=float), sig, ws)
    stack = window_stack(sig, ws)
    np.testing.assert_allclose(stack, np.stack([w[:, 0] for w in yw]))


def test_overlap_add_jax_matches_numpy(rng):
    import jax.numpy as jnp
    ws, nw = 101, 5
    ll = (ws - 1) // 2
    n = ll * (nw - 1) + ws
    wins = rng.standard_normal((nw, ws))
    a = overlap_add(wins, n)
    b = overlap_add(jnp.asarray(wins), n)
    np.testing.assert_allclose(np.asarray(b), a, atol=1e-12)


def test_segmented_and_augmentate(rng):
    n = 1000
    x = np.linspace(0, (n - 1) / 16000, n).reshape(-1, 1)
    y = rng.standard_normal((n, 1))
    xs, ys = segmented(x, y, window_size=250)
    assert len(xs) == 4 and xs[0].shape == (250, 1)
    np.testing.assert_allclose(np.concatenate(ys), y)

    xa, ya = augmentate(xs[0], ys[0], augment_size=100)
    assert ya.shape == (450, 1)
    assert np.all(ya[:100] == 0) and np.all(ya[-100:] == 0)
    np.testing.assert_allclose(ya[100:-100], ys[0])

    merged = trim_n_merge([ya, ya], trim_size=100)
    np.testing.assert_allclose(merged, np.concatenate([ys[0], ys[0]]))


def test_merged_x(rng):
    ws = 51
    n = 25 * 4 + ws
    x = np.arange(n, dtype=float)
    xw, _ = windowed(x, x, ws)
    out = merged_x(xw, ws)
    np.testing.assert_allclose(out[:, 0], x[:out.size])
