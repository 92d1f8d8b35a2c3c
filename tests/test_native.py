"""Native C++ DSP runtime vs the numpy reference implementations.

The production paths (read_wav / window_stack / init_liv) now dispatch through
the native library when built, so every oracle here is computed with the
dispatch disabled (GPITCH_TPU_NATIVE=0) to keep the comparison native-vs-numpy
rather than native-vs-itself."""

import os

import numpy as np
import pytest

from gpitch_tpu import native
from gpitch_tpu.audio import ola_weights, overlap_add, read_wav, window_stack
from gpitch_tpu.pipelines import init_liv

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _no_native(fn, *args, **kw):
    """Run fn with the native dispatch disabled (numpy oracle path)."""
    old = os.environ.get("GPITCH_TPU_NATIVE")
    os.environ["GPITCH_TPU_NATIVE"] = "0"
    try:
        return fn(*args, **kw)
    finally:
        if old is None:
            del os.environ["GPITCH_TPU_NATIVE"]
        else:
            os.environ["GPITCH_TPU_NATIVE"] = old


def test_wav_read_matches_scipy(tmp_path, rng):
    from scipy.io import wavfile
    fs = 16000
    sig = (0.4 * np.sin(2 * np.pi * 440 * np.arange(fs) / fs)).astype(np.float32)
    p16 = os.path.join(tmp_path, "p16.wav")
    pf32 = os.path.join(tmp_path, "f32.wav")
    wavfile.write(p16, fs, (sig * 32767).astype(np.int16))
    wavfile.write(pf32, fs, sig)

    y, fs2 = native.wav_read(pf32)
    assert fs2 == fs
    np.testing.assert_allclose(y, sig, atol=1e-7)

    y2, _ = native.wav_read(p16)
    ref, _ = _no_native(read_wav, p16)
    np.testing.assert_allclose(y2, ref, atol=1e-9)

    # start/frames windowing
    y3, _ = native.wav_read(pf32, start=100, frames=50)
    np.testing.assert_allclose(y3, sig[100:150], atol=1e-7)

    # stereo mixdown
    pst = os.path.join(tmp_path, "st.wav")
    stereo = np.stack([sig, -sig], axis=1)
    wavfile.write(pst, fs, stereo)
    y4, _ = native.wav_read(pst)
    np.testing.assert_allclose(y4, np.zeros_like(sig), atol=1e-7)


def test_frame_windows_matches_numpy(rng):
    y = rng.standard_normal(5000)
    ws = 201
    got = native.frame_windows(y, ws)
    want = _no_native(window_stack, y, ws)
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("squared", [False, True])
def test_overlap_add_matches_numpy(squared, rng):
    ws, nw = 201, 6
    hop = (ws - 1) // 2
    n = hop * (nw - 1) + ws
    wins = rng.standard_normal((nw, ws))
    got = native.overlap_add_native(wins, n, squared=squared)
    want = overlap_add(wins, n, ola_weights(nw, ws, squared=squared))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-12)


def test_find_extrema_matches_init_liv(rng):
    n = 8000
    t = np.arange(n) / 16000.0
    y = np.sin(2 * np.pi * 200 * t) * np.exp(-5 * t) + 0.001 * rng.standard_normal(n)
    idx = native.find_extrema(y, smooth_win=9, thres=0.0025, dec=1)
    x = np.arange(n, dtype=float)
    z, _ = _no_native(init_liv, x, y, num_sources=1, win_size=9, thres=0.0025,
                      dec=1)
    want = z[0][0].reshape(-1)
    got = idx.astype(float)
    # same count and same positions (allow one-off boundary differences)
    assert abs(len(got) - len(want)) <= 2
    m = min(len(got), len(want))
    np.testing.assert_allclose(got[:m], want[:m], atol=1.0)
