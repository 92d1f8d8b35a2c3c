"""Audio I/O and containers.

Rebuilds ``readaudio`` (/root/reference/gpitch/methods.py:36-54) and the
``Audio`` container (audio.py:6-37) without the soundfile dependency: WAV
decoding goes through scipy.io.wavfile (PCM + IEEE float), normalized to
float mono column vectors.
"""

from __future__ import annotations

import numpy as np

from .windowing import segmented, windowed

__all__ = ["read_wav", "readaudio", "Audio", "synth_tone"]

_PCM_SCALE = {np.dtype(np.int16): 32768.0, np.dtype(np.int32): 2147483648.0,
              np.dtype(np.uint8): 128.0}


def read_wav(path):
    """(samples float64 array, fs). Handles PCM 8/16/32-bit and float WAVs."""
    from scipy.io import wavfile
    fs, data = wavfile.read(path)
    data = np.asarray(data)
    if data.dtype in _PCM_SCALE:
        offset = 128.0 if data.dtype == np.uint8 else 0.0
        data = (data.astype(np.float64) - offset) / _PCM_SCALE[data.dtype]
    else:
        data = data.astype(np.float64)
    return data, fs


def readaudio(fname, frames=-1, start=0, aug=False, scaled=False):
    """Mirror of methods.py:36-54: mono column vector, optional peak
    normalization, optional 1000-zero left pad, plus the time vector."""
    y, fs = read_wav(fname)
    if y.ndim == 2:
        y = y.mean(axis=1)
    y = y.reshape(-1, 1)
    if start:
        y = y[start:]
    if frames is not None and frames > 0:
        y = y[:frames]
    if scaled:
        beta = np.max(np.abs(y))
        y = y / (beta if beta != 0.0 else 1.0)
    if aug:
        y = np.concatenate([np.zeros((1000, 1)), y], axis=0)
    n = y.shape[0]
    x = np.linspace(0.0, (n - 1.0) / fs, n).reshape(-1, 1)
    return x, y, fs


def synth_tone(fs=16000, seconds=1.0, freq=440.0):
    """The reference's fallback test signal (audio.py:12-15): cos(2 pi 440 t)."""
    n = int(round(fs * seconds))
    x = np.linspace(0.0, (n - 1.0) / fs, n).reshape(-1, 1)
    return x, np.cos(2.0 * np.pi * freq * x)


class Audio:
    """Windowed audio container (reference audio.py:6-37).

    ``X``/``Y`` are lists of (ws, 1) windows: 50%-overlap frames when
    ``overlap`` else disjoint segments.
    """

    def __init__(self, path=None, filename=None, frames=-1, start=0, scaled=False,
                 window_size=None, overlap=True, aug=False):
        self.path = path
        if path is None:
            self.name = "unnamed"
            self.fs = 16000
            self.x, self.y = synth_tone(self.fs, 1.0, 440.0)
        else:
            self.read(filename=filename, frames=frames, start=start, scaled=scaled,
                      aug=aug)
        self.wsize = window_size if window_size is not None else self.x.shape[0]
        self.X, self.Y = self.windowed(overlap)

    def read(self, filename, frames=-1, start=0, scaled=False, aug=False):
        self.name = filename
        full = (self.path or "") + filename
        self.x, self.y, self.fs = readaudio(full, frames=frames, start=start,
                                            scaled=scaled, aug=aug)

    def windowed(self, overlap=True):
        if overlap:
            xw, yw = windowed(self.x, self.y, self.wsize)
        else:
            xw, yw = segmented(self.x, self.y, self.wsize)
        self.X, self.Y = xw, yw
        return xw, yw
