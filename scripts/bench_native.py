"""Benchmark the native C++ DSP runtime against the numpy fallbacks on the
separation pipeline's build path (14 s @ 16 kHz, ws=2001 → 222 windows).

These are the host-side stages that run before any TPU work: WAV decode,
overlap framing, per-window extrema-based inducing initialization, and the
overlap-add merge of predictions.  Run: python scripts/bench_native.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gpitch_tpu import native
from gpitch_tpu.audio.io import read_wav
from gpitch_tpu.audio.windowing import ola_weights, overlap_add, window_stack
from gpitch_tpu.pipelines.init import init_liv_robust


def timeit(fn, reps=5):
    fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def with_native(flag, fn):
    old = os.environ.get("GPITCH_TPU_NATIVE")
    os.environ["GPITCH_TPU_NATIVE"] = "1" if flag else "0"
    try:
        return fn()
    finally:
        if old is None:
            del os.environ["GPITCH_TPU_NATIVE"]
        else:
            os.environ["GPITCH_TPU_NATIVE"] = old


def main():
    assert native.available(), "native library failed to build"
    fs, seconds, ws = 16000, 14.0, 2001
    n = int(fs * seconds)
    t = np.arange(n) / fs
    y = sum(np.sin(2 * np.pi * f * t) * np.exp(-((t % 2.0)) * 3.0)
            for f in (261.6, 329.6, 392.0)) / 3.0

    import tempfile
    from scipy.io import wavfile
    wav = os.path.join(tempfile.mkdtemp(), "mix.wav")
    wavfile.write(wav, fs, (y * 32767 * 0.8).astype(np.int16))

    rows = []

    def bench(name, fn):
        t_np = with_native(False, lambda: timeit(fn))
        t_nat = with_native(True, lambda: timeit(fn))
        rows.append((name, t_np * 1e3, t_nat * 1e3, t_np / t_nat))

    bench("read_wav 14s PCM16", lambda: read_wav(wav))
    bench("window_stack 222w", lambda: window_stack(y, ws))

    xw = window_stack(t, ws)
    yw = window_stack(y, ws)

    def all_init():
        return [init_liv_robust(xw[i], yw[i], dec=2) for i in range(xw.shape[0])]
    bench("init_liv x 222 windows", all_init)

    wins = np.asarray(yw)
    w = np.asarray(ola_weights(wins.shape[0], ws))

    def merge_np():
        return np.asarray(overlap_add(wins, n, w))

    def merge():
        if native.enabled():
            return native.overlap_add_native(wins, n)
        return merge_np()
    bench("overlap_add merge", merge)

    total_np = sum(r[1] for r in rows)
    total_nat = sum(r[2] for r in rows)
    print(f"{'stage':28s} {'numpy ms':>10s} {'native ms':>10s} {'speedup':>8s}")
    for name, a, b, s in rows:
        print(f"{name:28s} {a:10.2f} {b:10.2f} {s:7.1f}x")
    print(f"{'TOTAL build-path host DSP':28s} {total_np:10.2f} {total_nat:10.2f} "
          f"{total_np / total_nat:7.1f}x")


if __name__ == "__main__":
    main()
