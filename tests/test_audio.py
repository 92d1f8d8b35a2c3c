"""Audio I/O, spectral init and pianoroll tests (synthetic fixtures; the MAPS
demo wav in the reference is only used by notebooks)."""

import os

import numpy as np
import pytest

from gpitch_tpu.audio import (Audio, Pianoroll, get_features, init_cparam,
                              peak_indexes, read_wav, readaudio, synth_tone)
from gpitch_tpu.utils.math import find_ideal_f0, freq2midi, midi2freq


def _write_wav(path, data, fs=16000):
    from scipy.io import wavfile
    wavfile.write(path, fs, data.astype(np.float32))


def test_midi_freq_roundtrip():
    assert abs(midi2freq(69) - 440.0) < 1e-9
    assert abs(midi2freq(60) - 261.6255653) < 1e-3
    assert freq2midi(440.0) == 69
    assert find_ideal_f0(["011PFNOF_M60_train.wav"]) == [midi2freq(60)]


def test_read_wav_float_and_pcm(tmp_path):
    fs = 16000
    t = np.arange(fs) / fs
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    fpath = os.path.join(tmp_path, "f32.wav")
    _write_wav(fpath, sig, fs)
    y, fs2 = read_wav(fpath)
    assert fs2 == fs
    np.testing.assert_allclose(y, sig, atol=1e-6)

    from scipy.io import wavfile
    ipath = os.path.join(tmp_path, "i16.wav")
    wavfile.write(ipath, fs, (sig * 32767).astype(np.int16))
    y2, _ = read_wav(ipath)
    np.testing.assert_allclose(y2, sig, atol=1e-3)


def test_readaudio_options(tmp_path):
    fs = 16000
    sig = np.sin(2 * np.pi * 100 * np.arange(fs) / fs) * 0.25
    fpath = os.path.join(tmp_path, "a.wav")
    _write_wav(fpath, sig, fs)
    x, y, fs2 = readaudio(fpath, frames=1000, start=100, scaled=True)
    assert y.shape == (1000, 1) and x.shape == (1000, 1)
    assert abs(np.max(np.abs(y)) - 1.0) < 1e-6
    x2, y2, _ = readaudio(fpath, frames=500, aug=True)
    assert y2.shape == (1500, 1)
    assert np.all(y2[:1000] == 0)


def test_audio_container_synthesizes_440(tmp_path):
    a = Audio(window_size=2001)
    assert a.fs == 16000 and a.y.shape == (16000, 1)
    np.testing.assert_allclose(a.y[:, 0], np.cos(2 * np.pi * 440 * a.x[:, 0]),
                               atol=1e-12)
    assert len(a.X) == (16000 - 2001) // 1000 + 1
    xs, ys = a.windowed(overlap=False)
    assert len(xs) == 16000 // 2001


def test_peak_indexes_basic():
    y = np.zeros(100)
    y[[10, 40, 41, 80]] = [1.0, 2.0, 1.5, 0.8]
    idx = peak_indexes(y, thres=0.5, min_dist=5)
    assert 10 in idx and 40 in idx and 80 in idx and 41 not in idx


def test_init_cparam_recovers_harmonics():
    fs = 16000
    f0 = midi2freq(60)
    t = np.arange(2 * fs) / fs
    sig = sum((0.5 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t) for k in range(4))
    freqs, energies, F, S, thres = init_cparam(sig, fs, maxh=4, ideal_f0=f0)
    assert len(freqs) <= 4
    np.testing.assert_allclose(energies.sum(), 1.0, rtol=1e-9)
    # each detected frequency close to a true harmonic
    harm = f0 * np.arange(1, 5)
    for f in freqs:
        assert np.min(np.abs(harm - f)) < 2.0, f
    # fundamental present and strongest
    assert np.min(np.abs(freqs - f0)) < 2.0
    assert freqs[np.argmax(energies)] == pytest.approx(f0, abs=2.0)


def test_get_features_centers_and_topn():
    F = np.linspace(0, 1000, 1001)
    S = np.ones(1001) * 1e-3
    S[[100, 200, 300]] = [3.0, 2.0, 1.0]
    fr, en = get_features(F, S, f_centers=np.array([100.0, 200.0]), nfpc=1)
    np.testing.assert_allclose(fr, [100.0, 200.0])
    np.testing.assert_allclose(en.sum(), 1.0)
    fr2, en2 = get_features(F, S, use_centers=False, totalnumf=2)
    assert set(np.round(fr2)) == {100.0, 200.0}


def test_pianoroll_from_notes():
    notes = [(0.1, 0.5, 60), (0.3, 0.8, 64), (1.2, 1.4, 60)]
    pr = Pianoroll(fs=20, duration=2.0, notes=notes)
    assert pr.matrix.shape == (88, 40)
    assert pr.pitch_list == [60, 64]
    row60 = pr.pr_dic["60"][:, 0]
    x = pr.x[:, 0]
    want = (((x >= 0.1) & (x < 0.5)) | ((x >= 1.2) & (x < 1.4))).astype(float)
    np.testing.assert_allclose(row60, want)
    # matrix rows are flipped: midi 108 is row 0
    assert pr.matrix[108 - 60].sum() == row60.sum()


def test_pianoroll_from_file(tmp_path):
    txt = "OnsetTime\tOffsetTime\tMidiPitch\n0.10\t0.50\t60\n0.30\t0.80\t64\n"
    path = os.path.join(tmp_path, "piece.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    pr = Pianoroll(path=str(tmp_path), filename="piece.wav", fs=20, duration=1.0)
    assert pr.pitch_list == [60, 64]
    assert pr.matrix.shape == (88, 20)
