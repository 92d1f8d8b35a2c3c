"""Deterministic flagship-shape workloads shared by the TPU lane and its
CPU-f64 golden generator (gen_goldens.py).

Shapes match the quality runs (scripts/run_quality.py): AMT @ 44.1 kHz,
ws=2001, M=160, 8 pitches x 10 partials — the configuration whose Gram
conditioning caused the round-4 NaN — and separation @ 16 kHz, M=112,
3 pitches.  Audio is synthesized (audio.io.synth_piano_note), so the
workload needs no reference data and is bit-identical across backends.
"""

import numpy as np

from gpitch_tpu.audio.io import synth_piano_note

MIDI_A4 = 69
OPT_STEPS = 100
LEARNING_RATE = 0.01
WINDOW_CHUNK = 16  # compile cost scales superlinearly with the window axis


def _f0(midi: int) -> float:
    return 440.0 * 2.0 ** ((midi - MIDI_A4) / 12.0)


def _piece(fs: float, seconds: float, pitches, onsets):
    n = int(fs * seconds)
    mix = np.zeros(n)
    notes = {}
    for p in pitches:
        _, y = synth_piano_note(fs=fs, seconds=2.0, f0=_f0(p), seed=p)
        notes[p] = y[:, 0]
    for p, on in onsets:
        i0 = int(on * fs)
        seg = notes[p][: n - i0]
        mix[i0: i0 + len(seg)] += seg
    x = (np.arange(n) / fs).reshape(-1, 1)
    return notes, mix, x


def make_amt(seconds: float = 1.0, fs: float = 44100.0):
    """The 44.1 kHz M=160 AMT model (run_quality.run_amt shapes)."""
    from gpitch_tpu.pipelines import AMT
    pitches = [60, 62, 64, 65, 67, 69, 71, 72]
    onsets = [(p, 0.05 + 0.11 * i) for i, p in enumerate(pitches)]
    notes, mix, x = _piece(fs, seconds, pitches, onsets)
    return AMT(train_signals=[notes[p][: int(2 * fs)] for p in pitches],
               train_names=[f"piano_M{p}_train.wav" for p in pitches],
               fs=fs, test=(x, mix), pitches=pitches, window_size=2001,
               kernel_mode="fft", max_par=10, num_inducing=160, dec=3)


def make_sosp(seconds: float = 4.0, fs: float = 16000.0):
    """The 16 kHz M=112 separation model (run_quality.run_separation shapes)."""
    from gpitch_tpu.pipelines import SoSp
    pitches = [60, 64, 67]
    onsets = [(60, 0.1), (64, 0.8), (67, 1.6), (60, 2.4), (64, 3.1)]
    notes, mix, x = _piece(fs, seconds, pitches, onsets)
    return SoSp(train_signals=[notes[p] for p in pitches],
                train_names=[f"piano_M{p}_train.wav" for p in pitches],
                fs=fs, mixture=(x, mix), window_size=2001, kernel_mode="fft",
                max_par=5, num_inducing=112, dec=2)


def loss_trajectory(model) -> np.ndarray:
    """OPT_STEPS Adam steps on the model's window bank; per-step total loss."""
    losses, _ = model.optimize(maxiter=OPT_STEPS, learning_rate=LEARNING_RATE,
                               timed=True, window_chunk=WINDOW_CHUNK)
    return np.asarray(losses, dtype=np.float64)
