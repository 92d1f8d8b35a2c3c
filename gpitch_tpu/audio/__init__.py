from .io import Audio, read_wav, readaudio, synth_piano_note, synth_tone
from .pianoroll import Pianoroll, read_note_table
from .spectrum import get_features, init_cparam, peak_indexes
from .windowing import (augmentate, hann, merged_mean, merged_variance,
                        merged_x, num_windows, ola_weights, overlap_add,
                        segmented, trim_n_merge, window_stack, windowed)

__all__ = [
    "Audio", "read_wav", "readaudio", "synth_tone", "synth_piano_note",
    "Pianoroll", "read_note_table",
    "init_cparam", "peak_indexes", "get_features",
    "windowed", "segmented", "augmentate", "trim_n_merge", "hann",
    "ola_weights", "overlap_add", "merged_mean", "merged_variance", "merged_x",
    "window_stack", "num_windows",
]
