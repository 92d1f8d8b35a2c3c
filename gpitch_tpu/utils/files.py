"""Dataset filename helpers (MAPS-style corpora).

Rebuilds load_filenames (/root/reference/gpitch/methods.py:183-190) and the
result-merging utilities merge_all/append_sources/trim lists
(methods.py:57-89, window_overlap.py:77-103).
"""

from __future__ import annotations

import fnmatch
import os

import numpy as np

from .math import logistic

__all__ = ["load_filenames", "merge_all_results", "append_sources"]


def load_filenames(directory, pattern, pitches=None, ext=".wav"):
    """Filter a directory for '*pattern*ext', optionally one file per MIDI
    pitch via the '_M<midi>_' MAPS convention (methods.py:183-190)."""
    names = fnmatch.filter(sorted(os.listdir(directory)), "*" + pattern + "*" + ext)
    if pitches is not None:
        names = [fnmatch.filter(names, f"*_M{p}_*")[0] for p in pitches]
    return np.asarray(names).reshape(-1)


def merge_all_results(inlist):
    """Transpose a per-segment list of result tuples into per-quantity lists of
    per-source segment lists (window_overlap.py:77-92): inlist[segment][quantity]
    [source] -> out[quantity][source][segment]."""
    nq = len(inlist[0])
    ns = len(inlist[0][0])
    return [[[seg[q][s] for seg in inlist] for s in range(ns)] for q in range(nq)]


def append_sources(rmerged):
    """Per-window source estimates logistic(m_act) * m_com for 3 sources
    (window_overlap.py:95-103): rmerged[0]=activation means per source,
    rmerged[2]=component means per source."""
    out = []
    for s in range(3):
        out.append([np.asarray(logistic(np.asarray(a))) * np.asarray(c)
                    for a, c in zip(rmerged[0][s], rmerged[2][s])])
    return tuple(out)
