"""Checkpointing of model pytrees and learned kernel parameters.

Replaces the reference's pickle/h5py persistence (methods.py:16-23 ``loadm``,
separation.py:315-330 ``SoSp.save``, init_kernels.py:50-66 ``load_params``)
with plain-array numpy archives.  No object arrays anywhere, so every load
runs with ``allow_pickle=False`` — unlike the reference's pickles, a
checkpoint file cannot execute code on load.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_params", "load_params", "save_model", "load_model",
           "list_checkpoints"]


def save_params(path: str, lengthscale, energy, frequency, xkern=None, skern=None):
    """Persist per-pitch kernel hypers (+ optional sampled kernel) —
    the payload of SoSp.save (separation.py:325-330).

    Ragged per-pitch lists are stored as one plain array per (quantity, pitch)
    key, never as object arrays, so loading needs no pickle."""
    n = len(lengthscale)
    data = {"n_pitches": np.asarray(n)}
    for i in range(n):
        data[f"lengthscale_{i}"] = np.asarray(lengthscale[i])
        data[f"energy_{i}"] = np.asarray(energy[i])
        data[f"frequency_{i}"] = np.asarray(frequency[i])
        if xkern is not None:
            data[f"xkern_{i}"] = np.asarray(xkern[i])
        if skern is not None:
            data[f"skern_{i}"] = np.asarray(skern[i])
    np.savez(path, **data)


def load_params(path: str):
    """-> [lengthscales, energies, frequencies] lists (load_kernel equivalent,
    separation.py:162-177)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    d = np.load(path, allow_pickle=False)
    n = int(d["n_pitches"])
    return [[d[f"lengthscale_{i}"] for i in range(n)],
            [d[f"energy_{i}"] for i in range(n)],
            [d[f"frequency_{i}"] for i in range(n)]]


def _fingerprint(model: Any) -> str:
    """Hash of the treedef plus every leaf's shape/dtype — a structural
    identity for the checkpoint format."""
    leaves, treedef = jax.tree_util.tree_flatten(model)
    desc = str(treedef) + "|" + ";".join(
        f"{tuple(np.shape(l))}:{np.asarray(l).dtype}" for l in leaves)
    return hashlib.sha256(desc.encode()).hexdigest()


def save_model(directory: str, model: Any, step: int = 0):
    """Checkpoint a full model pytree (replaces whole-model pickling,
    methods.py:16-23): leaves serialized positionally against the treedef,
    guarded by a treedef+shape fingerprint so a restore into a different
    model structure fails loudly instead of silently binding wrong leaves."""
    os.makedirs(directory, exist_ok=True)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(model)]
    np.savez(os.path.join(directory, f"{step}.npz"),
             __fingerprint__=np.asarray(_fingerprint(model)),
             **{f"leaf_{i}": l for i, l in enumerate(leaves)})


def load_model(directory: str, like: Any, step: int = 0):
    """Restore into the structure of ``like`` (same treedef; fingerprint
    checked)."""
    d = np.load(os.path.join(directory, f"{step}.npz"), allow_pickle=False)
    if "__fingerprint__" in d.files:
        want = str(d["__fingerprint__"])
        have = _fingerprint(like)
        if want != have:
            raise ValueError(
                "checkpoint structure mismatch: the saved model's treedef/"
                f"leaf shapes (fingerprint {want[:12]}…) do not match `like` "
                f"({have[:12]}…) — refusing to bind leaves positionally")
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [jax.numpy.asarray(d[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def list_checkpoints(directory: str):
    if not os.path.isdir(directory):
        return []
    return sorted(int(f[:-4]) for f in os.listdir(directory)
                  if f.endswith(".npz") and f[:-4].isdigit())
