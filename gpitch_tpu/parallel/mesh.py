"""Device-mesh sharding for window banks and source banks.

The reference is single-process/single-GPU (SURVEY.md section 2.10); the
TPU-native scaling strategy is:

* **windows axis** (data parallel): overlap windows are conditionally
  independent by model design (window_overlap.py:7-59), so the stacked SGPRSS
  bank shards its leading axis across chips; the summed loss induces one psum
  over ICI per step and nothing else.
* **sources axis** (model parallel): ModGP's stacked per-source leaves shard
  across chips; the likelihood couples sources only at the (N, S) marginal
  stage, where XLA inserts the single all-gather required.

No NCCL/MPI analogue exists or is needed: shardings are declared with
``jax.sharding`` and XLA emits the collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_leading_axis", "replicate", "pad_bank_windows",
           "shard_bank", "shard_modgp_sources", "init_multihost",
           "make_bank_loss_shard_map"]


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Multi-host initialization (jax.distributed) — the cross-host half of the
    scaling plan (SURVEY.md section 5: mesh over {hosts x chips}).  No-op when
    arguments are absent and no cluster env is detected."""
    import jax
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            jax.distributed.initialize()  # env/TPU-metadata autodetect
    except Exception:
        return False  # single-process fallback
    return True


def make_mesh(n_devices: int | None = None, axis_name: str = "w",
              devices=None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def _axis_size(mesh: Mesh, axis_name) -> int:
    if isinstance(axis_name, (tuple, list)):
        size = 1
        for a in axis_name:
            size *= mesh.shape[a]
        return size
    return mesh.shape[axis_name]


def shard_leading_axis(tree: Any, mesh: Mesh, axis_name="w") -> Any:
    """Place every array leaf with its leading axis sharded over ``axis_name``
    (leaves whose leading dim is not divisible are replicated).  ``axis_name``
    may be a tuple of mesh axes — e.g. ("h", "c") shards the window axis over
    the full hosts x chips grid."""
    size = _axis_size(mesh, axis_name)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % size == 0:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def pad_bank_windows(bank, multiple: int):
    """Pad the window axis of an SGPRSS bank to a multiple of ``multiple`` with
    fully-masked copies of the last window.

    A fully-masked window contributes exactly zero to the collapsed bound and
    to every gradient (all data-dependent terms carry the mask), so padding is
    loss-free — verified in tests/test_parallel.py.
    """
    nw = jax.tree_util.tree_leaves(bank)[0].shape[0]
    target = -(-nw // multiple) * multiple
    pad = target - nw
    if pad == 0:
        return bank, nw
    if bank.mask is None:
        raise ValueError("pad_bank_windows requires a masked bank "
                         "(build_window_bank default)")

    def pad_leaf(x):
        return jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)

    padded = jax.tree_util.tree_map(pad_leaf, bank)
    mask = padded.mask
    mask = mask.with_value(mask.value.at[nw:].set(0.0))
    return padded.replace(mask=mask), nw


def shard_bank(bank, mesh: Mesh | None = None, axis_name: str = "w"):
    """Pad + shard a window bank over the mesh; returns (bank, nw_orig, mesh)."""
    mesh = mesh or make_mesh(axis_name=axis_name)
    bank, nw = pad_bank_windows(bank, mesh.shape[axis_name])
    return shard_leading_axis(bank, mesh, axis_name), nw, mesh


def make_bank_loss_shard_map(mesh: Mesh, axis_name="w"):
    """Explicit-collective variant of ``pipelines.bank_loss``.

    ``axis_name`` may be a tuple of mesh axes — ("h", "c") expresses the
    hosts x chips plan: windows shard over the full grid and the scalar psum
    reduces over both axes (ICI within a host, DCN across hosts).

    Where the NamedSharding path leaves collective placement to XLA's SPMD
    partitioner, this pins the communication pattern by hand with
    ``jax.shard_map``: each device computes the sum of its local shard of
    per-window bounds, then ONE scalar ``psum`` over the window axis combines
    them.  That single scalar reduction is the entire per-step communication
    of the window-data-parallel scheme — it rides ICI within a host and is
    cheap enough to cross DCN unchanged in the hosts x chips mesh
    (docs/PARITY.md section 2.10).  Fully differentiable (psum transposes to
    psum), so it drops into the same fit loops.

    Returns ``loss_fn(bank) -> scalar``; the bank's window axis must be
    divisible by the mesh size (use ``pad_bank_windows``).
    """
    from ..pipelines.windowed_sgpr import bank_loss  # local import: no cycle

    def local_loss(bank):
        return jax.lax.psum(bank_loss(bank), axis_name)

    return jax.shard_map(local_loss, mesh=mesh, in_specs=P(axis_name),
                         out_specs=P())


def shard_modgp_sources(model, mesh: Mesh | None = None, axis_name: str = "w"):
    """Shard a ModGP model over its source axis (model parallelism).

    Only stacked per-source leaves (q_mu/q_sqrt/z and stacked kernel params,
    all with leading dim = num_sources) shard; scalars replicate.
    """
    mesh = mesh or make_mesh(axis_name=axis_name)
    size = mesh.shape[axis_name]
    s = model.num_sources

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == s and s % size == 0:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, model), mesh
