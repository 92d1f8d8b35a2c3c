"""Pytree parameter system.

Replaces gpflow 0.x ``Param``/``ParamList`` machinery the reference leans on
(/root/reference/gpitch/pdgp.py:8, kernels.py:4).  Differences, by design:

* Parameters are stored *unconstrained*; the transform is static pytree metadata,
  so a whole model is a single jit-friendly pytree and ``jax.grad`` w.r.t. the
  model "just works".
* ``trainable`` is static metadata too.  ``zero_untrainable_grads`` implements the
  reference's ``.fixed = True`` idiom (e.g. matern12_spectral_mixture.py:34-36)
  by masking gradient leaves, keeping a single optimizer state for everything.
* No Python-object parameter lists: vector-valued parameters (per-partial
  energies/frequencies) are plain arrays, which is what makes the kernels map
  onto the MXU instead of unrolling per-partial TF ops (kernels.py:244-246).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float
from .transforms import Identity, Positive, Transform

__all__ = ["Param", "param", "positive_param", "module", "static_field",
           "zero_untrainable_grads", "constrained", "n_params"]


@jax.tree_util.register_pytree_node_class
class Param:
    """A single (possibly array-valued) constrained parameter.

    ``raw`` is the unconstrained leaf; ``transform`` and ``trainable`` are static.
    """

    __slots__ = ("raw", "transform", "trainable")

    def __init__(self, raw, transform: Transform = Identity(), trainable: bool = True):
        self.raw = raw
        self.transform = transform
        self.trainable = trainable

    # -- constructors ------------------------------------------------------
    @classmethod
    def create(cls, value, transform: Transform = Identity(), trainable: bool = True,
               dtype=None) -> "Param":
        """Host values stay numpy: ``raw`` only becomes a device buffer when
        the model enters jit (one bulk transfer).  Per-Param jnp math here
        meant one ~30 ms relayed-TPU dispatch per parameter — 88-pitch bank
        construction alone cost ~12 s (round 3, docs/LAG_TABLE.md era fix)."""
        dtype = dtype or default_float()
        if isinstance(value, jax.Array):
            value = jnp.asarray(value, dtype=dtype)
        else:
            value = np.asarray(value, dtype=dtype)
        return cls(transform.inverse(value), transform, trainable)

    # -- value access ------------------------------------------------------
    @property
    def value(self):
        return self.transform.forward(self.raw)

    def with_value(self, value) -> "Param":
        return Param(self.transform.inverse(jnp.asarray(value, dtype=jnp.result_type(self.raw))),
                     self.transform, self.trainable)

    def with_trainable(self, trainable: bool) -> "Param":
        return Param(self.raw, self.transform, trainable)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.raw,), (self.transform, self.trainable)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    def __repr__(self):
        return f"Param({self.value!r}, transform={self.transform}, trainable={self.trainable})"


def param(value, trainable: bool = True) -> Param:
    return Param.create(value, Identity(), trainable)


def positive_param(value, trainable: bool = True, lower: float = 1e-6) -> Param:
    return Param.create(value, Positive(lower=lower), trainable)


def static_field(default=None, **kw):
    """Marks a dataclass field as static (pytree aux data)."""
    return dataclasses.field(default=default, metadata={"static": True}, **kw)


def module(cls):
    """Decorator: dataclass + pytree registration with static-field support.

    Fields created with ``static_field`` become aux data; everything else is a
    pytree child (arrays, Params, sub-modules, lists thereof).
    """
    cls = dataclasses.dataclass(cls)
    fields = dataclasses.fields(cls)
    data_fields = tuple(f.name for f in fields if not f.metadata.get("static"))
    meta_fields = tuple(f.name for f in fields if f.metadata.get("static"))
    jax.tree_util.register_dataclass(cls, data_fields=list(data_fields),
                                     meta_fields=list(meta_fields))
    cls.replace = dataclasses.replace
    return cls


def _is_param(x) -> bool:
    return isinstance(x, Param)


def zero_untrainable_grads(grads: Any) -> Any:
    """Zero gradient leaves belonging to non-trainable Params.

    ``grads`` must share the pytree structure of the model (jax.grad output):
    Param nodes keep their static ``trainable`` flag, so the mask is recoverable
    from the gradient tree itself.
    """

    def mask(p):
        if not isinstance(p, Param):
            return p  # plain array leaf (data buffer / raw vector): untouched
        if p.trainable:
            return p
        return Param(jax.tree_util.tree_map(jnp.zeros_like, p.raw), p.transform, p.trainable)

    return jax.tree_util.tree_map(mask, grads, is_leaf=_is_param)


def constrained(tree: Any) -> Any:
    """Replace every Param in the tree by its constrained value (for inspection)."""
    return jax.tree_util.tree_map(lambda p: p.value if _is_param(p) else p, tree,
                                  is_leaf=_is_param)


def n_params(tree: Any) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return int(sum(jnp.size(l) for l in leaves))
