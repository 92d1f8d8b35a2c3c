"""Kernel protocol and combination kernels.

Functional counterpart of the gpflow ``Kern`` protocol the reference implements
(/root/reference/gpitch/kernels.py:15-571): each kernel is a registered pytree
module whose fields are Params (differentiable, constrained) plus static shape
metadata, with pure methods

    K(X, X2=None) -> (N, M) Gram matrix
    Kdiag(X)      -> (N,) diagonal

X has shape (N, D) with D=1 for audio time vectors.  Unlike the reference there
is no graph/session state: kernels compose with jit/grad/vmap, and homogeneous
kernel lists can be stacked into one batched pytree (see ``stack_modules``) so a
whole bank of per-pitch kernels evaluates as a single vmapped/MXU-batched op —
replacing the per-source Python loops of pdgp.py:146-155.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..core.params import module, static_field

__all__ = ["Kernel", "Sum", "StackedSum", "Product", "White", "Constant",
           "absdist", "sqdist", "euclid_dist", "stack_modules", "unstack_modules"]


def sqdist(X, X2=None):
    """Pairwise squared euclidean distance, (N, M). X: (N, D)."""
    if X2 is None:
        X2 = X
    xs = jnp.sum(jnp.square(X), axis=-1)
    x2s = jnp.sum(jnp.square(X2), axis=-1)
    d2 = xs[:, None] + x2s[None, :] - 2.0 * (X @ X2.T)
    return jnp.maximum(d2, 0.0)


def euclid_dist(X, X2=None, eps: float = 1e-12):
    """sqrt(sqdist + eps) — matches the reference's guarded sqrt (kernels.py:140-142)."""
    return jnp.sqrt(sqdist(X, X2) + eps)


def absdist(X, X2=None):
    """Exact |x - x2'| for 1-D inputs (avoids the sqrt-of-square dance)."""
    if X2 is None:
        X2 = X
    return jnp.abs(X[:, None, :] - X2[None, :, :]).sum(-1)


class Kernel:
    """Mixin providing combination operators; concrete kernels add K/Kdiag.

    Stationary kernels additionally implement ``k_r(r)`` — the kernel value as
    a function of distance alone.  It powers the opt-in uniform-grid lag-table
    path (models/sgpr.py, ``lag_table=True``) and the grid==direct exactness
    tests; the default compute path is the direct cos/sin feature-matmul
    build, which the TPU MXU evaluates ~200x faster than XLA lowers the
    equivalent integer-lag gather (docs/LAG_TABLE.md).
    """

    def K(self, X, X2=None):
        raise NotImplementedError

    def Kdiag(self, X):
        raise NotImplementedError

    def k_r(self, r):
        """Stationary evaluation k(|x-x'|=r); r any-shape array of distances.
        Only defined for stationary kernels."""
        raise NotImplementedError(f"{type(self).__name__} is not stationary")

    def __add__(self, other):
        return Sum(kern_list=_flatten_combination(self, other, Sum))

    def __radd__(self, other):
        if other == 0:  # support sum([...]) / np.sum over kernel lists,
            return self  # the reference's np.sum(kern_pitches) idiom
        return Sum(kern_list=_flatten_combination(other, self, Sum))

    def __mul__(self, other):
        return Product(kern_list=_flatten_combination(self, other, Product))


def _flatten_combination(a, b, cls):
    parts = []
    for k in (a, b):
        if isinstance(k, cls):
            parts.extend(k.kern_list)
        else:
            parts.append(k)
    return tuple(parts)


@module
class Sum(Kernel):
    """Sum kernel; exposes ``kern_list`` like gpflow Add (used by the separation
    model's per-source posterior, sgpr_ss.py:86-93)."""

    kern_list: tuple = ()

    def K(self, X, X2=None):
        parts = [k.K(X, X2) for k in self.kern_list]
        return sum(parts[1:], parts[0])

    def Kdiag(self, X):
        parts = [k.Kdiag(X) for k in self.kern_list]
        return sum(parts[1:], parts[0])

    def k_r(self, r):
        parts = [k.k_r(r) for k in self.kern_list]
        return sum(parts[1:], parts[0])


@module
class StackedSum(Kernel):
    """Sum of S same-family kernels with *stacked* parameters.

    The AMT model kernel is a sum over up to 88 per-pitch kernels
    (reference separation.py:257 ``np.sum(self.kern_pitches)``,
    transcription.py:170-227).  ``Sum`` unrolls a Python loop per term — an
    88x larger graph and 88 sequential small ops.  Here the terms live as one
    batched pytree and evaluate as a single vmapped op: one (S, N, M)
    covariance batch followed by a sum over the leading axis, so the pitch
    axis rides the MXU/VPU instead of the instruction stream.
    """

    stacked: Any = None           # batched kernel pytree, leading axis S
    num_terms: int = static_field(0)

    @classmethod
    def create(cls, kern_list):
        kern_list = list(kern_list)
        return cls(stacked=stack_modules(kern_list), num_terms=len(kern_list))

    def K(self, X, X2=None):
        return jnp.sum(self.K_terms(X, X2), axis=0)

    def Kdiag(self, X):
        return jnp.sum(self.Kdiag_terms(X), axis=0)

    # batched per-term access — the per-source posterior path (sgpr_ss.py:92-106)
    def K_terms(self, X, X2=None):
        """(S, N, M) cross-covariance of every term at once."""
        return jax.vmap(lambda k: k.K(X, X2))(self.stacked)

    def Kdiag_terms(self, X):
        """(S, N) diagonals of every term."""
        return jax.vmap(lambda k: k.Kdiag(X))(self.stacked)

    def k_r(self, r):
        """Summed stationary evaluation: S per-pitch tables collapse into ONE
        before any gather — the 88-pitch AMT kernel costs one table."""
        return jnp.sum(self.k_r_terms(r), axis=0)

    def k_r_terms(self, r):
        """(S, ...) per-term stationary evaluations."""
        return jax.vmap(lambda k: k.k_r(r))(self.stacked)

    @property
    def kern_list(self):
        """Unstacked view (Sum-compatible).  Do not use inside jit hot loops —
        it materializes S separate pytrees."""
        return tuple(unstack_modules(self.stacked, self.num_terms))


@module
class Product(Kernel):
    kern_list: tuple = ()

    def K(self, X, X2=None):
        out = self.kern_list[0].K(X, X2)
        for k in self.kern_list[1:]:
            out = out * k.K(X, X2)
        return out

    def Kdiag(self, X):
        out = self.kern_list[0].Kdiag(X)
        for k in self.kern_list[1:]:
            out = out * k.Kdiag(X)
        return out

    def k_r(self, r):
        out = self.kern_list[0].k_r(r)
        for k in self.kern_list[1:]:
            out = out * k.k_r(r)
        return out


@module
class White(Kernel):
    """White-noise kernel (not in the reference's zoo but required for composing
    numerically robust inducing covariances)."""

    variance: Any = None

    def K(self, X, X2=None):
        if X2 is None:
            return self.variance.value * jnp.eye(X.shape[0], dtype=X.dtype)
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), self.variance.value, dtype=X.dtype)


@module
class Constant(Kernel):
    variance: Any = None

    def K(self, X, X2=None):
        m = X.shape[0] if X2 is None else X2.shape[0]
        return jnp.full((X.shape[0], m), self.variance.value, dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.full((X.shape[0],), self.variance.value, dtype=X.dtype)


def stack_modules(mods: Sequence[Any]):
    """Stack a homogeneous list of modules into one batched pytree.

    All modules must share treedef and leaf shapes.  The result has a leading
    axis of size len(mods) on every leaf; use with jax.vmap to evaluate a bank
    of kernels/models in one compiled op.
    """
    treedefs = {jax.tree_util.tree_structure(m) for m in mods}
    if len(treedefs) != 1:
        raise ValueError("stack_modules requires homogeneous modules; got "
                         f"{len(treedefs)} distinct structures")

    import numpy as np

    def _stack(*xs):
        # host leaves stack on the host: freshly constructed Params are numpy
        # (core/params.py), and issuing one tiny device stack per leaf costs
        # an XLA compile + relay dispatch each (~6 s for an 88-pitch bank)
        if any(isinstance(x, jax.Array) for x in xs):
            return jnp.stack(xs)
        return np.stack(xs)

    return jax.tree_util.tree_map(_stack, *mods)


def unstack_modules(stacked, n: int):
    """Inverse of stack_modules."""
    return [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)]
