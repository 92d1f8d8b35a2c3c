import jax.numpy as jnp
import numpy as np
import pytest

from gpitch_tpu.core.transforms import FillTriangular, Identity, Logistic, Positive
from gpitch_tpu.core.params import Param, constrained, zero_untrainable_grads
import jax


@pytest.mark.parametrize("t,vals", [
    (Positive(), [0.1, 1.0, 10.0, 1e-4]),
    (Logistic(0.0, 2.0), [0.01, 1.0, 1.9]),
    (Logistic(0.0, 0.25), [0.001, 0.1, 0.2]),
    (Identity(), [-3.0, 0.0, 5.0]),
])
def test_roundtrip(t, vals):
    v = jnp.asarray(vals)
    np.testing.assert_allclose(t.forward(t.inverse(v)), v, rtol=1e-6, atol=1e-9)


def test_positive_is_positive():
    t = Positive()
    x = jnp.linspace(-50, 50, 101)
    assert (t.forward(x) > 0).all()


def test_logistic_bounds():
    t = Logistic(0.0, 2.0)
    x = jnp.linspace(-100, 100, 201)
    y = t.forward(x)
    assert (y >= 0).all() and (y <= 2).all()


def test_fill_triangular_roundtrip():
    t = FillTriangular(4)
    m = jnp.tril(jnp.arange(16.0).reshape(4, 4) + 1.0)
    np.testing.assert_allclose(t.forward(t.inverse(m)), m)
    # batched
    mb = jnp.stack([m, 2 * m])
    np.testing.assert_allclose(t.forward(t.inverse(mb)), mb)


def test_param_pytree_and_grad_mask():
    p_train = Param.create(2.0, Positive())
    p_fixed = Param.create(3.0, Positive(), trainable=False)
    tree = {"a": p_train, "b": p_fixed}

    def loss(tr):
        return tr["a"].value ** 2 + tr["b"].value ** 2

    g = jax.grad(loss)(tree)
    g = zero_untrainable_grads(g)
    assert float(jnp.abs(g["a"].raw)) > 0
    assert float(jnp.abs(g["b"].raw)) == 0.0
    vals = constrained(tree)
    np.testing.assert_allclose(vals["a"], 2.0, rtol=1e-6)


def test_param_jit_static():
    p = Param.create(1.5, Positive())
    calls = []

    @jax.jit
    def f(q):
        calls.append(1)
        return q.value * 2

    f(p)
    f(Param.create(2.5, Positive()))
    assert len(calls) == 1  # same treedef -> no retrace
