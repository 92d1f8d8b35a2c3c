"""Nonlinearities and music-math helpers.

Mirrors /root/reference/gpitch/methods.py:193-233 (logistic/softplus/gaussfun and
inverses — note the reference logistic is shifted/scaled: 1/(1+e^{-2(x-pi)})) and
methods.py:266-270 (midi<->freq).  Single implementations work on numpy or jax
arrays via jnp.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "logistic", "ilogistic", "softplus", "isoftplus", "gaussfun", "igaussfun",
    "norm", "midi2freq", "freq2midi", "find_ideal_f0",
]


def logistic(x):
    """Shifted logistic 1/(1+exp(-2(x-pi))) — reference methods.py:197-199."""
    return 0.5 * (jnp.tanh(x - jnp.pi) + 1.0)


def ilogistic(x):
    """Inverse of ``logistic`` — methods.py:201-203 (modulo the shift/scale)."""
    return jnp.pi - 0.5 * jnp.log(1.0 / x - 1.0)


def softplus(x):
    """log(1+e^x) — methods.py:205-207."""
    return jnp.logaddexp(x, 0.0)


def isoftplus(x):
    """log(e^x - 1) — methods.py:209-211."""
    return jnp.log(-jnp.expm1(-x)) + x


def gaussfun(x):
    """exp(-2(x-pi)^2) Gaussian-bump nonlinearity — methods.py:213-214."""
    return jnp.exp(-2.0 * (x - jnp.pi) ** 2)


def igaussfun(x):
    return jnp.pi - jnp.sqrt(-0.5 * jnp.log(x))


def norm(x):
    """Divide by absolute max — methods.py:193-195."""
    m = jnp.max(jnp.abs(x))
    return x / jnp.where(m == 0, 1.0, m)


def midi2freq(midi):
    """methods.py:266-267."""
    return 2.0 ** ((np.asarray(midi, dtype=float) - 69.0) / 12.0) * 440.0


def freq2midi(freq):
    """methods.py:269-270."""
    return int(69.0 + 12.0 * np.log2(float(freq) / 440.0))


def find_ideal_f0(names):
    """Parse MIDI numbers like 'M60' out of MAPS filenames — methods.py:26-33."""
    out = []
    for name in names:
        for midi in range(21, 109):
            if f"M{midi}" in name:
                out.append(midi2freq(midi))
    return out
