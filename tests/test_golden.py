"""Golden-value regression pins (round-1 VERDICT item 6).

Every other test in the suite compares the repo to itself (self-consistency,
brute-force dense conditioning); these pin *committed f64 constants* computed
once on CPU (scripts/gen_golden.py), so a silent regression in a transform,
jitter constant, quadrature rule or bound term is caught even though no GPflow
install exists to diff against.  The pinned quantities are the reference's
core math: the modulated ELBO (/root/reference/gpitch/pdgp.py:133-170), the
collapsed Titsias bound (sgpr_ss.py:29-71), per-source posterior mean/var
(sgpr_ss.py:73-114) and the modulated posterior (pdgp.py:190-208).

Regenerate (only after an *intentional* math change) with:
    JAX_PLATFORMS=cpu python scripts/gen_golden.py
"""

import jax.numpy as jnp
import numpy as np

from gpitch_tpu.kernels import Matern12sm, Matern32, MercerMatern12sm
from gpitch_tpu.models import ModGP, SGPRSS


def build_modgp():
    """Seeded 2-source modulated-GP fixture with non-trivial q(u)."""
    rng = np.random.default_rng(42)
    n, m, fs = 32, 8, 800.0
    x = (np.arange(n) / fs).reshape(-1, 1)
    y = (np.sin(2 * np.pi * 50.0 * x) * np.exp(-30 * (x - 0.02) ** 2)
         + 0.3 * np.sin(2 * np.pi * 80.0 * x)
         + 0.01 * rng.standard_normal((n, 1)))
    z = x[:: n // m][:m]

    kern_act = [Matern32.create(1.0, 0.01), Matern32.create(0.8, 0.02)]
    kern_com = [MercerMatern12sm.create(1.0, 0.05, [1.0, 0.4], [50.0, 100.0]),
                MercerMatern12sm.create(0.7, 0.04, [0.8, 0.3], [80.0, 160.0])]
    model = ModGP.create(z=[[z, z], [z, z]], kern=[kern_act, kern_com],
                         noise_variance=0.09)

    # non-trivial variational state: q_mu random, q_sqrt = scaled tril
    q_mu_a = 0.3 * rng.standard_normal((2, m, 1))
    q_mu_c = 0.2 * rng.standard_normal((2, m, 1))
    tril = np.tril(0.05 * rng.standard_normal((2, m, m))) \
        + 0.7 * np.eye(m)[None]
    model = model.replace(
        q_mu_act=model.q_mu_act.with_value(jnp.asarray(q_mu_a)),
        q_mu_com=model.q_mu_com.with_value(jnp.asarray(q_mu_c)),
        q_sqrt_act=model.q_sqrt_act.with_value(jnp.asarray(tril)),
        q_sqrt_com=model.q_sqrt_com.with_value(jnp.asarray(0.9 * tril)),
    )
    return model, jnp.asarray(x), jnp.asarray(y)


def build_sgprss():
    """Seeded 2-source collapsed-bound fixture."""
    rng = np.random.default_rng(7)
    n, m, fs = 24, 8, 800.0
    x = (np.arange(n) / fs).reshape(-1, 1)
    y = 0.4 * rng.standard_normal((n, 1))
    z = x[:: n // m][:m]
    k1 = Matern12sm.create(1.1, 0.03, [1.0, 0.5], [60.0, 120.0],
                           train_energy=True)
    k2 = Matern12sm.create(0.6, 0.05, [0.9, 0.2], [90.0, 180.0],
                           train_energy=True)
    model = SGPRSS.create(jnp.asarray(x), jnp.asarray(y), k1 + k2,
                          Z=z, noise_variance=0.16)
    return model, jnp.asarray(x)


def compute_all():
    """All pinned quantities as plain floats/lists (f64)."""
    model, x, y = build_modgp()
    elbo_w = float(model.elbo(x, y))
    kl = float(model.prior_kl())
    elbo_scaled = float(model.elbo(x[:16], y[:16], num_data=32))
    m_a, v_a, m_c, v_c, m_s = model.predict_act_n_com(x[::8])

    sg, xs = build_sgprss()
    bound = float(sg.elbo())
    means, variances = sg.predict_s(xs[::6])

    sg_grid = SGPRSS.create(sg.X.value, sg.Y.value, sg.kern,
                            Z=np.asarray(sg.Z.value), noise_variance=0.16,
                            grid_dt=1.0 / 800.0)
    grid = float(sg_grid.elbo())

    def l(a):
        return np.asarray(a, dtype=np.float64).ravel().tolist()

    return {
        "modgp_elbo_whitened": elbo_w,
        "modgp_prior_kl": kl,
        "modgp_elbo_minibatch_scaled": elbo_scaled,
        "modgp_mean_act": l(m_a), "modgp_var_act": l(v_a),
        "modgp_mean_com": l(m_c), "modgp_var_com": l(v_c),
        "modgp_mean_src": l(m_s),
        "sgprss_bound": bound,
        "sgprss_bound_grid": grid,
        "sgprss_mean_s": [l(mm) for mm in means],
        "sgprss_var_s": [l(vv) for vv in variances],
    }


# ---------------------------------------------------------------------------
# Committed constants live in tests/golden_values.json — written once by
# scripts/gen_golden.py (f64, CPU).  DO NOT regenerate to make a failing test
# pass: a mismatch means the math changed.  Regenerate only for an
# intentional, reviewed change.
# ---------------------------------------------------------------------------
def _load_golden():
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "golden_values.json")
    if not os.path.exists(path):  # only during initial generation
        return {}
    with open(path) as fh:
        return json.load(fh)


GOLDEN = _load_golden()


def test_golden_values_pinned():
    assert GOLDEN, "GOLDEN constants missing — run scripts/gen_golden.py"
    got = compute_all()
    assert set(got) == set(GOLDEN)
    for key, want in GOLDEN.items():
        np.testing.assert_allclose(
            np.asarray(got[key], dtype=np.float64),
            np.asarray(want, dtype=np.float64),
            rtol=1e-9, atol=1e-12, err_msg=key)


def test_golden_f32_within_tolerance():
    """The same fixture in f32 must stay within loose tolerance of the f64
    pins — the dtype TPU actually runs (docs/F32_ACCURACY.md)."""
    import jax

    def to_f32(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a, t)

    model, x, y = build_modgp()
    model32, x32, y32 = to_f32(model), to_f32(x), to_f32(y)
    np.testing.assert_allclose(float(model32.elbo(x32, y32)),
                               GOLDEN["modgp_elbo_whitened"], rtol=2e-4)

    sg, _ = build_sgprss()
    sg32 = to_f32(sg)
    np.testing.assert_allclose(float(sg32.elbo()),
                               GOLDEN["sgprss_bound"], rtol=2e-4)
