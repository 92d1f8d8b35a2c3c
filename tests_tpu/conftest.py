"""TPU regression lane: SHIPPED defaults on the real chip.

The main suite (tests/) pins JAX_PLATFORMS=cpu + float64, which means
TPU-only default paths (Pallas Cholesky, blocked tri-inverse, the matmul
precision policy) run with ZERO test coverage — exactly how the round-4 AMT
NaN shipped (round-4 VERDICT weak #2).  This lane runs the flagship bank
shapes on the TPU backend with every shipped default live and compares
against CPU-float64 golden trajectories (tests_tpu/goldens.npz, regenerated
by ``python tests_tpu/gen_goldens.py``).

Run:  python -m pytest tests_tpu -q      (~3-5 min with a warm compile cache)
"""

import numpy as np
import pytest

import jax

from gpitch_tpu import config

# the windowed-bank programs compile for tens of seconds; share the
# persistent cache the production pipelines use
config.enable_persistent_compilation_cache()


def pytest_collection_modifyitems(config, items):  # noqa: ARG001
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="TPU backend unavailable "
                            f"(default_backend={jax.default_backend()})")
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session")
def goldens():
    import os
    path = os.path.join(os.path.dirname(__file__), "goldens.npz")
    if not os.path.exists(path):
        pytest.skip("goldens.npz missing — run python tests_tpu/gen_goldens.py")
    return dict(np.load(path))
