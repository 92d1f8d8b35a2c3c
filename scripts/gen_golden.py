"""Generate tests/golden_values.json — the committed f64 golden constants.

Run ONLY after an intentional, reviewed math change:
    JAX_PLATFORMS=cpu python scripts/gen_golden.py

The fixtures live in tests/test_golden.py so the generator and the test can
never drift apart.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

# config update beats the env var (the axon sitecustomize force-registers the
# TPU backend the same way) — golden constants are defined as CPU f64
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import test_golden  # noqa: E402


def main():
    values = test_golden.compute_all()
    out = os.path.join(REPO, "tests", "golden_values.json")
    with open(out, "w") as fh:
        json.dump(values, fh, indent=1)
    print(f"wrote {out}")
    for k, v in values.items():
        if isinstance(v, float):
            print(f"  {k} = {v:.12g}")


if __name__ == "__main__":
    main()
