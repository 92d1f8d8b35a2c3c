"""Generate the CPU-float64 golden trajectories for the TPU lane.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests_tpu/gen_goldens.py

Forces the CPU backend + x64 before importing anything JAX, runs the shared
workloads (workloads.py) for OPT_STEPS Adam steps, and writes
tests_tpu/goldens.npz.  The TPU lane (test_shipped_defaults.py) compares the
f32 shipped-defaults trajectory on the real chip against these arbitration
values.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    from tests_tpu import workloads
    out = {}
    for name, make in (("amt", workloads.make_amt),
                       ("sosp", workloads.make_sosp)):
        print(f"[{name}] building ...", flush=True)
        model = make()
        print(f"[{name}] {model.nwin} windows; optimizing "
              f"{workloads.OPT_STEPS} steps (CPU f64, chunk "
              f"{workloads.WINDOW_CHUNK}) ...", flush=True)
        tr = workloads.loss_trajectory(model)
        assert np.isfinite(tr).all(), f"{name}: non-finite golden trajectory"
        out[f"{name}_losses"] = tr
        print(f"[{name}] loss[0]={tr[0]:.6g} loss[-1]={tr[-1]:.6g}", flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "goldens.npz")
    np.savez(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
