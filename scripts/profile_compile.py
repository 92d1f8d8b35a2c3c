"""Where does the cold compile go?  (round-4 VERDICT weak #5)

Times the cold XLA compile of the separation bank Adam step at quality scale
(222 windows) under each numerics toggle, in a fresh process per config with
the persistent cache DISABLED (jax_compilation_cache_dir -> fresh temp dir),
so the numbers are true cold-cache compiles.

Run:  python scripts/profile_compile.py            # all configs
      python scripts/profile_compile.py <config>   # one config (subprocess mode)
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "defaults": {},
    "no_pallas_chol": {"GPITCH_TPU_PALLAS_CHOL": "0"},
    "no_blocked_triinv": {"GPITCH_TPU_TRI_INV_BLOCKED": "0"},
    "precision_default": {"GPITCH_TPU_MATMUL_PRECISION": "default"},
    "no_pallas_no_triinv": {"GPITCH_TPU_PALLAS_CHOL": "0",
                            "GPITCH_TPU_TRI_INV_BLOCKED": "0"},
}


def child(nw: int):
    import time

    import jax
    jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

    sys.path.insert(0, os.path.join(REPO, "tests_tpu"))
    import numpy as np

    from tests_tpu.workloads import make_sosp
    t0 = time.perf_counter()
    model = make_sosp(seconds=14.0)  # 222 windows at ws=2001
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    # 60 steps = two 50/10 invocations of the one segment executable, so the
    # timed split has a steady-state sample and compile_s is honest
    losses, (compile_s, run_s) = model.optimize(
        maxiter=60, learning_rate=0.01, timed=True)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "nwin": int(model.nwin), "build_s": round(build_s, 2),
        "compile_s": round(compile_s, 2), "run_s": round(run_s, 3),
        "wall_s": round(wall, 2),
        "loss_final": float(np.asarray(losses)[-1]),
        "backend": jax.default_backend(),
    }))


def main():
    results = {}
    for name, env in CONFIGS.items():
        e = dict(os.environ)
        e.update(env)
        p = subprocess.run([sys.executable, __file__, "--child"],
                           env=e, capture_output=True, text=True, timeout=1200)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": (p.stderr or p.stdout)[-500:]}
        print(name, "->", results[name], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(222)
    else:
        main()
