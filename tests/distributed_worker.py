"""Worker for the 2-process jax.distributed smoke test (test_parallel.py).

Each process owns 4 virtual CPU devices; together they form the 8-device
2x4 (hosts x chips) mesh of the scaling plan (SURVEY.md section 5).  Run as:

    python tests/distributed_worker.py <pid> <nproc> <port> <out_file>

The spawner must provide JAX_PLATFORMS=cpu and an env WITHOUT
PALLAS_AXON_POOL_IPS: the axon sitecustomize initializes jax at interpreter
start, which locks the backend in before jax.distributed.initialize runs.
Import-safe: all configuration happens inside main().
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_bank():
    """Deterministic tiny bank — identical on every process."""
    from gpitch_tpu.kernels import Matern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import build_window_bank, sum_kernel

    fs = 16000.0
    ws, nw = 64, 8
    rng = np.random.default_rng(42)
    xw = np.stack([(np.arange(ws) + i * ws // 2) / fs
                   for i in range(nw)]).reshape(nw, ws, 1)
    yw = rng.standard_normal((nw, ws, 1)) * 0.2
    zw = xw[:, ::8]

    def builder():
        return sum_kernel([Matern12sm.create(1.0, 0.05, [1.0],
                                             [220.0 * (i + 1)])
                           for i in range(2)])

    return build_window_bank(xw, yw, zw, builder, grid_dt=1.0 / fs)


def main():
    pid, nproc, port, out_file = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_enable_x64", True)

    from jax.sharding import Mesh

    from gpitch_tpu.parallel.mesh import (init_multihost,
                                          make_bank_loss_shard_map,
                                          shard_leading_axis)

    ok = init_multihost(coordinator_address=f"127.0.0.1:{port}",
                        num_processes=nproc, process_id=pid)
    assert ok, "init_multihost returned False"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.device_count()

    # hosts x chips mesh: 2 processes x 4 local devices
    devs = np.asarray(jax.devices()).reshape(nproc, 4)
    mesh = Mesh(devs, ("h", "c"))

    bank = make_bank()
    sharded = shard_leading_axis(bank, mesh, axis_name=("h", "c"))
    loss_fn = make_bank_loss_shard_map(mesh, axis_name=("h", "c"))
    val = float(jax.jit(loss_fn)(sharded))

    if pid == 0:
        with open(out_file, "w") as fh:
            fh.write(repr(val))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
