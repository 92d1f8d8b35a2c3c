"""Weak-scaling measurement of the window-DP bank on a virtual device mesh.

Round-4 VERDICT item 8: ``dryrun_multichip`` proves the sharded program
compiles and executes; this script adds the measured half — a weak-scaling
table over 1/2/4/8 virtual CPU devices with FIXED windows-per-device
(SURVEY.md section 2.10: windows are the data-parallel axis), pinning that
the sharded optimization produces the SAME losses as the unsharded run of
the identical bank, and recording steady-state step time.

Honesty note (recorded in the output): the 8 "devices" are XLA host-platform
partitions of ONE physical CPU, so wall-clock here measures the *overhead*
of sharding (partitioned executables + any collectives), not real-chip
speedup — flat-or-gently-rising step time with zero loss drift is the pass
criterion.  The per-step communication of this program is zero by design
(per-window value_and_grad, window-masked dot for the loss trace); real-pod
scaling rides that property over ICI.

Writes MULTICHIP_SCALING.md.  Run:
    python scripts/multichip_scaling.py [--steps 30] [--wpd 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def build_pool(num_windows: int, ws: int = 2001, m: int = 112):
    """A pool of separation-shape windows (3 pitches x 5 partials, 16 kHz)."""
    from gpitch_tpu.audio import synth_piano_note
    from gpitch_tpu.audio.windowing import window_stack
    from gpitch_tpu.kernels import MercerMatern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (build_window_bank,
                                                    pad_inducing, sum_kernel)
    from gpitch_tpu.utils import midi2freq

    fs, hop = 16000, (ws - 1) // 2
    seconds = (hop * (num_windows - 1) + ws) / fs + 0.01
    sources = [synth_piano_note(fs=fs, seconds=seconds, f0=midi2freq(mm),
                                onset=o, noise=0.0, seed=mm)[1]
               for mm, o in zip((60, 64, 67), (0.0, 0.9, 1.8))]
    mix = sum(sources) / 3.0
    x = np.arange(mix.shape[0]).reshape(-1, 1) / fs
    xw, yw = window_stack(x, ws)[:num_windows], window_stack(mix, ws)[:num_windows]
    z = pad_inducing([xw[i, ::16][:m].reshape(-1, 1)
                      for i in range(num_windows)], m, grid_dt=1.0 / fs)

    def builder():
        return sum_kernel([
            MercerMatern12sm.create(1.0, 0.1,
                                    [1.0 / (k + 1) for k in range(5)],
                                    [midi2freq(mm) * (k + 1) for k in range(5)])
            for mm in (60, 64, 67)])

    return build_window_bank(xw, yw, z, builder, grid_dt=1.0 / fs)


def take_windows(bank, nw: int):
    import jax
    return jax.tree_util.tree_map(lambda l: l[:nw], bank)


def run_one(bank, steps: int, mesh=None, segment: int = 10):
    from gpitch_tpu.pipelines.windowed_sgpr import optimize_bank
    nw = np.asarray(bank.X.raw).shape[0]
    t0 = time.perf_counter()
    _, losses, (compile_s, run_s) = optimize_bank(
        bank, num_steps=steps, learning_rate=0.01, segment=segment,
        window_chunk=nw if mesh is not None else None,
        mesh=mesh, timed=True)
    wall = time.perf_counter() - t0
    return np.asarray(losses), compile_s, run_s, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--wpd", type=int, default=16,
                    help="windows per device (weak scaling)")
    args = ap.parse_args()

    import jax
    # config update beats the env var: the axon sitecustomize force-registers
    # the TPU plugin regardless of JAX_PLATFORMS (see run_quality.py --cpu)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # exact loss-equality pinning

    from gpitch_tpu.parallel.mesh import make_mesh

    sizes = [1, 2, 4, 8]
    pool = build_pool(args.wpd * sizes[-1])
    rows = []
    for n in sizes:
        nw = args.wpd * n
        bank = take_windows(pool, nw)
        mesh = make_mesh(n)
        losses_m, comp_m, run_m, _ = run_one(bank, args.steps, mesh=mesh)
        losses_u, comp_u, run_u, _ = run_one(bank, args.steps, mesh=None)
        drift = float(np.max(np.abs(losses_m - losses_u)
                             / np.maximum(np.abs(losses_u), 1.0)))
        step_ms = run_m / args.steps * 1e3
        rows.append({"devices": n, "windows": nw, "step_ms": step_ms,
                     "step_ms_unsharded": run_u / args.steps * 1e3,
                     "compile_s": comp_m, "loss_final": float(losses_m[-1]),
                     "loss_final_unsharded": float(losses_u[-1]),
                     "max_rel_loss_drift": drift})
        print(rows[-1], flush=True)

    lines = [
        "# Multi-chip weak scaling — window-DP bank (virtual CPU mesh)",
        "",
        f"Generated by `python scripts/multichip_scaling.py --steps "
        f"{args.steps} --wpd {args.wpd}` on "
        f"{len(jax.devices())} virtual CPU devices "
        "(`--xla_force_host_platform_device_count=8`), float64.",
        "",
        "Weak scaling: windows-per-device FIXED at "
        f"{args.wpd} while the mesh grows, matching SURVEY.md section 2.10 "
        "(windows are the data-parallel axis; per-step cross-window "
        "communication is zero by construction — per-window value_and_grad, "
        "window-masked loss reduction).  Every sharded run is pinned against "
        "the UNSHARDED optimization of the identical bank: "
        "`max_rel_loss_drift` is the max per-step relative difference of the "
        "loss traces over all steps.",
        "",
        "**Caveat (recorded honestly):** all virtual devices share one "
        "physical CPU, so total compute throughput is FIXED while the weak-"
        "scaled workload grows — step time necessarily grows ~linearly with "
        "total windows here and cannot demonstrate real-chip speedup.  The "
        "pass criteria on this rig are (a) bit-level loss equality of the "
        "sharded vs unsharded optimization at every size, and (b) bounded "
        "SPMD partitioning overhead (`step_ms` vs `step_ms_unsharded` on "
        "the identical bank).  On a real pod the same program distributes "
        "the compute: no per-step collectives exist to serialize it.",
        "",
        "| devices | windows | step ms (sharded) | step ms (unsharded, same "
        "bank) | compile s | final loss (sharded) | final loss (unsharded) "
        "| max rel loss drift |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['devices']} | {r['windows']} | {r['step_ms']:.1f} | "
            f"{r['step_ms_unsharded']:.1f} | {r['compile_s']:.1f} | "
            f"{r['loss_final']:.6f} | {r['loss_final_unsharded']:.6f} | "
            f"{r['max_rel_loss_drift']:.2e} |")
    drifts = [r["max_rel_loss_drift"] for r in rows]
    lines += ["",
              f"Max loss drift across all sizes: {max(drifts):.2e} "
              "(f64; sharded and unsharded runs execute bit-comparable "
              "per-window computations — drift at this level is reduction-"
              "order noise).", ""]
    out = os.path.join(REPO, "MULTICHIP_SCALING.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
