"""Where do the ~6 ms/step between raw value_and_grad (9.7 ms) and the full
Adam bank step (15.5 ms, BENCH separation 222 windows) go?  Ablates the
segment-scan body composition, all measured with the dispatch-free
Timer.time_fn_loop.

Run: python scripts/profile_adamstep.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import run_separation_bank  # noqa: F401  (path setup only)
    from gpitch_tpu.config import enable_persistent_compilation_cache
    from gpitch_tpu.core.params import Param, zero_untrainable_grads
    from gpitch_tpu.pipelines.windowed_sgpr import bank_loss
    from gpitch_tpu.utils.profiling import Timer

    enable_persistent_compilation_cache()

    # same bank the bench builds (222 windows)
    import bench
    import time

    from gpitch_tpu.audio import synth_piano_note
    from gpitch_tpu.audio.windowing import window_stack
    from gpitch_tpu.kernels import MercerMatern12sm
    from gpitch_tpu.pipelines.windowed_sgpr import (build_window_bank,
                                                    pad_inducing, sum_kernel)
    from gpitch_tpu.utils import midi2freq

    fs, ws, m, seconds = 16000, 2001, 112, 14.0
    sources = [synth_piano_note(fs=fs, seconds=seconds, f0=midi2freq(mm),
                                onset=o, noise=0.0, seed=mm)[1]
               for mm, o in zip((60, 64, 67), (0.0, 0.9, 1.8))]
    mix = sum(sources) / 3.0
    x = np.arange(mix.shape[0]).reshape(-1, 1) / fs
    xw, yw = window_stack(x, ws), window_stack(mix, ws)
    nw = xw.shape[0]
    z = pad_inducing([xw[i, ::16][:m].reshape(-1, 1) for i in range(nw)],
                     m, grid_dt=1.0 / fs)

    def builder():
        return sum_kernel([
            MercerMatern12sm.create(1.0, 0.1,
                                    [1.0 / (k + 1) for k in range(5)],
                                    [midi2freq(mm) * (k + 1) for k in range(5)])
            for mm in (60, 64, 67)])

    bank = build_window_bank(xw, yw, z, builder, grid_dt=1.0 / fs)
    print(f"bank: nw={nw} M={m} backend={jax.default_backend()}", flush=True)

    optimizer = optax.adam(0.01)
    opt0 = optimizer.init(bank)

    def perturbed(eps):
        v = bank.variance
        return bank.replace(variance=Param(jnp.asarray(v.raw) + eps,
                                           v.transform, v.trainable))

    def live(tree):
        return sum(jnp.sum(jnp.asarray(l)) * 1e-20
                   for l in jax.tree_util.tree_leaves(tree)
                   if hasattr(l, "dtype")
                   and jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating))

    def v0(eps):
        loss, grads = jax.value_and_grad(bank_loss)(perturbed(eps))
        return loss + live(grads)

    def v1(eps):
        m0 = perturbed(eps)
        loss, grads = jax.value_and_grad(bank_loss)(m0)
        grads = zero_untrainable_grads(grads)
        updates, st2 = optimizer.update(grads, opt0, m0)
        m2 = optax.apply_updates(m0, updates)
        return loss + live(m2) + live(st2)

    def v2(eps):
        m0 = perturbed(eps)
        loss, grads = jax.value_and_grad(bank_loss)(m0)
        grads = zero_untrainable_grads(grads)
        updates, st2 = optimizer.update(grads, opt0, m0)
        m2 = optax.apply_updates(m0, updates)
        ok = loss < jnp.inf

        def pick(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)

        m3, st3 = pick(m2, m0), pick(st2, opt0)
        return loss + live(m3) + live(st3)

    for name, fn in (("v0 val_grad", v0),
                     ("v1 +adam", v1),
                     ("v2 +pick", v2)):
        t = Timer.time_fn_loop(fn, loop_iters=20, reps=3)
        print(f"  {name:12s} {t * 1e3:8.2f} ms", flush=True)

    # v3: the REAL segment executable, steady-state per step
    from gpitch_tpu.models.fit import fit_adam_segmented
    for seg in (50, 250):
        t0 = time.perf_counter()
        _, _, compile_s, run_s = fit_adam_segmented(
            bank, bank_loss, num_steps=500, learning_rate=0.01, segment=seg)
        wall = time.perf_counter() - t0
        print(f"  segment={seg}: compile {compile_s:.1f}s run {run_s:.2f}s "
              f"({run_s / 500 * 1e3:.2f} ms/step) wall {wall:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
