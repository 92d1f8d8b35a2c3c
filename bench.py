"""Benchmark: SVGP modulated-GP ELBO optimization throughput (steps/s).

Workload matches the reference demo (BASELINE.md: demos/scripts/demo-modgp.py
N=16,000 @ 16 kHz, 1 source, minibatch 100, Adam, M~extrema count): whole Adam
loop jit-compiled as one lax.scan on the accelerator.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the north
star is ">=10x audio-seconds/s per chip vs CPU GPflow".  As a measurable proxy
the same compiled program is timed on the host CPU backend and the ratio
accelerator/CPU is reported.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def build_workload(backend):
    import jax
    import jax.numpy as jnp
    from gpitch_tpu.kernels import Matern32, MercerMatern12sm
    from gpitch_tpu.models import ModGP
    from gpitch_tpu.pipelines import init_liv

    n, fs = 16000, 16000
    x = np.linspace(0.0, (n - 1.0) / fs, n).reshape(-1, 1)
    comp = sum(np.sin(2 * np.pi * x * (k + 1) * 15.0) for k in range(3))
    comp /= np.max(np.abs(comp))
    env = np.exp(-25 * (x - 0.33) ** 2) + np.exp(-75 * (x - 0.66) ** 2)
    env /= np.max(np.abs(env))
    rng = np.random.default_rng(0)
    y = comp * env + 1e-3 * rng.standard_normal((n, 1))

    z, _ = init_liv(x=x, y=y, win_size=31, thres=0.05, dec=1)
    # pad/trim inducing set to a fixed MXU-friendly size
    m = 128
    zi = z[0][0]
    sel = np.linspace(0, zi.shape[0] - 1, m).astype(int)
    zi = zi[sel]

    kern_act = [Matern32.create(1.0, 1.0)]
    kern_com = [MercerMatern12sm.create(1.0, 1.0, [1.0, 1.0, 1.0],
                                        [15.0, 30.0, 45.0])]
    dev = jax.devices(backend)[0]
    model = ModGP.create(z=[[zi], [zi]], kern=[kern_act, kern_com])
    model = jax.device_put(model, dev)
    return model, jax.device_put(jnp.asarray(x), dev), jax.device_put(jnp.asarray(y), dev)


def run(backend, num_steps=2000, minibatch=100):
    import jax
    import optax
    from gpitch_tpu.models import adam_step_fn, minibatch_fn

    model, x, y = build_workload(backend)
    n = x.shape[0]
    loss_fn = lambda m, xb, yb: m.loss(xb, yb, num_data=n)
    batch_fn = minibatch_fn(x, y, minibatch)
    optimizer = optax.adam(0.005)
    opt_state = optimizer.init(model)
    step = adam_step_fn(loss_fn, optimizer)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run_steps(model, opt_state):
        keys = jax.random.split(key, num_steps)

        def body(carry, k):
            return step(carry, batch_fn(k))

        return jax.lax.scan(body, (model, opt_state), keys)

    # first call compiles; the timed second call measures pure execution.
    # Fence with a host scalar read — block_until_ready can return before the
    # computation finishes on relayed/remote devices.
    (_, _), losses = run_steps(model, opt_state)
    float(losses[-1])
    t0 = time.perf_counter()
    (model2, _), losses = run_steps(model, opt_state)
    final = float(losses[-1])
    dt = time.perf_counter() - t0
    return num_steps / dt, final


def main():
    import jax

    default = jax.default_backend()
    steps_per_s, final_loss = run(default, num_steps=2000)

    vs = 1.0
    try:
        if default != "cpu":
            cpu_steps_per_s, _ = run("cpu", num_steps=200)
            vs = steps_per_s / cpu_steps_per_s
    except Exception:
        pass

    print(json.dumps({
        "metric": "svgp_elbo_steps_per_s",
        "value": round(steps_per_s, 2),
        "unit": "steps/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
