#!/usr/bin/env python
"""Headline benchmark: MPPI solves/s per chip (K=10k, 8-step horizon) on the
mppi4-non-liner config (BASELINE.json metric), via the fused Pallas kernel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N, ...}

Baseline: the reference's implied real-time CPU throughput is 64 M
rollout-steps/s (BASELINE.md — K·N/DT = 6.4e6/0.1 s on a multicore x86 via
rayon). At K=10240, N=8 that is 81.9k steps/solve → 781 solves/s.

Methodology: the production pattern keeps the control loop device-resident
(a lax.scan chaining solves through the warm-started u_n), so we report the
*marginal* per-solve time from two scan lengths — this cancels the fixed
host↔device dispatch latency (which on this tunneled single-chip setup is
~0.4 s per call and pure network, not TPU). The per-dispatch rate is also
reported for the host-in-the-loop usage pattern.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 64e6


def _marginal_scan_time(make_run, x0, u0, n_short, n_long, reps=3):
    """Per-solve marginal time from two scan lengths; the n_long runs must
    be long enough that the length delta dominates the fixed dispatch RTT
    (~0.4 s with jitter on this tunneled chip)."""
    run = make_run()
    for attempt in range(3):
        short = jnp.arange(n_short, dtype=jnp.int32)
        long = jnp.arange(n_long, dtype=jnp.int32)
        # NOTE: on the axon remote backend block_until_ready returns before
        # the device finishes; a scalar readback (float()) is the only
        # honest sync.
        float(run(x0, u0, short))  # compile both lengths
        float(run(x0, u0, long))
        ts, tl = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            float(run(x0, u0, short + 7 * (r + 1)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(x0, u0, long + 13 * (r + 1)))
            tl.append(time.perf_counter() - t0)
        delta = min(tl) - min(ts)
        # the length delta must dominate dispatch jitter, or the number is
        # fiction — retry with longer scans, else report the conservative
        # whole-run upper bound
        if delta > 0.2 * min(tl):
            return delta / (n_long - n_short)
        n_short, n_long = n_short * 4, n_long * 4
    return min(tl) / n_long  # conservative: includes fixed dispatch cost


def main():
    from mpc_rs_tpu.controllers.mppi import MppiConfig, mppi_solve
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    p = CartPoleParams.single_wheel()
    dt = 0.8 / 8
    step = dynamics.make_cartpole_nonlinear(p, dt)
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(8, jnp.float32)

    def make_scan(cfg):
        if on_tpu:
            def body(carry, seed):
                u_n, st = mppi_solve_pallas(cfg, step, costs.shaped4, 4, seed, carry[0], carry[1])
                return (carry[0], u_n), st
        else:
            def body(carry, seed):
                r = mppi_solve(cfg, step, costs.shaped4, jax.random.key(seed), tuple(carry[0]), carry[1])
                return (carry[0], r.u_n), r.status

        @jax.jit
        def run(x, u_n, seeds):
            _, ys = jax.lax.scan(body, (x, u_n), seeds)
            return jnp.sum(ys)  # scalar readback forces the whole chain

        return lambda: run

    results = {}
    for k in (10240, 819200):
        cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
        if on_tpu:
            # length delta must make marginal compute >> dispatch jitter
            n_short, n_long = (1000, 8000) if k <= 20000 else (200, 1600)
        else:
            n_short, n_long = (4, 16) if k > 20000 else (16, 64)
        sec = _marginal_scan_time(make_scan(cfg), x0, u0, n_short, n_long)
        results[k] = dict(us_per_solve=sec * 1e6, solves_per_s=1.0 / sec,
                          steps_per_s=k * 8 / sec)

    # --- scenario-fleet north star: B batched MPPI+UKF closed loops/chip
    fleet = {}
    if on_tpu:
        try:
            fleet = _bench_fleet()
        except Exception as e:  # fleet metric is auxiliary; never fail the bench
            fleet = {"fleet_error": str(e)[:120]}

    solves_10k = results[10240]["solves_per_s"]
    baseline_10k = BASELINE_STEPS_PER_S / (10240 * 8)
    out = {
        "metric": "MPPI solves/s per chip (K=10240 rollouts, 8-step horizon, nonlinear cart-pole, device-resident loop)",
        "value": round(solves_10k, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_10k / baseline_10k, 2),
        "hardware": str(jax.devices()[0]),
        "kernel": "pallas-fused" if on_tpu else "vmap-reference(cpu-fallback)",
        "k10240_us_per_solve": round(results[10240]["us_per_solve"], 2),
        "k819200_us_per_solve": round(results[819200]["us_per_solve"], 2),
        "k819200_rollout_steps_per_s": round(results[819200]["steps_per_s"], 0),
        "k819200_vs_baseline_steps": round(results[819200]["steps_per_s"] / BASELINE_STEPS_PER_S, 2),
    }
    out.update(fleet)
    print(json.dumps(out))


def _bench_fleet(batch: int = 1024, k: int = 1024):
    """North star (BASELINE.json): batched MPPI+UKF closed loops per chip."""
    import jax.numpy as jnp
    import numpy as np

    from mpc_rs_tpu.controllers.mppi import MppiConfig
    from mpc_rs_tpu.estimators.ukf import ukf_init
    from mpc_rs_tpu.models import costs, dynamics, observation
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.parallel.mesh import make_mesh
    from mpc_rs_tpu.parallel.scenario import init_scenario_carry, make_scenario_step
    from mpc_rs_tpu.utils import as_vector_fn

    p = CartPoleParams.single_wheel()
    step = dynamics.make_cartpole_nonlinear(p, 0.1)
    fx = as_vector_fn(step, 4)
    hx = observation.make_hx_rpm_gyro4(p)
    q = jnp.diag(jnp.asarray([0.0, 0.0, 0.0, 0.25], jnp.float32))
    r = jnp.diag(jnp.asarray([50.0, 50.0, 0.2], jnp.float32))
    params, ukf0 = ukf_init(
        jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32),
        0.1 * jnp.eye(4, dtype=jnp.float32), q, r, sqrt_method="cholesky",
    )
    mesh = make_mesh({"scenario": 1, "rollouts": 1}, devices=jax.devices()[:1])
    cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
    tick = make_scenario_step(
        cfg, step, costs.shaped4, fx, params, fx, hx,
        jnp.asarray([50.0, 50.0, 0.2], jnp.float32), mesh, backend="pallas", n_state=4,
    )
    carry = init_scenario_carry(
        batch, jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32),
        jnp.zeros(8, jnp.float32), ukf0, jax.random.key(0),
    )

    def make(n):
        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (tick(c), None), c, jnp.arange(n))
            return c
        return run

    r1, r2 = make(2), make(30)
    out = r1(carry); float(jnp.sum(out.x))
    out = r2(carry); float(jnp.sum(out.x))
    t0 = time.perf_counter(); float(jnp.sum(r1(carry).x)); e1 = time.perf_counter() - t0
    t0 = time.perf_counter(); out = r2(carry); float(jnp.sum(out.x)); e2 = time.perf_counter() - t0
    per = max(1e-9, (e2 - e1) / 28)
    th = np.abs(np.array(out.x[:, 2]))
    return {
        "fleet_scenarios": batch,
        "fleet_k_per_scenario": k,
        "fleet_ms_per_tick": round(per * 1e3, 3),
        "fleet_scenario_ticks_per_s": round(batch / per, 0),
        "fleet_survival_30_ticks": round(float((th < np.radians(60.0)).mean()), 3),
    }


if __name__ == "__main__":
    main()
