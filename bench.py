#!/usr/bin/env python
"""Headline benchmark: MPPI solves/s per chip (K=10k, 8-step horizon) on the
mppi4-non-liner config (BASELINE.json metric), via the fused Pallas kernel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N, ...}

Baseline: the reference's implied real-time CPU throughput is 64 M
rollout-steps/s (BASELINE.md — K·N/DT = 6.4e6/0.1 s on a multicore x86 via
rayon). At K=10k, N=8 that is 80k steps/solve → 800 solves/s.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_SOLVES_PER_S_10K = 800.0  # 64e6 steps/s ÷ (10240 × 8) steps/solve
BASELINE_STEPS_PER_S = 64e6


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
    x = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)

    def timeit(f, u_n, iters):
        u, st = f(0, x, u_n)
        jax.block_until_ready(u)  # compile + warm
        t0 = time.perf_counter()
        for i in range(iters):
            u, st = f(i + 1, x, u_n)
        jax.block_until_ready(u)
        return (time.perf_counter() - t0) / iters, int(st)

    results = {}
    for k, bs, iters in ((10240, 8, 500), (819200, 64, 100)):
        cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
        if on_tpu:
            f = jax.jit(
                lambda seed, xx, u, cfg=cfg, bs=bs: mppi_solve_pallas(
                    cfg, step, costs.shaped4, 4, seed, xx, u, block_sublanes=bs
                )
            )
        else:  # CPU fallback: vmap reference path (keeps bench runnable anywhere)
            f = jax.jit(
                lambda seed, xx, u, cfg=cfg: (
                    lambda r: (r.u_n, r.status)
                )(mppi_solve(cfg, step, costs.shaped4, jax.random.key(seed), tuple(xx), u))
            )
            iters = max(3, iters // 50)
        sec, status = timeit(f, jnp.zeros(8, jnp.float32), iters)
        results[k] = dict(ms_per_solve=sec * 1e3, solves_per_s=1.0 / sec,
                          rollout_steps_per_s=k * 8 / sec, status=status)

    solves_10k = results[10240]["solves_per_s"]
    out = {
        "metric": "MPPI solves/s per chip (K=10k rollouts, 8-step horizon, nonlinear cart-pole)",
        "value": round(solves_10k, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_10k / BASELINE_SOLVES_PER_S_10K, 2),
        "hardware": str(jax.devices()[0]),
        "kernel": "pallas-fused" if on_tpu else "vmap-reference(cpu-fallback)",
        "k10240_ms": round(results[10240]["ms_per_solve"], 4),
        "k819200_ms": round(results[819200]["ms_per_solve"], 4),
        "k819200_rollout_steps_per_s": round(results[819200]["rollout_steps_per_s"], 0),
        "k819200_vs_baseline_steps": round(results[819200]["rollout_steps_per_s"] / BASELINE_STEPS_PER_S, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
