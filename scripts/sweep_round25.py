#!/usr/bin/env python
"""Round-2.5 measurement artifact: sampler sweep + batched-QP crossover.

Writes SCALING_r25.json at the repo root. Run on the real TPU chip:

    python scripts/sweep_round25.py

Methodology: marginal chain/scan-length deltas with min-over-reps on each
length separately (the min(tl)-min(ts) form — robust to tunneled-dispatch
jitter; a per-rep-delta min can *overestimate* throughput when a short run
hits congestion, which is how one 67 G steps/s fiction was caught in
round 2.5).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mpc_rs_tpu.controllers.mppi import MppiConfig
from mpc_rs_tpu.models import costs, dynamics
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain

K = 819200
N = 8


def chain_marginal(sampler: str, fast: bool, j_short=200, j_long=1600, reps=3):
    p = CartPoleParams.single_wheel()
    step = dynamics.make_cartpole_nonlinear(p, 0.8 / N, fast=fast)
    cfg = MppiConfig(n_horizon=N, n_rollouts=K, lambda_=0.5, std_dev=3.0,
                     limit=(-20.0, 20.0))
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(N, jnp.float32)

    def make(n_solves):
        @jax.jit
        def run(x, u, seed):
            u0s, sts, _ = mppi_pallas_chain(
                cfg, step, costs.shaped4, 4, None, x, u,
                fast=fast, n_solves=n_solves, base_seed=seed, sampler=sampler,
            )
            return jnp.sum(u0s) + jnp.sum(sts)
        return run

    s, l = make(j_short), make(j_long)
    float(s(x0, u0, jnp.int32(0))); float(l(x0, u0, jnp.int32(0)))
    ts, tl = [], []
    for r in range(reps):
        t0 = time.perf_counter(); float(s(x0, u0, jnp.int32(7 * r + 1)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(l(x0, u0, jnp.int32(13 * r + 2)))
        tl.append(time.perf_counter() - t0)
    sec = (min(tl) - min(ts)) / (j_long - j_short)
    return {"us_per_solve": round(sec * 1e6, 1),
            "g_steps_per_s": round(K * N / sec / 1e9, 1)}


def qp_crossover(ticks_small=20000, ticks_big=4000):
    """Per-tick time of the batched Newton QP tick (solve + nonlinear
    plant), table vs unrolled Cholesky, across batch sizes — the measured
    crossover behind build_qp_fleet's B<16 table gate. Built directly here
    so both paths are forced at every B."""
    import numpy as np

    from mpc_rs_tpu.controllers.qp import (
        active_set_inverse_table,
        box_qp_newton,
        build_condensed_qp,
        qp_linear_term,
    )
    from mpc_rs_tpu.models import reference
    from mpc_rs_tpu.utils import as_vector_fn

    p = CartPoleParams.single_wheel()
    n, dt = 8, 0.1
    a, bm = dynamics.linear_ab(p, dt)
    qp = build_condensed_qp(a, bm, np.diag([5.0, 5.0, 1.0, 1.0]), n, dtype=jnp.float32)
    gen_ref = reference.make_gen_ref_raised_cosine(n)
    plant = as_vector_fn(dynamics.make_cartpole_nonlinear(p, dt), 4)
    tbl = active_set_inverse_table(qp.h)

    def per_tick(b, inv_table):
        def tick(carry):
            x, u_n = carry
            x_ref = jax.vmap(lambda xi: gen_ref(xi).reshape(-1))(x)
            bq = qp_linear_term(qp, x, x_ref)
            u = box_qp_newton(qp.h, bq, u_n, -30.0, 30.0, iters=12, inv_table=inv_table)
            return (jax.vmap(plant)(x, u[:, 0]), u)

        x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32) + 0.2 * jax.random.normal(
            jax.random.key(0), (b, 4), jnp.float32)
        carry = (x0, jnp.zeros((b, n), jnp.float32))
        ticks = ticks_small if b <= 64 else ticks_big

        def make(m):
            @jax.jit
            def run(c):
                c, _ = jax.lax.scan(lambda c, _: (tick(c), None), c, jnp.arange(m))
                return c
            return run

        ns = ticks // 10
        r1, r2 = make(ns), make(ticks)
        float(jnp.sum(r1(carry)[0])); float(jnp.sum(r2(carry)[0]))
        t0 = time.perf_counter(); float(jnp.sum(r1(carry)[0])); e1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(r2(carry)[0])); e2 = time.perf_counter() - t0
        return round((e2 - e1) / (ticks - ns) * 1e6, 2)

    return {
        f"B={b}": {"cholesky_us_per_tick": per_tick(b, None),
                   "table_us_per_tick": per_tick(b, tbl)}
        for b in (1, 16, 64, 256, 1024)
    }


def main():
    assert jax.default_backend() == "tpu", "run on the TPU chip"
    art = {
        "hardware": str(jax.devices()[0]),
        "what": "round-2.5 sampler sweep (K=819200 chain) + batched-QP solve crossover",
        "sampler_sweep_k819200": {
            "fast+clt4": chain_marginal("clt4", True),
            "fast+clt4a": chain_marginal("clt4a", True),
            "fast+clt2q": chain_marginal("clt2q", True),
            "fast+box-muller": chain_marginal("box-muller", True),
            "fast+box-muller-a": chain_marginal("box-muller-a", True),
            "exact+box-muller": chain_marginal("box-muller", False),
            "exact+box-muller-a": chain_marginal("box-muller-a", False),
        },
        "qp_newton_crossover": qp_crossover(),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING_r25.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, indent=1))


if __name__ == "__main__":
    main()
