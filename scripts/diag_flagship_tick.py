"""Flagship fleet tick-split diagnostic: where does the tick time go?

Times, at the flagship fleet's CURRENT default operating point (B=1024,
K=8192, fast-math dynamics + clt4 sampler, SoA batch-minor estimator with
the Jacobi eigen root — the same constructors apps/fleet.py uses):
  mppi   — the scenario-batched fused kernel alone (per tick)
  ukf    — SoA predict+update alone (per tick)
  tick   — the full fleet tick (MPPI + plant + sensor + UKF + glue)

Marginal timing over two scan lengths cancels the tunneled-dispatch RTT
(bench.py methodology). Run on the real chip:

  PYTHONPATH=.:$PYTHONPATH python scripts/diag_flagship_tick.py [B]
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

import sys

from mpc_rs_tpu.apps.fleet import _componentize_hx, build_fleet
from mpc_rs_tpu.controllers.mppi import MppiConfig
from mpc_rs_tpu.estimators import ukf_soa
from mpc_rs_tpu.estimators.ukf import ukf_init
from mpc_rs_tpu.models import costs, dynamics, noise, observation
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_batch_partials
from mpc_rs_tpu.parallel.mesh import make_mesh

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
K = 8192


def marginal(run, carry, n_short=30, n_long=240, reps=3):
    f_short = run(n_short)
    f_long = run(n_long)
    float(jnp.sum(f_short(carry)))
    float(jnp.sum(f_long(carry)))
    for _ in range(3):
        ts, tl = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(f_short(carry)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(jnp.sum(f_long(carry)))
            tl.append(time.perf_counter() - t0)
        d = min(tl) - min(ts)
        if d > 0.1 * min(tl):
            return d / (n_long - n_short)
    return min(tl) / n_long


def main():
    p = CartPoleParams.two_wheel()
    dt = 0.01

    # --- MPPI kernel alone (fleet defaults: fast-math dynamics + clt4)
    ctrl_step = dynamics.make_flagship4(p, 1.2 / 8, fast=True)
    cost = costs.make_diag4(0.1, 0.1, 1.0, 0.5)
    cfg = MppiConfig(n_horizon=8, n_rollouts=K, lambda_=1.4, std_dev=4.0, limit=(-10.0, 10.0))

    def run_mppi(n):
        @jax.jit
        def f(c):
            def body(c, i):
                xs, u_ns = c
                parts = mppi_pallas_batch_partials(
                    cfg, ctrl_step, cost, 4,
                    jnp.full((B,), i, jnp.int32), xs, u_ns,
                    fast=True, sampler="clt4",
                )
                return (xs, parts.uw / jnp.maximum(parts.s, 1.0)[:, None]), None

            c, _ = jax.lax.scan(body, c, jnp.arange(n))
            return c[1]

        return f

    carry_m = (jnp.zeros((B, 4), jnp.float32), jnp.zeros((B, 8), jnp.float32))
    sec_m = marginal(run_mppi, carry_m)

    # --- UKF alone (fleet defaults: SoA batch-minor layout, Jacobi root)
    plant6 = dynamics.make_flagship6(p)
    ukf_fx_c = lambda xs, u: tuple(jnp.broadcast_arrays(*plant6(*xs, u, dt, 0.0)))
    hx = observation.make_hx_imu6(p)
    hx_c = _componentize_hx(hx, 5)
    sens = jnp.asarray([200.0, 200.0, 10.0, 0.05, 0.05], jnp.float32)
    q6 = noise.gen_q6(jnp.float32(2.15 * dt)).astype(jnp.float32)
    params, ukf0 = ukf_init(
        jnp.zeros(6, jnp.float32), 0.1 * jnp.eye(6, dtype=jnp.float32),
        q6, jnp.diag(sens), sqrt_method="jacobi",
    )
    ukf_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), ukf0)
    soa0 = ukf_soa.from_batched(ukf_b.x, ukf_b.p, ukf_b.sigma_f)

    def run_ukf(n):
        @jax.jit
        def f(c):
            def body(s, i):
                s = ukf_soa.soa_predict(params, s, jnp.full((B,), 0.1, jnp.float32),
                                        ukf_fx_c, q6)
                z = hx_c(tuple(xi + 0.01 * i for xi in s.x))
                return ukf_soa.soa_update(params, s, z, hx_c, jnp.diag(sens)), None

            s, _ = jax.lax.scan(body, c, jnp.arange(n, dtype=jnp.float32))
            return s.x[0]

        return f

    sec_u = marginal(run_ukf, soa0)

    # --- full tick
    mesh = make_mesh({"scenario": 1, "rollouts": 1}, devices=jax.devices()[:1])
    tick, carry, _, _, _ = build_fleet("flagship6", 0, "pallas", mesh, scenarios=B)

    def run_tick(n):
        @jax.jit
        def f(c):
            def body(c, _):
                return tick(c), None

            c, _ = jax.lax.scan(body, c, jnp.arange(n))
            return c.x

        return f

    sec_t = marginal(run_tick, carry)

    print(f"mppi kernel alone : {sec_m*1e3:7.3f} ms/tick ({sec_m/sec_t*100:4.1f}%)")
    print(f"ukf alone         : {sec_u*1e3:7.3f} ms/tick ({sec_u/sec_t*100:4.1f}%)")
    print(f"full tick         : {sec_t*1e3:7.3f} ms/tick")
    print(f"residual (plant+glue): {(sec_t-sec_m-sec_u)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
