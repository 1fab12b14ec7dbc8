"""Bisect the flagship fleet tick's plant/sensor/glue residual.

Builds scan-wrapped variants of the flagship tick with components
progressively enabled, timing each by the marginal-scan method:

  kern      — key mgmt + batched MPPI kernel + merge + finalize
  +plant    — ... + disturbance + plant step
  +sensor   — ... + hx + sensor noise draw
  +ukf      — ... + SoA convert + predict/update/guard (the full tick)

Run on the real chip:  PYTHONPATH=.:$PYTHONPATH python scripts/diag_glue.py [B]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from mpc_rs_tpu.apps.fleet import build_fleet
from mpc_rs_tpu.parallel.mesh import make_mesh
from mpc_rs_tpu.parallel import scenario as sc

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def _vary(carry, i):
    # perturb the carry per call — the tunneled axon relay memoizes
    # repeated identical (executable, inputs) dispatches, which silently
    # zeroes out repeat-call timings
    return carry._replace(t=carry.t + jnp.float32(1e-6 * i))


def marginal(f_short, f_long, carry, n_short, n_long, reps=3):
    sync = lambda o: float(jnp.sum(o))  # host readback = hard sync
    sync(f_short(_vary(carry, 97)))
    sync(f_long(_vary(carry, 98)))
    ts, tl = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        sync(f_short(_vary(carry, 2 * i)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        sync(f_long(_vary(carry, 2 * i + 1)))
        tl.append(time.perf_counter() - t0)
    print(f"    raw: short {min(ts)*1e3:8.1f} ms   long {min(tl)*1e3:8.1f} ms")
    return (min(tl) - min(ts)) / (n_long - n_short)


def scan_wrap(tick, n):
    @jax.jit
    def f(c):
        c, _ = jax.lax.scan(lambda c, _: (tick(c), None), c, jnp.arange(n))
        return c.x

    return f


def main():
    mesh = make_mesh({"scenario": 1, "rollouts": 1}, devices=jax.devices()[:1])

    import mpc_rs_tpu.ops.mppi_pallas as mp
    from mpc_rs_tpu.estimators import ukf_soa as _soa

    stages = {}

    # monkeypatch-free variant builder: re-create the tick with pieces off
    def build_variant(mode):
        orig_step = sc.make_scenario_step

        def wrapper(*a, **kw):
            return orig_step(*a, **kw)

        tick, carry, dt, theta_idx, guard = build_fleet(
            "flagship6", 0, "pallas", mesh, scenarios=B)
        return tick, carry

    tick, carry, dt, theta_idx, guard = build_fleet(
        "flagship6", 0, "pallas", mesh, scenarios=B)

    # Rebuild the inner pieces by hand to isolate stages (mirrors
    # make_scenario_step's flagship path, same constructors).
    from mpc_rs_tpu.apps.fleet import _componentize_hx
    from mpc_rs_tpu.controllers.mppi import MppiConfig
    from mpc_rs_tpu.estimators.ukf import ukf_init
    from mpc_rs_tpu.models import costs, dynamics, noise, observation
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.ops.mppi_pallas import (
        MppiPartials, finalize_partials, mppi_pallas_batch_partials)

    p = CartPoleParams.two_wheel()
    dt = 0.01
    plant6 = dynamics.make_flagship6(p)
    ctrl_step = dynamics.make_flagship4(p, 1.2 / 8, fast=True)
    cost = costs.make_diag4(0.1, 0.1, 1.0, 0.5)
    hx = observation.make_hx_imu6(p)
    hx_c = _componentize_hx(hx, 5)
    ukf_fx_c = lambda xs, u: tuple(jnp.broadcast_arrays(*plant6(*xs, u, dt, 0.0)))
    sens = jnp.asarray([200.0, 200.0, 10.0, 0.05, 0.05], jnp.float32)
    q6 = noise.gen_q6(jnp.float32(2.15 * dt)).astype(jnp.float32)
    p0 = 0.1 * jnp.eye(6, dtype=jnp.float32)
    params, ukf0 = ukf_init(jnp.zeros(6, jnp.float32), p0, q6,
                            jnp.diag(sens), sqrt_method="jacobi")
    cfg = MppiConfig(n_horizon=8, n_rollouts=8192, lambda_=1.4, std_dev=4.0,
                     limit=(-10.0, 10.0))

    def plant_fx(xv, u, f):
        out = plant6(*(xv[..., i] for i in range(6)), u, dt, f)
        return jnp.stack(jnp.broadcast_arrays(*out), axis=-1)

    dist = lambda t: jnp.where((t > 1.0) & (t < 1.5), jnp.float32(2.0),
                               jnp.float32(0.0))

    def make_tick(mode):
        def step(carry):
            keys = jax.vmap(lambda k: jax.random.split(k, 3))(carry.key)
            key_next, k_mppi, k_sens = keys[:, 0], keys[:, 1], keys[:, 2]
            x_ctrl = carry.ukf.x
            x_hats = x_ctrl[:, jnp.asarray((0, 1, 3, 4))]
            seeds = jax.vmap(
                lambda k: jax.random.randint(k, (), 0, 2**31 - 1, dtype=jnp.int32)
            )(k_mppi)
            parts = mppi_pallas_batch_partials(
                cfg, ctrl_step, cost, 4, seeds, x_hats, carry.u_n,
                fast=True, sampler="clt4")
            u_new, status = jax.vmap(lambda pp, u: finalize_partials(cfg, pp, u))(
                parts, carry.u_n)
            ukf = carry.ukf
            if mode == "kern":
                x_next = carry.x
            else:
                u0 = u_new[:, 0]
                x_next = plant_fx(carry.x, u0, dist(carry.t))
                if mode != "plant":
                    zmat = hx(x_next) + sens * jax.random.normal(
                        k_sens[0], x_next.shape[:-1] + sens.shape, dtype=sens.dtype)
                    if mode == "sensor":
                        # consume z so it isn't DCE'd: fold into x lanes
                        x_next = x_next + 0.0 * jnp.pad(
                            zmat[:, :1], ((0, 0), (0, 5)))
                    else:  # full
                        soa = _soa.from_batched(ukf.x, ukf.p, ukf.sigma_f)
                        soa = _soa.soa_predict(params, soa, u0, ukf_fx_c, q6)
                        soa = _soa.soa_update(
                            params, soa, tuple(zmat[..., j] for j in range(5)),
                            hx_c, jnp.diag(sens))
                        soa = _soa.soa_guard(soa, p0)
                        xb, pb, sfb = _soa.to_batched(soa)
                        ukf = ukf._replace(x=xb, p=pb, sigma_f=sfb)
            return sc.ScenarioCarry(
                x=x_next, u_n=u_new, ukf=ukf, key=key_next, status=status,
                t=carry.t + jnp.float32(dt))

        return step

    results = {}
    for mode in ("kern", "plant", "sensor", "full"):
        t = make_tick(mode)
        results[mode] = marginal(scan_wrap(t, 30), scan_wrap(t, 240), carry,
                                 30, 240)

    real = marginal(scan_wrap(tick, 30), scan_wrap(tick, 240), carry, 30, 240)

    print(f"kern (keys+kernel+finalize): {results['kern']*1e3:7.3f} ms")
    print(f"+plant                     : {results['plant']*1e3:7.3f} ms  (Δ {1e3*(results['plant']-results['kern']):+.3f})")
    print(f"+sensor                    : {results['sensor']*1e3:7.3f} ms  (Δ {1e3*(results['sensor']-results['plant']):+.3f})")
    print(f"+ukf (hand-rolled full)    : {results['full']*1e3:7.3f} ms  (Δ {1e3*(results['full']-results['sensor']):+.3f})")
    print(f"production tick            : {real*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
