"""Scenario-fleet runner — the BASELINE north star as a CLI workload.

Runs B independent MPPI+UKF closed loops (nonlinear cart-pole) batched on
the device mesh, reporting population statistics per report interval and
supporting checkpoint/resume of the full fleet state.

  python -m mpc_rs_tpu.apps.run fleet --scenarios 1024 --k 1024 --t-end 10
  python -m mpc_rs_tpu.apps.run fleet --resume logs/fleet/fleet.npz
"""

from __future__ import annotations

import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_rs_tpu.apps.common import Elapsed, pick_backend
from mpc_rs_tpu.controllers.mppi import MppiConfig
from mpc_rs_tpu.estimators.ukf import ukf_init
from mpc_rs_tpu.models import costs, dynamics, observation
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.parallel.mesh import make_mesh
from mpc_rs_tpu.parallel.scenario import init_scenario_carry, make_scenario_step
from mpc_rs_tpu.runtime.checkpoint import load_pytree, save_pytree
from mpc_rs_tpu.utils import as_vector_fn


def fleet(args):
    # control-tick period: the two-wheel flagship plant is fast (L=0.4,
    # reference controls it at ~300 Hz); 10 Hz is fine for the single-wheel
    dt = 0.02 if args.model == "flagship6" else 0.1
    b = args.scenarios
    k = args.k or 1024
    backend = pick_backend(args.backend)
    sqrt_method = "cholesky" if jax.default_backend() == "tpu" else "eigh"
    n_dev = len(jax.devices())
    mesh = make_mesh({"scenario": 1, "rollouts": n_dev})

    if args.model == "flagship6":
        # two-wheel 6-state plant + UKF2(6,5) with IMU observation — the
        # mppi4-non-liner-ukf stack as a fleet
        from mpc_rs_tpu.models import noise as noise_mod

        p = CartPoleParams.two_wheel()
        plant6 = dynamics.make_flagship6(p)

        def plant_fx(xv, u):
            out = plant6(*(xv[..., i] for i in range(6)), u, dt, 0.0)
            return jnp.stack(jnp.broadcast_arrays(*out), axis=-1)

        ctrl_step = dynamics.make_flagship4(p, 1.2 / 8)
        cost = costs.make_diag4(0.1, 0.1, 1.0, 0.5)
        hx = observation.make_hx_imu6(p)
        sens = jnp.asarray([20.0, 20.0, 2.0, 0.05, 0.05], jnp.float32)
        params, ukf0 = ukf_init(
            jnp.zeros(6, jnp.float32),
            0.1 * jnp.eye(6, dtype=jnp.float32),
            noise_mod.gen_q6(jnp.float32(dt)).astype(jnp.float32),
            jnp.diag(sens * sens),
            sqrt_method=sqrt_method,
        )
        cfg = MppiConfig(n_horizon=8, n_rollouts=k * n_dev if k % n_dev else k,
                         lambda_=1.4, std_dev=4.0, limit=(-10.0, 10.0))
        tick = make_scenario_step(
            cfg, ctrl_step, cost, plant_fx, params, plant_fx, hx, sens, mesh,
            backend="pallas" if backend == "pallas" else "jnp",
            n_state=4, state_slice=(0, 1, 3, 4),
        )
        x0 = jnp.asarray([0.0, 0.0, 0.0, 0.05, 0.0, 0.0], jnp.float32)
        theta_idx = 3
    else:
        p = CartPoleParams.single_wheel()
        step = dynamics.make_cartpole_nonlinear(p, dt)
        fx = as_vector_fn(step, 4)
        hx = observation.make_hx_rpm_gyro4(p)
        q = jnp.diag(jnp.asarray([0.0, 0.0, 0.0, 0.25], jnp.float32))
        sens = jnp.asarray([50.0, 50.0, 0.2], jnp.float32)
        params, ukf0 = ukf_init(
            jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32),
            0.1 * jnp.eye(4, dtype=jnp.float32),
            q,
            jnp.diag(sens),
            sqrt_method=sqrt_method,
        )
        cfg = MppiConfig(n_horizon=8, n_rollouts=k * n_dev if k % n_dev else k,
                         lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
        tick = make_scenario_step(
            cfg, step, costs.shaped4, fx, params, fx, hx, sens, mesh,
            backend="pallas" if backend == "pallas" else "jnp", n_state=4,
        )
        x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
        theta_idx = 2

    carry = init_scenario_carry(
        b, x0, jnp.zeros(8, jnp.float32), ukf0, jax.random.key(args.seed),
    )
    ckpt_path = os.path.join(args.log_dir, "fleet", "fleet.npz")
    if args.resume:
        carry = load_pytree(args.resume, carry)
        print(f"resumed fleet from {args.resume}")

    chunk = max(1, int(round(args.report_every / dt)))

    @jax.jit
    def run_chunk(c):
        c, _ = jax.lax.scan(lambda c, _: (tick(c), None), c, jnp.arange(chunk))
        return c

    el = Elapsed()
    n_ticks = int(args.t_end / dt)
    done = 0
    while done < n_ticks:
        t0 = time.perf_counter()
        carry = run_chunk(c=carry)
        th = np.abs(np.array(carry.x[:, theta_idx]))  # readback = sync
        wall = time.perf_counter() - t0
        done += chunk
        surv = float((th < math.radians(60.0)) .mean())
        print(
            f"t={done*dt:6.1f}s  survival={surv:6.3f}  median|θ|={float(np.median(th)):.4f}  "
            f"{b*chunk/wall:,.0f} scenario-ticks/s"
        )
        save_pytree(ckpt_path, carry)
    el.print()
    print(f"checkpoint: {ckpt_path}")
    return carry
