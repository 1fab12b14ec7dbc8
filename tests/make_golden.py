"""Regenerate golden-trajectory fixtures (run manually; outputs committed).

Golden trajectories pin the engine's exact closed-loop behavior under fixed
seeds — the regression mechanism the reference lacks entirely (its sampling
is entropy-seeded, SURVEY §4). f64 on CPU for platform stability.

  python tests/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mpc_rs_tpu.controllers.mppi import MppiConfig, mppi_solve
from mpc_rs_tpu.estimators.ukf import ukf_init, ukf_predict, ukf_update
from mpc_rs_tpu.models import costs, dynamics, observation
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.utils import as_vector_fn

OUT = os.path.join(os.path.dirname(__file__), "golden")


def golden_mppi4_non_liner():
    p = CartPoleParams.single_wheel()
    dt = 0.8 / 8
    cfg = MppiConfig(n_horizon=8, n_rollouts=8192, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
    step = dynamics.make_cartpole_nonlinear(p, dt)
    solve = jax.jit(lambda k, x, u: mppi_solve(cfg, step, costs.shaped4, k, x, u))
    x = tuple(jnp.float64(v) for v in (0.5, 0.0, 0.1, 0.0))
    u_n = jnp.zeros(8)
    key = jax.random.key(1234)
    xs, us = [], []
    for i in range(40):
        key, sub = jax.random.split(key)
        res = solve(sub, x, u_n)
        u_n = res.u_n
        x = step(*x, u_n[0])
        xs.append([float(v) for v in x])
        us.append(float(u_n[0]))
    np.savez(os.path.join(OUT, "mppi4_non_liner.npz"), x=np.array(xs), u=np.array(us))


def golden_ukf_cartpole():
    p = CartPoleParams.single_wheel()
    fx = as_vector_fn(dynamics.make_cartpole_nonlinear(p, 0.01), 4)
    hx = observation.make_hx_rpm_gyro4(p)
    q = jnp.diag(jnp.asarray([0.0, 0.0, 0.0, 0.25]))
    r = jnp.diag(jnp.asarray([100.0, 100.0, 0.5]))
    params, state = ukf_init(jnp.zeros(4), 10.0 * jnp.eye(4), q, r)
    rng = np.random.default_rng(99)
    x_act = np.zeros(4)
    xs, ps = [], []
    for i in range(50):
        x_act = np.array(fx(jnp.asarray(x_act), 0.1))
        z = np.array(hx(jnp.asarray(x_act))) + rng.normal(size=3) * [100, 100, 0.5]
        state = ukf_predict(params, state, 0.1, fx)
        state = ukf_update(params, state, jnp.asarray(z), hx)
        xs.append(np.array(state.x))
        ps.append(np.diag(np.array(state.p)))
    np.savez(os.path.join(OUT, "ukf_cartpole.npz"), x=np.array(xs), p_diag=np.array(ps))


def golden_qp_mpc():
    from mpc_rs_tpu.controllers.panoc import PanocConfig, box_projection, panoc_solve
    from mpc_rs_tpu.controllers.qp import build_condensed_qp, make_qp_value_and_grad
    from mpc_rs_tpu.models import reference

    p = CartPoleParams.single_wheel()
    dt = 0.8 / 8
    n = 8
    a, b = dynamics.linear_ab(p, dt)
    qp = build_condensed_qp(a, b, np.diag([5.0, 5.0, 1.0, 1.0]), n)
    vgf = make_qp_value_and_grad(qp, reference.make_gen_ref_raised_cosine(n))
    cfg = PanocConfig(tol=1e-8, max_iter=200, lbfgs_mem=20)
    proj = box_projection(-30.0, 30.0)
    aj, bj = jnp.asarray(a), jnp.asarray(b).reshape(-1)
    x = jnp.asarray([0.5, 0.0, 0.1, 0.0])
    u = jnp.zeros(n)
    xs, us = [], []
    for i in range(30):
        res = panoc_solve(cfg, None, proj, u, value_and_grad=vgf(x))
        u = res.u
        x = aj @ x + bj * u[0]
        xs.append(np.array(x))
        us.append(float(u[0]))
    np.savez(os.path.join(OUT, "qp_mpc.npz"), x=np.array(xs), u=np.array(us))


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    golden_mppi4_non_liner()
    golden_ukf_cartpole()
    golden_qp_mpc()
    print("golden fixtures written to", OUT)
