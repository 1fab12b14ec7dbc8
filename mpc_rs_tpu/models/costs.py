"""Stage-cost zoo — per-example cost functions from the reference.

Component-wise signatures matching the dynamics zoo: ``cost(*xs) -> array``.
"""

from __future__ import annotations

import jax.numpy as jnp


def quad2(x0, x1):
    """x0² + x1² — examples/mppi2.rs:53."""
    return x0 * x0 + x1 * x1


def shaped4(x0, x1, x2, x3):
    """Shaped cart-pole cost with clamps — examples/mppi4.rs:20-27.

    2·clamp(x0,±2)² + 3·clamp(x1+2·clamp(x0,±2),±5)² +
    5·(x2+0.35·clamp(x0,±0.75))² + 1.2·x3².
    """
    xc = jnp.clip(x0, -2.0, 2.0)
    t1 = 2.0 * xc * xc
    t2 = 3.0 * jnp.clip(x1 + 2.0 * xc, -5.0, 5.0) ** 2
    t3 = 5.0 * (x2 + 0.35 * jnp.clip(x0, -0.75, 0.75)) ** 2
    t4 = 1.2 * x3 * x3
    return t1 + t2 + t3 + t4


def make_diag4(c0: float, c1: float, c2: float, c3: float):
    """Diagonal quadratic Σ cᵢ xᵢ² — examples/mppi4-non-liner-ukf.rs:21,33-35
    (C = [0.1, 0.1, 1.0, 0.5])."""

    def cost(x0, x1, x2, x3):
        return c0 * x0 * x0 + c1 * x1 * x1 + c2 * x2 * x2 + c3 * x3 * x3

    return cost


def commu4(x0, x1, x2, x3):
    """HW flagship cost — examples/mppi4-ukf-commu.rs:171-177.

    0 + 1.2 + 3θ² + 3θ̇² (the 1.2 constant is in the reference verbatim)."""
    return 1.2 + 3.0 * x2 * x2 + 3.0 * x3 * x3


def make_tracking_rollout_cost(dynamics_step, planning_err, gain, barrier=1.0, n_state=4):
    """Horizon-rollout tracking cost — examples/op-mpc-x.rs:106-125.

    Given a control sequence u (..., N), roll the (vector-form) dynamics
    and accumulate GAIN[0]·e0² + GAIN[1]·e1⁴ + GAIN[2]·e2⁴ + GAIN[3]·e3⁴ +
    GAIN[4]·u² plus the soft barrier max(cosh(θ) − 1.2, 0).

    ``dynamics_step``: vector form f(x, u) -> x on (..., n_state).
    ``planning_err``: f(x) -> err (..., 4) (op-mpc-x.rs:86-102) OR
    f(x, plan) when a plan is threaded (mpc-ukf-x.rs:207-216) — pass a
    closure that has captured the plan update in that case.
    Returns ``cost(x0_vec, u_seq) -> scalar`` (jax.grad-able).
    """
    import jax

    def cost(x0, u_seq):
        def body(x, u):
            x = dynamics_step(x, u)
            e = planning_err(x)
            c = (
                gain[0] * e[..., 0] ** 2
                + gain[1] * e[..., 1] ** 4
                + gain[2] * e[..., 2] ** 4
                + gain[3] * e[..., 3] ** 4
                + gain[4] * u**2
            )
            if barrier:
                # weight 1.0: op-mpc-x.rs:123; weight 1e-6: mpc-ukf-x.rs:237
                c = c + barrier * jnp.maximum(jnp.cosh(x[..., 2]) - 1.2, 0.0)
            return x, c

        _, cs = jax.lax.scan(body, x0, u_seq)
        return jnp.sum(cs)

    return cost
