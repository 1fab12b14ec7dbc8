"""Reference-trajectory generators (gen_ref / next_plan / planning_err).

Vector form on (..., 4) states; horizon outputs are (N, 4) (time-major, in
contrast to the reference's 4×N column layout — noted per function).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def make_gen_ref_raised_cosine(n_horizon: int):
    """Raised-cosine parking reference — examples/op-mpc-x-calc.rs:29-39.

    Returns ``gen_ref(x) -> (N, 4)`` with rows
    [x0(1+cosφ)/2, clamp(−0.4x0,±2)sinφ, clamp(−0.5x0,±0.35)cosφ/2,
     clamp(−0.5x0,±1.5)sinφ], φ = πi/N. (Reference stores 4×N; we use N×4.)
    """

    phases = jnp.arange(n_horizon) * (math.pi / n_horizon)
    cosp, sinp = jnp.cos(phases), jnp.sin(phases)

    def gen_ref(x):
        x0 = x[..., 0]
        r0 = x0[..., None] * (1.0 + cosp) / 2.0
        r1 = jnp.clip(-0.4 * x0, -2.0, 2.0)[..., None] * sinp
        r2 = jnp.clip(-0.5 * x0, -0.35, 0.35)[..., None] * (1.0 * cosp) / 2.0
        r3 = jnp.clip(-0.5 * x0, -1.5, 1.5)[..., None] * sinp
        return jnp.stack([r0, r1, r2, r3], axis=-1)

    return gen_ref


def make_gen_ref_zero(n_horizon: int):
    """Regulator reference ≡ 0 — examples/mpc-ukf-s.rs:179-181."""

    def gen_ref(x):
        return jnp.zeros(x.shape[:-1] + (n_horizon, 4), dtype=x.dtype)

    return gen_ref


def make_planning_err(l: float):
    """Center-of-gravity tracking error — examples/op-mpc-x.rs:86-102.

    e = [x_g_err, x_g_dot_err, theta_err, theta_dot_err] with the cascaded
    clamped references (x_g target 0, v_ref = clamp(1.5·e_x,±1.5),
    θ_ref = clamp(0.5·e_v,±0.3))."""

    def planning_err(x):
        x_g = x[..., 0] + x[..., 2] * l
        x_g_ref = jnp.clip(0.0 - x_g, -1.5, 1.5)
        x_g_err = x_g_ref - x_g
        x_g_dot = x[..., 1] + x[..., 3] * l
        x_g_dot_ref = jnp.clip(1.5 * x_g_err, -1.5, 1.5)
        x_g_dot_err = x_g_dot_ref - x_g_dot
        theta_ref = jnp.clip(0.5 * x_g_dot_err, -0.3, 0.3)
        theta_err = theta_ref - x[..., 2]
        theta_dot_err = 0.0 - x[..., 3]
        return jnp.stack(
            jnp.broadcast_arrays(x_g_err, x_g_dot_err, theta_err, theta_dot_err),
            axis=-1,
        )

    return planning_err


def make_next_plan(dt: float):
    """Incremental rate-limited planner — examples/mpc-ukf-x.rs:182-203.

    plan' built from prev plan with per-state rate limits
    max_dx = [0.5, 1.2, 1.5, 5.0]·dt, cascaded x → ẋ → θ → θ̇."""
    m0, m1, m2, m3 = 0.5 * dt, 1.2 * dt, 1.5 * dt, 5.0 * dt

    def next_plan(plan):
        d_x = jnp.clip(0.0 - plan[..., 0], -m0, m0)
        p0 = plan[..., 0] + d_x
        dd_x = d_x - plan[..., 1]
        p1 = plan[..., 1] + jnp.clip(dd_x, -m1, m1)
        d_theta = d_x * 0.5 - plan[..., 2]
        p2 = plan[..., 2] + jnp.clip(d_theta, -m2, m2)
        dd_theta = d_theta * 3.0 - plan[..., 3]
        p3 = plan[..., 3] + jnp.clip(dd_theta, -m3, m3)
        return jnp.stack([p0, p1, p2, p3], axis=-1)

    return next_plan


def make_plan_err(l: float):
    """Tracking error against an explicit plan — examples/mpc-ukf-x.rs:207-216."""

    def plan_err(x, plan):
        x_g = x[..., 0] + x[..., 2] * l
        x_g_dot = x[..., 1] + x[..., 3] * l
        return jnp.stack(
            [
                plan[..., 0] - x_g,
                plan[..., 1] - x_g_dot,
                plan[..., 2] - x[..., 2],
                plan[..., 3] - x[..., 3],
            ],
            axis=-1,
        )

    return plan_err


def rollout_plan(next_plan, plan0, n: int):
    """Unroll a planner n steps → (n, 4) via lax.scan (mpc-ukf-x.rs:228-231)."""

    def body(p, _):
        p = next_plan(p)
        return p, p

    _, plans = jax.lax.scan(body, plan0, None, length=n)
    return plans
