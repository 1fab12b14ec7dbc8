"""Velocity-form PID — baseline controller (parity with advanced-pid's
``VelPid``, examples/pid.rs:15,27).

Velocity (incremental) form with derivative on the error:
  Δu = Kp·(e − e₁) + Ki·e·dt + Kd·(e − 2e₁ + e₂)/dt
  u  = clamp(u + Δu, lo, hi)
State is a small pytree (u, e₁, e₂) — pure-functional, vmappable.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PidConfig:
    kp: float
    ki: float
    kd: float
    lo: float = -float("inf")
    hi: float = float("inf")


class PidState(NamedTuple):
    u: jax.Array
    e1: jax.Array  # previous error
    e2: jax.Array  # error two ticks ago


def pid_init(dtype=jnp.float32, shape=()) -> PidState:
    z = jnp.zeros(shape, dtype)
    return PidState(u=z, e1=z, e2=z)


def pid_update(cfg: PidConfig, state: PidState, set_point, actual, dt):
    """One tick: returns (u, new_state) — pid.rs:27 ``pid.update(ref, act, DT)``."""
    e = set_point - actual
    du = cfg.kp * (e - state.e1) + cfg.ki * e * dt + cfg.kd * (e - 2.0 * state.e1 + state.e2) / dt
    u = jnp.clip(state.u + du, cfg.lo, cfg.hi)
    return u, PidState(u=u, e1=e, e2=state.e1)
