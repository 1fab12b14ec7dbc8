"""Shared runner plumbing: solver backend choice, guards, printing."""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_rs_tpu.controllers.mppi import MppiConfig, mppi_solve
from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas

DEG60 = math.radians(60.0)
PI_2 = math.pi / 2.0


def pick_backend(requested: str | None = None) -> str:
    if requested in ("pallas", "vmap"):
        return requested
    return "pallas" if jax.default_backend() == "tpu" else "vmap"


def make_mppi_solver(cfg: MppiConfig, dynamics, cost, n_state: int, backend: str | None = None):
    """jitted solve(seed:int, x: np (S,), u_n) -> (u_n, status).

    On TPU: the fused Pallas kernel; elsewhere: the vmap reference path
    (identical semantics, threefry sampling)."""
    backend = pick_backend(backend)
    if backend == "pallas":

        @jax.jit
        def solve(seed, x, u_n):
            return mppi_solve_pallas(cfg, dynamics, cost, n_state, seed, x, u_n)

        return lambda seed, x, u_n: solve(
            jnp.int32(seed), jnp.asarray(x, jnp.float32), u_n
        )

    @jax.jit
    def solve(key, x, u_n):
        r = mppi_solve(cfg, dynamics, cost, key, tuple(x), u_n)
        return r.u_n, r.status

    return lambda seed, x, u_n: solve(
        jax.random.key(seed) if isinstance(seed, int) else seed,
        jnp.asarray(x, jnp.float32),
        u_n,
    )


def np_step(step, x, u, *extra):
    """Apply a component-wise dynamics step to a numpy state vector."""
    return np.array(
        [float(v) for v in step(*(float(c) for c in x), float(u), *extra)], dtype=np.float64
    )


class Elapsed:
    def __init__(self):
        self.t0 = time.time()

    def print(self):
        print(f"elapsed: {time.time() - self.t0:.2f} sec")
