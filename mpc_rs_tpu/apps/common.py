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


def make_mppi_solver(cfg: MppiConfig, dynamics, cost, n_state: int, backend: str | None = None,
                     sampler: str | None = None):
    """jitted solve(seed:int, x: np (S,), u_n) -> (u_n, status).

    On TPU: the fused Pallas kernel; elsewhere: the vmap reference path
    (identical semantics, threefry sampling). ``sampler`` selects the
    in-kernel noise generator (ops.mppi_pallas.SAMPLERS; pallas/TPU only —
    the vmap and interpret paths always draw threefry normals)."""
    backend = pick_backend(backend)
    # conversions stay numpy (host-side, free); the jitted call moves data in
    # ONE dispatch — eager jnp.asarray would cost a device round trip each
    # on a remote/tunneled TPU.
    if backend == "pallas":
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:

            @jax.jit
            def solve(seed, x, u_n):
                return mppi_solve_pallas(cfg, dynamics, cost, n_state, seed, x, u_n,
                                         sampler=sampler or "box-muller")

        else:
            # off-TPU `--backend pallas`: interpret mode with external
            # threefry noise (the interpreter's hardware-PRNG is a stub),
            # so the kernel code path is debuggable anywhere
            from mpc_rs_tpu.ops.mppi_pallas import _LANES, _default_block_sublanes

            bs = _default_block_sublanes(cfg.n_rollouts)
            nb = -(-cfg.n_rollouts // (bs * _LANES))

            @jax.jit
            def solve(seed, x, u_n):
                eps = cfg.std_dev * jax.random.normal(
                    jax.random.key(seed), (nb, cfg.n_horizon, bs, _LANES), jnp.float32
                )
                return mppi_solve_pallas(
                    cfg, dynamics, cost, n_state, seed, x, u_n,
                    interpret=True, noise=eps,
                )

        return lambda seed, x, u_n: solve(
            np.int32(seed), np.asarray(x, np.float32), u_n
        )

    @jax.jit
    def solve(key, x, u_n):
        r = mppi_solve(cfg, dynamics, cost, key, tuple(x), u_n)
        return r.u_n, r.status

    return lambda seed, x, u_n: solve(
        jax.random.key(seed) if isinstance(seed, int) else seed,
        np.asarray(x, np.float32),
        u_n,
    )


# Resolved lazily: jax.devices() at import time would initialize every
# backend — on this image that grabs the EXCLUSIVE tunneled TPU chip before
# callers (tests, the acceptance harness) can select the CPU platform.
_CPU_SENTINEL = object()
_CPU = _CPU_SENTINEL


def _cpu_device():
    global _CPU
    if _CPU is _CPU_SENTINEL:
        try:
            _CPU = jax.devices("cpu")[0]
        except RuntimeError:
            _CPU = None
    return _CPU


def host_device():
    """Context manager pinning eager jnp ops to the host CPU device (no-op
    when no CPU device is registered)."""
    import contextlib

    cpu = _cpu_device()
    return jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()


def np_step(step, x, u, *extra):
    """Apply a component-wise dynamics step to a numpy state vector.

    Runs eagerly on the HOST CPU device: on a remote/tunneled TPU, eager
    scalar ops would otherwise each pay a network round trip (~0.4 s here),
    turning a 1 ms plant step into tens of seconds."""
    cpu = _cpu_device()
    if cpu is not None:
        with jax.default_device(cpu):
            out = step(*(float(c) for c in x), float(u), *extra)
            return np.array([float(v) for v in out], dtype=np.float64)
    return np.array(
        [float(v) for v in step(*(float(c) for c in x), float(u), *extra)], dtype=np.float64
    )


class Elapsed:
    def __init__(self):
        self.t0 = time.time()

    def print(self):
        print(f"elapsed: {time.time() - self.t0:.2f} sec")
