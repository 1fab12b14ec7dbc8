"""Wallace-lever measurement (DESIGN §9 "remaining levers"): does the
recycled-Box-Muller `wallace` sampler (exact N(0,1) marginals, pool refresh
every 8 steps, sign/roll mixes in between) beat paired Box-Muller — and can
it close the exact tier's gap to the transcendental-free clt4 fast tier?

Times the PRODUCTION chain kernel (ops.mppi_pallas.mppi_pallas_chain) at
K=819200, N=8 on the real chip, marginal two-length method (same discipline
as bench.py). Run:

  python scripts/diag_wallace.py            # default matrix
  python scripts/diag_wallace.py exact      # exact tier only
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from mpc_rs_tpu.controllers.mppi import MppiConfig
from mpc_rs_tpu.models import costs, dynamics
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain

K, N, BS = 819200, 8, 64


def make_chain(cfg, dyn, n_solves, fast, sampler):
    @jax.jit
    def run(x, u_n, seed):
        u0s, sts, _ = mppi_pallas_chain(
            cfg, dyn, costs.shaped4, 4, None, x, u_n,
            fast=fast, n_solves=n_solves, base_seed=seed,
            sampler=sampler, block_sublanes=BS,
        )
        return jnp.sum(u0s) + jnp.sum(sts)

    return run


def time_chain(cfg, dyn, fast, sampler, j_short=200, j_long=1600, reps=3):
    short = make_chain(cfg, dyn, j_short, fast, sampler)
    long_ = make_chain(cfg, dyn, j_long, fast, sampler)
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(N, jnp.float32)
    float(short(x0, u0, jnp.int32(0)))
    float(long_(x0, u0, jnp.int32(0)))
    for attempt in range(3):
        ts, tl = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            float(short(x0, u0, jnp.int32(attempt * 100 + 7 * r + 1)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(long_(x0, u0, jnp.int32(attempt * 100 + 13 * r + 2)))
            tl.append(time.perf_counter() - t0)
        sec = (min(tl) - min(ts)) / (j_long - j_short)
        if sec > 0 and (min(tl) - min(ts)) > 0.1 * min(tl):
            return sec
    return min(tl) / j_long


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    p = CartPoleParams.single_wheel()
    cfg = MppiConfig(n_horizon=N, n_rollouts=K, lambda_=0.5, std_dev=3.0,
                     limit=(-20.0, 20.0))
    dyn_exact = dynamics.make_cartpole_nonlinear(p, 0.1)
    dyn_fast = dynamics.make_cartpole_nonlinear(p, 0.1, fast=True)
    rows = []
    if which in ("all", "exact"):
        rows += [("exact/box-muller", dyn_exact, False, "box-muller"),
                 ("exact/wallace", dyn_exact, False, "wallace")]
    if which in ("all", "fast"):
        rows += [("fast/box-muller", dyn_fast, True, "box-muller"),
                 ("fast/clt4", dyn_fast, True, "clt4"),
                 ("fast/wallace", dyn_fast, True, "wallace")]
    for name, dyn, fast, sampler in rows:
        sec = time_chain(cfg, dyn, fast, sampler)
        print(f"{name:22s} {sec * 1e6:8.1f} us/solve  "
              f"{K * N / sec / 1e9:6.2f} G steps/s", flush=True)


if __name__ == "__main__":
    main()
