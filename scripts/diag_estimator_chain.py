"""On-chip trial of the fused plant→sensor→UKF estimator-chain kernel.

Round 3 left the chain kernel opt-in: the remote Mosaic compile helper was
SIGKILLed by the python-unrolled substep trace at flagship dims. Round 4
added a fori_loop substep mode (ops/estimator_pallas.py substep_loop) that
shrinks the trace by n_substeps — cartpole4's 5-substep chain is the case
where the XLA dense-tile fallback also regresses, so it has the most to
gain. This measures, per model:

  1. does the chain compile on the real chip at production dims?
  2. marginal ms/tick chain vs the default (rest_soa) path,
  3. a 1-seed B=1024 survival smoke (full gates via gate_fleet_survival).

Run:  PYTHONPATH=.:$PYTHONPATH python scripts/diag_estimator_chain.py [model ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from mpc_rs_tpu.apps.fleet import build_fleet
from mpc_rs_tpu.parallel.mesh import make_mesh

B = 1024
# args: model or model:sublanes (chain tile height, ops/estimator_pallas.py)
ARGS = sys.argv[1:] or ["cartpole4", "flagship6"]
TIME_TICKS = {"cartpole4": 2000, "flagship6": 800}
SURV_TICKS = {"cartpole4": 100, "flagship6": 300}


def time_marginal(tick, carry, n_long):
    vary = lambda c, i: c._replace(t=c.t + jnp.float32(1e-6 * i))
    n_s = max(2, n_long // 10)

    def make(n):
        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (tick(c), None), c, jnp.arange(n))
            return c

        return run

    r1, r2 = make(n_s), make(n_long)
    float(jnp.sum(r1(vary(carry, 97)).x))
    float(jnp.sum(r2(vary(carry, 98)).x))
    e1s, e2s = [], []
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(r1(vary(carry, 2 * i)).x))
        e1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(r2(vary(carry, 2 * i + 1)).x))
        e2s.append(time.perf_counter() - t0)
    return (min(e2s) - min(e1s)) / (n_long - n_s)


def main():
    mesh = make_mesh({"scenario": 1, "rollouts": 1}, devices=jax.devices()[:1])
    for arg in ARGS:
        model, _, sub = arg.partition(":")
        sub = int(sub) if sub else 1
        for chain in ((True,) if sub > 1 else (False, True)):
            label = f"{model} chain={chain} bs={sub}"
            try:
                tick, carry, dt, theta_idx, guard = build_fleet(
                    model, 0, "pallas", mesh, scenarios=B, seed=0,
                    estimator_chain=chain, estimator_chain_sublanes=sub,
                )
                t0 = time.perf_counter()
                c1 = jax.jit(tick)(carry)
                float(jnp.sum(c1.x))
                compile_s = time.perf_counter() - t0
                per = time_marginal(tick, carry, TIME_TICKS[model])
                # 1-seed survival smoke
                n = SURV_TICKS[model]

                @jax.jit
                def surv_run(c):
                    def body(c, _):
                        c = tick(c)
                        return c, jnp.abs(c.x[:, theta_idx])

                    c, th = jax.lax.scan(body, c, jnp.arange(n))
                    return jnp.max(th, axis=0)

                th_max = np.array(surv_run(carry))
                surv = float((th_max < guard).mean())
                print(
                    f"{label:26s} compile {compile_s:6.1f}s  "
                    f"{per*1e3:7.3f} ms/tick  {B/per:>12,.0f} ticks/s  "
                    f"survival(seed0) {surv:.4f}",
                    flush=True,
                )
            except Exception as e:  # compile SIGKILL surfaces as RuntimeError
                print(f"{label:26s} FAILED: {type(e).__name__}: {e}", flush=True)
                traceback.print_exc()


if __name__ == "__main__":
    main()
