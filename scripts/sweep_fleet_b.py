"""Fleet batch-size (B) sweep at the CURRENT production defaults.

SCALING_r2.json's flagship_b_sweep predates the round-3 tick work (glue
fusion, dead-disturbance elimination, clt4a default) — the tick is now
~4.5x faster, so the saturation curve needed re-measuring. Times the full
fleet tick (marginal two-scan-length method, bench.py methodology) and a
seed-0 survival smoke per (model, B); writes SCALING_r4.json at the repo
root.

Run:  PYTHONPATH=.:/root/.axon_site python scripts/sweep_fleet_b.py
"""

from __future__ import annotations

import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_rs_tpu.apps.fleet import build_fleet
from mpc_rs_tpu.parallel.mesh import make_mesh

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO / "SCALING_r5.json"

N_SEEDS = 4

SWEEP = {
    # (B list, timing ticks, survival ticks = the reference 10 s episode)
    "flagship6": ([256, 512, 1024, 2048], 800, 1000),
    "cartpole4": ([512, 1024, 2048, 4096], 2000, 200),
}


def time_marginal(tick, carry, n_long, n_s=None):
    n_s = n_s or max(2, n_long // 10)
    vary = lambda c, i: c._replace(t=c.t + jnp.float32(1e-6 * i))

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
    per = (min(e2s) - min(e1s)) / (n_long - n_s)
    if per <= 0:
        # short runs can be swallowed by the ~0.4 s tunneled-dispatch
        # jitter (bench.py guards the same way) — retry with 4x the work
        if n_long < 20_000:
            return time_marginal(tick, carry, n_long * 4, n_s * 4)
        per = 1e-9
    return per


def main():
    mesh = make_mesh({"scenario": 1, "rollouts": 1}, devices=jax.devices()[:1])
    dev = jax.devices()[0]
    rows = []
    for model, (bs_list, time_ticks, surv_ticks) in SWEEP.items():
        for b in bs_list:
            tick, carry, dt, theta_idx, guard = build_fleet(
                model, 0, "pallas", mesh, scenarios=b, seed=0)
            per = time_marginal(tick, carry, time_ticks)

            @jax.jit
            def surv_run(c):
                def body(c, _):
                    c = tick(c)
                    return c, jnp.abs(c.x[:, theta_idx])

                c, th = jax.lax.scan(body, c, jnp.arange(surv_ticks))
                return jnp.max(th, axis=0)

            # per-seed survival at the 10 s reference episode (VERDICT r4
            # #8: r4 recorded survival_seed0 only). Episodes re-key the
            # carry exactly as init_scenario_carry(seed) would, so one
            # compiled tick serves every seed.
            surv_seeds = []
            for seed in range(N_SEEDS):
                c_s = carry._replace(key=jax.random.split(jax.random.key(seed), b))
                surv_seeds.append(float((np.array(surv_run(c_s)) < guard).mean()))
            row = {
                "model": model, "scenarios": b,
                "ms_per_tick": round(per * 1e3, 4),
                "scenario_ticks_per_s": round(b / per, 0),
                "survival_per_seed": surv_seeds,
                "survival_mean": round(float(np.mean(surv_seeds)), 5),
                "sim_seconds": round(surv_ticks * dt, 2),
            }
            print(json.dumps(row), flush=True)
            rows.append(row)
            # incremental + atomic: a crash mid-sweep keeps completed rows
            tmp = OUT.with_suffix(".json.tmp")
            tmp.write_text(json.dumps({
                "workload": "fleet tick B-sweep at production defaults, 10 s episodes x 4 seeds (round 5)",
                "hardware": f"{dev.platform} ({dev.device_kind})",
                "rows": rows,
            }, indent=1))
            tmp.replace(OUT)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
