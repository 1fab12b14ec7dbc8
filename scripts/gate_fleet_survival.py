"""Full-scale fleet survival + throughput gates.

For each (model, sampler) combination: B=1024 scenarios at the
REFERENCE'S OWN 10 s episode (examples/mppi4.rs:41 — flagship6: 1000
ticks at 100 Hz incl. the 2 N pulse; cartpole4: 200 ticks at 20 Hz),
estimator in the loop, over N seeds (VERDICT r4 Next #8 — r4 gated at
3 s/5 s). Prints one JSON line per combination and a summary table.

The committed artifact is GATES.json at the repo root; in-progress runs
snapshot to GATES.json.partial (gitignored) and only a COMPLETE run
atomically replaces GATES.json (logs/ is gitignored
and does not survive between rounds). It is written incrementally after
every case so a crash loses at most one case, and a run with fewer seeds
than the committed evidence refuses to overwrite it (pass --force to
override).

  PYTHONPATH=.:$PYTHONPATH python scripts/gate_fleet_survival.py [seeds] [--force]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpc_rs_tpu.apps.fleet import build_fleet
from mpc_rs_tpu.parallel.mesh import make_mesh

ARGS = [a for a in sys.argv[1:] if a != "--force"]
FORCE = "--force" in sys.argv[1:]
N_SEEDS = int(ARGS[0]) if ARGS else 4
B = 1024
REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = REPO_ROOT / "GATES.json"

CASES = [
    # (model, sampler, ticks, time_ticks) — ticks = the 10 s reference episode
    ("flagship6", "clt4", 1000, 800),
    ("flagship6", "clt4a", 1000, 0),
    ("flagship6", "wallace", 1000, 0),
    ("cartpole4", "clt4", 200, 2000),
    ("cartpole4", "clt4a", 200, 0),
    ("cartpole4", "wallace", 200, 0),
]


def write_artifact(results, complete):
    dev = jax.devices()[0]
    payload = {
        "workload": "scripts/gate_fleet_survival.py — B=1024 scenarios, "
                    "estimator in loop, flagship6 incl. the 2 N pulse",
        "seeds": N_SEEDS,
        "hardware": f"{dev.platform} ({dev.device_kind}, "
                    f"{jax.device_count()} device(s))",
        "complete": complete,
        "results": results,
    }
    # In-progress snapshots go to a SIDE file so a rerun interrupted
    # mid-way never clobbers the committed complete artifact; only a
    # COMPLETE run atomically replaces GATES.json.
    target = OUT if complete else OUT.with_suffix(".json.partial")
    tmp = OUT.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(payload, indent=1))
    tmp.replace(target)
    if complete:
        OUT.with_suffix(".json.partial").unlink(missing_ok=True)


def main():
    if OUT.exists() and not FORCE:
        prior = json.loads(OUT.read_text())
        if prior.get("complete") and prior.get("seeds", 0) > N_SEEDS:
            sys.exit(
                f"{OUT} holds complete {prior['seeds']}-seed evidence; "
                f"refusing to overwrite with a {N_SEEDS}-seed run "
                f"(pass --force to override)."
            )
    mesh = make_mesh({"scenario": 1, "rollouts": 1}, devices=jax.devices()[:1])
    results = []
    for model, sampler, ticks, time_ticks in CASES:
        surv_all = []
        per_tick = None
        # build ONCE per (model, sampler); per-seed episodes re-key the
        # carry exactly as init_scenario_carry(seed) would (the fleets'
        # x0 are fixed constants), so one compiled tick serves all seeds
        tick, carry0, dt, theta_idx, guard = build_fleet(
            model, 0, "pallas", mesh, scenarios=B, seed=0, sampler=sampler,
        )
        def make(n, track):
            @jax.jit
            def run(c):
                def body(c, _):
                    c = tick(c)
                    return c, (jnp.abs(c.x[:, theta_idx]) if track else 0.0)

                c, th = jax.lax.scan(body, c, jnp.arange(n))
                return c, (jnp.max(th, axis=0) if track else th)

            return run

        surv_run = make(ticks, True)
        for seed in range(N_SEEDS):
            carry = carry0._replace(
                key=jax.random.split(jax.random.key(seed), B))

            _, th_max = surv_run(carry)
            th_max = np.array(th_max)
            surv = float((th_max < guard).mean())
            surv_all.append(surv)
            if seed == 0 and time_ticks:
                # marginal timing once per (model, sampler): two scan lengths.
                # Vary the carry per dispatch — the tunneled axon relay
                # memoizes repeated identical (executable, inputs) pairs,
                # which silently zeroes repeat-call timings.
                vary = lambda c, i: c._replace(t=c.t + jnp.float32(1e-6 * i))
                n_s = max(2, time_ticks // 10)
                r1, r2 = make(n_s, False), make(time_ticks, False)
                o, _ = r1(vary(carry, 97)); float(jnp.sum(o.x))
                o, _ = r2(vary(carry, 98)); float(jnp.sum(o.x))
                e1s, e2s = [], []
                for i in range(3):
                    t0 = time.perf_counter()
                    float(jnp.sum(r1(vary(carry, 2 * i))[0].x))
                    e1s.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    float(jnp.sum(r2(vary(carry, 2 * i + 1))[0].x))
                    e2s.append(time.perf_counter() - t0)
                per_tick = (min(e2s) - min(e1s)) / (time_ticks - n_s)
        row = {
            "model": model, "sampler": sampler, "scenarios": B,
            "seeds": N_SEEDS, "ticks": ticks,
            "survival_per_seed": surv_all,
            "survival_mean": round(float(np.mean(surv_all)), 5),
            "survived_total": int(round(sum(surv_all) * B)),
        }
        if per_tick:
            row["ms_per_tick"] = round(per_tick * 1e3, 3)
            row["scenario_ticks_per_s"] = round(B / per_tick, 0)
        print(json.dumps(row), flush=True)
        results.append(row)
        write_artifact(results, complete=False)
    write_artifact(results, complete=True)
    print("\nsummary:")
    for r in results:
        extra = f"  {r.get('scenario_ticks_per_s', ''):>9} ticks/s" if "scenario_ticks_per_s" in r else ""
        print(f"  {r['model']:10s} {r['sampler']:8s} survival {r['survival_mean']:.4f} "
              f"({r['survived_total']}/{B * N_SEEDS}){extra}")


if __name__ == "__main__":
    main()
