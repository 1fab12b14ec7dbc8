"""On-chip flagship acceptance AT THE REFERENCE'S OWN SAMPLING BUDGET.

VERDICT r4 Next #3a: the acceptance table pins the flagship at
(50 Hz, K=16384) because the CPU harness cannot afford K=5e5; on the TPU
chip the reference constant is trivially affordable (~150 µs/solve), so
this script runs the mppi4-non-liner-ukf closed loop at K=500 000
(examples/mppi4-non-liner-ukf.rs:16) for 20 seeds in BOTH modes:

- DEBUG_UKF (reference default :31 — controller sees the true state,
  estimator runs in parallel);
- estimator-in-loop (--use-ukf-estimate).

Both modes run at the rate-validated 50 Hz control period
(SOLVE_RATE_SWEEP.json: 20/20 at 0.02 s with K=16384; more samples only
helps). The DEBUG_UKF default of 3 ms (emulating the reference's
unthrottled thread) costs 3334 tunneled dispatches/episode (~17 min
each, measured) purely in network RTT — 50 Hz keeps the same sim
semantics at 1/6.7 the dispatch count.

Pass criterion = the reference's own: survive t_end=10 s without |θ|>π/2,
including the 2 N disturbance pulse (chk_multirate_survives).

Writes ACCEPT_TPU_r05.json. Run ON the TPU chip (no platform override):
    PYTHONPATH=.:/root/.axon_site python scripts/accept_tpu_r05.py
"""

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax

    from mpc_rs_tpu.apps.run import main as run_main

    assert jax.default_backend() == "tpu", (
        "this acceptance run must execute on the TPU chip; got "
        f"{jax.default_backend()}")

    seeds = list(range(20))
    out = {
        "workload": "mppi4-non-liner-ukf, K=500000 (the reference's own "
                    "sampling budget, mppi4-non-liner-ukf.rs:16), 10 s, "
                    "2 N pulse, TPU Pallas kernel",
        "hardware": str(jax.devices()[0]),
        "modes": {},
    }
    for mode, extra in (
        ("debug_ukf", ["--control-period", "0.02"]),
        ("estimator_in_loop", ["--use-ukf-estimate", "--control-period", "0.02"]),
    ):
        passes, fails, times = 0, [], []
        for seed in seeds:
            t0 = time.time()
            with tempfile.TemporaryDirectory() as td:
                ret = run_main(["mppi4-non-liner-ukf", "--seed", str(seed),
                                "--log-dir", td, "--k", "500000",
                                "--t-end", "10"] + extra)
            ok = (not ret.tipped) and ret.t >= 9.5
            passes += ok
            if not ok:
                fails.append(seed)
            times.append(round(time.time() - t0, 1))
            print(f"{mode} seed {seed}: {'PASS' if ok else 'FAIL'} "
                  f"t={ret.t:.2f} ({times[-1]}s)", flush=True)
        out["modes"][mode] = {
            "criterion": "survive 10 s incl. 2 N pulse, no pi/2 tip "
                         "(mppi4.rs:41 class guard)",
            "k": 500000,
            "seeds": len(seeds),
            "passes": passes,
            "rate": passes / len(seeds),
            "fail_seeds": fails,
            "mean_wall_s_per_episode": round(sum(times) / len(times), 1),
        }
    with open(os.path.join(ROOT, "ACCEPT_TPU_r05.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({m: {k: v for k, v in d.items() if k != "fail_seeds" or v}
                      for m, d in out["modes"].items()}, indent=1))


if __name__ == "__main__":
    main()
