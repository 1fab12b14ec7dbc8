"""20-seed single-solve closed-loop gate for the in-kernel samplers (round 3).

Runs the mppi4-non-liner app (the primary single-chip benchmark config:
K=8e5, N=8, nonlinear cart-pole, 10 s closed loop — the reference's own
pass signal is "no 60° tip", examples/mppi4.rs:50-53) on the REAL chip via
the app entry point (apps.run main → make_mppi_solver → fused Pallas
kernel), once per (sampler, seed). This is the TPU-side acceptance run the
CPU acceptance harness cannot provide (its vmap path draws threefry
normals regardless of sampler).

  PYTHONPATH=.:$PYTHONPATH python scripts/gate_sampler_single_solve.py [seeds]

Appends one JSON line per sampler; writes SAMPLER_GATES.json.
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import tempfile
import time

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SAMPLERS = ["box-muller", "box-muller-a", "wallace", "clt4", "clt4a"]


def main():
    from mpc_rs_tpu.apps.run import main as run_main

    results = {}
    for sampler in SAMPLERS:
        passed, details = 0, []
        t0 = time.perf_counter()
        for seed in range(N_SEEDS):
            with tempfile.TemporaryDirectory() as td:
                buf = io.StringIO()
                try:
                    with contextlib.redirect_stdout(buf):
                        ret = run_main([
                            "mppi4-non-liner", "--seed", str(seed),
                            "--log-dir", td, "--sampler", sampler,
                        ])
                    out = buf.getvalue()
                    import numpy as np
                    ok = ("over 60 degrees" not in out
                          and bool(np.all(np.isfinite(np.asarray(ret, dtype=np.float64)))))
                except Exception as e:  # noqa: BLE001 — gate records, never raises
                    ok = False
                    details.append(f"seed {seed}: {e!r}"[:200])
                passed += ok
                if not ok and "over 60" in buf.getvalue():
                    details.append(f"seed {seed}: tipped")
        row = {
            "workload": "mppi4-non-liner (K=8e5, 10 s, no-60°-tip criterion)",
            "sampler": sampler, "passed": passed, "seeds": N_SEEDS,
            "elapsed_s": round(time.perf_counter() - t0, 1),
            "details": details[:5],
        }
        results[sampler] = row
        print(json.dumps(row), flush=True)
    with open("SAMPLER_GATES.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote SAMPLER_GATES.json")


if __name__ == "__main__":
    main()
