"""Attribute the flagship-est distributional delta to its fast tier(s).

PARITY_DIST_r05.json round-5 finding: with the ESTIMATOR IN THE LOOP the
production fleet tier's per-episode θ-RMS distribution sits ~25% above
the f64 oracle's (survival 200/200 on both sides; the truth-fed mode and
cartpole4 pass KS cleanly). The production tier differs from the
reference semantics in four gated ways: clt4a sampling, fast-math
dynamics, the Jacobi sigma root, and the SoA f32 estimator layout.

This diag re-runs the library side per variant (200 episodes each,
matched fleet cadence) and KS-tests each against the SAME stored oracle
sample, so the delta lands on the responsible component(s):

    production   pallas + clt4a + fast + jacobi + soa   (the failing row)
    ref-tier     vmap (threefry box-muller) + exact math + eigh + aos
    -sampler     production but box-muller
    -fastmath    production but exact transcendentals (sampler kept clt4a)
    -sqrt        production but eigh sigma root
    -soa         production but AoS vmapped estimator

Results append to PARITY_DIST_r05.json under "flagship-est-variants".
Run: PYTHONPATH=.:/root/.axon_site python scripts/diag_flagship_est_dist.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

VARIANTS = {
    "ref-tier": dict(backend="vmap", fast_math=False, sqrt_method="eigh",
                     ukf_layout="aos"),
    "-sampler": dict(sampler="box-muller"),
    "-fastmath": dict(fast_math=False, sampler="clt4a"),
    "-sqrt": dict(sqrt_method="eigh"),
    "-soa": dict(ukf_layout="aos"),
}


def main():
    import numpy as np
    from scipy import stats

    import parity_dist as pd

    out_path = os.path.join(ROOT, "PARITY_DIST_r05.json")
    with open(out_path) as fh:
        data = json.load(fh)
    oracle = data["flagship-est"]["raw"]["oracle"]
    o_rms = [e["rms_theta"] for e in oracle]
    episodes = len(oracle)

    rows = data["flagship-est"].get("variants", {})
    for name, kw in VARIANTS.items():
        t0 = time.time()
        print(f"--- variant {name}: {kw} ---", flush=True)
        lib = pd.run_library_flagship(episodes, feed_true=False, **kw)
        l_rms = [e["rms_theta"] for e in lib]
        ks = stats.ks_2samp(l_rms, o_rms)
        rows[name] = {
            "overrides": {k: str(v) for k, v in kw.items()},
            "survival": sum(e["survived"] for e in lib) / episodes,
            "rms_theta_mean": float(np.mean(l_rms)),
            "ks_rms_vs_oracle": {"stat": float(ks.statistic),
                                 "p": float(ks.pvalue)},
            "seconds": round(time.time() - t0, 1),
        }
        print(json.dumps(rows[name]), flush=True)
        data["flagship-est"]["variants"] = rows
        with open(out_path, "w") as fh:
            json.dump(data, fh, indent=1)
    print("done; per-variant KS vs the oracle sample recorded")


if __name__ == "__main__":
    main()
