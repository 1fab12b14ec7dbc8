"""On-chip validation of observation-channel normalization (round 5).

DESIGN §18, historical validation step: the flagship est-in-loop
distributional-parity rejection was first attributed to f32 conditioning
in the UKF innovation covariance (geared encoder rows ~8 decades above
the IMU rows). The candidate fix — rescale z/hx/R by 1/σ per channel —
is mathematically the identical filter (f64 identity pinned in
tests/test_ukf.py::test_ukf_observation_normalization_equivalence_f64).
This driver ran the on-chip evidence that REFUTED it as the cause
(normalized 200-episode θ-RMS 0.167 ≈ raw 0.169, KS still rejected vs
the oracle's 0.135; the real cause was the α=1e-3 UT weight
amplification, scripts/diag_flagship_est_bisect.py).

For each of flagship-est / flagship-dbg it runs the library side with
obs_normalize=True against the cached oracle raw and REPLACES that
config's entry in PARITY_DIST_r05.json (raw included), tagging it with
library_overrides; the prior flagship-est attribution table is carried
over under variants_raw_path. The committed artifact has since been
re-recorded at production defaults (α=1, obs_normalize off) by
parity_dist.py — re-running this script would overwrite those entries
with the obs-normalized variant; it is kept for reproducibility of the
refutation, not as a maintenance tool.

Run (on the TPU chip):
  PYTHONPATH=.:scripts python scripts/validate_obs_normalize.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def main():
    import numpy as np
    from scipy import stats

    import parity_dist as pd

    out_path = os.path.join(ROOT, "PARITY_DIST_r05.json")
    with open(out_path) as fh:
        data = json.load(fh)

    for config, feed_true in (("flagship-est", False), ("flagship-dbg", True)):
        oracle = data[config]["raw"]["oracle"]
        episodes = len(oracle)
        t0 = time.time()
        print(f"--- {config}: obs_normalize=True, {episodes} episodes ---",
              flush=True)
        lib = pd.run_library_flagship(episodes, feed_true=feed_true,
                                      obs_normalize=True)
        entry = pd.summarize(config, lib, oracle)
        entry["raw"] = {"library": lib, "oracle": oracle}
        entry["library_overrides"] = {"obs_normalize": True}
        entry["seconds"] = round(time.time() - t0, 1)
        data[config] = entry
        if config == "flagship-est":
            # keep the attribution table (raw-path variants) alongside
            prior = json.load(open(out_path))
            if "variants" in prior.get("flagship-est", {}):
                entry["variants_raw_path"] = prior["flagship-est"]["variants"]
        with open(out_path, "w") as fh:
            json.dump(data, fh, indent=1)
        print(json.dumps({k: v for k, v in entry.items() if k != "raw"},
                         indent=1), flush=True)


if __name__ == "__main__":
    main()
