"""On-chip validation of observation-channel normalization (round 5).

DESIGN §18: the flagship est-in-loop distributional-parity rejection was
attributed to f32 conditioning in the UKF innovation covariance (geared
encoder rows ~8 decades above the IMU rows). The fix — rescale z/hx/R by
1/σ per channel — is mathematically the identical filter (f64 identity
pinned in tests/test_ukf.py::test_obs_normalization_is_identity). This
driver produces the VALIDATION evidence the default flip is gated on:

  1. est-in-loop library side, obs_normalize=True, 200 free-running
     episodes on the production tier → KS vs the stored f64 oracle
     sample (the exact test the raw path failed at stat 0.66 / p~1e-42).
  2. same for the truth-fed (DEBUG_UKF) mode — the controller never sees
     the estimate there, so this doubles as the flagship-dbg library
     restore for PARITY_DIST_r05.json.

Results append to PARITY_DIST_r05.json under
flagship-est.variants["obs-normalize"] and restore the full
flagship-dbg/flagship-est entries when --restore is passed.

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
