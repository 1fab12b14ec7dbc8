"""Measure mppi4-ukf-commu at FULL K=8e5 on the chip (VERDICT r4 Next #5).

The r4 acceptance note claimed "full-rate full-K runs on TPU" with no
artifact behind it. This script records what is actually measurable in
this image:

1. the end-to-end dispatch rate of the commu solver at the reference's
   full budget (K=8e5, N=20 — make_mppi_solver's pallas path, state in /
   control out per call, synchronous readback) through the TUNNELED chip
   — the honest deployable rate here;
2. the device-resident kernel latency of the same solve (receding-horizon
   chain marginal — no per-call tunnel RTT), which is the rate a
   locally-attached chip sustains;
3. a closed-loop HIL-twin run (--sim-mcu, PTY fake MCU) at full K, at the
   time-scale the measured dispatch rate supports, demonstrating the full
   packet path (Sensor3/enable/gen_r → UKF2 → MPPI → Control) at the
   reference budget.

Writes COMMU_FULLK_r05.json; apps/acceptance.py's criterion string cites
these measured numbers instead of the unbacked claim.

Run: PYTHONPATH=.:/root/.axon_site python scripts/measure_commu_fullk.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
OUT = ROOT / "COMMU_FULLK_r05.json"


def main():
    import jax
    import jax.numpy as jnp

    from mpc_rs_tpu.apps.common import make_mppi_solver
    from mpc_rs_tpu.controllers.mppi import MppiConfig
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain

    assert jax.default_backend() == "tpu"
    p = CartPoleParams.two_wheel()
    n, k = 20, 800_000
    dt = 1.2 / n
    cfg = MppiConfig(n_horizon=n, n_rollouts=k, lambda_=2.0, std_dev=2.0,
                     limit=(-10.0, 10.0))
    dyn = dynamics.make_commu4(p, dt)

    # (1) tunneled per-dispatch rate, synchronous (the -commu usage: one
    # State in, one Control out per packet)
    solve = make_mppi_solver(cfg, dyn, costs.commu4, 4)
    x = np.array([0.0, 0.0, 0.1, 0.0])
    u_n = jnp.zeros(n, jnp.float32)
    u_n, st = solve(0, x, u_n)
    np.asarray(u_n)  # compile + land
    t0 = time.perf_counter()
    reps = 20
    for i in range(reps):
        u_n, st = solve(i + 1, x, u_n)
        np.asarray(u_n)  # synchronous readback per packet
    per_dispatch = (time.perf_counter() - t0) / reps
    print(f"tunneled dispatch: {per_dispatch * 1e3:.1f} ms/solve "
          f"({1 / per_dispatch:.2f} solves/s)", flush=True)

    # (2) device-resident kernel latency (chain marginal, no tunnel RTT)
    def make(j):
        @jax.jit
        def run(xx, uu, seed):
            u0s, sts, _ = mppi_pallas_chain(
                cfg, dyn, costs.commu4, 4, None, xx, uu, plant=dyn,
                n_solves=j, base_seed=seed, sampler="clt4a")
            return jnp.sum(u0s) + jnp.sum(sts)
        return run

    x0j = jnp.asarray([0.0, 0.0, 0.1, 0.0], jnp.float32)
    u0j = jnp.zeros(n, jnp.float32)
    short, long_ = make(200), make(1600)
    float(short(x0j, u0j, jnp.int32(0)))
    float(long_(x0j, u0j, jnp.int32(0)))
    ts, tl = [], []
    for r in range(3):
        t0 = time.perf_counter(); float(short(x0j, u0j, jnp.int32(7 * r + 1)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(long_(x0j, u0j, jnp.int32(13 * r + 2)))
        tl.append(time.perf_counter() - t0)
    kernel_s = max(1e-9, (min(tl) - min(ts)) / 1400)
    print(f"device-resident: {kernel_s * 1e6:.0f} us/solve "
          f"({1 / kernel_s:.0f} solves/s)", flush=True)

    # (3) closed-loop HIL twin at full K at the supportable time-scale:
    # the reference control cadence is ~100 Hz (10 ms CSV cadence,
    # mppi4-ukf-commu.rs:353-396); scale sim time so the measured
    # dispatch rate meets it with ~30% headroom
    scale = max(0.005, round(1.0 / (per_dispatch * 100 * 1.3), 3))
    from mpc_rs_tpu.apps.run import main as run_main

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        pkts = run_main(["mppi4-ukf-commu", "--sim-mcu", "--k", "800000",
                         "--t-end", "2", "--time-scale", str(scale),
                         "--seed", "0", "--log-dir", td])
        wall = time.perf_counter() - t0
    print(f"HIL twin at K=8e5, time-scale {scale}: {int(pkts)} packets "
          f"in {wall:.0f} s wall", flush=True)

    dev = jax.devices()[0]
    OUT.write_text(json.dumps({
        "workload": "mppi4-ukf-commu MPPI at the reference's full budget "
                    "(K=8e5, N=20, mppi4-ukf-commu.rs:15-22)",
        "hardware": f"{dev.platform} ({dev.device_kind}), tunneled remote chip",
        "tunneled_ms_per_dispatch": round(per_dispatch * 1e3, 1),
        "tunneled_solves_per_s": round(1 / per_dispatch, 2),
        "device_resident_us_per_solve": round(kernel_s * 1e6, 1),
        "device_resident_solves_per_s": round(1 / kernel_s, 0),
        "reference_cadence_hz": 100,
        "local_chip_headroom_vs_100hz": round(1 / kernel_s / 100, 0),
        "hil_twin": {"k": 800000, "time_scale": scale,
                     "packets": int(pkts), "sim_seconds": 2.0,
                     "wall_seconds": round(wall, 1)},
        "note": "the 100 Hz HIL cadence is NOT sustainable through this "
                "session's tunneled dispatch path (pure network RTT); the "
                "kernel itself clears the reference budget by the recorded "
                "headroom factor on-device",
    }, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
