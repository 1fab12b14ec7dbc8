#!/usr/bin/env python
"""Headline benchmark: MPPI solves/s per chip (K=10k, 8-step horizon) on the
mppi4-non-liner config (BASELINE.json metric), via the fused Pallas kernel.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N, ...}

Baseline: the reference's implied real-time CPU throughput is 64 M
rollout-steps/s (BASELINE.md — K·N/DT = 6.4e6/0.1 s on a multicore x86 via
rayon). At K=10240, N=8 that is 81.9k steps/solve → 781 solves/s.

Methodology: the production pattern keeps the control loop device-resident
(a lax.scan chaining solves through the warm-started u_n), so we report the
*marginal* per-solve time from two scan lengths — this cancels the fixed
host↔device dispatch latency (which on this tunneled single-chip setup is
~0.4 s per call and pure network, not TPU). The per-dispatch rate is also
reported for the host-in-the-loop usage pattern.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_S = 64e6

# Self-audit anchors (DESIGN §9, measured on v5e):
# - VPU elementwise peak: 8×128 lanes at ~940 MHz.
# - Op-mix floors: the converged lane-cycles/rollout-step of each tier's
#   kernel at its measured roofline with the DEFAULT samplers (fast =
#   antithetic clt4a ≈ 21.5 from 44.8 G steps/s, exact-marginals =
#   wallace ≈ 39 from 24.7 G — SCALING_r25.json/DESIGN §9; survival-gated
#   1.000 at B=1024×4 seeds, GATES.json). roofline_pct =
#   floor / measured-cycles — a regression shows up as pct < 100 without
#   consulting DESIGN.
VPU_LANE_OPS_PER_S = 962e9
OPMIX_CYCLES_FLOOR = {"fast": 21.5, "exact": 39.0}


def _marginal_scan_time(make_run, x0, u0, n_short, n_long, reps=3):
    """Per-solve marginal time from two scan lengths; the n_long runs must
    be long enough that the length delta dominates the fixed dispatch RTT
    (~0.4 s with jitter on this tunneled chip)."""
    run = make_run()
    for attempt in range(3):
        short = jnp.arange(n_short, dtype=jnp.int32)
        long = jnp.arange(n_long, dtype=jnp.int32)
        # NOTE: on the axon remote backend block_until_ready returns before
        # the device finishes; a scalar readback (float()) is the only
        # honest sync.
        float(run(x0, u0, short))  # compile both lengths
        float(run(x0, u0, long))
        ts, tl = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            float(run(x0, u0, short + 7 * (r + 1)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(x0, u0, long + 13 * (r + 1)))
            tl.append(time.perf_counter() - t0)
        delta = min(tl) - min(ts)
        # the length delta must dominate dispatch jitter, or the number is
        # fiction — retry with longer scans, else report the conservative
        # whole-run upper bound
        if delta > 0.2 * min(tl):
            return delta / (n_long - n_short)
        n_short, n_long = n_short * 4, n_long * 4
    return min(tl) / n_long  # conservative: includes fixed dispatch cost


def main():
    from mpc_rs_tpu.controllers.mppi import MppiConfig, mppi_solve
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    p = CartPoleParams.single_wheel()
    dt = 0.8 / 8
    step = dynamics.make_cartpole_nonlinear(p, dt)
    step_fast = dynamics.make_cartpole_nonlinear(p, dt, fast=True)
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(8, jnp.float32)

    def make_chain(cfg, n_solves, fast):
        """Whole receding-horizon chain in ONE kernel call (scalar-seed
        mode): per-solve dispatch/finalize glue is zero by construction.
        The fast config pairs polynomial transcendentals in the dynamics
        with the transcendental-free CLT4 noise generator (sampling was
        76% of kernel time with Box-Muller — scripts/diag_kernel_mix.py)."""
        dyn = step_fast if fast else step

        @jax.jit
        def run(x, u_n, seed):
            u0s, sts, _ = mppi_pallas_chain(
                cfg, dyn, costs.shaped4, 4, None, x, u_n,
                fast=fast, n_solves=n_solves, base_seed=seed,
                sampler="clt4a" if fast else "wallace",
            )
            return jnp.sum(u0s) + jnp.sum(sts)

        return run

    def time_chain(cfg, j_short, j_long, fast, reps=3):
        short, long_ = make_chain(cfg, j_short, fast), make_chain(cfg, j_long, fast)
        float(short(x0, u0, jnp.int32(0)))
        float(long_(x0, u0, jnp.int32(0)))
        for attempt in range(3):
            ts, tl = [], []
            for r in range(reps):
                t0 = time.perf_counter()
                float(short(x0, u0, jnp.int32(100 * attempt + 7 * r + 1)))
                ts.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(long_(x0, u0, jnp.int32(100 * attempt + 13 * r + 2)))
                tl.append(time.perf_counter() - t0)
            sec = (min(tl) - min(ts)) / (j_long - j_short)
            # tunnel congestion can stretch individual dispatches by seconds;
            # a non-positive or jitter-dominated marginal is fiction — retry,
            # else fall back to the conservative whole-run upper bound
            if sec > 0 and (min(tl) - min(ts)) > 0.1 * min(tl):
                return sec
        return min(tl) / j_long

    def make_scan(cfg):
        def body(carry, seed):
            r = mppi_solve(cfg, step, costs.shaped4, jax.random.key(seed), tuple(carry[0]), carry[1])
            return (carry[0], r.u_n), r.status

        @jax.jit
        def run(x, u_n, seeds):
            _, ys = jax.lax.scan(body, (x, u_n), seeds)
            return jnp.sum(ys)  # scalar readback forces the whole chain

        return lambda: run

    results = {}
    for k in (10240, 819200):
        cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
        if on_tpu:
            # chains long enough that the marginal compute dominates the
            # ~0.4 s tunneled-dispatch jitter
            j_short, j_long = (8000, 64000) if k <= 20000 else (200, 1600)
            sec = time_chain(cfg, j_short, j_long, fast=True)
            sec_exact = time_chain(cfg, j_short, j_long, fast=False)
            results[k] = dict(us_per_solve=sec * 1e6, solves_per_s=1.0 / sec,
                              steps_per_s=k * 8 / sec,
                              steps_per_s_exact=k * 8 / sec_exact,
                              us_per_solve_exact=sec_exact * 1e6)
        else:
            n_short, n_long = (4, 16) if k > 20000 else (16, 64)
            sec = _marginal_scan_time(make_scan(cfg), x0, u0, n_short, n_long)
            results[k] = dict(us_per_solve=sec * 1e6, solves_per_s=1.0 / sec,
                              steps_per_s=k * 8 / sec,
                              us_per_solve_exact=sec * 1e6)

    # --- HW-flagship config (mppi4-ukf-commu.rs:15-22): N=20, K=8e5 —
    # 16 M evals/solve, the LARGEST per-solve workload in the reference —
    # single-solve marginal + device-resident receding-horizon chain with
    # the plant advancing (VERDICT r4 Next #3b)
    hw = {}
    if on_tpu:
        try:
            hw = _bench_hw_flagship()
        except Exception as e:
            hw = {"hw_flagship_error": str(e)[:120]}

    # --- scenario-fleet north star: B batched MPPI+UKF closed loops/chip
    fleet = {}
    if on_tpu:
        try:
            # survival horizons = the reference's full 10 s episode
            # (mppi4.rs:41; r4 used 5 s/3 s stand-ins — VERDICT r4 #8)
            fleet = _bench_fleet("cartpole4", ticks=200, time_ticks=4000)  # 10 s at 20 Hz
            # B=1024 for survival resolution (1 tip = 0.001, not 0.004);
            # matched-seed basis: clt4 4093/4096 vs exact 4094/4096
            fl2 = _bench_fleet("flagship6", ticks=1000, batch=1024,
                               time_ticks=800)  # 10 s at 100 Hz incl. the 2 N pulse
            fleet.update({f"flagship_{k.split('fleet_')[-1]}": v for k, v in fl2.items()})
            # saturated-B throughput (SCALING_r4 curve: both models still
            # climb past the B=1024 survival operating point) — timing only
            sat_c = _bench_fleet("cartpole4", ticks=0, batch=4096, time_ticks=1200)
            fleet["fleet_b4096_scenario_ticks_per_s"] = sat_c["fleet_scenario_ticks_per_s"]
            sat_f = _bench_fleet("flagship6", ticks=0, batch=2048, time_ticks=400)
            fleet["flagship_b2048_scenario_ticks_per_s"] = sat_f["fleet_scenario_ticks_per_s"]
            fleet.update(_bench_qp_fleet())
            fleet.update(_bench_qp_latency())
        except Exception as e:  # fleet metric is auxiliary; never fail the bench
            fleet = {"fleet_error": str(e)[:120]}

    solves_10k = results[10240]["solves_per_s"]
    baseline_10k = BASELINE_STEPS_PER_S / (10240 * 8)
    out = {
        "metric": "MPPI solves/s per chip (K=10240 rollouts, 8-step horizon, nonlinear cart-pole, device-resident loop)",
        "value": round(solves_10k, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_10k / baseline_10k, 2),
        "hardware": str(jax.devices()[0]),
        "kernel": "pallas-fused-chain(fastmath+clt4a)" if on_tpu else "vmap-reference(cpu-fallback)",
        "k10240_us_per_solve": round(results[10240]["us_per_solve"], 2),
        "k10240_us_per_solve_exact": round(results[10240]["us_per_solve_exact"], 2),
        "k819200_us_per_solve": round(results[819200]["us_per_solve"], 2),
        "k819200_us_per_solve_exact": round(results[819200]["us_per_solve_exact"], 2),
        "k819200_rollout_steps_per_s": round(results[819200]["steps_per_s"], 0),
        "k819200_vs_baseline_steps": round(results[819200]["steps_per_s"] / BASELINE_STEPS_PER_S, 2),
    }
    if on_tpu:
        # self-auditing roofline fields (VERDICT r2 #8): lane-cycles per
        # rollout-step and % of the documented op-mix floor, BOTH tiers
        for tier, key in (("fast", "steps_per_s"), ("exact", "steps_per_s_exact")):
            sps = results[819200][key]
            cyc = VPU_LANE_OPS_PER_S / sps
            suffix = "" if tier == "fast" else "_exact"
            out[f"k819200_lane_cycles_per_step{suffix}"] = round(cyc, 1)
            out[f"k819200_roofline_pct{suffix}"] = round(
                100.0 * OPMIX_CYCLES_FLOOR[tier] / cyc, 1)
        out["k819200_rollout_steps_per_s_exact"] = round(
            results[819200]["steps_per_s_exact"], 0)
        try:
            out.update(_bench_merge_round())
        except Exception as e:
            out["merge_error"] = str(e)[:120]
    out.update(hw)
    out.update(fleet)
    print(json.dumps(out))


def _bench_hw_flagship():
    """mppi4-ukf-commu's MPPI at the reference's own budget: T=1.2, N=20,
    K=8e5, λ=2, σ=2, ±10 (examples/mppi4-ukf-commu.rs:15-22) — 16 M
    dynamics+cost evals per solve against a 0.06 s real-time budget
    (DT=T/N). Timed as a device-resident receding-horizon chain (warm
    start through SMEM, plant advancing one step per solve — the
    closed-loop usage), two-length marginal; both sampler tiers."""
    from mpc_rs_tpu.controllers.mppi import MppiConfig
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain

    p = CartPoleParams.two_wheel()
    n, k = 20, 800_000
    dt = 1.2 / n
    cfg = MppiConfig(n_horizon=n, n_rollouts=k, lambda_=2.0, std_dev=2.0,
                     limit=(-10.0, 10.0))
    dyn = dynamics.make_commu4(p, dt)
    x0 = jnp.asarray([0.0, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(n, jnp.float32)

    def make(n_solves, sampler):
        @jax.jit
        def run(x, u_n, seed):
            u0s, sts, _ = mppi_pallas_chain(
                cfg, dyn, costs.commu4, 4, None, x, u_n, plant=dyn,
                n_solves=n_solves, base_seed=seed, sampler=sampler,
            )
            return jnp.sum(u0s) + jnp.sum(sts)

        return run

    out = {}
    for tier, sampler in (("", "clt4a"), ("_exact", "wallace")):
        j_short, j_long = 200, 1600
        short, long_ = make(j_short, sampler), make(j_long, sampler)
        float(short(x0, u0, jnp.int32(0)))
        float(long_(x0, u0, jnp.int32(0)))
        sec = None
        for attempt in range(3):
            ts, tl = [], []
            for r in range(3):
                t0 = time.perf_counter()
                float(short(x0, u0, jnp.int32(50 * attempt + 7 * r + 1)))
                ts.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(long_(x0, u0, jnp.int32(50 * attempt + 13 * r + 2)))
                tl.append(time.perf_counter() - t0)
            cand = (min(tl) - min(ts)) / (j_long - j_short)
            if cand > 0 and (min(tl) - min(ts)) > 0.1 * min(tl):
                sec = cand
                break
        if sec is None:
            sec = min(tl) / j_long  # conservative upper bound
        out[f"hw_n20_k800000_us_per_solve{tier}"] = round(sec * 1e6, 1)
        out[f"hw_n20_k800000_steps_per_s{tier}"] = round(k * n / sec, 0)
        # the reference's implied budget: 16 M evals inside DT=0.06 s
        out[f"hw_n20_realtime_headroom{tier}"] = round(0.06 / sec, 0)
    return out


def _bench_merge_round(n_iter: int = 200000):
    """1-chip anchor for the multi-chip log-sum-exp merge (VERDICT r2 #5):
    the COMPUTE half of the one-collective-round combine — pmax/psum of
    (m, s, uw·N) partials across rollout shards (parallel/sharded_mppi.py /
    parallel/scenario.py merge()). Measured as a 2-shard self-merge chained
    under lax.scan; the ICI wire time is modeled in DESIGN §12 on top of
    this anchor (payload: (2+N)·4 B per solve, (2+N)·4·B per fleet tick)."""
    lam = 1.4

    def merge2(a, b):
        # two-shard log-sum-exp combine: m, s scalars-per-scenario; uw (B, N)
        m_g = jnp.maximum(a[0], b[0])
        sa = jnp.exp((a[0] - m_g) / lam)
        sb = jnp.exp((b[0] - m_g) / lam)
        return (m_g, a[1] * sa + b[1] * sb,
                a[2] * sa[..., None] + b[2] * sb[..., None])

    results = {}
    for b in (1, 1024):
        pa = (jnp.zeros((b,)), jnp.ones((b,)), jnp.ones((b, 8)))

        def make(n):
            @jax.jit
            def run(p):
                def body(p, i):
                    q = (p[0] + 1e-6 * i, p[1], p[2])
                    return merge2(p, q), None
                p, _ = jax.lax.scan(body, p, jnp.arange(n, dtype=jnp.float32))
                return p
            return run

        short, long_ = make(n_iter // 10), make(n_iter)
        float(jnp.sum(short(pa)[2])); float(jnp.sum(long_(pa)[2]))
        t0 = time.perf_counter(); float(jnp.sum(short(pa)[2])); e1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(long_(pa)[2])); e2 = time.perf_counter() - t0
        per = max(0.0, (e2 - e1) / (n_iter - n_iter // 10))
        results[f"merge_compute_us_b{b}"] = round(per * 1e6, 3)
    return results


def _bench_fleet(model: str, *, ticks: int, batch: int = 1024,
                 time_ticks: int | None = None):
    """North star (BASELINE.json): batched MPPI+UKF closed loops per chip.

    Survival = fraction of scenarios whose |θ| NEVER exceeded the model's
    tip-over guard during the whole run (estimator in the loop; flagship6
    includes the reference's 2 N pulse at matched sensor noise)."""
    import jax.numpy as jnp
    import numpy as np

    from mpc_rs_tpu.apps.fleet import build_fleet
    from mpc_rs_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"scenario": 1, "rollouts": 1}, devices=jax.devices()[:1])
    tick, carry, dt, theta_idx, guard = build_fleet(
        model, 0, "pallas", mesh, scenarios=batch,
    )

    def make(n, track_theta):
        @jax.jit
        def run(c):
            def body(c, _):
                c = tick(c)
                return c, (jnp.abs(c.x[:, theta_idx]) if track_theta else 0.0)

            c, th = jax.lax.scan(body, c, jnp.arange(n))
            return c, (jnp.max(th, axis=0) if track_theta else th)
        return run

    # survival at the acceptance horizon (`ticks`); timing over a scan long
    # enough that the marginal dominates the ~0.4 s dispatch jitter (a
    # 100-tick marginal under-reported the cartpole4 fleet by ~40%)
    n_time = max(ticks, time_ticks or 0)
    n_short = max(2, n_time // 10)
    r1, r2 = make(n_short, False), make(n_time, False)
    out, _ = r1(carry); float(jnp.sum(out.x))
    out, _ = r2(carry); float(jnp.sum(out.x))
    t0 = time.perf_counter(); float(jnp.sum(r1(carry)[0].x)); e1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jnp.sum(r2(carry)[0].x)); e2 = time.perf_counter() - t0
    per = max(1e-9, (e2 - e1) / (n_time - n_short))
    out = {
        "fleet_scenarios": batch,
        "fleet_k_per_scenario": 8192 if model == "flagship6" else 1024,
        "fleet_ms_per_tick": round(per * 1e3, 3),
        "fleet_scenario_ticks_per_s": round(batch / per, 0),
    }
    if ticks:  # ticks=0 → timing-only probe (saturated-B fields)
        _, th_max = make(ticks, True)(carry)
        surv = float((np.array(th_max) < guard).mean())
        out[f"fleet_survival_{ticks}_ticks"] = round(surv, 4)
        out["fleet_sim_seconds"] = round(ticks * dt, 2)
    return out


def _qp_tick_marginal(tick, carry, ticks: int):
    """Per-tick marginal time of a scanned QP-fleet tick (two-length scan,
    scalar-readback sync — same discipline as the MPPI chain timing)."""
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (tick(c), None), c, jnp.arange(n))
            return c
        return run

    n_short = max(2, ticks // 10)
    r1, r2 = make(n_short), make(ticks)
    float(jnp.sum(r1(carry)[0])); float(jnp.sum(r2(carry)[0]))
    t0 = time.perf_counter(); float(jnp.sum(r1(carry)[0])); e1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(jnp.sum(r2(carry)[0])); e2 = time.perf_counter() - t0
    return max(1e-9, (e2 - e1) / (ticks - n_short)), make


def _bench_qp_latency(ticks: int = 60000):
    """Single-instance gradient-MPC latency, device-resident: one
    receding-horizon tick = exact box-QP solve (projected Newton, 12
    iterations, active-set inverse table) + nonlinear plant step, chained
    through warm-started u_n under lax.scan. The reference's PANOC budget
    for the same condensed QP is its wall-clock cap: 0.03 s (DUR,
    mpc-ukf-s.rs:17) to 0.1 s (op-mpc-x.rs:161)."""
    from mpc_rs_tpu.apps.fleet import build_qp_fleet

    tick, carry, dt = build_qp_fleet(1)
    per, _ = _qp_tick_marginal(tick, carry, ticks)
    return {"qp_solve_us": round(per * 1e6, 2),
            "qp_solves_per_s": round(1.0 / per, 0),
            "qp_vs_reference_budget": round(0.03 / per, 0)}


def _bench_qp_fleet(batch: int = 1024, ticks: int = 4000):
    """Batched gradient-MPC fleet (projected-Newton batched box-QP solve,
    nonlinear plant — op-mpc-x-calc-nl.rs batched). A tick is ~10 µs for
    the whole B=1024 batch since round 2.5 (12 exact Newton iterations of
    lane-dense (B,N) work replace the vmapped PANOC while_loop), so the
    scan must be thousands of ticks long for the marginal time to dominate
    the ~0.4 s tunneled-dispatch jitter. Parked fraction is read at 30
    ticks (3 s sim — the acceptance horizon); the timing scan continues
    beyond it (the fleet just regulates in place)."""
    import numpy as np

    from mpc_rs_tpu.apps.fleet import build_qp_fleet

    tick, carry, dt = build_qp_fleet(batch)
    per, make = _qp_tick_marginal(tick, carry, ticks)
    x = np.array(make(30)(carry)[0])  # parked? read at the 3 s acceptance horizon
    return {
        "qp_fleet_scenarios": batch,
        "qp_fleet_scenario_ticks_per_s": round(batch / per, 0),
        "qp_fleet_parked_frac": round(float((np.abs(x[:, 0]) < 0.3).mean()), 3),
    }


if __name__ == "__main__":
    main()
