"""Record scaling evidence → SCALING_r2.json (VERDICT round-1 item 5).

Three sections, honestly labeled (multi-chip TPU hardware is not available
in this environment — one tunneled v5e chip only):

- ``cpu_virtual_mesh``: strong-scaling of the K-sharded MPPI solve over
  1→8 virtual CPU devices (code-path validation of the shard_map +
  psum/pmax collectives; wall-clock efficiency here reflects host
  threading, NOT ICI — see the tpu section for hardware numbers).
- ``tpu_single_chip``: real-chip kernel shape sweep — block_sublanes × K
  for the fused chain kernel (fast + exact), the basis for the tuned
  defaults in ops/mppi_pallas._default_block_sublanes.
- ``multiprocess``: result of the genuine 2-process jax.distributed
  (Gloo) sharded-solve test (tests/test_distributed.py).

Usage:
  python scripts/measure_scaling_r2.py --cpu    # virtual-mesh section
  python scripts/measure_scaling_r2.py --tpu    # real-chip sweep section
Each invocation merges its section into SCALING_r2.json.
"""

import argparse
import json
import os
import sys
import time

# NOTE: do NOT launch this with PYTHONPATH=<repo>: a repo entry on the
# interpreter's initial sys.path breaks the axon TPU plugin's discovery in
# this image. Import jax first, then extend the path for mpc_rs_tpu.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _repo_on_path():
    if _REPO not in sys.path:
        sys.path.insert(0, _REPO)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING_r2.json")


def merge(section, payload):
    data = {}
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data[section] = payload
    json.dump(data, open(OUT, "w"), indent=1)
    print(f"wrote {section} -> {OUT}")


def run_cpu():
    _repo_on_path()
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mpc_rs_tpu.controllers.mppi import MppiConfig
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.parallel.scaling import measure_scaling

    p = CartPoleParams.single_wheel()
    step = dynamics.make_cartpole_nonlinear(p, 0.1)
    out = {}
    for k in (65536, 262144):
        cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0,
                         limit=(-20.0, 20.0))
        res = measure_scaling(cfg, step, costs.shaped4, 4, backend="jnp", iters=10)
        out[f"jnp_k{k}"] = [
            {kk: round(v, 4) if isinstance(v, float) else v for kk, v in r.items()}
            for r in res
        ]
    out["note"] = (
        "8 virtual CPU devices; validates the shard_map/psum code path. "
        "Efficiency reflects host-thread scheduling, not ICI (4 physical cores "
        "under 8 virtual devices: >4-way scaling cannot be linear here)."
    )
    merge("cpu_virtual_mesh", out)


def run_tpu():
    import jax
    import jax.numpy as jnp

    jax.devices()  # register the axon plugin BEFORE repo imports
    _repo_on_path()

    assert jax.default_backend() == "tpu", jax.default_backend()
    from mpc_rs_tpu.controllers.mppi import MppiConfig
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain

    p = CartPoleParams.single_wheel()
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(8, jnp.float32)

    def time_chain(k, j_short, j_long, fast, bs, reps=3, sampler="box-muller"):
        step = dynamics.make_cartpole_nonlinear(p, 0.1, fast=fast)
        cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0,
                         limit=(-20.0, 20.0))

        def make(j):
            @jax.jit
            def run(x, u_n, seed):
                u0s, sts, _ = mppi_pallas_chain(
                    cfg, step, costs.shaped4, 4, None, x, u_n,
                    fast=fast, n_solves=j, base_seed=seed, block_sublanes=bs,
                    sampler=sampler,
                )
                return jnp.sum(u0s) + jnp.sum(sts)
            return run

        short, long_ = make(j_short), make(j_long)
        float(short(x0, u0, jnp.int32(0))); float(long_(x0, u0, jnp.int32(0)))
        ts, tl = [], []
        for r in range(reps):
            t0 = time.perf_counter(); float(short(x0, u0, jnp.int32(3 * r + 1)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(long_(x0, u0, jnp.int32(5 * r + 2)))
            tl.append(time.perf_counter() - t0)
        sec = (min(tl) - min(ts)) / (j_long - j_short)
        return {"us_per_solve": round(sec * 1e6, 2),
                "g_steps_per_s": round(k * 8 / sec / 1e9, 2)}

    sweep = []
    for k, (js, jl) in ((10240, (4000, 24000)), (102400, (400, 2400)), (819200, (100, 600))):
        for bs in (40, 64, 80 if k == 10240 else 128, 256):
            for fast in (False, True):
                r = time_chain(k, js, jl, fast, bs)
                r.update({"k": k, "block_sublanes": bs, "fast": fast})
                sweep.append(r)
                print(r, flush=True)
    merge("tpu_single_chip", {
        "hardware": str(jax.devices()[0]),
        "kernel": "mppi_pallas_chain (one pallas_call per receding-horizon chain)",
        "sweep": sweep,
    })


def run_tpu_clt4():
    """Round-2.3 addendum: block-size sweep for the clt4 sampler fast path
    (the round-2 defaults in _default_block_sublanes were tuned under
    Box-Muller; the op mix changed)."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    jax.devices()
    _repo_on_path()
    assert jax.default_backend() == "tpu", jax.default_backend()
    import jax.numpy as jnp

    from mpc_rs_tpu.controllers.mppi import MppiConfig
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain

    import time as _t

    p = CartPoleParams.single_wheel()
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(8, jnp.float32)

    def time_chain(k, js, jl, bs, reps=3):
        step = dynamics.make_cartpole_nonlinear(p, 0.1, fast=True)
        cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0,
                         limit=(-20.0, 20.0))

        def make(j):
            @jax.jit
            def run(x, u_n, seed):
                u0s, sts, _ = mppi_pallas_chain(
                    cfg, step, costs.shaped4, 4, None, x, u_n,
                    fast=True, n_solves=j, base_seed=seed, block_sublanes=bs,
                    sampler="clt4",
                )
                return jnp.sum(u0s) + jnp.sum(sts)
            return run

        short, long_ = make(js), make(jl)
        float(short(x0, u0, jnp.int32(0))); float(long_(x0, u0, jnp.int32(0)))
        ts, tl = [], []
        for r in range(reps):
            t0 = _t.perf_counter(); float(short(x0, u0, jnp.int32(3 * r + 1)))
            ts.append(_t.perf_counter() - t0)
            t0 = _t.perf_counter(); float(long_(x0, u0, jnp.int32(5 * r + 2)))
            tl.append(_t.perf_counter() - t0)
        sec = (min(tl) - min(ts)) / (jl - js)
        return {"us_per_solve": round(sec * 1e6, 2),
                "g_steps_per_s": round(k * 8 / sec / 1e9, 2)}

    sweep = []
    for k, (js, jl) in ((10240, (4000, 24000)), (819200, (100, 600))):
        for bs in (40, 64, 128, 256):
            r = time_chain(k, js, jl, bs)
            r.update({"k": k, "block_sublanes": bs, "sampler": "clt4", "fast": True})
            sweep.append(r)
            print(r, flush=True)
    merge("tpu_single_chip_clt4", {
        "hardware": str(jax.devices()[0]),
        "kernel": "mppi_pallas_chain, clt4 sampler fast path (round 2.3)",
        "sweep": sweep,
    })


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--tpu-clt4", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        run_cpu()
    if a.tpu:
        run_tpu()
    if a.tpu_clt4:
        run_tpu_clt4()
