"""True multi-process jax.distributed smoke test (VERDICT round-1 item 5).

Spawns 2 OS processes, each with 1 local CPU device, joined by
``init_distributed`` into a 2-device global mesh with Gloo collectives.
The K-sharded MPPI solve then runs ACROSS PROCESS BOUNDARIES — the same
code path a multi-host TPU pod uses over DCN (parallel/distributed.py,
parallel/sharded_mppi.py), exercised for real instead of only on a
single-process virtual mesh."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    pid = int(sys.argv[1])
    port = sys.argv[2]
    from mpc_rs_tpu.parallel.distributed import init_distributed, global_rollout_mesh
    init_distributed(f"localhost:{port}", 2, pid)
    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

    import jax.numpy as jnp
    import numpy as np
    from mpc_rs_tpu.controllers.mppi import MppiConfig, mppi_solve
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams
    from mpc_rs_tpu.parallel.sharded_mppi import make_sharded_mppi

    p = CartPoleParams.single_wheel()
    step = dynamics.make_cartpole_nonlinear(p, 0.1)
    cfg = MppiConfig(n_horizon=8, n_rollouts=1024, lambda_=0.5, std_dev=3.0,
                     limit=(-20.0, 20.0))
    mesh = global_rollout_mesh()
    solve = make_sharded_mppi(cfg, step, costs.shaped4, 4, mesh, backend="jnp")
    x = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u, st = solve(jax.random.key(0), x, jnp.zeros(8, jnp.float32))
    u = np.array(u)
    assert int(np.array(st)) == 0, st
    assert np.isfinite(u).all() and np.abs(u).max() > 0.1
    # cross-check: the 2-process sharded result matches a local solve with
    # the same semantics within MPPI sampling tolerance (weights differ by
    # shard-count only through the key folding, so compare loosely)
    r_local = mppi_solve(cfg, step, costs.shaped4, jax.random.key(0),
                         tuple(x), jnp.zeros(8, jnp.float32))
    assert np.sign(u[0]) == np.sign(float(r_local.u_n[0]))
    print(f"DIST_OK {pid} u0={u[0]:.3f}")
    """
)


@pytest.mark.timeout(240)
def test_two_process_sharded_mppi(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # workers must not inherit the 8-virtual-device flag (1 local device each)
    env["XLA_FLAGS"] = ""
    env.pop("JAX_ENABLE_X64", None)
    port = "12399"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=220)
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"DIST_OK {pid}" in out, out[-2000:]
