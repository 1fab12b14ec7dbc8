"""Multi-host bring-up: jax.distributed + global mesh over ICI/DCN.

The reference has no distributed backend (SURVEY §2d: rayon work-stealing
on one host). Scale-out here is one global mesh: the ``rollouts``/
``scenario`` axes lay out so the MPPI log-sum-exp collectives ride ICI
within a slice, while scenario data-parallel crosses DCN (no cross-device
math per scenario, so DCN latency is off the critical path).

Single-process usage needs nothing from this module; multi-host jobs call
``init_distributed()`` once per process before any jax op.
"""

from __future__ import annotations

import jax

from mpc_rs_tpu.parallel.mesh import make_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op if already initialized or args are
    auto-discoverable from the TPU environment)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def global_rollout_mesh(scenario_axis: int = 1):
    """All global devices on (scenario, rollouts); rollouts fills the
    fastest (ICI-contiguous) dimension."""
    n = len(jax.devices())
    if n % scenario_axis:
        raise ValueError(f"{n} devices not divisible by scenario={scenario_axis}")
    return make_mesh({"scenario": scenario_axis, "rollouts": n // scenario_axis})
