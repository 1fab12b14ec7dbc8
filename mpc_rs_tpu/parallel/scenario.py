"""Scenario-parallel batched closed loops over a 2-D (scenario × rollouts)
mesh — the BASELINE "north star": thousands of independent MPPI+UKF control
loops, each loop's K rollouts additionally sharded across chips.

SPMD layout:
- axis ``scenario``: independent closed-loop instances (pure data parallel,
  no cross-device math — the UKF stays per-device, SURVEY §5),
- axis ``rollouts``: each scenario's K MPPI samples split across devices;
  the softmax reduction is one pmax/psum log-sum-exp round on ICI.

States are sharded P('scenario') over leading batch dim and replicated
over 'rollouts'; controls come back replicated over 'rollouts'.

Backends: 'pallas' (default on TPU) runs all local scenarios' MPPI in one
scenario-batched fused kernel (ops.mppi_pallas_batch_partials); 'jnp' uses
the vmap reference path (CPU meshes, parity tests).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mpc_rs_tpu.controllers.mppi import MppiConfig
from mpc_rs_tpu.estimators.ukf import UkfParams, UkfState, ukf_guard, ukf_predict, ukf_update
from mpc_rs_tpu.ops.mppi_pallas import (
    MppiPartials,
    finalize_partials,
    mppi_pallas_batch_partials,
)
from mpc_rs_tpu.parallel.sharded_mppi import _jnp_partials


class ScenarioCarry(NamedTuple):
    x: jax.Array  # (B, S) true plant states
    u_n: jax.Array  # (B, N) nominal sequences
    ukf: UkfState  # batched (leading B) estimator state
    key: jax.Array  # (B,) per-scenario PRNG keys
    status: jax.Array  # (B,) last MPPI status
    t: jax.Array  # (B,) sim time — drives disturbance windows


def make_scenario_step(
    cfg: MppiConfig,
    dynamics,  # component-wise controller model
    cost,
    plant_fx: Callable,  # vector form (x, u) -> x  — true plant
    ukf_params: UkfParams,
    ukf_fx: Callable,
    ukf_hx: Callable,
    sensor_stddevs,
    mesh: Mesh,
    *,
    scenario_axis: str = "scenario",
    rollout_axis: str = "rollouts",
    state_slice=None,  # e.g. 6-state estimate -> 4-state controller input
    backend: str = "jnp",
    n_state: int | None = None,
    feed_true_state: bool = False,
    n_substeps: int = 1,
    dt_tick: float = 0.0,
    disturbance: Callable | None = None,
    control_start: float = 0.0,
    ukf_p_reset=None,  # enables per-instance NaN recovery (ukf_guard)
    pallas_interpret: bool = False,  # run the batched kernel interpreted (CPU dryrun)
    fast_math: bool = False,  # polynomial transcendentals in the MPPI kernel sampling
    sampler: str = "box-muller",  # in-kernel noise generator (ops.mppi_pallas.SAMPLERS)
    ukf_layout: str = "aos",  # "aos": vmapped estimators.ukf; "soa": batch-minor
    ukf_fx_c: Callable | None = None,  # component-form fx (required for "soa")
    ukf_hx_c: Callable | None = None,  # component-form hx (required for "soa")
):
    """Returns jitted ``step(carry) -> carry`` advancing every scenario one
    control tick: MPPI (rollout-sharded) → plant → sensor → UKF.

    ``feed_true_state`` reproduces the reference's DEBUG_UKF switch
    (examples/mppi4-non-liner-ukf.rs:31,55-61): the controller sees the true
    plant state while the estimator still runs alongside.

    ``n_substeps`` models the reference's sensor/UKF threads ticking faster
    than the control loop (sensor every 3–9 ms vs control every 0.1 s —
    examples/mppi4-non-liner-s.rs:231-240): per control tick the plant and
    the sensor→UKF update run ``n_substeps`` times while ``u0`` is held.
    ``plant_fx``/``ukf_fx`` must then be built at the substep dt.

    ``disturbance``: traceable ``f(t_sim) -> force`` (e.g. the flagship's
    2 N push during t∈(1,1.5) s — mppi4-non-liner-ukf.rs:237-244). When
    given, ``plant_fx`` is called as ``plant_fx(x, u, f)`` and ``dt_tick``
    must be the control-tick period (sim time advances by it each tick).

    ``ukf_layout="soa"``: run the estimator in the batch-minor layout
    (estimators/ukf_soa.py — every matrix entry a (B,) lane-dense vector;
    the vmapped AoS layout wastes ~95% of each VPU tile on 6×6 math).
    Requires component-form ``ukf_fx_c``/``ukf_hx_c``; the carry keeps the
    standard batch-leading ``UkfState`` (checkpoint/sharding compatible) —
    conversion happens inside the tick. The sensor-noise key schedule
    differs from the AoS path (same statistics), so trajectories are not
    bit-comparable across layouts; survival/acceptance gates both.
    """
    n_dev_r = mesh.shape[rollout_axis]
    if cfg.n_rollouts % n_dev_r:
        raise ValueError("K not divisible by rollout axis")
    if ukf_layout == "soa" and (ukf_fx_c is None or ukf_hx_c is None):
        raise ValueError("ukf_layout='soa' requires component-form ukf_fx_c and ukf_hx_c")
    k_local = cfg.n_rollouts // n_dev_r
    sig = jnp.asarray(sensor_stddevs)
    if n_state is None:
        n_state = len(state_slice) if state_slice is not None else None

    def merge(parts: MppiPartials) -> MppiPartials:
        # batched partials: m/s are (B,), uw is (B, N)
        m_g = jax.lax.pmax(parts.m, rollout_axis)
        scale = jnp.exp((parts.m - m_g) / cfg.lambda_)
        return MppiPartials(
            m=m_g,
            s=jax.lax.psum(parts.s * scale, rollout_axis),
            uw=jax.lax.psum(parts.uw * scale[..., None], rollout_axis),
        )

    def shard_fn(carry: ScenarioCarry) -> ScenarioCarry:
        my_r = jax.lax.axis_index(rollout_axis)

        keys = jax.vmap(lambda k: jax.random.split(k, 3))(carry.key)
        key_next, k_mppi, k_sens = keys[:, 0], keys[:, 1], keys[:, 2]
        # decorrelate rollout shards; scenarios decorrelate via their keys
        k_mppi = jax.vmap(lambda k: jax.random.fold_in(k, my_r))(k_mppi)
        x_ctrl = carry.x if feed_true_state else carry.ukf.x
        x_hats = x_ctrl if state_slice is None else x_ctrl[:, jnp.asarray(state_slice)]

        if backend == "pallas":
            ns = n_state if n_state is not None else x_hats.shape[-1]
            seeds = jax.vmap(
                lambda k: jax.random.randint(k, (), 0, 2**31 - 1, dtype=jnp.int32)
            )(k_mppi)
            parts = mppi_pallas_batch_partials(
                cfg, dynamics, cost, ns, seeds, x_hats, carry.u_n, n_rollouts=k_local,
                interpret=pallas_interpret, fast=fast_math, sampler=sampler,
            )
        else:
            parts = jax.vmap(
                lambda k, xh, u: _jnp_partials(
                    cfg, dynamics, cost, k, tuple(xh), u, k_local
                )
            )(k_mppi, x_hats, carry.u_n)
        parts = merge(parts)
        u_new, status = jax.vmap(lambda p, u: finalize_partials(cfg, p, u))(parts, carry.u_n)

        dt_sub = dt_tick / n_substeps

        def rest(x, u_seq, ukf, ks, t):
            u0 = u_seq[0]
            if control_start > 0.0:
                # estimator-settling window: plant coasts (u=0) while the
                # sensor->UKF chain runs, as the reference's UKF thread does
                # during control-thread startup (mppi4-non-liner-ukf.rs:224-288)
                u0 = jnp.where(t >= jnp.float32(control_start), u0, 0.0)

            def substep(c, inp):
                x, ukf = c
                kss, i = inp
                if disturbance is None:
                    x_next = plant_fx(x, u0)
                else:
                    x_next = plant_fx(x, u0, disturbance(t + i * dt_sub))
                z = ukf_hx(x_next) + sig * jax.random.normal(kss, sig.shape, dtype=sig.dtype)
                ukf = ukf_predict(ukf_params, ukf, u0, ukf_fx)
                ukf = ukf_update(ukf_params, ukf, z, ukf_hx)
                if ukf_p_reset is not None:
                    ukf = ukf_guard(ukf, ukf_p_reset)
                return (x_next, ukf), None

            if n_substeps == 1:
                (x_next, ukf), _ = substep((x, ukf), (ks, jnp.float32(0.0)))
            else:
                (x_next, ukf), _ = jax.lax.scan(
                    substep,
                    (x, ukf),
                    (jax.random.split(ks, n_substeps), jnp.arange(n_substeps, dtype=jnp.float32)),
                )
            return x_next, ukf

        def rest_soa(x, u_seq, ukf, ks, t):
            """Batch-level plant/sensor/UKF substeps with the estimator in
            the batch-minor layout — no vmap; every UKF op is a full-lane
            (B,) vector op. The plant and hx run vector-form on (B, n)
            (their internals slice components, already lane-dense)."""
            from mpc_rs_tpu.estimators import ukf_soa as _soa

            u0 = u_seq[:, 0]
            if control_start > 0.0:
                u0 = jnp.where(t >= jnp.float32(control_start), u0, 0.0)
            # q/r are the fleets' per-init constants (identical across the
            # batch by construction — init_scenario_carry broadcasts one)
            q_const, r_const = ukf.q[0], ukf.r[0]
            n_obs = r_const.shape[-1]
            soa = _soa.from_batched(ukf.x, ukf.p, ukf.sigma_f)

            def substep(c, inp):
                x, soa = c
                kss, i = inp
                if disturbance is None:
                    x_next = plant_fx(x, u0)
                else:
                    x_next = plant_fx(x, u0, disturbance(t + i * dt_sub))
                zmat = ukf_hx(x_next) + sig * jax.random.normal(
                    kss, x_next.shape[:-1] + sig.shape, dtype=sig.dtype
                )
                soa = _soa.soa_predict(ukf_params, soa, u0, ukf_fx_c, q_const)
                soa = _soa.soa_update(
                    ukf_params, soa, tuple(zmat[..., j] for j in range(n_obs)),
                    ukf_hx_c, r_const,
                )
                if ukf_p_reset is not None:
                    soa = _soa.soa_guard(soa, jnp.asarray(ukf_p_reset))
                return (x_next, soa), None

            keys = jax.random.split(ks[0], n_substeps)  # shared sensor-noise
            # schedule root; per-substep keys draw (B, o) noise at once
            if n_substeps == 1:
                (x_next, soa), _ = substep((x, soa), (keys[0], jnp.float32(0.0)))
            else:
                (x_next, soa), _ = jax.lax.scan(
                    substep, (x, soa),
                    (keys, jnp.arange(n_substeps, dtype=jnp.float32)),
                )
            xb, pb, sfb = _soa.to_batched(soa)
            return x_next, ukf._replace(x=xb, p=pb, sigma_f=sfb)

        if ukf_layout == "soa":
            x_next, ukf = rest_soa(carry.x, u_new, carry.ukf, k_sens, carry.t)
        else:
            x_next, ukf = jax.vmap(rest)(carry.x, u_new, carry.ukf, k_sens, carry.t)
        return ScenarioCarry(
            x=x_next, u_n=u_new, ukf=ukf, key=key_next, status=status,
            t=carry.t + jnp.float32(dt_tick),
        )

    spec_b = P(scenario_axis)  # batch-leading arrays: sharded over scenario,
    # replicated over rollouts (each rollout-shard sees the whole sub-batch)
    specs = ScenarioCarry(x=spec_b, u_n=spec_b, ukf=jax.tree.map(lambda _: spec_b, UkfState(*(0,) * 5)), key=spec_b, status=spec_b, t=spec_b)

    step = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(specs,),
        out_specs=specs,
        check_vma=False,
    )
    return jax.jit(step)


def init_scenario_carry(batch, x0, u0, ukf_state: UkfState, key):
    """Broadcast a single-scenario initial condition to a (B, ...) carry."""
    tile = lambda a: jnp.broadcast_to(jnp.asarray(a), (batch,) + jnp.asarray(a).shape)
    return ScenarioCarry(
        x=tile(x0),
        u_n=tile(u0),
        ukf=jax.tree.map(tile, ukf_state),
        key=jax.random.split(key, batch),
        status=jnp.zeros((batch,), jnp.int32),
        t=jnp.zeros((batch,), jnp.float32),
    )
