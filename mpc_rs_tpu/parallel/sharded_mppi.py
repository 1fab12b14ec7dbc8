"""K-sharded MPPI: the rayon pool (src/mppi.rs:39-84) re-designed as
``shard_map`` over a ``rollouts`` mesh axis with one collective round.

Each device computes softmax partials (m, s, uw) for its K/n_dev rollouts —
via the fused Pallas kernel (TPU) or the vmap reference path (any backend)
— then a single log-sum-exp merge runs on ICI:

    m* = pmax(m);  s* = psum(s · e^((m−m*)/λ));  uw* = psum(uw · e^((m−m*)/λ))

exactly the carried-max scheme SURVEY §5 calls for ("cross-host softmax
normalization without a second pass").
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mpc_rs_tpu.controllers.mppi import MppiConfig, rollout_scores
from mpc_rs_tpu.ops.mppi_pallas import (
    MppiPartials,
    finalize_partials,
    mppi_pallas_partials,
)


def _jnp_partials(cfg: MppiConfig, dynamics, cost, key, x, u_n, k_local: int,
                  eps=None) -> MppiPartials:
    """Reference-path partials (vmap+scan) for CPU meshes / parity tests.
    ``eps``: optional externally supplied (k_local, N) perturbations
    (already scaled) — the matched-noise seam for oracle cross-validation
    of the sharded tier (see controllers.mppi.mppi_solve ``noise``)."""
    if eps is None:
        eps = cfg.std_dev * jax.random.normal(key, (k_local, cfg.n_horizon), dtype=u_n.dtype)
    v = jnp.clip(u_n + eps, cfg.limit[0], cfg.limit[1])
    s_k = rollout_scores(dynamics, cost, tuple(x), v, u_n, cfg.std_dev, cfg.control_inv)
    finite = jnp.isfinite(s_k)
    neg_big = jnp.asarray(-3.4e38, u_n.dtype)
    m = jnp.max(jnp.where(finite, s_k, neg_big))
    e = jnp.where(finite, jnp.exp((s_k - m) / cfg.lambda_), 0.0)
    return MppiPartials(m=m, s=jnp.sum(e), uw=e @ v)


def make_sharded_mppi(
    cfg: MppiConfig,
    dynamics: Callable,
    cost: Callable,
    n_state: int,
    mesh: Mesh,
    *,
    axis: str = "rollouts",
    backend: str = "pallas",
    block_sublanes: int | None = None,
    interpret: bool = False,
    external_noise: bool = False,
):
    """Returns jitted ``solve(seed_or_key, x, u_n) -> (u_n', status)``.

    K = cfg.n_rollouts is split evenly over ``mesh[axis]``; each device
    samples with an independent stream (seed/key folded with axis_index —
    the principled version of the reference's per-thread from_entropy,
    src/mppi.rs:41).
    """
    n_dev = mesh.shape[axis]
    if cfg.n_rollouts % n_dev:
        raise ValueError(f"K={cfg.n_rollouts} not divisible by {n_dev} devices")
    k_local = cfg.n_rollouts // n_dev

    def merge(parts: MppiPartials) -> MppiPartials:
        m_g = jax.lax.pmax(parts.m, axis)
        scale = jnp.exp((parts.m - m_g) / cfg.lambda_)
        return MppiPartials(
            m=m_g,
            s=jax.lax.psum(parts.s * scale, axis),
            uw=jax.lax.psum(parts.uw * scale, axis),
        )

    if backend == "pallas":
        if external_noise:
            # first solve() argument becomes pre-generated eps laid out per
            # the kernel's linearization contract — GLOBAL shape
            # (n_dev · num_blocks_local, N, bs, 128), sharded block-major
            # over the rollouts axis so device d sees blocks
            # [d·num_blocks_local, (d+1)·num_blocks_local): concatenating
            # the per-device linearizations in device order reproduces the
            # global K order. Matched-noise seam for exact cross-validation
            # of the WHOLE pallas tier (kernel partials + collective merge)
            # against single-device solves (VERDICT r4 Next #6).
            from mpc_rs_tpu.ops.mppi_pallas import (_LANES,
                                                    _default_block_sublanes)

            bs = block_sublanes or _default_block_sublanes(k_local, "box-muller")
            assert k_local % (bs * _LANES) == 0, (k_local, bs)

            def shard_fn(eps, x, u_n):
                parts = mppi_pallas_partials(
                    cfg, dynamics, cost, n_state, jnp.int32(0), x, u_n,
                    n_rollouts=k_local, block_sublanes=bs,
                    interpret=interpret, noise=eps,
                )
                return merge(parts)

            in_specs = (P(axis, None, None, None), P(), P())
        else:
            def shard_fn(seed, x, u_n):
                my = jax.lax.axis_index(axis)
                parts = mppi_pallas_partials(
                    cfg, dynamics, cost, n_state,
                    seed[0] + my * jnp.int32(7919),
                    x, u_n,
                    n_rollouts=k_local,
                    block_sublanes=block_sublanes,
                    interpret=interpret,
                )
                return merge(parts)

            in_specs = (P(), P(), P())
    elif backend == "jnp":
        if external_noise:
            # first solve() argument becomes the (K, N) noise matrix,
            # sharded over the rollouts axis — each device sees its
            # k_local rows. Matched-noise cross-validation of the WHOLE
            # sharded tier (partials + pmax/psum log-sum-exp merge).
            def shard_fn(eps, x, u_n):
                parts = _jnp_partials(cfg, dynamics, cost, None, x, u_n,
                                      k_local, eps=eps)
                return merge(parts)

            in_specs = (P(axis, None), P(), P())
        else:
            def shard_fn(key, x, u_n):
                my = jax.lax.axis_index(axis)
                parts = _jnp_partials(
                    cfg, dynamics, cost, jax.random.fold_in(key, my), x, u_n, k_local
                )
                return merge(parts)

            in_specs = (P(), P(), P())
    else:
        raise ValueError(backend)

    sharded = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )

    @jax.jit
    def solve(seed_or_key, x, u_n):
        if backend == "pallas" and not external_noise:
            seed_or_key = jnp.asarray(seed_or_key, jnp.int32).reshape(1)
        parts = sharded(seed_or_key, x, u_n)
        # partials are replicated after the collectives; take them as-is
        return finalize_partials(cfg, parts, u_n)

    return solve
