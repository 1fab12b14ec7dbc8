"""Fused Pallas TPU kernel for the MPPI hot path.

One kernel fuses everything the reference's rayon pipeline does in five
parallel passes over K-sized buffers (src/mppi.rs:39-84: sample → rollout →
max → exp/sum → weighted average) into a single streaming pass that never
materializes K-sized arrays in HBM:

- in-kernel PRNG (threefry-free hardware PRNG + Box-Muller) generates the
  noise directly in VMEM — the (K, N) sample matrix never exists in HBM;
- the N-step rollout runs component-wise on (sublane, lane) blocks with the
  S≤6 state components held in vector registers/VMEM;
- the three K-reductions (max, Σw, Σw·v) become one *streaming log-sum-exp*
  accumulated across sequential grid steps in scratch: carried (m, s, uw)
  with rescaling exp(m_old − m_new) — the numerically-safe max-shift of
  src/mppi.rs:65-74 generalized to a single pass (SURVEY §2d).

The kernel emits per-core partials (m, s, uw-lanes) so the cross-chip
combine is one psum/pmax round on a ``rollouts`` mesh axis
(parallel/sharded_mppi.py) — log-sum-exp merging, no second pass over K.

Layout: rollouts on the 128-lane minor axis, BS sublanes per block
(K-minor tiling — SURVEY §7 hard part (c)).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_rs_tpu.controllers.mppi import MppiConfig, MppiStatus

_LANES = 128
_TWO_PI = 2.0 * math.pi


def _rollout_index(block_id, bs):
    """Global rollout index grid (bs, 128) for block ``block_id`` — the
    linearization contract shared by the kernels, the external-noise layout,
    and the parity tests: idx = block·(bs·128) + sublane·128 + lane."""
    return block_id * (bs * _LANES) + (
        jax.lax.broadcasted_iota(jnp.int32, (bs, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (bs, _LANES), 1)
    )


def _default_block_sublanes(k: int, sampler: str = "box-muller") -> int:
    """Measured-optimal block size (round-2 sweeps, TPU v5e — SCALING_r2
    tpu_single_chip[_clt4]): one block when K fits 256 sublanes (K ≤ 32768
    — kills per-grid-step overhead entirely: 3.1 → 1 block at K=10240),
    else 128 sublanes (uniformly ≥ 64 at K=819200 across exact/fast/clt4:
    42.5 vs 41.3 G steps/s clt4, 29.9 vs 29.1 fast-BM, 19.4 vs 19.2
    exact). The antithetic sampler needs sublane-tiled halves, so its
    blocks round up to 16 (exact-K masking keeps semantics at K < block)."""
    bs_full = -(-k // _LANES)
    quantum = 16 if sampler in _ANTITHETIC_SAMPLERS else 8
    if bs_full <= 256:
        return max(quantum, -(-bs_full // quantum) * quantum)
    return 128


def _bits_to_unit_open(bits):
    """uint32 → float32 in (0, 1]: mantissa trick. f ∈ [1,2) ⇒ 2−f ∈ (0,1]."""
    f = pltpu.bitcast((bits >> 9) | np.uint32(0x3F800000), jnp.float32)
    return 2.0 - f


def _hw_rcp_kernel(kernel_fn):
    """Trace the kernel body under fastmath.hw_rcp_scope so fdiv/freciprocal
    in fast dynamics emit the hardware approx reciprocal (in-kernel only;
    the vmap tier keeps exact division — ops/fastmath.py)."""
    import functools

    from mpc_rs_tpu.ops import fastmath

    @functools.wraps(kernel_fn)
    def wrapped(*refs):
        with fastmath.hw_rcp_scope():
            return kernel_fn(*refs)

    return wrapped


def _sampling_math(fast: bool):
    """(log, sqrt, sin, cos) used by in-kernel Box-Muller."""
    if fast:
        from mpc_rs_tpu.ops.fastmath import fcos, flog, fsin, fsqrt

        return flog, fsqrt, fsin, fcos
    return jnp.log, jnp.sqrt, jnp.sin, jnp.cos


# CLT4x8 sampler constants: z_raw = (Σ four 8-bit uniforms − 510)/σ₄ has
# var 1, kurtosis 2.70; the cubic z·(A + B·z²) moment-matches var=1 and
# kurtosis=3 exactly (offline fit over 2²⁴ words: KS 0.0034 vs normal,
# P(|z|>3) = 0.0024 vs 0.0027 exact, support extends to ±3.99σ).
_CLT_INV_SIG = 1.0 / math.sqrt(4 * (256**2 - 1) / 12.0)
_CLT_A = 0.949188
_CLT_B = 0.018629

# CLT2Q sampler constants: TWO normals per PRNG word (16-bit halves, each
# the sum of two 8-bit uniforms = triangular), quintic z·(A + z²(B + C·z²))
# matching var=1, kurtosis=3 AND the 6th moment (=15). KS 0.0099,
# P(|z|>3) = 0.0032 vs 0.0027 exact, support ±3.50σ; monotonic on the
# triangular support (derivative ≥ 0.85 everywhere).
_TRI_INV_SIG = 1.0 / math.sqrt(2 * (256**2 - 1) / 12.0)
_TRI_A = 1.019453
_TRI_B = -0.103499
_TRI_C = 0.029151

SAMPLERS = ("box-muller", "clt4", "clt2q", "clt4a", "box-muller-a", "wallace")
_ANTITHETIC_SAMPLERS = ("clt4a", "box-muller-a")

# Wallace-style recycled Box-Muller: exact-marginal pool refreshed every
# _WALLACE_PERIOD steps; in-between steps are orthonormal sign/roll mixes
# of the pool (no transcendentals). See the `wallace` branch below.
_WALLACE_PERIOD = 8


def _fill_vbuf(v_buf, get_u, n, shape, std_dev, lo, hi, fast, sampler):
    """Sample-and-clamp perturbed controls into the noise buffer
    (src/mppi.rs:38-45). Must be preceded by ``pltpu.prng_seed``.

    ``sampler="box-muller"``: exact normals — paired Box-Muller, one
    (log, sqrt) radius feeding both cos/sin branches (2 normals per draw;
    the VPU is transcendental-bound here, not FLOP-bound).

    ``sampler="clt4"``: approximate normals with NO transcendentals — sum
    of four 8-bit uniforms carved from ONE hardware PRNG word per normal
    (two pairwise in-register adds), then the cubic tail correction above.
    Measured on v5e at K=819200: sampling falls from 76% to ~50% of kernel
    time (31 → 41+ G steps/s). Exploration-noise grade: mean/var/kurtosis
    match the exact normal; the tail is truncated at 3.99σ.
    """
    if sampler == "clt4":
        inv_sig = np.float32(_CLT_INV_SIG)
        ca = np.float32(_CLT_A * std_dev)
        cb = np.float32(_CLT_B * std_dev)
        for t in range(n):
            w = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
            s4 = (x2 & np.uint32(0xFFFF)) + (x2 >> 16)
            z = (pltpu.bitcast(s4, jnp.int32).astype(jnp.float32) - 510.0) * inv_sig
            v_buf[t] = jnp.clip(get_u(t) + z * (ca + cb * (z * z)), lo, hi)
    elif sampler == "clt4a":
        # antithetic clt4: ONE normal per rollout PAIR — the top half of
        # the block perturbs +ε, the bottom half −ε. Classic antithetic
        # variates for the MPPI softmax estimator: the empirical noise mean
        # is exactly zero per (t, block) and the whole integer/poly sampling
        # pipeline runs at HALF width (sampling is the dominant kernel cost
        # — DESIGN §9), at the price of pairwise-correlated rollouts.
        # Distribution per sample is identical to clt4 (z and −z are
        # equidistributed). Requires block_sublanes % 16 == 0.
        bs_, lanes = shape
        if bs_ % 16:
            raise ValueError(
                f"sampler 'clt4a' needs block_sublanes % 16 == 0, got {bs_}"
            )
        half = bs_ // 2
        inv_sig = np.float32(_CLT_INV_SIG)
        ca = np.float32(_CLT_A * std_dev)
        cb = np.float32(_CLT_B * std_dev)
        for t in range(n):
            w = pltpu.bitcast(pltpu.prng_random_bits((half, lanes)), jnp.uint32)
            x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
            s4 = (x2 & np.uint32(0xFFFF)) + (x2 >> 16)
            z = (pltpu.bitcast(s4, jnp.int32).astype(jnp.float32) - 510.0) * inv_sig
            e = z * (ca + cb * (z * z))
            u_t = get_u(t)
            # two half-block stores (a concatenate forces a sublane relayout
            # that costs more than the halved sampling saves)
            v_buf[t, : half] = jnp.clip(u_t + e, lo, hi)
            v_buf[t, half :] = jnp.clip(u_t - e, lo, hi)
    elif sampler == "clt2q":
        inv_t = np.float32(_TRI_INV_SIG)
        qa = np.float32(_TRI_A * std_dev)
        qb = np.float32(_TRI_B * std_dev)
        qc = np.float32(_TRI_C * std_dev)
        for t0 in range(0, n, 2):
            w = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
            z1 = (pltpu.bitcast(x2 & np.uint32(0xFFFF), jnp.int32).astype(jnp.float32) - 255.0) * inv_t
            s1 = z1 * z1
            v_buf[t0] = jnp.clip(get_u(t0) + z1 * (qa + s1 * (qb + qc * s1)), lo, hi)
            if t0 + 1 < n:
                z2 = (pltpu.bitcast(x2 >> 16, jnp.int32).astype(jnp.float32) - 255.0) * inv_t
                s2 = z2 * z2
                v_buf[t0 + 1] = jnp.clip(get_u(t0 + 1) + z2 * (qa + s2 * (qb + qc * s2)), lo, hi)
    elif sampler == "box-muller":
        _log, _sqrt, _sin, _cos = _sampling_math(fast)
        for t0 in range(0, n, 2):
            bits = pltpu.prng_random_bits((2,) + shape)
            u1 = _bits_to_unit_open(pltpu.bitcast(bits[0], jnp.uint32))
            u2 = pltpu.bitcast(
                (pltpu.bitcast(bits[1], jnp.uint32) >> 9) | np.uint32(0x3F800000),
                jnp.float32,
            ) - 1.0  # [0,1) is fine for the angle
            r = std_dev * _sqrt(-2.0 * _log(u1))
            ang = _TWO_PI * u2
            v_buf[t0] = jnp.clip(get_u(t0) + r * _cos(ang), lo, hi)
            if t0 + 1 < n:
                v_buf[t0 + 1] = jnp.clip(get_u(t0 + 1) + r * _sin(ang), lo, hi)
    elif sampler == "box-muller-a":
        # antithetic Box-Muller: exact normal MARGINALS (unlike the clt
        # family) with the whole transcendental pipeline at half width —
        # the top half of the block perturbs +ε, the bottom half −ε.
        # Requires block_sublanes % 16 == 0 (sublane-tiled halves).
        bs_, lanes = shape
        if bs_ % 16:
            raise ValueError(
                f"sampler 'box-muller-a' needs block_sublanes % 16 == 0, got {bs_}"
            )
        half = bs_ // 2
        _log, _sqrt, _sin, _cos = _sampling_math(fast)
        for t0 in range(0, n, 2):
            bits = pltpu.prng_random_bits((2, half, lanes))
            u1 = _bits_to_unit_open(pltpu.bitcast(bits[0], jnp.uint32))
            u2 = pltpu.bitcast(
                (pltpu.bitcast(bits[1], jnp.uint32) >> 9) | np.uint32(0x3F800000),
                jnp.float32,
            ) - 1.0
            r = std_dev * _sqrt(-2.0 * _log(u1))
            ang = _TWO_PI * u2
            e0 = r * _cos(ang)
            u_t = get_u(t0)
            v_buf[t0, : half] = jnp.clip(u_t + e0, lo, hi)
            v_buf[t0, half :] = jnp.clip(u_t - e0, lo, hi)
            if t0 + 1 < n:
                e1 = r * _sin(ang)
                u_t1 = get_u(t0 + 1)
                v_buf[t0 + 1, : half] = jnp.clip(u_t1 + e1, lo, hi)
                v_buf[t0 + 1, half :] = jnp.clip(u_t1 - e1, lo, hi)
    elif sampler == "wallace":
        # Recycled Box-Muller ("Wallace-style" — the DESIGN §9 remaining
        # lever). One exact Box-Muller POOL (a, b) is drawn per
        # _WALLACE_PERIOD steps; the in-between steps emit
        #   z_i = (±a_i + b_{(i+r_t) mod L}) / √2
        # — an orthonormal combination of the pool's iid N(0,1) entries
        # with FRESH per-element random sign bits each step. Since a_i and
        # b_j are independent exact normals for every (i, j), each step's
        # MARGINAL is exactly N(0,1) (unlike clt4's truncated cubic), while
        # only 2/_WALLACE_PERIOD of the steps pay transcendentals. Steps
        # within a window are pairwise UNcorrelated (the sign bits are
        # zero-mean and independent of the pool) but not independent
        # (shared pool ⇒ variance clustering) — exploration-noise grade,
        # gated by the same closed-loop survival tests as clt4.
        _log, _sqrt, _sin, _cos = _sampling_math(fast)
        sd = np.float32(std_dev)
        mix = np.float32(std_dev / math.sqrt(2.0))
        lanes = shape[-1]
        a = b = None
        for t in range(n):
            ph = t % _WALLACE_PERIOD
            if ph == 0:
                bits = pltpu.prng_random_bits((2,) + shape)
                u1 = _bits_to_unit_open(pltpu.bitcast(bits[0], jnp.uint32))
                u2 = pltpu.bitcast(
                    (pltpu.bitcast(bits[1], jnp.uint32) >> 9) | np.uint32(0x3F800000),
                    jnp.float32,
                ) - 1.0
                r = _sqrt(-2.0 * _log(u1))
                ang = _TWO_PI * u2
                a = r * _cos(ang)
                b = r * _sin(ang)
                z = sd * a
            elif ph == 1:
                z = sd * b
            else:
                w = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
                sa = pltpu.bitcast(
                    pltpu.bitcast(a, jnp.uint32) ^ (w & np.uint32(0x80000000)),
                    jnp.float32,
                )
                # distinct nonzero lane rotations per phase vary the pairing
                shift = (29 * ph + 13) % lanes or 1
                z = mix * (sa + pltpu.roll(b, shift, len(shape) - 1))
            v_buf[t] = jnp.clip(get_u(t) + z, lo, hi)
    else:
        raise ValueError(f"unknown sampler {sampler!r}; expected one of {SAMPLERS}")


def _make_kernel(
    dynamics: Callable,
    cost: Callable,
    cfg: MppiConfig,
    n_state: int,
    block_sublanes: int,
    use_prng: bool,
    k_total: int,
    fast: bool = False,
    sampler: str = "box-muller",
):
    n = cfg.n_horizon
    bs = block_sublanes
    inv = cfg.std_dev ** -2.0 if cfg.control_inv is None else cfg.control_inv
    lo, hi = cfg.limit
    neg_big = np.float32(-3.4e38)
    bk = bs * _LANES

    @_hw_rcp_kernel
    def kernel(seed_ref, x0_ref, u_n_ref, *rest):
        if use_prng:
            m_ref, s_ref, uw_ref, v_buf = rest
        else:
            eps_ref, m_ref, s_ref, uw_ref, v_buf = rest
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            m_ref[0, 0] = neg_big
            s_ref[0, 0] = 0.0
            uw_ref[...] = jnp.zeros_like(uw_ref)

        if use_prng:
            pltpu.prng_seed(seed_ref[0], pid)

        # --- sample & clamp (src/mppi.rs:38-45), stored for the weighted avg
        if use_prng:
            _fill_vbuf(
                v_buf, lambda t: u_n_ref[t, 0], n, (bs, _LANES),
                cfg.std_dev, lo, hi, fast, sampler,
            )
        else:
            for t in range(n):
                v_buf[t] = jnp.clip(u_n_ref[t, 0] + eps_ref[0, t], lo, hi)

        # --- rollout + cost + control term (src/mppi.rs:48-62)
        xs = tuple(
            jnp.full((bs, _LANES), x0_ref[i, 0], dtype=jnp.float32) for i in range(n_state)
        )
        c = jnp.zeros((bs, _LANES), jnp.float32)
        ct = jnp.zeros((bs, _LANES), jnp.float32)
        for t in range(n):
            v_t = v_buf[t]
            xs = dynamics(*xs, v_t)
            c = c + cost(*xs)
            ct = ct + u_n_ref[t, 0] * inv * v_t
        score = -c - ct

        # --- streaming log-sum-exp accumulation (src/mppi.rs:65-84);
        # weights w = exp((score − m)/λ) with the running max carried in
        # scratch and prior partials rescaled by exp((m_old − m_new)/λ)
        inv_lambda = np.float32(1.0 / cfg.lambda_)
        finite = jnp.isfinite(score)
        if k_total % bk:
            # exact-K semantics: mask rollouts past K in the final block
            finite = jnp.logical_and(finite, _rollout_index(pid, bs) < k_total)
        score_f = jnp.where(finite, score, neg_big)
        block_max = jnp.max(score_f)
        # treat all-masked blocks as neg_big (matches filtered max semantics)
        m_old = m_ref[0, 0]
        m_new = jnp.maximum(m_old, block_max)
        scale = jnp.exp((m_old - m_new) * inv_lambda)
        e = jnp.where(finite, jnp.exp((score - m_new) * inv_lambda), 0.0)
        s_ref[0, 0] = s_ref[0, 0] * scale + jnp.sum(e)
        m_ref[0, 0] = m_new
        # per-lane partials: sum over sublanes only (host sums lanes); one
        # vectorized (n, 128) read-modify-write instead of n row updates
        partial = jnp.stack([jnp.sum(e * v_buf[t], axis=0) for t in range(n)], axis=0)
        uw_ref[...] = uw_ref[...] * scale + partial

    return kernel


class MppiPartials(NamedTuple):
    m: jax.Array  # () running max of scores (neg_big if none finite)
    s: jax.Array  # () Σ exp(score − m)
    uw: jax.Array  # (N,) Σ exp(score − m) · v_t


def mppi_pallas_partials(
    cfg: MppiConfig,
    dynamics: Callable,
    cost: Callable,
    n_state: int,
    seed: jax.Array,
    x: jax.Array,
    u_n: jax.Array,
    *,
    n_rollouts: int | None = None,
    block_sublanes: int | None = None,
    interpret: bool = False,
    noise: jax.Array | None = None,
    fast: bool = False,
    sampler: str = "box-muller",
) -> MppiPartials:
    """Run the fused kernel over ``n_rollouts`` (default cfg.n_rollouts).

    ``x``: (S,) state vector; ``u_n``: (N,) nominal sequence; ``seed``:
    int32 scalar (combined with the block id in-kernel). Returns softmax
    partials for a log-sum-exp combine (single- or multi-chip).

    ``noise``: optional pre-generated eps of shape (num_blocks, N,
    block_sublanes, 128). When given, the in-kernel PRNG is bypassed —
    used for exact parity testing against the vmap reference (the TPU
    interpreter's PRNG is a stub) and for externally-controlled sampling.
    """
    k = n_rollouts or cfg.n_rollouts
    if block_sublanes is None:
        block_sublanes = _default_block_sublanes(k, sampler)
    bk = block_sublanes * _LANES
    num_blocks = pl.cdiv(k, bk)
    n = cfg.n_horizon
    use_prng = noise is None

    kernel = _make_kernel(
        dynamics, cost, cfg, n_state, block_sublanes, use_prng, k,
        fast=fast, sampler=sampler,
    )
    in_specs = []
    inputs = []
    if not use_prng:
        assert noise.shape == (num_blocks, n, block_sublanes, _LANES), noise.shape
        in_specs.append(
            pl.BlockSpec(
                (1, n, block_sublanes, _LANES),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(jnp.asarray(noise, jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seed, x0, u_n
        grid=(num_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # m (1,1)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s (1,1)
            pl.BlockSpec((n, _LANES), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((n, block_sublanes, _LANES), jnp.float32)],
    )
    m, s, uw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(x, jnp.float32).reshape(n_state, 1),
        jnp.asarray(u_n, jnp.float32).reshape(n, 1),
        *inputs,
    )
    return MppiPartials(m=m[0, 0], s=s[0, 0], uw=jnp.sum(uw, axis=-1))


def _make_batched_kernel(
    dynamics: Callable,
    cost: Callable,
    cfg: MppiConfig,
    n_state: int,
    block_sublanes: int,
    k_total: int,
    use_prng: bool,
    fast: bool = False,
    sampler: str = "box-muller",
):
    """Scenario-batched variant: grid (B, num_k_blocks), k innermost so the
    per-scenario streaming accumulators in the output refs are written by
    consecutive grid steps (TPU iterates the last grid dim fastest)."""
    n = cfg.n_horizon
    bs = block_sublanes
    inv = cfg.std_dev ** -2.0 if cfg.control_inv is None else cfg.control_inv
    lo, hi = cfg.limit
    neg_big = np.float32(-3.4e38)
    inv_lambda = np.float32(1.0 / cfg.lambda_)

    @_hw_rcp_kernel
    def kernel(seed_ref, x0_ref, u_n_ref, *rest):
        if use_prng:
            m_ref, s_ref, uw_ref, v_buf, ms_acc = rest
        else:
            eps_ref, m_ref, s_ref, uw_ref, v_buf, ms_acc = rest
        # x0_ref/u_n_ref are (8,128) VMEM row-blocks (SMEM can't hold
        # B-sized prefetch arrays); seeds stay scalar-prefetch.
        b = pl.program_id(0)
        i = pl.program_id(1)
        n_i = pl.num_programs(1)
        row = b % 8  # row within the (8, 128)-blocked per-scenario refs

        @pl.when(i == 0)
        def _init():
            # per-scenario running (m, s) live in SMEM scratch; VMEM rows are
            # written once at the scenario's last k-block
            ms_acc[0] = neg_big
            ms_acc[1] = 0.0
            uw_ref[...] = jnp.zeros_like(uw_ref)

        if use_prng:
            # hardware seed takes at most 2 values; fold (scenario, block)
            pltpu.prng_seed(seed_ref[b], b * jnp.int32(100003) + i)
            _fill_vbuf(
                v_buf, lambda t: u_n_ref[row, t], n, (bs, _LANES),
                cfg.std_dev, lo, hi, fast, sampler,
            )
        else:
            for t in range(n):
                v_buf[t] = jnp.clip(u_n_ref[row, t] + eps_ref[0, 0, t], lo, hi)

        xs = tuple(
            jnp.full((bs, _LANES), x0_ref[row, j], dtype=jnp.float32) for j in range(n_state)
        )
        c = jnp.zeros((bs, _LANES), jnp.float32)
        ct = jnp.zeros((bs, _LANES), jnp.float32)
        for t in range(n):
            v_t = v_buf[t]
            xs = dynamics(*xs, v_t)
            c = c + cost(*xs)
            ct = ct + u_n_ref[row, t] * inv * v_t
        score = -c - ct

        finite = jnp.isfinite(score)
        if k_total % (bs * _LANES):
            finite = jnp.logical_and(finite, _rollout_index(i, bs) < k_total)
        block_max = jnp.max(jnp.where(finite, score, neg_big))
        m_old = ms_acc[0]
        m_new = jnp.maximum(m_old, block_max)
        scale = jnp.exp((m_old - m_new) * inv_lambda)
        e = jnp.where(finite, jnp.exp((score - m_new) * inv_lambda), 0.0)
        ms_acc[1] = ms_acc[1] * scale + jnp.sum(e)
        ms_acc[0] = m_new
        # one vectorized (1, n, 128) read-modify-write instead of n row updates
        partial = jnp.stack([jnp.sum(e * v_buf[t], axis=0) for t in range(n)], axis=0)
        uw_ref[...] = uw_ref[...] * scale + partial[None]

        @pl.when(i == n_i - 1)
        def _finalize():
            m_ref[pl.ds(row, 1), :] = jnp.full((1, _LANES), ms_acc[0], jnp.float32)
            s_ref[pl.ds(row, 1), :] = jnp.full((1, _LANES), ms_acc[1], jnp.float32)

    return kernel


def _make_fleet_kernel(
    dynamics: Callable,
    cost: Callable,
    cfg: MppiConfig,
    n_state: int,
    block_sublanes: int,
    k_total: int,
    use_prng: bool,
    fast: bool = False,
    sampler: str = "box-muller",
):
    """Scenario-batched variant for the fleet shape (each scenario's K fits
    ONE (bs, 128) block): EIGHT scenarios unrolled per grid step.

    The general batched kernel pays per-grid-step machinery (accumulator
    init, block dispatch, masked finalize writes) once per scenario — at
    the fleet operating points that overhead dominates: the flagship tick
    split (scripts/diag_flagship_tick.py) measured its B=256 × one-block
    MPPI at 12.3 G steps/s vs the chain kernel's 19.5 exact. Unrolling 8
    scenarios per grid step (matching the (8, 128) row-block layout the
    refs already use) amortizes it 8×, and x0/u_n ride in scalar-prefetch
    SMEM (transposed B-minor) — the general kernel's per-scenario VMEM scalar extracts
    (~20 × load-tile-and-extract per scenario) are what kept it at
    12.3 G steps/s vs the chain kernel's 19.5 (SMEM-carried scalars).
    The per-scenario PRNG stream is bit-identical to the general
    kernel's (same seed fold, i=0), so dispatching between the two
    kernels never changes sampled noise."""
    n = cfg.n_horizon
    bs = block_sublanes
    inv = cfg.std_dev ** -2.0 if cfg.control_inv is None else cfg.control_inv
    lo, hi = cfg.limit
    neg_big = np.float32(-3.4e38)
    inv_lambda = np.float32(1.0 / cfg.lambda_)

    @_hw_rcp_kernel
    def kernel(seed_ref, x0s_ref, uns_ref, *rest):
        if use_prng:
            m_ref, s_ref, uw_ref, v_buf = rest
        else:
            eps_ref, m_ref, s_ref, uw_ref, v_buf = rest
        bb = pl.program_id(0)

        for row in range(8):
            b = bb * 8 + row
            if use_prng:
                pltpu.prng_seed(seed_ref[b], b * jnp.int32(100003))
                _fill_vbuf(
                    v_buf, lambda t, b=b: uns_ref[t, b], n, (bs, _LANES),
                    cfg.std_dev, lo, hi, fast, sampler,
                )
            else:
                for t in range(n):
                    v_buf[t] = jnp.clip(uns_ref[t, b] + eps_ref[row, 0, t], lo, hi)

            xs = tuple(
                jnp.full((bs, _LANES), x0s_ref[j, b], dtype=jnp.float32)
                for j in range(n_state)
            )
            c = jnp.zeros((bs, _LANES), jnp.float32)
            ct = jnp.zeros((bs, _LANES), jnp.float32)
            for t in range(n):
                v_t = v_buf[t]
                xs = dynamics(*xs, v_t)
                c = c + cost(*xs)
                ct = ct + uns_ref[t, b] * inv * v_t
            score = -c - ct

            finite = jnp.isfinite(score)
            if k_total % (bs * _LANES):
                finite = jnp.logical_and(finite, _rollout_index(0, bs) < k_total)
            m = jnp.max(jnp.where(finite, score, neg_big))
            e = jnp.where(finite, jnp.exp((score - m) * inv_lambda), 0.0)
            s = jnp.sum(e)
            partial = jnp.stack([jnp.sum(e * v_buf[t], axis=0) for t in range(n)], axis=0)
            m_ref[pl.ds(row, 1), :] = jnp.full((1, _LANES), m, jnp.float32)
            s_ref[pl.ds(row, 1), :] = jnp.full((1, _LANES), s, jnp.float32)
            uw_ref[row] = partial

    return kernel


def mppi_pallas_batch_partials(
    cfg: MppiConfig,
    dynamics: Callable,
    cost: Callable,
    n_state: int,
    seeds: jax.Array,  # (B,) int32
    xs: jax.Array,  # (B, S)
    u_ns: jax.Array,  # (B, N)
    *,
    n_rollouts: int | None = None,
    block_sublanes: int | None = None,
    interpret: bool = False,
    noise: jax.Array | None = None,
    fast: bool = False,
    sampler: str = "box-muller",
) -> MppiPartials:
    """Fused kernel over a scenario batch: every scenario gets its own
    cfg.n_rollouts samples from its own state/nominal/seed. Returns
    partials with leading batch dim (m: (B,), s: (B,), uw: (B, N)).

    ``noise``: optional eps of shape (B, num_blocks, N, block_sublanes,
    128) bypassing the in-kernel PRNG — exact parity tests of the batched
    path (the interpreter PRNG is a stub)."""
    b = xs.shape[0]
    k = n_rollouts or cfg.n_rollouts
    if block_sublanes is None:
        block_sublanes = _default_block_sublanes(k, sampler)
    bk = block_sublanes * _LANES
    num_blocks = pl.cdiv(k, bk)
    n = cfg.n_horizon
    use_prng = noise is None

    if b % 8:
        raise ValueError(f"scenario batch {b} must be a multiple of 8")
    if not use_prng:
        assert noise.shape == (b, num_blocks, n, block_sublanes, _LANES), noise.shape
    extra_inputs = [] if use_prng else [jnp.asarray(noise, jnp.float32)]
    if num_blocks == 1:
        # fleet shape: K fits one block — 8 scenarios per grid step, with
        # x0/u_n in scalar-prefetch SMEM (cheap scalar reads; ~60 KB at
        # B=1024 — well under the scalar-memory budget at fleet sizes)
        kernel = _make_fleet_kernel(
            dynamics, cost, cfg, n_state, block_sublanes, k, use_prng,
            fast=fast, sampler=sampler,
        )
        row_block8 = pl.BlockSpec((8, _LANES), lambda bb, *_: (bb, 0), memory_space=pltpu.VMEM)
        in_specs = []
        if not use_prng:
            in_specs.append(
                pl.BlockSpec(
                    (8, 1, n, block_sublanes, _LANES),
                    lambda bb, *_: (bb, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # seeds, x0 (S,B), u_n (N,B) — all SMEM,
            # B-minor so SMEM row padding stays O(rows) not O(B) (the 1 MB
            # smem cap is real: B-major OOMed at B=1024)
            grid=(b // 8,),
            in_specs=in_specs,
            out_specs=[
                row_block8,
                row_block8,
                pl.BlockSpec((8, n, _LANES), lambda bb, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[pltpu.VMEM((n, block_sublanes, _LANES), jnp.float32)],
        )
        m, s, uw = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((b, n, _LANES), jnp.float32),
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(
            jnp.asarray(seeds, jnp.int32).reshape(b),
            jnp.asarray(xs, jnp.float32).T,
            jnp.asarray(u_ns, jnp.float32).T,
            *extra_inputs,
        )
        return MppiPartials(m=m[:, 0], s=s[:, 0], uw=jnp.sum(uw, axis=-1))
    else:
        kernel = _make_batched_kernel(
            dynamics, cost, cfg, n_state, block_sublanes, k, use_prng,
            fast=fast, sampler=sampler,
        )
        row_block = pl.BlockSpec((8, _LANES), lambda bb, i, *_: (bb // 8, 0), memory_space=pltpu.VMEM)
        in_specs = [row_block, row_block]  # x0 (B,128) lane-padded, u_n (B,128)
        if not use_prng:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, n, block_sublanes, _LANES),
                    lambda bb, i, *_: (bb, i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # seeds only (SMEM is too small for B-sized x0/u_n)
            grid=(b, num_blocks),
            in_specs=in_specs,
            out_specs=[
                # (8,128) row blocks: 8 consecutive scenarios share a block and
                # are fully written before the grid leaves it (k is innermost)
                pl.BlockSpec((8, _LANES), lambda bb, i, *_: (bb // 8, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _LANES), lambda bb, i, *_: (bb // 8, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, _LANES), lambda bb, i, *_: (bb, 0, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((n, block_sublanes, _LANES), jnp.float32),
                pltpu.SMEM((2,), jnp.float32),
            ],
        )
    m, s, uw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, n, _LANES), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seeds, jnp.int32).reshape(b),
        _pad_lanes(jnp.asarray(xs, jnp.float32)),
        _pad_lanes(jnp.asarray(u_ns, jnp.float32)),
        *extra_inputs,
    )
    return MppiPartials(m=m[:, 0], s=s[:, 0], uw=jnp.sum(uw, axis=-1))


def _pad_lanes(a: jax.Array) -> jax.Array:
    """(B, d) -> (B, 128) zero-padded so per-scenario rows are VMEM tiles."""
    b, d = a.shape
    if d > _LANES:
        raise ValueError(f"last dim {d} exceeds lane width {_LANES}")
    return jnp.pad(a, ((0, 0), (0, _LANES - d)))


def mppi_solve_pallas_batch(
    cfg: MppiConfig,
    dynamics: Callable,
    cost: Callable,
    n_state: int,
    seeds: jax.Array,
    xs: jax.Array,
    u_ns: jax.Array,
    **kw,
):
    """Batched solve: (B,) statuses and (B, N) sequences with zero fallback."""
    parts = mppi_pallas_batch_partials(cfg, dynamics, cost, n_state, seeds, xs, u_ns, **kw)
    return jax.vmap(lambda p, u: finalize_partials(cfg, p, u))(parts, u_ns)


def mppi_solve_pallas(
    cfg: MppiConfig,
    dynamics: Callable,
    cost: Callable,
    n_state: int,
    seed: jax.Array,
    x: jax.Array,
    u_n: jax.Array,
    *,
    block_sublanes: int | None = None,
    interpret: bool = False,
    noise: jax.Array | None = None,
    fast: bool = False,
    sampler: str = "box-muller",
):
    """Full single-chip MPPI solve via the fused kernel.

    Returns (u_n', status) with the same semantics as
    ``controllers.mppi.mppi_solve`` (zero fallback on failure).
    """
    parts = mppi_pallas_partials(
        cfg, dynamics, cost, n_state, seed, x, u_n,
        block_sublanes=block_sublanes, interpret=interpret, noise=noise,
        fast=fast, sampler=sampler,
    )
    return finalize_partials(cfg, parts, u_n)


def _make_chain_kernel(
    dynamics: Callable,
    cost: Callable,
    cfg: MppiConfig,
    n_state: int,
    block_sublanes: int,
    k_total: int,
    fast: bool,
    plant: Callable | None,
    j_real: int,
    per_solve_seeds: bool,
    num_blocks: int,
    sampler: str = "box-muller",
):
    """Multi-solve receding-horizon chain: 1-D grid over solves, K-blocks
    streamed by an IN-KERNEL fori_loop with the (m, s, uw) log-sum-exp
    accumulators carried in vector registers.

    The warm-started u_n and (optionally) the plant state live in SMEM
    scratch across the whole chain, so J solves cost ONE pallas_call — no
    per-solve dispatch/finalize glue. The in-kernel block loop (round 2.1)
    removes the per-grid-step overhead (~1 µs/block: scratch RMW + block
    machinery) that capped big-K throughput at ~31 G steps/s."""
    n = cfg.n_horizon
    bs = block_sublanes
    inv = cfg.std_dev ** -2.0 if cfg.control_inv is None else cfg.control_inv
    lo, hi = cfg.limit
    neg_big = np.float32(-3.4e38)
    inv_lambda = np.float32(1.0 / cfg.lambda_)

    @_hw_rcp_kernel
    def kernel(seed_ref, x0_ref, u_n0_ref, u0_ref, st_ref, un_ref, v_buf, u_n_s, x_s):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init_chain():
            for t in range(n):
                u_n_s[t] = u_n0_ref[t, 0]
            for c_ in range(n_state):
                x_s[c_] = x0_ref[c_, 0]

        def block_body(i, carry):
            m, s_acc, uw = carry
            if per_solve_seeds:
                pltpu.prng_seed(seed_ref[j], i)
            else:
                # scalar-seed mode: fold (solve, block) — same scheme as
                # the scenario-batched kernel; no J-sized prefetch array
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)

            _fill_vbuf(
                v_buf, lambda t: u_n_s[t], n, (bs, _LANES),
                cfg.std_dev, lo, hi, fast, sampler,
            )

            xs = tuple(
                jnp.full((bs, _LANES), x_s[c_], dtype=jnp.float32) for c_ in range(n_state)
            )
            c = jnp.zeros((bs, _LANES), jnp.float32)
            ct = jnp.zeros((bs, _LANES), jnp.float32)
            for t in range(n):
                v_t = v_buf[t]
                xs = dynamics(*xs, v_t)
                c = c + cost(*xs)
                ct = ct + u_n_s[t] * inv * v_t
            score = -c - ct

            finite = jnp.isfinite(score)
            if k_total % (bs * _LANES):
                finite = jnp.logical_and(finite, _rollout_index(i, bs) < k_total)
            block_max = jnp.max(jnp.where(finite, score, neg_big))
            m_new = jnp.maximum(m, block_max)
            scale = jnp.exp((m - m_new) * inv_lambda)
            e = jnp.where(finite, jnp.exp((score - m_new) * inv_lambda), 0.0)
            s_new = s_acc * scale + jnp.sum(e)
            partial = jnp.stack([jnp.sum(e * v_buf[t], axis=0) for t in range(n)], axis=0)
            uw_new = uw * scale + partial
            return m_new, s_new, uw_new

        init = (
            jnp.float32(neg_big),
            jnp.float32(0.0),
            jnp.zeros((n, _LANES), jnp.float32),
        )
        if num_blocks == 1:
            m, s_acc, uw = block_body(0, init)
        else:
            m, s_acc, uw = jax.lax.fori_loop(0, num_blocks, block_body, init)

        # --- finalize this solve (same semantics as finalize_partials)
        no_finite = m <= np.float32(-3.3e38)
        sum_zero = s_acc == 0.0
        inv_s = 1.0 / jnp.where(sum_zero, 1.0, s_acc)
        totals = jnp.sum(uw, axis=-1, keepdims=True) * inv_s  # (n, 1)
        bad = no_finite | sum_zero | ~jnp.isfinite(totals[0, 0])
        status = jnp.where(
            no_finite,
            jnp.float32(MppiStatus.NO_FINITE),
            jnp.where(
                sum_zero,
                jnp.float32(MppiStatus.SUM_ZERO),
                jnp.where(
                    jnp.isfinite(totals[0, 0]),
                    jnp.float32(MppiStatus.OK),
                    jnp.float32(MppiStatus.INVALID_U),
                ),
            ),
        )
        for t in range(n):
            u_n_s[t] = jnp.where(bad, 0.0, totals[t, 0])
        row = j % 8  # row within the (8, 128) output block
        u0_ref[pl.ds(row, 1), :] = jnp.full((1, _LANES), u_n_s[0], jnp.float32)
        st_ref[pl.ds(row, 1), :] = jnp.full((1, _LANES), status, jnp.float32)
        if plant is not None:
            new_xs = plant(*(x_s[c_] for c_ in range(n_state)), u_n_s[0])
            for c_ in range(n_state):
                x_s[c_] = new_xs[c_]

        # final u_n after the last REAL solve (rows past j_real are tile
        # padding that keeps running the chain harmlessly)
        @pl.when(j == j_real - 1)
        def _emit_final_un():
            for t in range(n):
                un_ref[pl.ds(t, 1), :] = jnp.full((1, _LANES), u_n_s[t], jnp.float32)

    return kernel


def mppi_pallas_chain(
    cfg: MppiConfig,
    dynamics: Callable,
    cost: Callable,
    n_state: int,
    seeds: jax.Array | None,  # (n_solves,) int32, one per solve — or None
    x: jax.Array,  # (S,) initial state
    u_n: jax.Array,  # (N,) initial nominal sequence
    *,
    n_rollouts: int | None = None,
    block_sublanes: int | None = None,
    fast: bool = False,
    plant: Callable | None = None,
    interpret: bool = False,
    n_solves: int | None = None,
    base_seed: jax.Array | int = 0,
    sampler: str = "box-muller",
):
    """J receding-horizon MPPI solves in ONE fused kernel call.

    The warm start chains through SMEM scratch exactly as the reference
    reuses the returned sequence verbatim (examples/mppi4.rs:42); zero
    fallback on failure matches ``finalize_partials``. With ``plant`` the
    state also advances by one plant step per solve (device-resident
    closed loop); otherwise x is held (pure solver throughput).

    Seeding: pass ``seeds`` (J,) for per-solve seeds matching the single
    kernel's (seed, block) scheme (exact chain-vs-sequential parity), or
    ``seeds=None`` with ``n_solves``/``base_seed`` for unbounded chains
    (the J-sized prefetch array would not fit SMEM for J ≫ 10⁴).

    Returns (u0s (J,), statuses (J,) int32, final u_n (N,)).
    """
    per_solve_seeds = seeds is not None
    j = int(seeds.shape[0]) if per_solve_seeds else int(n_solves)
    jp = -(-j // 8) * 8  # output rows padded to the (8, 128) tile
    if per_solve_seeds:
        seed_arg = jnp.asarray(seeds, jnp.int32).reshape(j)
        if jp != j:
            seed_arg = jnp.concatenate([seed_arg, jnp.zeros(jp - j, jnp.int32)])
    else:
        seed_arg = jnp.asarray(base_seed, jnp.int32).reshape(1)
    k = n_rollouts or cfg.n_rollouts
    if block_sublanes is None:
        block_sublanes = _default_block_sublanes(k, sampler)
    bk = block_sublanes * _LANES
    num_blocks = pl.cdiv(k, bk)
    n = cfg.n_horizon

    kernel = _make_chain_kernel(
        dynamics, cost, cfg, n_state, block_sublanes, k, fast, plant, j,
        per_solve_seeds, num_blocks, sampler=sampler,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # seeds, x0, u_n0
        grid=(jp,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((8, _LANES), lambda jj, *_: (jj // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda jj, *_: (jj // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, _LANES), lambda jj, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, block_sublanes, _LANES), jnp.float32),  # v_buf
            pltpu.SMEM((n,), jnp.float32),  # warm-started u_n
            pltpu.SMEM((n_state,), jnp.float32),  # plant/controller state
        ],
    )
    u0s, sts, un = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((jp, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((jp, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        seed_arg,
        jnp.asarray(x, jnp.float32).reshape(n_state, 1),
        jnp.asarray(u_n, jnp.float32).reshape(n, 1),
    )
    return u0s[:j, 0], sts[:j, 0].astype(jnp.int32), un[:, 0]


def finalize_partials(cfg: MppiConfig, parts: MppiPartials, u_n: jax.Array):
    no_finite = parts.m <= np.float32(-3.3e38)
    sum_zero = parts.s == 0.0
    u_new = (parts.uw / jnp.where(sum_zero, 1.0, parts.s)).astype(u_n.dtype)
    invalid = jnp.isnan(u_new[0]) | jnp.isinf(u_new[0])
    status = jnp.where(
        no_finite,
        jnp.int32(MppiStatus.NO_FINITE),
        jnp.where(
            sum_zero,
            jnp.int32(MppiStatus.SUM_ZERO),
            jnp.where(invalid, jnp.int32(MppiStatus.INVALID_U), jnp.int32(MppiStatus.OK)),
        ),
    )
    ok = status == jnp.int32(MppiStatus.OK)
    return jnp.where(ok, u_new, jnp.zeros_like(u_new)), status
