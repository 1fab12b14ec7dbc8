"""Kernel op-mix diagnostic: where do the ~30 lane-cycles/step go?

Times chain-kernel variants at K=819200 (fast math) with parts disabled:
  full      — sampling (PRNG+Box-Muller) + rollout (dynamics+cost) + LSE
  nosample  — rollout + LSE only (noise buffer filled with a cheap ramp)
  noroll    — sampling + LSE only (rollout replaced by v-accumulation)

The marginal difference full−nosample is the true sampling cost; this
decides whether a cheaper normal generator (Wallace-style pool) can pay
(DESIGN.md §9 "remaining levers"). Run on the real chip:

  python scripts/diag_kernel_mix.py
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_rs_tpu.controllers.mppi import MppiConfig
from mpc_rs_tpu.models import costs, dynamics
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.ops import fastmath
from mpc_rs_tpu.ops.mppi_pallas import _bits_to_unit_open, _sampling_math

_LANES = 128
_TWO_PI = 2.0 * math.pi


def make_chain(cfg, dyn, cost, n_state, k, bs, n_solves, mode):
    n = cfg.n_horizon
    inv = cfg.std_dev ** -2.0
    lo, hi = cfg.limit
    neg_big = np.float32(-3.4e38)
    inv_lambda = np.float32(1.0 / cfg.lambda_)
    num_blocks = k // (bs * _LANES)
    _log, _sqrt, _sin, _cos = _sampling_math(True)

    def kernel(seed_ref, x0_ref, u_n0_ref, u0_ref, v_buf, u_n_s, x_s):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            for t in range(n):
                u_n_s[t] = u_n0_ref[t, 0]
            for c_ in range(n_state):
                x_s[c_] = x0_ref[c_, 0]

        def block_body(i, carry):
            m, s_acc, uw = carry
            if mode == "bitsonly":
                # PRNG floor: one word per normal, cheapest possible use
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                for t in range(n):
                    w = pltpu.bitcast(pltpu.prng_random_bits((bs, _LANES)), jnp.uint32)
                    z = pltpu.bitcast(w >> 9, jnp.int32).astype(jnp.float32) * np.float32(1e-7)
                    v_buf[t] = jnp.clip(u_n_s[t] + z, lo, hi)
            elif mode == "cltone":
                # CLT with ONE bits call for the whole horizon
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                inv_sig = np.float32(1.0 / math.sqrt(4 * (256**2 - 1) / 12.0))
                ca = np.float32(0.949188 * cfg.std_dev)
                cb = np.float32(0.018629 * cfg.std_dev)
                wall = pltpu.bitcast(pltpu.prng_random_bits((n, bs, _LANES)), jnp.uint32)
                for t in range(n):
                    w = wall[t]
                    x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
                    s4 = (x2 & np.uint32(0xFFFF)) + (x2 >> 16)
                    z = (pltpu.bitcast(s4, jnp.int32).astype(jnp.float32) - 510.0) * inv_sig
                    z = z * (ca + cb * (z * z))
                    v_buf[t] = jnp.clip(u_n_s[t] + z, lo, hi)
            elif mode == "cltbig":
                # clt4 with sampling vectorized over the WHOLE horizon:
                # one (n, bs, 128) bits call, byte-sum/cvt/cubic on the big
                # array (tests whether bulk ops schedule better than 8
                # per-timestep sweeps)
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                inv_sig = np.float32(1.0 / math.sqrt(4 * (256**2 - 1) / 12.0))
                ca = np.float32(0.949188 * cfg.std_dev)
                cb = np.float32(0.018629 * cfg.std_dev)
                w = pltpu.bitcast(pltpu.prng_random_bits((n, bs, _LANES)), jnp.uint32)
                x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
                s4 = (x2 & np.uint32(0xFFFF)) + (x2 >> 16)
                z = (pltpu.bitcast(s4, jnp.int32).astype(jnp.float32) - 510.0) * inv_sig
                z = z * (ca + cb * (z * z))
                for t in range(n):
                    v_buf[t] = jnp.clip(u_n_s[t] + z[t], lo, hi)
            elif mode == "cltf":
                # clt4 with NO int->float convert: each byte becomes a
                # [1,2) float via mantissa bitcast (shift/and/or only)
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                mant = np.uint32(0x007F8000)
                one = np.uint32(0x3F800000)
                # sum of four [1,2) uniforms with 256 levels: mean 4+510/256,
                # var 4*(256^2-1)/12/256^2
                mu = np.float32(4.0 + 510.0 / 256.0)
                inv_sig = np.float32(256.0 / math.sqrt(4 * (256**2 - 1) / 12.0))
                ca = np.float32(0.949188 * cfg.std_dev)
                cb = np.float32(0.018629 * cfg.std_dev)
                for t in range(n):
                    w = pltpu.bitcast(pltpu.prng_random_bits((bs, _LANES)), jnp.uint32)
                    f0 = pltpu.bitcast(((w << 15) & mant) | one, jnp.float32)
                    f1 = pltpu.bitcast(((w << 7) & mant) | one, jnp.float32)
                    f2 = pltpu.bitcast(((w >> 1) & mant) | one, jnp.float32)
                    f3 = pltpu.bitcast(((w >> 9) & mant) | one, jnp.float32)
                    z = ((f0 + f1) + (f2 + f3) - mu) * inv_sig
                    z = z * (ca + cb * (z * z))
                    v_buf[t] = jnp.clip(u_n_s[t] + z, lo, hi)
            elif mode == "cltreg":
                # clt4 with the noise kept in REGISTERS (no v_buf stores):
                # isolates the VMEM round-trip cost of the noise buffer
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                inv_sig = np.float32(1.0 / math.sqrt(4 * (256**2 - 1) / 12.0))
                ca = np.float32(0.949188 * cfg.std_dev)
                cb = np.float32(0.018629 * cfg.std_dev)
                vs = []
                for t in range(n):
                    w = pltpu.bitcast(pltpu.prng_random_bits((bs, _LANES)), jnp.uint32)
                    x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
                    s4 = (x2 & np.uint32(0xFFFF)) + (x2 >> 16)
                    z = (pltpu.bitcast(s4, jnp.int32).astype(jnp.float32) - 510.0) * inv_sig
                    z = z * (ca + cb * (z * z))
                    vs.append(jnp.clip(u_n_s[t] + z, lo, hi))

                c = jnp.zeros((bs, _LANES), jnp.float32)
                ct = jnp.zeros((bs, _LANES), jnp.float32)
                xs = tuple(
                    jnp.full((bs, _LANES), x_s[c_], dtype=jnp.float32)
                    for c_ in range(n_state)
                )
                for t in range(n):
                    v_t = vs[t]
                    xs = dyn(*xs, v_t)
                    c = c + cost(*xs)
                    ct = ct + u_n_s[t] * inv * v_t
                score = -c - ct
                finite = jnp.isfinite(score)
                block_max = jnp.max(jnp.where(finite, score, neg_big))
                m_new = jnp.maximum(m, block_max)
                scale = jnp.exp((m - m_new) * inv_lambda)
                e = jnp.where(finite, jnp.exp((score - m_new) * inv_lambda), 0.0)
                s_new = s_acc * scale + jnp.sum(e)
                partial = jnp.stack([jnp.sum(e * vs[t], axis=0) for t in range(n)], axis=0)
                return m_new, s_new, uw * scale + partial
            elif mode == "cvtonly":
                # clt4 int math on ONE reused word per block (t-XORed to
                # defeat CSE): isolates PRNG generation vs int/cvt cost
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                inv_sig = np.float32(1.0 / math.sqrt(4 * (256**2 - 1) / 12.0))
                ca = np.float32(0.949188 * cfg.std_dev)
                cb = np.float32(0.018629 * cfg.std_dev)
                w0 = pltpu.bitcast(pltpu.prng_random_bits((bs, _LANES)), jnp.uint32)
                for t in range(n):
                    w = w0 ^ np.uint32(0x9E3779B9 * (t + 1) & 0xFFFFFFFF)
                    x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
                    s4 = (x2 & np.uint32(0xFFFF)) + (x2 >> 16)
                    z = (pltpu.bitcast(s4, jnp.int32).astype(jnp.float32) - 510.0) * inv_sig
                    z = z * (ca + cb * (z * z))
                    v_buf[t] = jnp.clip(u_n_s[t] + z, lo, hi)
            elif mode == "clt2q":
                # two normals per word: 16-bit halves, each = sum of two
                # 8-bit uniforms (triangular) + quintic shape correction
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                inv_t = np.float32(1.0 / math.sqrt(2 * (256**2 - 1) / 12.0))
                qa = np.float32(1.019453 * cfg.std_dev)
                qb = np.float32(-0.103499 * cfg.std_dev)
                qc = np.float32(0.029151 * cfg.std_dev)
                for t0 in range(0, n, 2):
                    w = pltpu.bitcast(pltpu.prng_random_bits((bs, _LANES)), jnp.uint32)
                    x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
                    z1 = (pltpu.bitcast(x2 & np.uint32(0xFFFF), jnp.int32).astype(jnp.float32) - 255.0) * inv_t
                    z2 = (pltpu.bitcast(x2 >> 16, jnp.int32).astype(jnp.float32) - 255.0) * inv_t
                    s1 = z1 * z1
                    s2 = z2 * z2
                    v_buf[t0] = jnp.clip(u_n_s[t0] + z1 * (qa + s1 * (qb + qc * s1)), lo, hi)
                    if t0 + 1 < n:
                        v_buf[t0 + 1] = jnp.clip(u_n_s[t0 + 1] + z2 * (qa + s2 * (qb + qc * s2)), lo, hi)
            elif mode == "clt":
                # sum of four 8-bit uniforms from ONE PRNG word per normal:
                # pairwise-add bytes in-register (2 masks, 2 shifts, 2 adds),
                # then affine + cubic tail correction — no transcendentals.
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                inv_sig = np.float32(1.0 / math.sqrt(4 * (256**2 - 1) / 12.0))
                ca = np.float32(0.949188 * cfg.std_dev)
                cb = np.float32(0.018629 * cfg.std_dev)
                for t in range(n):
                    w = pltpu.bitcast(pltpu.prng_random_bits((bs, _LANES)), jnp.uint32)
                    x2 = (w & np.uint32(0x00FF00FF)) + ((w >> 8) & np.uint32(0x00FF00FF))
                    s4 = (x2 & np.uint32(0xFFFF)) + (x2 >> 16)
                    z = (pltpu.bitcast(s4, jnp.int32).astype(jnp.float32) - 510.0) * inv_sig
                    z = z * (ca + cb * (z * z))
                    v_buf[t] = jnp.clip(u_n_s[t] + z, lo, hi)
            elif mode != "nosample":
                pltpu.prng_seed(seed_ref[0], j * jnp.int32(100003) + i)
                for t0 in range(0, n, 2):
                    bits = pltpu.prng_random_bits((2, bs, _LANES))
                    u1 = _bits_to_unit_open(pltpu.bitcast(bits[0], jnp.uint32))
                    u2 = pltpu.bitcast(
                        (pltpu.bitcast(bits[1], jnp.uint32) >> 9) | np.uint32(0x3F800000),
                        jnp.float32,
                    ) - 1.0
                    r = cfg.std_dev * _sqrt(-2.0 * _log(u1))
                    ang = _TWO_PI * u2
                    v_buf[t0] = jnp.clip(u_n_s[t0] + r * _cos(ang), lo, hi)
                    if t0 + 1 < n:
                        v_buf[t0 + 1] = jnp.clip(u_n_s[t0 + 1] + r * _sin(ang), lo, hi)
            else:
                ramp = (
                    jax.lax.broadcasted_iota(jnp.int32, (bs, _LANES), 1).astype(jnp.float32)
                    * 1e-3
                )
                for t in range(n):
                    v_buf[t] = jnp.clip(u_n_s[t] + ramp + jnp.float32(1e-4) * i, lo, hi)

            c = jnp.zeros((bs, _LANES), jnp.float32)
            ct = jnp.zeros((bs, _LANES), jnp.float32)
            if mode != "noroll":
                xs = tuple(
                    jnp.full((bs, _LANES), x_s[c_], dtype=jnp.float32)
                    for c_ in range(n_state)
                )
                for t in range(n):
                    v_t = v_buf[t]
                    xs = dyn(*xs, v_t)
                    c = c + cost(*xs)
                    ct = ct + u_n_s[t] * inv * v_t
            else:
                for t in range(n):
                    v_t = v_buf[t]
                    c = c + v_t * v_t  # keep sampling live, rollout-free
                    ct = ct + u_n_s[t] * inv * v_t
            score = -c - ct

            finite = jnp.isfinite(score)
            block_max = jnp.max(jnp.where(finite, score, neg_big))
            m_new = jnp.maximum(m, block_max)
            scale = jnp.exp((m - m_new) * inv_lambda)
            e = jnp.where(finite, jnp.exp((score - m_new) * inv_lambda), 0.0)
            s_new = s_acc * scale + jnp.sum(e)
            partial = jnp.stack([jnp.sum(e * v_buf[t], axis=0) for t in range(n)], axis=0)
            return m_new, s_new, uw * scale + partial

        init = (jnp.float32(neg_big), jnp.float32(0.0), jnp.zeros((n, _LANES), jnp.float32))
        if num_blocks == 1:
            m, s_acc, uw = block_body(0, init)
        else:
            m, s_acc, uw = jax.lax.fori_loop(0, num_blocks, block_body, init)

        inv_s = 1.0 / jnp.where(s_acc == 0.0, 1.0, s_acc)
        totals = jnp.sum(uw, axis=-1, keepdims=True) * inv_s
        for t in range(n):
            u_n_s[t] = totals[t, 0]
        row = j % 8
        u0_ref[pl.ds(row, 1), :] = jnp.full((1, _LANES), u_n_s[0], jnp.float32)

    jp = -(-n_solves // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(jp,),
        in_specs=[],
        out_specs=[
            pl.BlockSpec((8, _LANES), lambda jj, *_: (jj // 8, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, bs, _LANES), jnp.float32),
            pltpu.SMEM((n,), jnp.float32),
            pltpu.SMEM((n_state,), jnp.float32),
        ],
    )

    def wrapped_kernel(*refs):
        with fastmath.hw_rcp_scope():
            return kernel(*refs)

    @jax.jit
    def run(x, u_n, seed):
        (u0s,) = pl.pallas_call(
            wrapped_kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((jp, _LANES), jnp.float32)],
        )(
            jnp.asarray(seed, jnp.int32).reshape(1),
            jnp.asarray(x, jnp.float32).reshape(n_state, 1),
            jnp.asarray(u_n, jnp.float32).reshape(n, 1),
        )
        return jnp.sum(u0s)

    return run


def time_mode(cfg, dyn, cost, k, bs, mode, j_short=200, j_long=1600, reps=3):
    short = make_chain(cfg, dyn, cost, 4, k, bs, j_short, mode)
    long_ = make_chain(cfg, dyn, cost, 4, k, bs, j_long, mode)
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(cfg.n_horizon, jnp.float32)
    float(short(x0, u0, jnp.int32(0)))
    float(long_(x0, u0, jnp.int32(0)))
    for attempt in range(3):
        ts, tl = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            float(short(x0, u0, jnp.int32(attempt * 100 + 7 * r + 1)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(long_(x0, u0, jnp.int32(attempt * 100 + 13 * r + 2)))
            tl.append(time.perf_counter() - t0)
        sec = (min(tl) - min(ts)) / (j_long - j_short)
        if sec > 0 and (min(tl) - min(ts)) > 0.1 * min(tl):
            return sec
    return min(tl) / j_long


def main():
    p = CartPoleParams.single_wheel()
    dyn = dynamics.make_cartpole_nonlinear(p, 0.1, fast=True)
    k, bs = 819200, 64
    cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
    clk = 940e6  # v5e VPU ~940 MHz
    out = {}
    import sys

    modes = sys.argv[1:] or ["full", "clt", "nosample", "noroll"]
    for mode in modes:
        sec = time_mode(cfg, dyn, costs.shaped4, k, bs, mode)
        steps = k * cfg.n_horizon
        out[mode] = dict(
            us_per_solve=sec * 1e6,
            g_steps_per_s=steps / sec / 1e9,
            lane_cycles_per_step=sec * clk / steps * 1e0 * 8 * 128 / 1,  # per lane-step: cycles·lanes/steps
        )
        print(mode, {k2: round(v, 2) for k2, v in out[mode].items()}, flush=True)
    if "full" in out and "nosample" in out:
        samp = out["full"]["us_per_solve"] - out["nosample"]["us_per_solve"]
        print(f"sampling share: {samp:.1f} µs/solve ({samp / out['full']['us_per_solve'] * 100:.0f}%)")
    if "full" in out and "noroll" in out:
        roll = out["full"]["us_per_solve"] - out["noroll"]["us_per_solve"]
        print(f"rollout share:  {roll:.1f} µs/solve ({roll / out['full']['us_per_solve'] * 100:.0f}%)")


if __name__ == "__main__":
    main()
