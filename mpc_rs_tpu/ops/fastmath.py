"""Fast f32 transcendentals for the VPU hot loop (behind a flag).

The MPPI rollout kernel is transcendental-bound (~50 lane-cycles/step,
DESIGN.md §8): sin/cos + a divide in the cart-pole dynamics and log/sqrt in
Box-Muller dominate. These replacements trade ≤~1e-5 relative error for
mul/add-only pipelines:

- ``fsin``/``fcos``/``fsincos``: degree-7/6 minimax polynomials after
  round-to-nearest range reduction to [−π, π]. Max abs error ≈ 3e-7 (sin),
  6e-7 (cos) over ±π; finite for any finite input.
- ``flog``: exponent/mantissa split + degree-6 polynomial of log2(m) on
  [1, 2). Max rel error ≈ 2e-7 for normal floats.
- ``frsqrt``/``fsqrt``: ``jax.lax.rsqrt`` + one Newton step.
- ``freciprocal``: Pallas approximate reciprocal + one Newton step (falls
  back to exact division outside Pallas).

Exact-parity tests keep the flag off; tolerance tests (tests/test_fastmath)
pin the error bounds. The reference clamps rollouts' cost inputs, so these
tolerances are far below MPPI's sampling noise floor.
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * math.pi
_INV_TWO_PI = 1.0 / _TWO_PI
_PI_C = np.float32(math.pi)

_PI = np.float32(math.pi)
_HALF_PI = np.float32(math.pi / 2.0)
# sin Taylor deg-9 on the folded range [−π/2, π/2] (max err ~2.7e-6)
_S3 = np.float32(-1.0 / 6.0)
_S5 = np.float32(1.0 / 120.0)
_S7 = np.float32(-1.0 / 5040.0)
_S9 = np.float32(1.0 / 362880.0)


def _reduce_pi(x):
    """x − 2π·round(x/2π) ∈ [−π, π]."""
    k = jnp.round(x * np.float32(_INV_TWO_PI))
    # two-step multiply keeps f32 cancellation error small for |x| ≲ 1e4
    hi = np.float32(6.28125)  # 2π split: hi + lo
    lo = np.float32(_TWO_PI - 6.28125)
    r = (x - k * hi) - k * lo
    # huge |x| defeats f32 reduction; clamp keeps the poly finite (values
    # are meaningless there, exactly like the rollout they came from)
    return jnp.clip(r, -_PI_C, _PI_C)


def _sin_folded(r):
    """sin on r ∈ [−π, π] via quadrant fold: sin(r) = sin(±π − r) outside
    ±π/2, which lands the polynomial argument in [−π/2, π/2]."""
    r = jnp.where(r > _HALF_PI, _PI - r, jnp.where(r < -_HALF_PI, -_PI - r, r))
    r2 = r * r
    return r + r * r2 * (_S3 + r2 * (_S5 + r2 * (_S7 + r2 * _S9)))


def fsin(x):
    return _sin_folded(_reduce_pi(x))


def fcos(x):
    # cos x = sin(x + π/2), reduced in its own pass
    return _sin_folded(_reduce_pi(x + _HALF_PI))


def fsincos(x):
    """(sin x, cos x); two folds, one shared reduction-and-poly pipeline."""
    return fsin(x), fcos(x)


_LOG2 = np.float32(math.log(2.0))


_SQRT2 = np.float32(math.sqrt(2.0))


def flog(x):
    """Natural log for x > 0 (normal floats), cephes-style: exponent split
    with the √2 mantissa adjustment, then the classic logf minimax poly on
    x ∈ [√½−1, √2−1]. Max abs err ~1e-7."""
    xi = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.int32)
    e = ((xi >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type((xi & 0x007FFFFF) | 0x3F800000, jnp.float32)
    big = m > _SQRT2
    m = jnp.where(big, m * 0.5, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = m - 1.0
    z = t * t
    p = np.float32(3.3333331174e-1) + t * (np.float32(-2.4999993993e-1) + t * (
        np.float32(2.0000714765e-1) + t * (np.float32(-1.6668057665e-1) + t * (
            np.float32(1.4249322787e-1) + t * (np.float32(-1.2420140846e-1) + t * (
                np.float32(1.1676998740e-1) + t * (np.float32(-1.1514610310e-1)
                    + t * np.float32(7.0376836292e-2))))))))
    y = t - 0.5 * z + t * z * p
    return y + e * _LOG2


def frsqrt(x):
    """rsqrt with one Newton refinement."""
    y = jax.lax.rsqrt(x)
    return y * (1.5 - 0.5 * x * y * y)


def fsqrt(x):
    return x * frsqrt(jnp.maximum(x, np.float32(1e-38)))


_HW_RCP = False  # set only while tracing a Pallas kernel body (hw_rcp_scope)


@contextlib.contextmanager
def hw_rcp_scope():
    """Enable the hardware approximate reciprocal for freciprocal/fdiv.

    ``pl.reciprocal`` happily traces *outside* pallas_call too (it lowers
    through XLA), so context detection can't be exception-based; the MPPI
    kernels enter this scope around their body trace instead. Tracing is
    single-threaded per process, so a module flag is safe."""
    global _HW_RCP
    prev, _HW_RCP = _HW_RCP, True
    try:
        yield
    finally:
        _HW_RCP = prev


def freciprocal(x):
    """1/x: hardware approximate reciprocal inside a Pallas kernel body
    (measured max rel err 1.6e-5 on v5e across [1e-3, 10] — within the
    fast-math tolerance budget, no Newton step), exact division elsewhere.

    An approx+Newton refinement was tried first and was NOT a win (the
    2-mul refinement costs what the divide's own refinement costs); the
    raw table lookup is the only cheaper point on the accuracy curve."""
    if _HW_RCP:
        from jax.experimental import pallas as pl

        return pl.reciprocal(jnp.asarray(x, jnp.float32), approx=True)
    return 1.0 / x


def fdiv(num, den):
    """num/den: ``num · rcp(den)`` inside a Pallas kernel body, plain
    single-rounding division elsewhere (keeps the vmap tier bit-identical
    to its pre-rcp form, so exact-vs-fast comparisons don't absorb an
    extra rounding)."""
    if _HW_RCP:
        from jax.experimental import pallas as pl

        return num * pl.reciprocal(jnp.asarray(den, jnp.float32), approx=True)
    return num / den
