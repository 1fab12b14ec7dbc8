"""Process/measurement-noise builders (gen_q / gen_r) from the reference.

``gen_q6`` is traceable in dt (a jnp scalar works), so per-tick
time-varying Q (mppi4-non-liner-ukf.rs:276-281) stays inside ``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp


def gen_q6(dt, phy=(100.0, 70.0, 20.0), dtype=None):
    """Piecewise-white-noise 6×6 process noise — mppi4-non-liner-ukf.rs:192-221.

    Three overlapping 3×3 white-noise blocks on the chains
    (θ, θ̇, θ̈), (ẋ?… slots 1,3,4), (x, ẋ, ẍ-ish slots 0,1,2) weighted by
    PHY = [100, 70, 20] (flagship) or [50, 50, 10] (mppi4-ukf-commu.rs:28).
    """
    dt = jnp.asarray(dt, dtype=dtype)
    z = jnp.zeros_like(dt)
    dt2 = dt * dt
    dt3 = dt2 * dt
    dt4 = dt2 * dt2
    a, b, c = dt4 / 8.0, dt3 / 6.0, dt3 / 3.0
    d, e = dt2 / 2.0, dt

    def mat(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    q1 = mat([
        [z, z, z, z, z, z],
        [z, z, z, z, z, z],
        [z, z, z, z, z, z],
        [z, z, z, z, a, b],
        [z, z, z, a, c, d],
        [z, z, z, b, d, e],
    ])
    q2 = mat([
        [z, z, z, z, z, z],
        [z, z, z, a, b, z],
        [z, z, z, z, z, z],
        [z, a, z, c, d, z],
        [z, b, z, d, e, z],
        [z, z, z, z, z, z],
    ])
    q3 = mat([
        [z, a, b, z, z, z],
        [a, c, d, z, z, z],
        [b, d, e, z, z, z],
        [z, z, z, z, z, z],
        [z, z, z, z, z, z],
        [z, z, z, z, z, z],
    ])
    return phy[0] * q1 + phy[1] * q2 + phy[2] * q3


def gen_q4(dt, accel_var=(25.0, 400.0), dtype=None):
    """Piecewise-white-noise 4×4 process noise for the (x, ẋ, θ, θ̇) state.

    Same discretization family as the flagship's ``gen_q`` (piecewise white
    noise on accelerations — mppi4-non-liner-ukf.rs:192-221) applied to the
    4-state chain: white linear acceleration with variance ``accel_var[0]``
    drives (x, ẋ), white angular acceleration ``accel_var[1]`` drives
    (θ, θ̇). Proper dt-scaling makes one tuning valid across sensor rates —
    unlike the reference's rate-specific hand-tuned constant Q
    (mppi4-non-liner-s.rs:216-221)."""
    dt = jnp.asarray(dt, dtype=dtype)
    z = jnp.zeros_like(dt)
    d4, d3, d2 = dt**4 / 4.0, dt**3 / 2.0, dt * dt
    sa, sw = accel_var

    def blk(s):
        return [s * d4, s * d3, s * d3, s * d2]

    a = blk(sa)
    w = blk(sw)
    return jnp.stack([
        jnp.stack([a[0], a[1], z, z], axis=-1),
        jnp.stack([a[2], a[3], z, z], axis=-1),
        jnp.stack([z, z, w[0], w[1]], axis=-1),
        jnp.stack([z, z, w[2], w[3]], axis=-1),
    ], axis=-2)


def gen_r_mask(r_diag, enable_mask, dropped=1e6):
    """Sensor-dropout R — mppi4-ukf-commu.rs:228-236, mpc-ukf-commu.rs.

    Channels whose enable bit is 0 get their variance inflated to 1e6;
    ``enable_mask`` is a (n_obs,) {0,1} array (traceable)."""
    r_diag = jnp.asarray(r_diag)
    diag = jnp.where(enable_mask.astype(bool), r_diag, dropped)
    return jnp.diag(diag) if diag.ndim == 1 else jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(diag)


def enable_bits_to_mask(enable, n: int = 5):
    """u8 bitmask → (n,) {0,1} float mask — src/packet.rs:112-118."""
    enable = jnp.asarray(enable, dtype=jnp.int32)
    bits = (enable[..., None] >> jnp.arange(n)) & 1
    return bits.astype(jnp.float32)
