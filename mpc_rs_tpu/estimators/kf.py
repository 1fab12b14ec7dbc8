"""Linear Kalman filter utilities — parity with examples/two-liner-kf.rs.

Functional: state is just (x, p); F/Q/H/R/B are constants closed over or
passed in. The Joseph-form update (two-liner-kf.rs:47-51) is the default
for numeric stability; the textbook form is provided for cross-checks.
"""

from __future__ import annotations

import jax.numpy as jnp


def kf_predict(x, p, f, q, u=None, b=None):
    """x' = Fx (+ Bu); P' = FPFᵀ + Q — examples/two-liner-kf.rs:17-27."""
    x = f @ x if u is None else f @ x + b @ u
    p = f @ p @ f.T + q
    return x, p


def kf_update_joseph(x, p, z, h, r):
    """Joseph-form measurement update — examples/two-liner-kf.rs:35-53.

    S = HPHᵀ+R; K = PHᵀS⁻¹; x += K(z−Hx);
    P = (I−KH)P(I−KH)ᵀ + KRKᵀ (numerically stable form).
    """
    s = h @ p @ h.T + r
    k = jnp.linalg.solve(s.T, (p @ h.T).T).T
    x = x + k @ (z - h @ x)
    i_kh = jnp.eye(p.shape[-1], dtype=p.dtype) - k @ h
    p = i_kh @ p @ i_kh.T + k @ r @ k.T
    return x, p


def kf_update(x, p, z, h, r):
    """Textbook update P = (I−KH)P — the commented-out form at
    two-liner-kf.rs:46."""
    s = h @ p @ h.T + r
    k = jnp.linalg.solve(s.T, (p @ h.T).T).T
    x = x + k @ (z - h @ x)
    p = p - k @ h @ p
    return x, p
