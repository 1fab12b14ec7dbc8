"""Unrolled small-matrix linear algebra for TPU-batched estimators.

``jnp.linalg.cholesky``/``solve`` lower to generic (loop-heavy) routines
that dominate a vmapped UKF tick on TPU. State dims here are 2..6, so the
factorizations unroll completely into a few dozen *elementwise* ops over
the batch — pure VPU work that fuses with the rest of the filter.

All functions broadcast over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_unrolled(s, eps_rel: float = 1e-12):
    """Lower-triangular L with L Lᵀ = s for SPD s (..., n, n), unrolled.

    Near-PSD semantics: a pivot that is ≤ eps_rel·mean-diag zeroes its
    whole column (that direction carries no uncertainty) instead of
    producing a ~1/√eps explosion or NaNs — mirrors the graceful
    eigenvalue clamping of the eigh path."""
    n = s.shape[-1]
    floor = eps_rel * (jnp.trace(s, axis1=-2, axis2=-1) / n + 1e-30)
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            acc = s[..., i, j]
            for k in range(j):
                acc = acc - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(acc, 0.0))
            else:
                piv = l[j][j]
                good = piv * piv > floor
                l[i][j] = jnp.where(good, acc / jnp.where(good, piv, 1.0), 0.0)
    zero = jnp.zeros_like(s[..., 0, 0])
    rows = [
        jnp.stack([l[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def chol_solve_unrolled(l, b, eps: float = 1e-25):
    """Solve (L Lᵀ) x = b with lower-tri L (..., n, n), b (..., n, m).

    Zeroed pivot columns (see chol_unrolled) yield zero solution components
    rather than infinities."""
    n = l.shape[-1]

    def safe_div(num, piv):
        good = piv * piv > eps
        return jnp.where(good, num / jnp.where(good, piv, 1.0), 0.0)

    # forward: L y = b
    y = [None] * n
    for i in range(n):
        acc = b[..., i, :]
        for k in range(i):
            acc = acc - l[..., i, k, None] * y[k]
        y[i] = safe_div(acc, l[..., i, i, None])
    # backward: Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        acc = y[i]
        for k in range(i + 1, n):
            acc = acc - l[..., k, i, None] * x[k]
        x[i] = safe_div(acc, l[..., i, i, None])
    return jnp.stack(x, axis=-2)


def spd_solve_unrolled(a, b, jitter_rel: float = 0.0):
    """x with a x = b for SPD a (..., n, n), b (..., n, m), fully unrolled."""
    if jitter_rel:
        n = a.shape[-1]
        tr = jnp.trace(a, axis1=-2, axis2=-1) / n
        a = a + (jitter_rel * tr)[..., None, None] * jnp.eye(n, dtype=a.dtype)
    return chol_solve_unrolled(chol_unrolled(a), b)
