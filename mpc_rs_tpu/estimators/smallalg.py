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


def eigh_jacobi_unrolled(s, sweeps: int = 4):
    """(eigenvalues (..., n), eigenvectors (..., n, n)) of symmetric s by
    ``sweeps`` unrolled cyclic Jacobi sweeps — batched, branch-free.

    ``jnp.linalg.eigh`` lowers to a generic QDWH iteration that dominates a
    vmapped UKF tick on TPU (measured: flagship fleet 1.4 → 2.7 ms/tick).
    For n ≤ 6 a fixed number of Jacobi sweeps reaches f32 accuracy with
    n(n−1)/2·sweeps rotations of pure elementwise math that fuses into the
    tick. Each rotation zeroes one off-diagonal pair; 4 sweeps drive the
    off-diagonal mass below f32 roundoff for the well-conditioned-enough
    covariances a guarded UKF produces (tests pin ~1e-6 reconstruction).

    Columns of the returned v are eigenvectors: s ≈ v · diag(w) · vᵀ.
    """
    n = s.shape[-1]
    a = jnp.asarray(s)
    v = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    eye = jnp.eye(n, dtype=a.dtype)

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                app = a[..., p, p]
                aqq = a[..., q, q]
                apq = a[..., p, q]
                # stable Jacobi angle: t = sign(θ)/(|θ|+√(θ²+1)),
                # θ = (aqq−app)/(2 apq); guard apq≈0 → identity rotation
                small = jnp.abs(apq) < 1e-30
                theta = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
                t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
                t = jnp.where(small, 0.0, t)
                c = 1.0 / jnp.sqrt(t * t + 1.0)
                snn = t * c
                # rotation acting on rows/cols p,q: build as gather-free
                # row updates (n is tiny; unrolled)
                rp = a[..., p, :]
                rq = a[..., q, :]
                new_p = c[..., None] * rp - snn[..., None] * rq
                new_q = snn[..., None] * rp + c[..., None] * rq
                sel_p = eye[p]
                sel_q = eye[q]
                a = (
                    a * (1.0 - sel_p - sel_q)[:, None]
                    + sel_p[:, None] * new_p[..., None, :]
                    + sel_q[:, None] * new_q[..., None, :]
                )
                cp = a[..., :, p]
                cq = a[..., :, q]
                new_cp = c[..., None] * cp - snn[..., None] * cq
                new_cq = snn[..., None] * cp + c[..., None] * cq
                a = (
                    a * (1.0 - sel_p - sel_q)[None, :]
                    + sel_p[None, :] * new_cp[..., :, None]
                    + sel_q[None, :] * new_cq[..., :, None]
                )
                vp = v[..., :, p]
                vq = v[..., :, q]
                new_vp = c[..., None] * vp - snn[..., None] * vq
                new_vq = snn[..., None] * vp + c[..., None] * vq
                v = (
                    v * (1.0 - sel_p - sel_q)[None, :]
                    + sel_p[None, :] * new_vp[..., :, None]
                    + sel_q[None, :] * new_vq[..., :, None]
                )
    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    return w, v
