"""Condensed-QP matrix builders for horizon-unrolled linear MPC.

Rebuilds src/mpc.rs (create_f_matrix!/create_g_matrix!/create_q_matrix!)
as *precomputed constants*: the reference rebuilds F/G/Q inside every cost
and gradient call (examples/mpc-ukf-s.rs:158-177 — O(N²) matrix powers per
solver iteration); here they are built once at trace/setup time.

Also fixes (by construction) the reference's macro hygiene bug where
``create_g_matrix!`` ignores its ``$b`` argument and captures a literal
``B`` from the call site (src/mpc.rs:20).

Prediction over the horizon: X = F x₀ + G U with
  F = [A; A²; …; Aᴺ]                 (src/mpc.rs:2-11)
  G[i,j] = A^(i−j) B  for j ≤ i      (src/mpc.rs:14-25)
  Q = blockdiag(C, …, C)             (src/mpc.rs:28-36)
Cost (examples/op-mpc-x-calc.rs:73-83):
  J(u) = uᵀGᵀQGu + 2(x₀ᵀFᵀ − x_refᵀ)QGu
Gradient (op-mpc-x-calc.rs:90-98):
  ∇J = 2GᵀQ(Gu + Fx₀ − x_ref)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


def create_f_matrix(a: np.ndarray, n: int) -> np.ndarray:
    """F = [A; A²; …; Aᴺ] — src/mpc.rs:2-11."""
    a = np.asarray(a, dtype=np.float64)
    s = a.shape[0]
    f = np.zeros((s * n, s))
    ai = np.eye(s)
    for i in range(n):
        ai = ai @ a
        f[s * i : s * (i + 1), :] = ai
    return f


def create_g_matrix(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Lower-block-triangular G with blocks A^(i−j)B — src/mpc.rs:14-25."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64).reshape(a.shape[0], -1)
    s = a.shape[0]
    g = np.zeros((s * n, n))
    powers = [np.eye(s)]
    for _ in range(n - 1):
        powers.append(powers[-1] @ a)
    for i in range(n):
        for j in range(i + 1):
            g[s * i : s * (i + 1), j : j + 1] = powers[i - j] @ b
    return g


def create_q_matrix(c: np.ndarray, n: int) -> np.ndarray:
    """Q = blockdiag(C,…,C) — src/mpc.rs:28-36."""
    c = np.asarray(c, dtype=np.float64)
    s = c.shape[0]
    q = np.zeros((s * n, s * n))
    for i in range(n):
        q[s * i : s * (i + 1), s * i : s * (i + 1)] = c
    return q


class CondensedQp(NamedTuple):
    f: jnp.ndarray  # (sN, s)
    g: jnp.ndarray  # (sN, N)
    q: jnp.ndarray  # (sN, sN)
    h: jnp.ndarray  # GᵀQG (N, N) — precomputed Hessian
    gq: jnp.ndarray  # GᵀQ (N, sN) — precomputed for the gradient


def build_condensed_qp(a, b, c, n: int, dtype=jnp.float64) -> CondensedQp:
    f = create_f_matrix(a, n)
    g = create_g_matrix(a, b, n)
    q = create_q_matrix(c, n)
    h = g.T @ q @ g
    gq = g.T @ q
    as_j = lambda m: jnp.asarray(m, dtype=dtype)
    return CondensedQp(f=as_j(f), g=as_j(g), q=as_j(q), h=as_j(h), gq=as_j(gq))


def qp_cost(qp: CondensedQp, x0, u, x_ref_flat):
    """J(u) — op-mpc-x-calc.rs:73-83. ``x_ref_flat``: (sN,) column-stacked
    per-step references (the reference flattens its 4×N column-major,
    i.e. step-major — identical to stacking (N,4) rows)."""
    gu = qp.g @ u
    fx = qp.f @ x0
    left = u @ (qp.h @ u)
    right = 2.0 * (fx - x_ref_flat) @ (qp.q @ gu)
    return left + right


def qp_grad(qp: CondensedQp, x0, u, x_ref_flat):
    """∇J = 2GᵀQ(Gu + Fx₀ − x_ref) — op-mpc-x-calc.rs:90-98."""
    return 2.0 * (qp.gq @ (qp.g @ u + qp.f @ x0 - x_ref_flat))


def make_qp_value_and_grad(qp: CondensedQp, gen_ref):
    """Closure factory: (x0) → value_and_grad(u) for panoc_solve.

    ``gen_ref(x0) -> (N, s)`` time-major references, flattened row-major to
    match the reference's column-major 4×N flatten (op-mpc-x-calc.rs:80).
    """

    def for_state(x0):
        x_ref_flat = gen_ref(x0).reshape(-1)

        def vg(u):
            return qp_cost(qp, x0, u, x_ref_flat), qp_grad(qp, x0, u, x_ref_flat)

        return vg

    return for_state
