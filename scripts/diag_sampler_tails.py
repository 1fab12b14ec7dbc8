"""Tail-sensitivity diagnostic for the integer CLT4 samplers (VERDICT r4
Next #10).

The production kernels default to clt4/clt4a exploration noise whose tail
is truncated at ±3.99σ (ops/mppi_pallas.py:98-104). GATES.json pins
survival at the two fleet operating points; this diag sweeps the WHOLE
tune grid (λ ∈ {0.1, 0.5, 1.4, 2.5} × σ ∈ {1, 3, 10} — apps/tune.py's
default grid, including the λ-cold cells where softmax ESS collapses to
~1-3 and a single tail sample can dominate the argmax) comparing
closed-loop survival / cost / ESS under three noise DISTRIBUTIONS at
matched seeds:

- gauss: exact normals (jax.random, the reference semantics)
- clt4:  the integer-CLT distribution, reproduced bit-faithfully in
         distribution (sum of four 8-bit uniforms + the cubic moment
         correction — same constants as the kernel)
- clt4a: clt4 with the antithetic ±ε rollout pairing

The kernel's HW-PRNG implementation quality is separately gated
(SAMPLER_GATES.json); what this diag isolates is the DISTRIBUTION —
truncation + kurtosis correction + antithetic pairing — through the vmap
reference path (mppi_solve(noise=...)), which accepts traced λ/σ so the
whole grid × dists × seeds sweep is three jitted calls.

Writes SAMPLER_TAIL_DIAG_r05.json.
Run: PYTHONPATH=.:/root/.axon_site python scripts/diag_sampler_tails.py
"""

from __future__ import annotations

import json
import math
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from mpc_rs_tpu.apps.common import DEG60
from mpc_rs_tpu.controllers.mppi import MppiConfig, mppi_solve
from mpc_rs_tpu.models import costs, dynamics
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.ops.mppi_pallas import _CLT_A, _CLT_B, _CLT_INV_SIG

LAMBDAS = (0.1, 0.5, 1.4, 2.5)
SIGMAS = (1.0, 3.0, 10.0)
SEEDS = 8
K = 8192
N_TICKS = 100  # 10 s at DT=0.1 (mppi4.rs:41)
OUT = pathlib.Path(__file__).resolve().parent.parent / "SAMPLER_TAIL_DIAG_r05.json"


def _clt4_z(key, shape):
    """The clt4 NORMALIZED variate (unit variance, kurtosis-corrected,
    support ±3.99σ) — distributionally identical to the kernel's
    (ops/mppi_pallas.py:140-149), drawn via jax.random."""
    s4 = jnp.sum(jax.random.randint(key, shape + (4,), 0, 256, jnp.int32), -1)
    z = (s4.astype(jnp.float32) - 510.0) * np.float32(_CLT_INV_SIG)
    return z * (np.float32(_CLT_A) + np.float32(_CLT_B) * z * z)


def make_noise(dist, key, k, n, sigma):
    if dist == "gauss":
        return sigma * jax.random.normal(key, (k, n), jnp.float32)
    if dist == "clt4":
        return sigma * _clt4_z(key, (k, n))
    if dist == "clt4a":
        e = sigma * _clt4_z(key, (k // 2, n))
        return jnp.concatenate([e, -e], axis=0)
    raise ValueError(dist)


def make_sweep(dist):
    p = CartPoleParams.single_wheel()
    dt = 0.1
    step = dynamics.make_cartpole_nonlinear(p, dt)
    cost = costs.shaped4

    def episode(lam, sig, seed):
        cfg = MppiConfig(n_horizon=8, n_rollouts=K, lambda_=lam, std_dev=sig,
                         limit=(-20.0, 20.0))
        x0 = tuple(jnp.float32(v) for v in (0.5, 0.0, 0.1, 0.0))
        u0 = jnp.zeros(8, jnp.float32)

        def tick(carry, key):
            x, u_n, alive, c_acc, ess_acc = carry
            eps = make_noise(dist, key, K, 8, sig)
            res = mppi_solve(cfg, step, cost, None, x, u_n, noise=eps)
            u_n = jnp.where(alive, res.u_n, jnp.zeros_like(res.u_n))
            x_new = step(*x, u_n[0])
            x = tuple(jnp.where(alive, xn, xo) for xn, xo in zip(x_new, x))
            alive = alive & (jnp.abs(x[2]) <= DEG60)
            c_acc = c_acc + jnp.where(alive, cost(*x), 0.0)
            ess_acc = ess_acc + res.ess
            return (x, u_n, alive, c_acc, ess_acc), None

        keys = jax.random.split(jax.random.fold_in(jax.random.key(20250820),
                                                   seed), N_TICKS)
        carry = (x0, u0, jnp.bool_(True), jnp.float32(0.0), jnp.float32(0.0))
        (x, _, alive, c_acc, ess_acc), _ = jax.lax.scan(tick, carry, keys)
        return alive, c_acc, ess_acc / N_TICKS

    lam_g, sig_g, seed_g = jnp.meshgrid(
        jnp.asarray(LAMBDAS, jnp.float32), jnp.asarray(SIGMAS, jnp.float32),
        jnp.arange(SEEDS), indexing="ij")
    flat = lambda a: a.reshape(-1)

    @jax.jit
    def run():
        return jax.vmap(episode)(flat(lam_g), flat(sig_g), flat(seed_g))

    return run


def main():
    dev = jax.devices()[0]
    rows = []
    per_dist = {}
    for dist in ("gauss", "clt4", "clt4a"):
        alive, cost_tot, ess = (np.asarray(v) for v in make_sweep(dist)())
        shape = (len(LAMBDAS), len(SIGMAS), SEEDS)
        alive = alive.reshape(shape)
        cost_tot = cost_tot.reshape(shape)
        ess = ess.reshape(shape)
        per_dist[dist] = (alive, cost_tot, ess)
        for i, lam in enumerate(LAMBDAS):
            for j, sig in enumerate(SIGMAS):
                rows.append({
                    "dist": dist, "lambda": lam, "sigma": sig,
                    "survival": float(alive[i, j].mean()),
                    "mean_cost_surviving": (
                        float(cost_tot[i, j][alive[i, j]].mean())
                        if alive[i, j].any() else None),
                    "mean_ess": float(ess[i, j].mean()),
                })
        print(f"{dist}: grid survival "
              f"{[round(float(alive[i].mean()), 3) for i in range(len(LAMBDAS))]}",
              flush=True)

    # per-cell deltas vs gauss at MATCHED seeds
    deltas = []
    ga, gc, _ = per_dist["gauss"]
    for dist in ("clt4", "clt4a"):
        da, dc, de = per_dist[dist]
        for i, lam in enumerate(LAMBDAS):
            for j, sig in enumerate(SIGMAS):
                both = ga[i, j] & da[i, j]
                deltas.append({
                    "dist": dist, "lambda": lam, "sigma": sig,
                    "d_survival": float(da[i, j].mean() - ga[i, j].mean()),
                    "cost_ratio": (float(dc[i, j][both].mean() / gc[i, j][both].mean())
                                   if both.any() else None),
                    "min_ess": float(de[i, j].min()),
                })
    worst = max(deltas, key=lambda d: abs(d["d_survival"]))
    payload = {
        "workload": "tune-grid closed loops (10 s, K=8192, matched seeds) — "
                    "noise DISTRIBUTION comparison: exact normals vs the "
                    "3.99σ-truncated integer-CLT samplers",
        "hardware": f"{dev.platform} ({dev.device_kind})",
        "grid": {"lambdas": LAMBDAS, "sigmas": SIGMAS, "seeds": SEEDS,
                 "k": K, "ticks": N_TICKS},
        "cells": rows,
        "deltas_vs_gauss": deltas,
        "max_abs_survival_delta": abs(worst["d_survival"]),
        "worst_cell": worst,
    }
    OUT.write_text(json.dumps(payload, indent=1))
    print(json.dumps({k: payload[k] for k in
                      ("max_abs_survival_delta", "worst_cell")}, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
