"""Fused estimator-chain kernel (ops/estimator_pallas.py) — interpret-mode
parity vs the plain SoA functions it wraps.

Small dims (n=2 states, o=1 obs) keep the interpret-mode CPU compile in
seconds; the flagship-dims kernel is validated on hardware (survival gates
+ tick split). Parity is exact: the kernel runs literally the same
soa_predict/soa_update/soa_guard trace on reshaped tiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_rs_tpu.estimators import ukf_soa
from mpc_rs_tpu.estimators.ukf import ukf_init
from mpc_rs_tpu.ops.estimator_pallas import make_estimator_chain


def _setup(b=8, n_substeps=2, disturbance=None, control_start=0.0,
           substep_loop=None, sublanes=1):
    dt = 0.05

    def plant_c(xs, u, f):
        x0, x1 = xs
        return (x0 + x1 * dt, x1 + (u - 0.5 * x0 + f) * dt)

    def fx_c(xs, u):
        x0, x1 = xs
        return (x0 + x1 * dt, x1 + (u - 0.5 * x0) * dt)

    def hx_c(xs):
        return (xs[1] * 2.0,)

    q = 0.01 * np.eye(2)
    r = np.array([[0.25]])
    sig = np.array([0.5])
    p0 = 0.1 * np.eye(2)
    # alpha=1: O(1) Merwe weights. The default alpha=1e-3 gives |wc0|~1e6
    # weights that amplify the interpreter's ~1e-4 op-reordering noise into
    # the percent range after two updates — this test pins the KERNEL
    # PLUMBING bit-for-bit-ish; the small-alpha numerics are pinned by
    # tests/test_ukf_soa.py and the on-chip fleet survival gates.
    params, _ = ukf_init(jnp.zeros(2), jnp.asarray(p0), jnp.asarray(q),
                         jnp.asarray(r), alpha=1.0)
    chain = make_estimator_chain(
        params, plant_c, fx_c, hx_c, q, r, sig, p0, n_substeps, dt,
        disturbance=disturbance, control_start=control_start, interpret=True,
        substep_loop=substep_loop, sublanes=sublanes,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 2)) * 0.3)
    ex = jnp.asarray(rng.normal(size=(b, 2)) * 0.2)
    pp = jnp.broadcast_to(jnp.asarray(p0.reshape(4))[:, None], (4, b))
    u0 = jnp.asarray(rng.normal(size=b))
    t = jnp.asarray(np.linspace(0.0, 1.0, b))
    nz = jnp.asarray(rng.normal(size=(n_substeps, b)))
    return (params, plant_c, fx_c, hx_c, q, r, sig, p0, dt,
            chain, (x, ex, pp, u0, t, nz.reshape(n_substeps * 1, b)))


def _reference(params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, args,
               n_substeps, disturbance=None, control_start=0.0):
    # the kernel computes in f32 (its I/O packing casts); match it exactly
    x, ex, pp, u0, t, nz = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32), args)
    q, r, sig, p0 = (np.asarray(m, np.float32) for m in (q, r, sig, p0))
    b = x.shape[0]
    if control_start > 0.0:
        u0 = jnp.where(t >= control_start, u0, 0.0)
    soa = ukf_soa.SoaUkfState(
        x=tuple(ex[:, i] for i in range(2)),
        p=tuple(tuple(pp[i * 2 + j] for j in range(2)) for i in range(2)),
        sigma_f=tuple(tuple(jnp.zeros(b) for _ in range(2)) for _ in range(5)),
    )
    xs = tuple(x[:, i] for i in range(2))
    for s in range(n_substeps):
        f = disturbance(t + s * dt) if disturbance else jnp.zeros(b)
        xs = plant_c(xs, u0, f)
        z = (hx_c(xs)[0] + sig[0] * nz[s],)
        soa = ukf_soa.soa_predict(params, soa, u0, fx_c, q)
        soa = ukf_soa.soa_update(params, soa, z, hx_c, r)
        soa = ukf_soa.soa_guard(soa, p0)
    return (jnp.stack(xs, -1), jnp.stack(soa.x, -1),
            jnp.stack([soa.p[i][j] for i in range(2) for j in range(2)]))


@pytest.mark.parametrize("substep_loop", [False, True])
def test_chain_matches_soa_path(substep_loop):
    (params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, chain, args) = _setup(
        substep_loop=substep_loop)
    got = chain(*args)
    want = _reference(params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, args, 2)
    for g, w, nm in zip(got, want, ("x", "ukf_x", "p")):
        np.testing.assert_allclose(np.array(g), np.array(w, np.float32),
                                   rtol=2e-5, atol=2e-6, err_msg=nm)


@pytest.mark.parametrize("substep_loop", [False, True])
def test_chain_disturbance_and_gating(substep_loop):
    dist = lambda tt: jnp.where(tt > 0.5, 2.0, 0.0)
    (params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, chain, args) = _setup(
        disturbance=dist, control_start=0.4, substep_loop=substep_loop)
    got = chain(*args)
    want = _reference(params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, args, 2,
                      disturbance=dist, control_start=0.4)
    for g, w, nm in zip(got, want, ("x", "ukf_x", "p")):
        np.testing.assert_allclose(np.array(g), np.array(w, np.float32),
                                   rtol=2e-5, atol=2e-6, err_msg=nm)


def test_chain_sublanes_parity():
    """sublanes=2 runs (2, 128) VMEM tiles (half the grid steps); results
    must match the SoA reference exactly like the bs=1 layout does."""
    (params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, chain, args) = _setup(
        b=256, sublanes=2, substep_loop=True)
    got = chain(*args)
    want = _reference(params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, args, 2)
    for g, w, nm in zip(got, want, ("x", "ukf_x", "p")):
        np.testing.assert_allclose(np.array(g), np.array(w, np.float32),
                                   rtol=2e-5, atol=2e-6, err_msg=nm)


def test_chain_guard_recovers_nan_scenarios():
    (params, plant_c, fx_c, hx_c, q, r, sig, p0, dt, chain, args) = _setup()
    x, ex, pp, u0, t, nz = args
    ex = ex.at[3, 0].set(jnp.nan)  # scenario 3's estimator corrupted
    got = chain(x, ex, pp, u0, t, nz)
    assert np.isfinite(np.array(got[1])).all()  # guard zeroed the bad mean
    # guard fires inside substep 1 (reset to p0), substep 2 then evolves the
    # clean filter — final P must be finite with positive variances
    p_out = np.array(got[2]).reshape(2, 2, -1)
    assert np.isfinite(p_out).all()
    assert (p_out[0, 0] > 0).all() and (p_out[1, 1] > 0).all()
