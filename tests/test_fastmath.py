"""Tolerance bounds for ops.fastmath and the fast-dynamics variants.

Exact-parity tests elsewhere keep fast=False; these pin the documented
error budget of the fast path (VERDICT round-1 item 4b: tolerance-tested
fast transcendentals behind a flag)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_rs_tpu.ops import fastmath as fm


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_fsin_fcos_bounds(rng):
    x = jnp.asarray(rng.uniform(-100.0, 100.0, 200_000), jnp.float32)
    assert float(jnp.max(jnp.abs(fm.fsin(x) - jnp.sin(x)))) < 1e-5
    assert float(jnp.max(jnp.abs(fm.fcos(x) - jnp.cos(x)))) < 1e-5
    s, c = fm.fsincos(x)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(fm.fsin(x)))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(fm.fcos(x)))


def test_fsin_finite_for_huge_inputs():
    x = jnp.asarray([1e6, -1e6, 3.4e37, -3.4e37], jnp.float32)
    assert np.isfinite(np.asarray(fm.fsin(x))).all()
    assert np.isfinite(np.asarray(fm.fcos(x))).all()


def test_flog_bounds(rng):
    # Box-Muller domain: u ∈ (0, 1]; also check >1 values
    u = jnp.asarray(rng.uniform(1e-7, 100.0, 200_000), jnp.float32)
    assert float(jnp.max(jnp.abs(fm.flog(u) - jnp.log(u)))) < 2e-6


def test_fsqrt_frsqrt_bounds(rng):
    x = jnp.asarray(rng.uniform(1e-6, 1e4, 200_000), jnp.float32)
    rel = jnp.abs(fm.fsqrt(x) - jnp.sqrt(x)) / jnp.sqrt(x)
    assert float(jnp.max(rel)) < 1e-6
    rel = jnp.abs(fm.frsqrt(x) - jax.lax.rsqrt(x)) * jnp.sqrt(x)
    assert float(jnp.max(rel)) < 1e-6


def test_fast_dynamics_close_to_exact():
    from mpc_rs_tpu.models import dynamics
    from mpc_rs_tpu.models.params import CartPoleParams

    rng = np.random.default_rng(7)
    p = CartPoleParams.single_wheel()
    a = dynamics.make_cartpole_nonlinear(p, 0.1)
    b = dynamics.make_cartpole_nonlinear(p, 0.1, fast=True)
    xs = rng.uniform(-2.0, 2.0, (500, 4)).astype(np.float32)
    us = rng.uniform(-20.0, 20.0, 500).astype(np.float32)
    for x, u in zip(xs[:50], us[:50]):
        ra = np.asarray(a(*map(jnp.float32, x), jnp.float32(u)))
        rb = np.asarray(b(*map(jnp.float32, x), jnp.float32(u)))
        np.testing.assert_allclose(ra, rb, atol=5e-5)

    # flagship: 1/d with d near-singular amplifies the trig error; bound
    # relative instead
    p2 = CartPoleParams.two_wheel()
    a4 = dynamics.make_flagship4(p2, 0.15)
    b4 = dynamics.make_flagship4(p2, 0.15, fast=True)
    for x, u in zip(xs[:50], us[:50]):
        ra = np.asarray(a4(*map(jnp.float32, x), jnp.float32(u)))
        rb = np.asarray(b4(*map(jnp.float32, x), jnp.float32(u)))
        np.testing.assert_allclose(ra, rb, rtol=2e-4, atol=2e-4)


def test_fast_mppi_solution_close():
    """Same threefry noise through the vmap solver with exact vs fast
    dynamics: returned sequences agree to well under the sampling noise."""
    from mpc_rs_tpu.controllers.mppi import MppiConfig, mppi_solve
    from mpc_rs_tpu.models import costs, dynamics
    from mpc_rs_tpu.models.params import CartPoleParams

    p = CartPoleParams.single_wheel()
    cfg = MppiConfig(n_horizon=8, n_rollouts=2048, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
    key = jax.random.key(3)
    x = (jnp.float32(0.5), jnp.float32(0.0), jnp.float32(0.1), jnp.float32(0.0))
    u0 = jnp.zeros(8, jnp.float32)
    re = mppi_solve(cfg, dynamics.make_cartpole_nonlinear(p, 0.1), costs.shaped4, key, x, u0)
    rf = mppi_solve(cfg, dynamics.make_cartpole_nonlinear(p, 0.1, fast=True), costs.shaped4, key, x, u0)
    assert int(re.status) == 0 and int(rf.status) == 0
    np.testing.assert_allclose(np.asarray(re.u_n), np.asarray(rf.u_n), atol=2e-3)


def test_fdiv_exact_outside_kernel(rng):
    """Outside a Pallas kernel body, fdiv/freciprocal must be plain
    single-rounding division — bit-identical, so the vmap tier's
    exact-vs-fast comparisons don't absorb an extra rounding."""
    num = jnp.asarray(rng.uniform(0.01, 10.0, 4096), jnp.float32)
    den = jnp.asarray(rng.uniform(0.5, 2.0, 4096), jnp.float32)
    np.testing.assert_array_equal(np.asarray(fm.fdiv(num, den)), np.asarray(num / den))
    np.testing.assert_array_equal(
        np.asarray(jax.jit(fm.freciprocal)(den)), np.asarray(1.0 / den)
    )


def test_fdiv_hw_rcp_in_kernel(rng):
    """Inside hw_rcp_scope (entered by the MPPI kernel bodies), fdiv emits
    the hardware approximate reciprocal. On TPU its measured max rel error
    is 1.6e-5 (v5e, [1e-3, 10]); assert the documented 3e-5 budget there.
    Interpret mode emulates a coarser rcp (~4e-3 measured), so CPU runs
    assert that looser envelope — both are far below the MPPI sampling
    noise the fast path is allowed to live under."""
    from jax.experimental import pallas as pl

    den = jnp.asarray(rng.uniform(0.5, 2.0, (8, 128)), jnp.float32)

    def kernel(d_ref, o_ref):
        with fm.hw_rcp_scope():
            o_ref[...] = fm.fdiv(jnp.float32(1.0), d_ref[...])

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(den)
    rel = np.abs(np.asarray(out) * np.asarray(den, np.float64) - 1.0)
    assert rel.max() < (5e-3 if interpret else 3e-5)


def _clt4_transform(w, std_dev=1.0):
    """NumPy mirror of the kernel's clt4 sampler math (mppi_pallas._fill_vbuf):
    sum of four 8-bit uniforms from one word + cubic tail correction."""
    from mpc_rs_tpu.ops import mppi_pallas as mp

    x2 = (w & 0x00FF00FF) + ((w >> 8) & 0x00FF00FF)
    s4 = ((x2 & 0xFFFF) + (x2 >> 16)).astype(np.float64)
    z = (s4 - 510.0) * mp._CLT_INV_SIG
    return z * (mp._CLT_A * std_dev + mp._CLT_B * std_dev * z * z)


def _clt2q_transform(w, std_dev=1.0):
    """NumPy mirror of the kernel's clt2q sampler (two normals per word)."""
    from mpc_rs_tpu.ops import mppi_pallas as mp

    x2 = (w & 0x00FF00FF) + ((w >> 8) & 0x00FF00FF)
    z = np.concatenate([
        ((x2 & 0xFFFF).astype(np.float64) - 255.0) * mp._TRI_INV_SIG,
        ((x2 >> 16).astype(np.float64) - 255.0) * mp._TRI_INV_SIG,
    ])
    s = z * z
    return z * (mp._TRI_A * std_dev + s * (mp._TRI_B * std_dev + mp._TRI_C * std_dev * s))


@pytest.mark.parametrize("transform,ks_budget", [(_clt4_transform, 0.005), (_clt2q_transform, 0.012)])
def test_clt_sampler_distribution(transform, ks_budget):
    """The CLT samplers' transforms produce (approximately) standard normals:
    mean/var/kurtosis moment-matched, KS distance within the documented
    budget, tails within 20% of exact normal mass beyond 2σ. The transform
    is pure integer/poly math — bit-identical between this NumPy mirror and
    the Mosaic kernel — so the TPU-side property reduces to the hardware
    PRNG's word uniformity (covered by test_kernel_prng_statistics_tpu)."""
    rng = np.random.default_rng(7)
    w = rng.integers(0, 1 << 32, size=1 << 22, dtype=np.uint32)
    z = transform(w)
    assert abs(z.mean()) < 5e-3
    assert abs(z.var() - 1.0) < 5e-3
    kurt = ((z - z.mean()) ** 4).mean() / z.var() ** 2
    assert abs(kurt - 3.0) < 0.02
    # empirical KS vs the normal CDF (scipy-free: direct sup |F̂ − Φ|)
    zs = np.sort(z[: 1 << 20])
    from math import erf, sqrt

    grid = np.linspace(-3.5, 3.5, 141)
    phi = np.array([0.5 * (1 + erf(g / sqrt(2))) for g in grid])
    fhat = np.searchsorted(zs, grid) / len(zs)
    assert np.abs(fhat - phi).max() < ks_budget
    p2 = (np.abs(z) > 2.0).mean()
    assert 0.8 * 0.0455 < p2 < 1.2 * 0.0455


def test_clt_sampler_scales_by_std_dev():
    rng = np.random.default_rng(3)
    w = rng.integers(0, 1 << 32, size=1 << 20, dtype=np.uint32)
    z3 = _clt4_transform(w, std_dev=3.0)
    assert abs(z3.std() - 3.0) < 0.02
