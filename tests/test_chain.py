"""Chain-kernel (multi-solve receding horizon in one pallas_call) tests.

Interpret-mode on CPU: shapes/statuses/plant-advance semantics (the
interpreter PRNG is a stub, so sample VALUES are only exercised on real
TPU — tests/test_pallas.py covers value parity via external noise, and the
chain-vs-sequential value parity ran on-chip in round 2: max |Δu₀| ≤ 1e-5
at matched block_sublanes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_rs_tpu.controllers.mppi import MppiConfig
from mpc_rs_tpu.models import costs, dynamics
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.ops.mppi_pallas import mppi_pallas_chain


@pytest.fixture(scope="module")
def setup():
    p = CartPoleParams.single_wheel()
    step = dynamics.make_cartpole_nonlinear(p, 0.1)
    cfg = MppiConfig(n_horizon=8, n_rollouts=512, lambda_=0.5, std_dev=3.0, limit=(-20.0, 20.0))
    x0 = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u0 = jnp.zeros(8, jnp.float32)
    return cfg, step, x0, u0


def test_chain_shapes_and_status(setup):
    cfg, step, x0, u0 = setup
    seeds = jnp.arange(5, dtype=jnp.int32)
    u0s, sts, un = mppi_pallas_chain(
        cfg, step, costs.shaped4, 4, seeds, x0, u0, interpret=True
    )
    assert u0s.shape == (5,) and sts.shape == (5,) and un.shape == (8,)
    assert (np.asarray(sts) == 0).all()
    assert np.isfinite(np.asarray(u0s)).all()


def test_chain_scalar_seed_mode(setup):
    cfg, step, x0, u0 = setup
    u0s, sts, un = mppi_pallas_chain(
        cfg, step, costs.shaped4, 4, None, x0, u0, interpret=True,
        n_solves=6, base_seed=99,
    )
    assert u0s.shape == (6,) and sts.shape == (6,)
    assert (np.asarray(sts) == 0).all()


def test_chain_pad_to_tile(setup):
    """J not a multiple of 8: outputs trimmed to J, final u_n from solve
    J−1 (padding solves must not affect it)."""
    cfg, step, x0, u0 = setup
    seeds = jnp.arange(3, dtype=jnp.int32)
    u0s3, sts3, un3 = mppi_pallas_chain(
        cfg, step, costs.shaped4, 4, seeds, x0, u0, interpret=True
    )
    assert u0s3.shape == (3,)
    # J=8 chain with the same first 3 seeds shares the warm-start prefix
    seeds8 = jnp.arange(8, dtype=jnp.int32)
    u0s8, _, _ = mppi_pallas_chain(
        cfg, step, costs.shaped4, 4, seeds8, x0, u0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u0s3), np.asarray(u0s8[:3]), rtol=1e-6)


def test_chain_all_inf_cost_gives_no_finite(setup):
    cfg, step, x0, u0 = setup
    bad_cost = lambda *xs: jnp.full_like(xs[0], jnp.inf)
    u0s, sts, un = mppi_pallas_chain(
        cfg, step, bad_cost, 4, jnp.arange(4, dtype=jnp.int32), x0, u0, interpret=True
    )
    assert (np.asarray(sts) == 1).all()  # NO_FINITE
    np.testing.assert_array_equal(np.asarray(u0s), 0.0)  # zero fallback
    np.testing.assert_array_equal(np.asarray(un), 0.0)


def test_chain_plant_mode_runs(setup):
    """Closed-loop mode (plant=step) compiles and returns OK statuses.

    The interpreter PRNG stub yields identical samples per block, so chain
    outputs cannot reflect the state dependence here; the on-chip round-2
    validation covered value behavior (chain-vs-sequential max |Δu₀| ≤
    1e-5, and plant-mode survival in bench.py's closed-loop chain)."""
    cfg, step, x0, u0 = setup
    seeds = jnp.arange(8, dtype=jnp.int32)
    u0s_loop, sts, un = mppi_pallas_chain(
        cfg, step, costs.shaped4, 4, seeds, x0, u0, interpret=True, plant=step
    )
    assert (np.asarray(sts) == 0).all()
    assert np.isfinite(np.asarray(u0s_loop)).all() and np.isfinite(np.asarray(un)).all()
