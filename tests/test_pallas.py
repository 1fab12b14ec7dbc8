"""Pallas fused MPPI kernel (TPU interpreter on CPU) + sharded solve.

The interpreter's hardware PRNG is a stub (returns zeros), so kernel-math
parity uses the external-noise mode: identical eps through the kernel and
the vmap reference must agree to f32 precision. The PRNG path is validated
on real TPU by bench.py and the TPU-marked tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_rs_tpu.controllers.mppi import MppiConfig, MppiStatus, rollout_scores
from mpc_rs_tpu.models import costs, dynamics
from mpc_rs_tpu.models.params import CartPoleParams
from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas
from mpc_rs_tpu.parallel import make_mesh, make_sharded_mppi

P = CartPoleParams.single_wheel()
N = 8
BS = 8
LANES = 128


def _cfg(k, lam=0.5):
    return MppiConfig(n_horizon=N, n_rollouts=k, lambda_=lam, std_dev=3.0, limit=(-20.0, 20.0))


def _noise(key, nb):
    return 3.0 * jax.random.normal(key, (nb, N, BS, LANES), dtype=jnp.float32)


def _ref_solve_on_noise(cfg, step, cost, x, u_n, eps):
    """Ground-truth softmax/weighted-average on the same samples (f64)."""
    k = eps.shape[0] * BS * LANES
    eps_kn = np.array(eps).transpose(0, 2, 3, 1).reshape(k, N).astype(np.float64)
    v = np.clip(np.array(u_n, np.float64) + eps_kn, cfg.limit[0], cfg.limit[1])
    s = np.array(
        rollout_scores(step, cost, tuple(jnp.float64(c) for c in np.array(x)), jnp.asarray(v), jnp.asarray(u_n, jnp.float64), cfg.std_dev)
    )
    m = s.max()
    w = np.exp((s - m) / cfg.lambda_)
    return (w / w.sum()) @ v


def test_kernel_exact_parity_same_noise():
    step = dynamics.make_cartpole_nonlinear(P, 0.1)
    nb = 2
    cfg = _cfg(nb * BS * LANES)
    eps = _noise(jax.random.key(0), nb)
    x = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u_n = jnp.zeros(N, jnp.float32)
    u_pal, st = mppi_solve_pallas(
        cfg, step, costs.shaped4, 4, 0, x, u_n, block_sublanes=BS, interpret=True, noise=eps
    )
    assert int(st) == MppiStatus.OK
    want = _ref_solve_on_noise(cfg, step, costs.shaped4, x, u_n, eps)
    np.testing.assert_allclose(np.array(u_pal), want, rtol=1e-3, atol=2e-4)


def test_kernel_streaming_logsumexp_multi_block_invariance():
    """Partials must be independent of block partitioning: solving the same
    samples in 4 blocks vs 1 reshaped super-block gives identical u."""
    step = dynamics.make_double_integrator(0.05)
    nb = 4
    cfg = _cfg(nb * BS * LANES, lam=2.5)
    eps = _noise(jax.random.key(1), nb)
    x = jnp.asarray([1.0, 0.0], jnp.float32)
    u_n = jnp.full((N,), 0.3, jnp.float32)
    u4, st4 = mppi_solve_pallas(
        cfg, step, costs.quad2, 2, 0, x, u_n, block_sublanes=BS, interpret=True, noise=eps
    )
    eps1 = eps.transpose(1, 0, 2, 3).reshape(1, N, nb * BS, LANES)
    u1, st1 = mppi_solve_pallas(
        cfg, step, costs.quad2, 2, 0, x, u_n, block_sublanes=nb * BS, interpret=True, noise=eps1
    )
    np.testing.assert_allclose(np.array(u4), np.array(u1), rtol=2e-4, atol=1e-5)


def test_kernel_warm_start_and_clamp():
    step = dynamics.make_double_integrator(0.05)
    nb = 1
    cfg = _cfg(nb * BS * LANES)
    # huge nominal → samples clamp at the limit → u' must respect limits
    eps = _noise(jax.random.key(2), nb)
    x = jnp.asarray([1.0, 0.0], jnp.float32)
    u_n = jnp.full((N,), 100.0, jnp.float32)
    u, st = mppi_solve_pallas(
        cfg, step, costs.quad2, 2, 0, x, u_n, block_sublanes=BS, interpret=True, noise=eps
    )
    assert int(st) == MppiStatus.OK
    arr = np.array(u)
    assert (arr >= cfg.limit[0] - 1e-5).all() and (arr <= cfg.limit[1] + 1e-5).all()
    np.testing.assert_allclose(arr, cfg.limit[1], atol=1e-4)  # all samples clamp to hi


def test_kernel_no_finite_status():
    step = dynamics.make_double_integrator(0.05)
    bad_cost = lambda a, b: jnp.full_like(a, jnp.inf)
    nb = 1
    cfg = _cfg(nb * BS * LANES)
    eps = _noise(jax.random.key(3), nb)
    u, st = mppi_solve_pallas(
        cfg, step, bad_cost, 2, 0, jnp.asarray([1.0, 0.0], jnp.float32),
        jnp.zeros(N, jnp.float32), block_sublanes=BS, interpret=True, noise=eps,
    )
    assert int(st) == MppiStatus.NO_FINITE
    np.testing.assert_array_equal(np.array(u), 0.0)


def test_sharded_jnp_backend_matches_unsharded_partials():
    """8-device rollout-sharded solve must equal a single-device solve that
    uses the same per-shard keys (the collective log-sum-exp is exact)."""
    step = dynamics.make_cartpole_nonlinear(P, 0.1)
    mesh = make_mesh()
    n_dev = mesh.shape["rollouts"]
    k_local = 512
    cfg = _cfg(n_dev * k_local)
    solve = make_sharded_mppi(cfg, step, costs.shaped4, 4, mesh, backend="jnp")
    x = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u_n = jnp.zeros(N, jnp.float32)
    key = jax.random.key(0)
    u_sh, st = solve(key, x, u_n)
    assert int(st) == MppiStatus.OK

    # replicate: concatenate the per-device sample sets and run the
    # reference softmax on all of them
    vs, ss = [], []
    for d in range(n_dev):
        kd = jax.random.fold_in(key, d)
        eps = 3.0 * jax.random.normal(kd, (k_local, N), dtype=jnp.float32)
        v = jnp.clip(u_n + eps, cfg.limit[0], cfg.limit[1])
        s = rollout_scores(step, costs.shaped4, tuple(x), v, u_n, cfg.std_dev)
        vs.append(np.array(v, np.float64))
        ss.append(np.array(s, np.float64))
    v = np.concatenate(vs)
    s = np.concatenate(ss)
    m = s.max()
    w = np.exp((s - m) / cfg.lambda_)
    want = (w / w.sum()) @ v
    np.testing.assert_allclose(np.array(u_sh), want, rtol=1e-3, atol=5e-4)


def test_sharded_pallas_interpret_on_cpu_mesh():
    """The exact TPU shard_map+pallas code path, interpreted on 8 CPU devices."""
    step = dynamics.make_cartpole_nonlinear(P, 0.1)
    mesh = make_mesh()
    n_dev = mesh.shape["rollouts"]
    cfg = _cfg(n_dev * BS * LANES)
    solve = make_sharded_mppi(
        cfg, step, costs.shaped4, 4, mesh, backend="pallas", block_sublanes=BS, interpret=True
    )
    x = jnp.asarray([0.5, 0.0, 0.1, 0.0], jnp.float32)
    u_n = jnp.zeros(N, jnp.float32)
    u, st = solve(3, x, u_n)
    # interpreter PRNG is a zero-stub ⇒ all samples equal u_n=0 ⇒ u'=0, OK status
    assert int(st) == MppiStatus.OK
    assert np.isfinite(np.array(u)).all()


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs real TPU PRNG")
@pytest.mark.parametrize("sampler,bs", [
    ("box-muller", BS), ("clt4", BS), ("clt2q", BS),
    ("clt4a", 16), ("box-muller-a", 16), ("wallace", BS),
])
def test_kernel_prng_statistics_tpu(sampler, bs):
    """Every in-kernel sampler's noise is mean-zero on real TPU hardware:
    huge λ ⇒ uniform weights ⇒ u' ≈ mean(v) ≈ u_n. The antithetic variants
    are exactly mean-zero per block by construction, so their tolerance is
    the f32 accumulation floor, not the K^-1/2 sampling floor."""
    step = dynamics.make_double_integrator(0.05)
    cfg = _cfg(64 * bs * LANES, lam=1e9)
    u, st = mppi_solve_pallas(
        cfg, step, costs.quad2, 2, 5, jnp.asarray([0.0, 0.0], jnp.float32),
        jnp.zeros(N, jnp.float32), block_sublanes=bs, sampler=sampler,
    )
    assert int(st) == MppiStatus.OK
    atol = 1e-3 if sampler in ("clt4a", "box-muller-a") else 0.05
    np.testing.assert_allclose(np.array(u), 0.0, atol=atol)


def test_batched_kernel_interpret_structure():
    """Scenario-batched kernel: shapes/statuses/per-scenario independence.
    (Interpreter PRNG is a zero stub ⇒ every sample = clip(u_n); the
    weighted average must then equal clip(u_n) per scenario — an exact
    closed-form check of the batched accumulator plumbing.)"""
    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas_batch

    step = dynamics.make_double_integrator(0.05)
    b, k = 16, 2048
    cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=2.5, std_dev=1.0, limit=(-3.0, 3.0))
    u_ns = jnp.tile(jnp.linspace(-5.0, 5.0, 8, dtype=jnp.float32), (b, 1))
    u_ns = u_ns * (jnp.arange(b, dtype=jnp.float32)[:, None] + 1) / b
    xs = jnp.stack([jnp.linspace(-1, 1, b, dtype=jnp.float32), jnp.zeros(b, jnp.float32)], axis=-1)
    u, st = mppi_solve_pallas_batch(
        cfg, step, costs.quad2, 2, jnp.arange(b, dtype=jnp.int32), xs, u_ns,
        interpret=True, block_sublanes=8,
    )
    assert u.shape == (b, 8) and st.shape == (b,)
    assert (np.array(st) == 0).all()
    np.testing.assert_allclose(
        np.array(u), np.clip(np.array(u_ns), -3.0, 3.0), rtol=1e-5, atol=1e-6
    )


def test_kernel_exact_k_masking():
    """Non-block-multiple K must use exactly K rollouts: with external noise
    where the padded tail carries a poison value, results must match the
    reference restricted to the first K samples."""
    step = dynamics.make_double_integrator(0.05)
    k_exact = BS * LANES + 300  # 1324: 300 rollouts into a second block
    cfg = MppiConfig(n_horizon=N, n_rollouts=k_exact, lambda_=2.5, std_dev=1.0, limit=(-3.0, 3.0))
    nb = 2
    eps = _noise(jax.random.key(9), nb) / 3.0
    # poison the padding region: if it leaked into the softmax the result
    # would shift drastically (huge positive score samples)
    eps_np = np.array(eps)
    flat_idx = np.arange(nb * BS * LANES).reshape(nb, BS, LANES)
    pad_mask = flat_idx >= k_exact
    # poison: favorable identical samples that would dominate the softmax
    # if the padding leaked past K (optimal control from x=(1,0) is ~-1.2)
    for t in range(N):
        eps_np[:, t][pad_mask] = -1.2
    x = jnp.asarray([1.0, 0.0], jnp.float32)
    u_n = jnp.zeros(N, jnp.float32)
    u_pal, st = mppi_solve_pallas(
        cfg, step, costs.quad2, 2, 0, x, u_n,
        block_sublanes=BS, interpret=True, noise=jnp.asarray(eps_np),
    )
    assert int(st) == MppiStatus.OK
    # reference on exactly the first K samples
    eps_kn = eps_np.transpose(0, 2, 3, 1).reshape(-1, N)[:k_exact]
    v = np.clip(eps_kn, -3.0, 3.0)
    s = np.array(rollout_scores(step, costs.quad2, (jnp.float64(1.0), jnp.float64(0.0)),
                                jnp.asarray(v, jnp.float64), jnp.zeros(N, jnp.float64), 1.0))
    w = np.exp((s - s.max()) / 2.5)
    want = (w / w.sum()) @ v
    np.testing.assert_allclose(np.array(u_pal), want, rtol=5e-4, atol=5e-4)


def test_batched_kernel_exact_parity_same_noise():
    """Batched kernel vs reference on identical per-scenario noise — also
    exercises the batched exact-K mask with poisoned padding."""
    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas_batch

    step = dynamics.make_double_integrator(0.05)
    b = 8
    nb = 2
    k_exact = BS * LANES + 200  # second block partially used
    cfg = MppiConfig(n_horizon=N, n_rollouts=k_exact, lambda_=2.5, std_dev=1.0, limit=(-3.0, 3.0))
    eps = np.array(jax.random.normal(jax.random.key(11), (b, nb, N, BS, LANES), dtype=jnp.float32))
    flat_idx = np.arange(nb * BS * LANES).reshape(nb, BS, LANES)
    pad = flat_idx >= k_exact
    for t in range(N):
        eps[:, :, t][np.broadcast_to(pad, (b, nb, BS, LANES))] = -1.2  # poison
    xs = np.stack([np.linspace(-1, 1, b), np.zeros(b)], axis=-1).astype(np.float32)
    u_ns = np.zeros((b, N), np.float32)
    u, st = mppi_solve_pallas_batch(
        cfg, step, costs.quad2, 2, jnp.zeros(b, jnp.int32), jnp.asarray(xs),
        jnp.asarray(u_ns), interpret=True, block_sublanes=BS, noise=jnp.asarray(eps),
    )
    assert (np.array(st) == 0).all()
    for s_i in range(b):
        eps_kn = eps[s_i].transpose(0, 2, 3, 1).reshape(-1, N)[:k_exact]
        v = np.clip(eps_kn, -3.0, 3.0)
        sc = np.array(rollout_scores(
            step, costs.quad2, tuple(jnp.float64(c) for c in xs[s_i]),
            jnp.asarray(v, jnp.float64), jnp.zeros(N, jnp.float64), 1.0))
        w = np.exp((sc - sc.max()) / 2.5)
        want = (w / w.sum()) @ v
        np.testing.assert_allclose(np.array(u[s_i]), want, rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("sampler", ["clt4", "clt2q"])
def test_batched_kernel_clt_sampler_interpret(sampler):
    """CLT samplers through the batched kernel (interpret): the zero-stub
    PRNG makes every sample the deterministic transform of w=0, so the
    uniform-weight average must equal clip(u_n + z(0)) — an exact
    end-to-end check that the in-kernel integer math matches the NumPy
    mirror pinned by tests/test_fastmath.py::test_clt_sampler_distribution."""
    from tests.test_fastmath import _clt2q_transform, _clt4_transform

    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas_batch

    step = dynamics.make_double_integrator(0.05)
    b, k, sd = 8, 2048, 1.7
    cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=2.5, std_dev=sd, limit=(-9.0, 9.0))
    u_ns = jnp.tile(jnp.linspace(-2.0, 2.0, 8, dtype=jnp.float32), (b, 1))
    xs = jnp.zeros((b, 2), jnp.float32)
    u, st = mppi_solve_pallas_batch(
        cfg, step, costs.quad2, 2, jnp.arange(b, dtype=jnp.int32), xs, u_ns,
        interpret=True, block_sublanes=8, sampler=sampler,
    )
    assert (np.array(st) == 0).all()
    w0 = np.zeros(1, np.uint32)
    z0 = _clt4_transform(w0, sd) if sampler == "clt4" else _clt2q_transform(w0, sd)[:1]
    expect = np.clip(np.array(u_ns) + z0[0], -9.0, 9.0)
    np.testing.assert_allclose(np.array(u), expect, rtol=1e-5, atol=1e-5)


def test_fleet_kernel_exact_parity_same_noise():
    """Single-k-block (fleet-shape) batched kernel — the 8-scenarios-per-
    grid-step unrolled variant — vs the vmap reference on identical noise,
    including the exact-K mask with poisoned padding."""
    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas_batch

    step = dynamics.make_double_integrator(0.05)
    b = 16
    k_exact = BS * LANES - 300  # single block, partially used
    cfg = MppiConfig(n_horizon=N, n_rollouts=k_exact, lambda_=2.5, std_dev=1.0, limit=(-3.0, 3.0))
    eps = np.array(jax.random.normal(jax.random.key(5), (b, 1, N, BS, LANES), dtype=jnp.float32))
    flat_idx = np.arange(BS * LANES).reshape(1, BS, LANES)
    pad = flat_idx >= k_exact
    for t in range(N):
        eps[:, :, t][np.broadcast_to(pad, (b, 1, BS, LANES))] = 55.5  # poison
    xs = np.stack([np.linspace(-1, 1, b), 0.1 * np.ones(b)], axis=-1).astype(np.float32)
    u_ns = np.tile(np.linspace(-0.5, 0.5, N, dtype=np.float32), (b, 1))
    u, st = mppi_solve_pallas_batch(
        cfg, step, costs.quad2, 2, jnp.zeros(b, jnp.int32), jnp.asarray(xs),
        jnp.asarray(u_ns), interpret=True, block_sublanes=BS, noise=jnp.asarray(eps),
    )
    assert (np.array(st) == 0).all()
    for s_i in range(b):
        eps_kn = eps[s_i].transpose(0, 2, 3, 1).reshape(-1, N)[:k_exact]
        v = np.clip(u_ns[s_i] + eps_kn, -3.0, 3.0)
        sc = np.array(rollout_scores(
            step, costs.quad2, tuple(jnp.float64(c) for c in xs[s_i]),
            jnp.asarray(v, jnp.float64), jnp.asarray(u_ns[s_i], jnp.float64), 1.0))
        w = np.exp((sc - sc.max()) / 2.5)
        want = (w / w.sum()) @ v
        np.testing.assert_allclose(np.array(u[s_i]), want, rtol=1e-3, atol=5e-4)


def test_batched_kernel_clt4a_antithetic_interpret():
    """Antithetic clt4 ('clt4a') through the batched kernel (interpret):
    the zero-stub PRNG makes every pair (+e0, −e0) with e0 = clt4(w=0)·σ;
    with uniform-ish weights (huge λ) and a box wide enough that neither
    side clips, the pair average cancels exactly back to clip(u_n) — an
    end-to-end check of the half-width sampling + two half-block stores.
    Per-sample distribution equals clt4's (z and −z are equidistributed),
    so the clt4 distribution tests cover it."""
    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas_batch

    step = dynamics.make_double_integrator(0.05)
    b, k, sd = 8, 2048, 1.7
    cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=1e9, std_dev=sd, limit=(-9.0, 9.0))
    u_ns = jnp.tile(jnp.linspace(-2.0, 2.0, 8, dtype=jnp.float32), (b, 1))
    xs = jnp.zeros((b, 2), jnp.float32)
    u, st = mppi_solve_pallas_batch(
        cfg, step, costs.quad2, 2, jnp.arange(b, dtype=jnp.int32), xs, u_ns,
        interpret=True, block_sublanes=16, sampler="clt4a",
    )
    assert (np.array(st) == 0).all()
    np.testing.assert_allclose(np.array(u), np.array(u_ns), rtol=1e-5, atol=1e-5)


def test_clt4a_rejects_narrow_blocks():
    """clt4a requires block_sublanes % 16 == 0 (the antithetic halves are
    sublane-tiled); narrower blocks must fail loudly, not mis-sample."""
    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas_batch

    step = dynamics.make_double_integrator(0.05)
    cfg = MppiConfig(n_horizon=8, n_rollouts=1024, lambda_=2.5, std_dev=1.0, limit=(-3.0, 3.0))
    with pytest.raises(ValueError, match="clt4a"):
        mppi_solve_pallas_batch(
            cfg, step, costs.quad2, 2, jnp.arange(8, dtype=jnp.int32),
            jnp.zeros((8, 2), jnp.float32), jnp.zeros((8, 8), jnp.float32),
            interpret=True, block_sublanes=8, sampler="clt4a",
        )


def test_batched_kernel_bm_antithetic_interpret():
    """Antithetic Box-Muller ('box-muller-a') plumbing: the zero-stub PRNG
    gives u1=1 → r=0 → ε=0, so every sample in BOTH halves must equal
    clip(u_n) and the weighted average returns clip(u_n) exactly. Marginals
    are exact normals on hardware (r,ang math identical to box-muller at
    half width; ±ε equidistributed)."""
    from mpc_rs_tpu.ops.mppi_pallas import mppi_solve_pallas_batch

    step = dynamics.make_double_integrator(0.05)
    b, k = 8, 2048
    cfg = MppiConfig(n_horizon=8, n_rollouts=k, lambda_=2.5, std_dev=1.7, limit=(-3.0, 3.0))
    u_ns = jnp.tile(jnp.linspace(-5.0, 5.0, 8, dtype=jnp.float32), (b, 1))
    xs = jnp.zeros((b, 2), jnp.float32)
    u, st = mppi_solve_pallas_batch(
        cfg, step, costs.quad2, 2, jnp.arange(b, dtype=jnp.int32), xs, u_ns,
        interpret=True, block_sublanes=16, sampler="box-muller-a",
    )
    assert (np.array(st) == 0).all()
    np.testing.assert_allclose(
        np.array(u), np.clip(np.array(u_ns), -3.0, 3.0), rtol=1e-5, atol=1e-6
    )
