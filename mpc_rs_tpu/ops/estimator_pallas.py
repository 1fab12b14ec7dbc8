"""Fused plant→sensor→UKF estimator-chain Pallas kernel for scenario fleets.

Why this kernel exists (round 3): after the MPPI kernel reached its
roofline, the flagship fleet tick still carried a ~0.42 ms residual. The
round-3 trace (907 XLA ops/tick) showed the SoA estimator's (B,) entries
compiled to ``f32[1024,1]{T(8,128)}`` — XLA put the batch on the SUBLANE
axis with ONE lane live, so every "lane-dense" op used 1/128 of the VPU,
and the UT outer-product stacks round-tripped HBM between fusions. Inside
a Pallas kernel WE pick the layout: every component is a (bs, 128) VMEM
tile (bs = block/128), the whole substepped plant + sensor + UKF
predict/update/guard chain runs in one launch with zero HBM round-trips
between its ~1k elementwise ops, and the batch genuinely rides the lanes.

The math is literally ``estimators.ukf_soa`` — the same ``soa_predict`` /
``soa_update`` / ``soa_guard`` functions are traced inside the kernel on
(bs, 128) components, so algorithmic parity with the reference
(src/ukf.rs predict/update, eigen-direction sigma placement, symmetrized
P) is inherited rather than re-implemented. Replaces the per-tick XLA
chain of parallel/scenario.py::rest_soa (the dynamics/UKF threads of
mppi4-non-liner-ukf.rs:224-288, batched over B scenarios).

I/O packing: ONE (R, B) f32 input carrying [plant x | ukf x | packed P |
u0 | t | sensor noise] rows and one (S + n + n², B) output — a single
transpose/concat on each side instead of per-entry slice/stack floods.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_rs_tpu.estimators.ukf_soa import (
    SoaUkfState,
    soa_guard,
    soa_predict,
    soa_update,
)

_LANES = 128


def _np_params(params):
    """UkfParams with plain-float weights — kernel-safe closure constants."""
    wm = np.asarray(params.wm, np.float64)
    wc = np.asarray(params.wc, np.float64)
    return params._replace(
        wm=tuple(float(v) for v in wm),
        wc=tuple(float(v) for v in wc),
        c=float(params.c),
    )


def make_estimator_chain(
    params,
    plant_c: Callable,  # (xs: tuple S, u, f) -> tuple S — substep dt baked in
    fx_c: Callable,  # UKF process model, component form
    hx_c: Callable,  # observation model, component form
    q,  # (n, n) additive process noise (build-time constants)
    r,  # (o, o) additive measurement noise (build-time constants)
    sig,  # (o,) sensor noise std devs (build-time constants)
    p_reset,  # (n, n) NaN-recovery covariance, or None
    n_substeps: int,
    dt_sub: float,
    *,
    disturbance: Callable | None = None,  # traceable f(t) -> force
    control_start: float = 0.0,
    interpret: bool = False,
    soa_mode: str = "stacked",  # "stacked": same path as the jnp tier (small
    # trace — the fully entrywise form SIGKILLed the Mosaic compile helper
    # at ~272 KB of MLIR); "entry": pure 2-D entrywise ops
    substep_loop: bool | None = None,  # run the substep chain as ONE
    # lax.fori_loop body instead of a python unroll: the Mosaic trace (and
    # its per-live-value scoped-vmem stack) shrinks by n_substeps. Default:
    # on whenever n_substeps > 1 (the 5-substep cartpole4 unroll is what
    # pushed the remote compile helper past its memory kill line).
    sublanes: int = 1,  # VMEM tile height bs: each component is a
    # (bs, 128) tile, so bs=8 uses the full (8, 128) VPU tile while bs=1
    # uses 1/8 of the sublanes. Capped by the Mosaic scoped-vmem stack
    # (one bs·128·4-byte slot per live trace value) — measured limits in
    # scripts/diag_estimator_chain.py.
):
    """Returns ``chain(x_plant (B,S), ukf_x (B,n), p_packed (n²,B), u0 (B,),
    t (B,), noise (n_substeps·o, B)) -> (x' (B,S), ukf_x' (B,n), p' (n²,B))``.

    One fused kernel per control tick; requires B % 128 == 0 on hardware
    (any B in interpret mode)."""
    params = _np_params(params)
    n, o = params.n, params.n_obs
    # plain Python floats are weakly typed: no f64 promotion of the f32
    # kernel values under jax_enable_x64 (CPU interpret tests)
    as_rows = lambda m, d: [[float(v) for v in row] for row in np.asarray(m, np.float64)[:d]]
    q_np = as_rows(q, None)
    r_np = as_rows(r, None)
    sig_np = [float(v) for v in np.asarray(sig, np.float64)]
    p_reset_np = None if p_reset is None else as_rows(p_reset, None)
    n2 = n * n
    use_loop = n_substeps > 1 if substep_loop is None else substep_loop

    @jax.jit
    def chain(x_plant, ukf_x, p_packed, u0, t, noise):
        b, s_dim = x_plant.shape
        rows_in = s_dim + n + n2 + 2 + n_substeps * o
        rows_out = s_dim + n + n2

        def kernel(in_ref, out_ref):
            comp = lambda r_: in_ref[r_, 0]
            x = [comp(i) for i in range(s_dim)]
            ex = tuple(comp(s_dim + i) for i in range(n))
            base = s_dim + n
            prows = tuple(
                tuple(comp(base + i * n + j) for j in range(n)) for i in range(n)
            )
            u = comp(base + n2)
            tt = comp(base + n2 + 1)
            nz0 = base + n2 + 2
            if control_start > 0.0:
                u = jnp.where(tt >= jnp.float32(control_start), u, 0.0)
            zero = jnp.zeros_like(u)
            # dead placeholder — first predict overwrites before update reads
            dead_sigma = tuple(
                jnp.zeros((2 * n + 1,) + u.shape, u.dtype) for _ in range(n)
            )

            def substep(i, x, soa):
                """One plant+sensor+UKF substep. ``i`` may be a python int
                (unrolled trace) or an int32 tracer (fori_loop body)."""
                if disturbance is None:
                    x = plant_c(tuple(x), u, zero)
                else:
                    # python-int i keeps the offset exact (f64 at trace time,
                    # matching the unrolled golden); tracer i computes in f32
                    off = (jnp.float32(i * dt_sub) if isinstance(i, int)
                           else jnp.float32(dt_sub) * i)
                    x = plant_c(tuple(x), u, disturbance(tt + off))
                x = tuple(jnp.broadcast_to(c_, u.shape) for c_ in x)
                hz = hx_c(x)
                z = tuple(
                    hz[j] + sig_np[j] * in_ref[nz0 + i * o + j, 0]
                    for j in range(o)
                )
                soa = soa_predict(params, soa, u, fx_c, q_np, mode=soa_mode,
                                  unroll_sum=True)
                soa = soa_update(params, soa, z, hx_c, r_np, mode=soa_mode,
                                 unroll_sum=True)
                if p_reset_np is not None:
                    soa = soa_guard(soa, p_reset_np, mode="entry")  # no leading-axis reduce in Mosaic
                return x, soa

            soa = SoaUkfState(x=ex, p=prows, sigma_f=dead_sigma)
            if use_loop:
                def body(i, carry):
                    x_, ex_, p_ = carry
                    x_, soa_ = substep(i, x_, SoaUkfState(x=ex_, p=p_, sigma_f=dead_sigma))
                    return x_, soa_.x, soa_.p

                x, ex_f, p_f = jax.lax.fori_loop(
                    0, n_substeps, body, (tuple(x), soa.x, soa.p)
                )
                soa = SoaUkfState(x=ex_f, p=p_f, sigma_f=dead_sigma)
            else:
                x = tuple(x)
                for i in range(n_substeps):
                    x, soa = substep(i, x, soa)
            for i in range(s_dim):
                out_ref[i, 0] = x[i]
            for i in range(n):
                out_ref[s_dim + i, 0] = soa.x[i]
            for i in range(n):
                for j in range(n):
                    out_ref[s_dim + n + i * n + j, 0] = soa.p[i][j]

        if b % _LANES == 0:
            # Default bs=1: Mosaic stack-allocates one slot per live trace
            # value and this kernel's unrolled entrywise trace is ~8k values
            # — at bs=8 that is a 61.6 MB scoped-vmem stack (measured OOM vs
            # the 16 MB v5e VMEM); at bs=1 it fits with room for the I/O
            # blocks. (1, 128) tiles use 1/8 of the VPU's sublanes, which is
            # still 16× denser than the f32[B,1] layout XLA chose for this
            # chain. With substep_loop the live set shrinks by n_substeps,
            # so larger ``sublanes`` may fit — pass it explicitly.
            bs = sublanes
            blk = bs * _LANES
            lanes = _LANES
            if b % blk:
                raise ValueError(f"B={b} must be a multiple of sublanes*128={blk}")
        else:
            if not interpret:
                raise ValueError(f"B={b} must be a multiple of 128 on hardware")
            if sublanes != 1:
                raise ValueError(
                    f"sublanes={sublanes} requires B % 128 == 0 (got B={b}); the"
                    " interpret fallback would silently run the bs=1 layout")
            bs, blk, lanes = 1, b, b
        g = b // blk
        packed = jnp.concatenate(
            [
                x_plant.T.astype(jnp.float32),
                ukf_x.T.astype(jnp.float32),
                p_packed.astype(jnp.float32),
                u0.astype(jnp.float32)[None, :],
                t.astype(jnp.float32)[None, :],
                noise.astype(jnp.float32),
            ],
            axis=0,
        ).reshape(rows_in, g, bs, lanes)
        out = pl.pallas_call(
            kernel,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(
                    (rows_in, 1, bs, lanes),
                    lambda bb: (0, bb, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (rows_out, 1, bs, lanes),
                lambda bb: (0, bb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((rows_out, g, bs, lanes), jnp.float32),
            interpret=interpret,
        )(packed)
        out = out.reshape(rows_out, b)
        return (
            out[:s_dim].T,
            out[s_dim : s_dim + n].T,
            out[s_dim + n :],
        )

    return chain
