"""Falsify-or-adopt: does bf16 elementwise work run 2x on the v5e VPU?

DESIGN.md §9 names "bf16 rollout state (halves VPU op width)" as a remaining
kernel lever. This measures the premise directly: a pure mul-add dependency
chain on a VMEM-resident block, f32 vs bf16 (and the int8-tile dtype for
completeness), timed by marginal chain-length deltas (the methodology of
bench.py — honest on the tunneled chip).

If bf16 is NOT faster elementwise (v5e VPU lanes are 32-bit; bf16 is
storage-packed but upconverted for ALU ops), the lever is dead and DESIGN
should record the falsification.

Run on the real chip:  python scripts/diag_bf16_vpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_chain(dtype, inner: int, sublanes: int):
    """One grid step = `inner` dependent mul-adds on a (sublanes, 128) block."""
    a = 1.000001 if dtype is not jnp.bfloat16 else 1.0078125

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        b = x * 0.5  # python scalars stay weakly typed -> ops run in x.dtype
        for _ in range(inner):
            x = x * a + b
        o_ref[...] = x

    @jax.jit
    def run(x, steps):
        return pl.pallas_call(
            kernel,
            grid=(steps,),
            in_specs=[pl.BlockSpec((sublanes, 128), lambda j: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((sublanes, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((sublanes, 128), x.dtype),
        )(x)

    return run


def marginal(run, x, s_short, s_long, reps=3):
    float(jnp.sum(run(x, s_short).astype(jnp.float32)))
    float(jnp.sum(run(x, s_long).astype(jnp.float32)))
    ts, tl = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(run(x, s_short).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(jnp.sum(run(x, s_long).astype(jnp.float32)))
        tl.append(time.perf_counter() - t0)
    return (min(tl) - min(ts)) / (s_long - s_short)


def main():
    inner = 256
    print(f"device: {jax.devices()[0]}")
    for dtype, sublanes in [(jnp.float32, 64), (jnp.bfloat16, 64), (jnp.bfloat16, 128)]:
        # NOTE: grid `steps` is a python int through pallas_call — jit retraces
        # per length, which is fine (two compiles each).
        runs = {}
        x = jnp.full((sublanes, 128), 1.5, dtype)
        run = make_chain(dtype, inner, sublanes)
        sec = marginal(run, x, 2000, 16000)
        lane_ops = sublanes * 128 * inner  # one fused mul-add = 1 op here
        gops = lane_ops / sec / 1e9
        print(
            f"dtype={dtype.__name__:9s} sublanes={sublanes:4d} inner={inner} "
            f"-> {sec*1e6:8.2f} us/step, {gops:8.1f} G fma/s"
        )


if __name__ == "__main__":
    main()
