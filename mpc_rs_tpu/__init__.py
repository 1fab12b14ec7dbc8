"""mpc_rs_tpu — a TPU-native MPPI/MPC + UKF real-time control engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``teruyamato0731/mpc-rs`` Rust crate (reference mounted at /root/reference):

- MPPI sampling controller (reference: src/mppi.rs) as a pure-functional
  ``vmap``/``lax.scan`` solver plus a fused Pallas TPU kernel with a
  streaming log-sum-exp reduction (ops/mppi_pallas.py), shardable over a
  ``rollouts`` mesh axis (parallel/).
- Gradient MPC: condensed-QP builders (src/mpc.rs) and a PANOC-style
  box/ball-constrained solver with L-BFGS acceleration
  (controllers/panoc.py) replacing the external ``optimization_engine``.
- UKF estimators for arbitrary state/obs dims (src/ukf.rs, src/ukf2.rs),
  batched over scenarios with ``vmap``; linear KF + scalar Gaussian algebra
  (src/gaussian.rs).
- Deterministic multi-rate closed-loop harness replacing the reference's
  wall-clock thread soup (examples/mppi4-non-liner-ukf.rs).
- Host-side COBS/serial wire protocol (src/packet.rs) with a C++ codec.

Design stance: static shapes under ``jit``, explicit PRNG keys, pure
functions + carried state pytrees, f32 on TPU with f64-on-CPU oracle mode.
"""

__version__ = "0.1.0"

import jax as _jax

# On TPU, matmul/einsum default to bf16 inputs on the MXU. Every contraction
# in this engine is small covariance/QP/weighted-average algebra where bf16
# is catastrophically lossy (measured: UKF fleets tip over), and none are
# MXU-throughput-bound — so full f32 accumulation is the right default
# engine-wide. The Pallas MPPI kernel is pure VPU and unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

from mpc_rs_tpu.controllers.mppi import MppiConfig, MppiStatus, mppi_solve
from mpc_rs_tpu.estimators.ukf import UkfParams, UkfState, ukf_init, ukf_predict, ukf_update

__all__ = [
    "MppiConfig",
    "MppiStatus",
    "mppi_solve",
    "UkfParams",
    "UkfState",
    "ukf_init",
    "ukf_predict",
    "ukf_update",
]
