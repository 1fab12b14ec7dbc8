"""Scalar Gaussian algebra — parity with src/gaussian.rs (1-D Kalman demo).

A tiny pytree-friendly NamedTuple with the same operator semantics:
``+``/``-`` convolve (add/sub means, add/sub variances — the reference
subtracts variances too, src/gaussian.rs:34-41), ``*`` of two Gaussians is
the Bayesian product (the 1-D KF measurement update,
src/gaussian.rs:44-52), ``*`` with a scalar scales both moments
(src/gaussian.rs:54-63). Works on arrays for batched 1-D filters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class Gaussian(NamedTuple):
    mean: jax.Array
    var: jax.Array

    def __add__(self, other):
        return Gaussian(self.mean + other.mean, self.var + other.var)

    def __sub__(self, other):
        return Gaussian(self.mean - other.mean, self.var - other.var)

    def __mul__(self, other):
        if isinstance(other, Gaussian):
            denom = self.var + other.var
            return Gaussian(
                (self.var * other.mean + other.var * self.mean) / denom,
                (self.var * other.var) / denom,
            )
        return Gaussian(self.mean * other, self.var * other)

    __rmul__ = __mul__


def kf1d_update_explicit(x_odom: Gaussian, x_obs: Gaussian) -> Gaussian:
    """Explicit-gain form — examples/one-liner-kf.rs:30-40 (equals product)."""
    k = x_odom.var / (x_odom.var + x_obs.var)
    y = x_obs.mean - x_odom.mean
    return Gaussian(x_odom.mean + k * y, (1.0 - k) * x_odom.var)


def kf1d_predict(x: Gaussian, u: Gaussian) -> Gaussian:
    """x' = x + u (convolution) — examples/one-liner-kf.rs:13-18."""
    return Gaussian(x.mean + u.mean, x.var + u.var)
