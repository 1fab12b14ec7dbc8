"""Physical parameter sets for the wheeled-inverted-pendulum model family.

The reference hard-codes several slightly different parameter sets as
``const`` blocks; each named constructor below reproduces one of them
verbatim (citations into /root/reference):

- ``single_wheel``      — examples/mppi4.rs:73-81, mppi4-non-liner.rs:73-80,
                          ukf-pen2.rs:8-15, mppi4-commu.rs:84-92,
                          op-mpc-x-calc.rs:186-194 (M2 = 2.3 - 2*M1 + 2.0)
- ``single_wheel_light``— examples/op-mpc-x.rs:26-48 (M2 = 2.3 - 2*M1, J2=0.2)
- ``single_wheel_heavy_j``— examples/mpc-ukf-x.rs:17-27 (M2 = 2.0, J2 = 1.2)
- ``single_wheel_j01``  — examples/ukf-pen.rs:6-14 (J2 = 0.1)
- ``two_wheel``         — examples/mppi4-non-liner-ukf.rs:105-125,
                          mpc-ukf-s.rs:113-133, mppi4-ukf-commu.rs:115-135
                          (two driven wheels: factor 2 on M1, J1, KT terms)

All parameters are plain Python floats — compile-time constants baked into
``jit`` traces, mirroring the reference's Rust ``const`` design.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class CartPoleParams:
    m1: float  # wheel mass [kg]
    r_w: float  # wheel radius [m]
    m2: float  # pendulum (body) mass [kg]
    l: float  # distance to the center of mass [m]
    j1: float  # wheel moment of inertia [kg m^2]
    j2: float  # body moment of inertia [kg m^2]
    g: float = 9.81
    kt: float = 0.15  # motor torque constant (m2006)

    # --- single-wheel formulation (examples/mppi4.rs:73-81) ---
    @property
    def d_lin(self) -> float:
        """(M1+M2+J1/R²)(M2 L²+J2) − M2²L² — examples/mppi4.rs:81."""
        return (self.m1 + self.m2 + self.j1 / (self.r_w * self.r_w)) * (
            self.m2 * self.l * self.l + self.j2
        ) - self.m2 * self.m2 * self.l * self.l

    @property
    def d0(self) -> float:
        """(M1+M2+J1/R²)(M2 L²+J2) — examples/mppi4-non-liner.rs:83."""
        return (self.m1 + self.m2 + self.j1 / (self.r_w * self.r_w)) * (
            self.m2 * self.l * self.l + self.j2
        )

    @property
    def mass_line(self) -> float:
        """M1 + M2 + J1/R² (single wheel)."""
        return self.m1 + self.m2 + self.j1 / (self.r_w * self.r_w)

    # --- two-wheel formulation (examples/mppi4-non-liner-ukf.rs:124-125) ---
    @property
    def d1_two(self) -> float:
        """(2M1+M2+2J1/R²)(M2 L²+J2) — examples/mppi4-non-liner-ukf.rs:125."""
        return (2.0 * self.m1 + self.m2 + 2.0 * self.j1 / (self.r_w * self.r_w)) * (
            self.m2 * self.l * self.l + self.j2
        )

    @property
    def mass_line_two(self) -> float:
        """2M1 + M2 + 2J1/R² (two driven wheels)."""
        return 2.0 * self.m1 + self.m2 + 2.0 * self.j1 / (self.r_w * self.r_w)

    @property
    def d_lin_two(self) -> float:
        """D1 − M2²L² — examples/mpc-ukf-s.rs:133."""
        return self.d1_two - self.m2 * self.m2 * self.l * self.l

    # --- named parameter sets ---
    @staticmethod
    def single_wheel(j2: float = 0.2, m2: float | None = None) -> "CartPoleParams":
        m1 = 150e-3
        r_w = 50e-3
        return CartPoleParams(
            m1=m1,
            r_w=r_w,
            m2=(2.3 - 2.0 * m1 + 2.0) if m2 is None else m2,
            l=0.2474,
            j1=m1 * r_w * r_w,
            j2=j2,
        )

    @staticmethod
    def single_wheel_light() -> "CartPoleParams":
        # examples/op-mpc-x.rs:30 — M2 = 2.3 - 2*M1 (no +2.0 payload)
        return CartPoleParams.single_wheel(j2=0.2, m2=2.3 - 2.0 * 150e-3)

    @staticmethod
    def single_wheel_heavy_j() -> "CartPoleParams":
        # examples/mpc-ukf-x.rs:19-23 — M2 = 2.0, J2 = 1.2
        return CartPoleParams.single_wheel(j2=1.2, m2=2.3 - 2.0 * 150e-3)

    @staticmethod
    def single_wheel_j01() -> "CartPoleParams":
        # examples/ukf-pen.rs:11 — J2 = 0.1
        return CartPoleParams.single_wheel(j2=0.1)

    @staticmethod
    def two_wheel() -> "CartPoleParams":
        # examples/mppi4-non-liner-ukf.rs:105-123
        return CartPoleParams(
            m1=160e-3,
            r_w=50e-3,
            m2=2.4,
            l=0.4,
            j1=2.23e5 * 1e-9,
            j2=1.168e8 * 1e-9,
        )


assert math.isclose(CartPoleParams.single_wheel().m2, 4.0)
