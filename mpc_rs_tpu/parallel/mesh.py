"""Device-mesh utilities.

The reference's only parallel resource is a single-host rayon pool
(src/mppi.rs:39-50); the TPU-native scale-out axes are

- ``rollouts``: MPPI's K sampled sequences sharded across chips (the three
  K-reductions become one pmax/psum log-sum-exp round — SURVEY §2d),
- ``scenario``: thousands of independent closed loops (UKF+MPPI instances)
  batch-sharded across chips (BASELINE north star).

Meshes ride ICI within a slice; multi-host extends the same axes over DCN
via ``jax.distributed.initialize`` with no code changes.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(axis_sizes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a named mesh, default = all devices on one ``rollouts`` axis.

    ``make_mesh({"scenario": 2, "rollouts": 4})`` builds a 2×4 mesh.
    """
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"rollouts": len(devices)}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, names)
