"""Device mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices.

    Raises if fewer devices exist than requested — a silent clamp would
    let a ``--dist_devices 8`` run degrade to single-device and still
    report itself as distributed."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} JAX device(s) are visible (backend "
                f"{jax.default_backend()!r}); for a virtual CPU mesh "
                f"set XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} and JAX_PLATFORMS=cpu before jax "
                f"initializes")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(shape: tuple[int, int],
                 axes: tuple[str, str] = ("data", "model")) -> Mesh:
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, axes)
