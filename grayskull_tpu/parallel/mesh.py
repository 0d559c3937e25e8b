"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(shape=None, axis_names=("data", "space"), devices=None) -> Mesh:
    """Build a device mesh.

    ``shape`` defaults to all available devices on the first axis.  When the
    default backend has too few devices, CPU devices are used (tests force 8
    virtual CPU devices via ``--xla_force_host_platform_device_count``).
    """
    if devices is None:
        devices = jax.devices()
        if shape is not None and int(np.prod(shape)) > len(devices):
            devices = jax.devices("cpu")
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names[: arr.ndim])
