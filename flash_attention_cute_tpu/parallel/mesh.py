"""Device mesh construction."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    data: int | None = None,
    model: int | None = None,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults: all devices on the model axis (tensor parallelism first —
    attention heads and MLP columns shard without collectives inside
    attention; see guide §14 head-parallel sharding).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None and model is None:
        data, model = 1, n
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model == n, (data, model, n)
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))
