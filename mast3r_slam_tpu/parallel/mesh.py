"""Device mesh construction."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: int | None = None,
    tp: int | None = None,
    axis_names: tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """Build a (dp, tp) mesh over the first n_devices.

    tp defaults to the largest power-of-two divisor of n_devices up to 4 —
    enough to shard 16-head attention and 4x MLPs without fragmenting the
    MXU tiles; dp takes the rest. On one device both axes are 1 (the same
    jitted program runs unsharded).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n_devices % cand == 0:
                tp = cand
                break
    dp = n_devices // tp
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, axis_names)
