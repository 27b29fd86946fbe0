"""Device mesh construction helpers.

The reference is strictly single-core (SURVEY.md section 2 rows 9-10: no
threads, no processes, no devices — its only parallelism is SIMD lanes).
Multi-chip scaling is therefore new, TPU-native surface: a 1-D or 2-D
`jax.sharding.Mesh` whose axes shard DSP channels and stream time-blocks,
with XLA/ICI collectives doing the communication.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["P", "Mesh", "NamedSharding", "dsp_mesh", "channel_time_mesh"]

CHANNEL_AXIS = "chan"
TIME_AXIS = "time"


def dsp_mesh(n_devices: int | None = None, axis: str = TIME_AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all local devices).
    Raises if fewer devices exist — silently returning a smaller mesh
    would leave the caller believing work is split n_devices ways."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def channel_time_mesh(channel_parallel: int, time_parallel: int) -> Mesh:
    """2-D (chan, time) mesh: channels data-parallel across one axis,
    stream time-blocks sequence-parallel across the other (the DSP analog
    of a dp x sp mesh)."""
    devs = jax.devices()
    need = channel_parallel * time_parallel
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    arr = np.asarray(devs[:need]).reshape(channel_parallel, time_parallel)
    return Mesh(arr, (CHANNEL_AXIS, TIME_AXIS))
