"""Teacher-student device partitioning.

Parity target: reference `utils/parallel_states.py:90-141`
(initialize_teacher_student_parallel_state: world split into teacher and
student halves plus per-pair "ts unit" groups) and
`utils/communication.py:21-38, 275-321` (broadcast_within_ts_unit,
all_gather_ts). Infrastructure for distillation-style dual-model runs;
the shipped reference drivers never initialize it (config flag
train.teacher_student_parallel exists but is unused) — provided here for
capability parity.

TPU-native form: a leading mesh axis "ts" of size 2. Device i in the
student half pairs with device i + world/2 in the teacher half (the
reference's ts_unit). Cross-half transfer is one ppermute over the ts axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

TS_AXIS = "ts"


def make_ts_mesh(data: int = 1, sp: int = 1,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh ("ts", "data", "sp") with ts=2: student half, teacher half."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % 2 == 0, "teacher-student split needs an even device count"
    assert 2 * data * sp == n, f"2x{data}x{sp} != {n}"
    arr = np.asarray(devices).reshape(2, data, sp)
    return Mesh(arr, (TS_AXIS, "data", "sp"))


def is_teacher_half(ts_index: int) -> bool:
    """Reference convention: second half of the world is the teacher
    (parallel_states.py:101-117)."""
    return ts_index == 1


def ts_unit_swap(x, axis_name: str = TS_AXIS):
    """Exchange values between paired student/teacher devices (one
    ppermute over the ts axis). Called inside shard_map."""
    return jax.lax.ppermute(x, axis_name, [(0, 1), (1, 0)])


def broadcast_from_teacher(x, axis_name: str = TS_AXIS):
    """Every ts unit receives the teacher's value
    (broadcast_within_ts_unit, communication.py:21-38). Inside shard_map."""
    from_teacher = jax.lax.ppermute(x, axis_name, [(1, 0)])
    idx = jax.lax.axis_index(axis_name)
    import jax.numpy as jnp

    return jnp.where(idx == 0, from_teacher, x)


def all_gather_ts(x, axis_name: str = TS_AXIS):
    """Stack both halves' values on a leading axis (all_gather_ts,
    communication.py:275-321). Inside shard_map."""
    return jax.lax.all_gather(x, axis_name)
