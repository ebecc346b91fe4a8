"""Mesh + sharding: FSDP, sequence parallel (GSPMD + shard_map Ulysses),
teacher-student axis."""

from . import sharding, teacher_student  # noqa: F401
