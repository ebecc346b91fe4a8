"""TPU compute ops: attention dispatch, Pallas flash attention, TeaCache."""

from . import attention, teacache  # noqa: F401
