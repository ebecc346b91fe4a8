"""Flow-matching schedulers/solvers: train scheduler + Euler, UniPC, DPM++."""

from . import dpm, flow_match, unipc  # noqa: F401
