"""Model-size and resolution config registry.

Parity target: reference `wan/configs/__init__.py:20-49` (WAN_CONFIGS,
SIZE_CONFIGS, MAX_AREA_CONFIGS, SUPPORTED_SIZES) + per-size config files.
"""

from ..models import wan_dit
from .config import AttrDict, load_config, default_config, NAME_MAPPING

# task -> WanConfig factory (wan_t2v_14B.py:20-27 etc.)
WAN_CONFIGS = {
    "t2v-14B": wan_dit.t2v_14b,
    "t2v-1.3B": wan_dit.t2v_1_3b,
    "i2v-14B": wan_dit.i2v_14b,
    "flf2v-14B": wan_dit.flf2v_14b,
}

# user-facing size name -> (W, H) (configs/__init__.py:32-38)
SIZE_CONFIGS = {
    "720*1280": (720, 1280),
    "1280*720": (1280, 720),
    "480*832": (480, 832),
    "832*480": (832, 480),
    "1024*1024": (1024, 1024),
}

MAX_AREA_CONFIGS = {
    "720*1280": 720 * 1280,
    "1280*720": 1280 * 720,
    "480*832": 480 * 832,
    "832*480": 832 * 480,
}

SUPPORTED_SIZES = {
    "t2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2v-1.3B": ("480*832", "832*480"),
    "i2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "flf2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
}


def dit_config_for_task(task: str, **kw) -> wan_dit.WanConfig:
    """Map a training-config task string (t2v-1.3b, i2v-14b-720p, ...) to a
    WanConfig (NAME_MAPPING semantics, train_prfl.py:86-93)."""
    t = task.lower()
    if t.startswith("t2v-1.3b"):
        return wan_dit.t2v_1_3b(**kw)
    if t.startswith("i2v-1.3b"):
        return wan_dit.i2v_1_3b(**kw)
    if t.startswith("t2v-14b"):
        return wan_dit.t2v_14b(**kw)
    if t.startswith("i2v-14b"):
        return wan_dit.i2v_14b(**kw)
    if t.startswith("flf2v"):
        return wan_dit.flf2v_14b(**kw)
    raise ValueError(f"unknown task {task}")


__all__ = [
    "WAN_CONFIGS", "SIZE_CONFIGS", "MAX_AREA_CONFIGS", "SUPPORTED_SIZES",
    "AttrDict", "load_config", "default_config", "NAME_MAPPING",
    "dit_config_for_task",
]
