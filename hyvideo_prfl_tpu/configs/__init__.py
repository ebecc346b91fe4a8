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
    # t2i = the t2v model sampled at frame_num 1 (configs/__init__.py:11-13)
    "t2i-14B": wan_dit.t2v_14b,
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

# default negative prompt for CFG sampling (shared_config.py:19 — an interop
# constant; generations match the reference only with the same uncond text)
SAMPLE_NEG_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)

SUPPORTED_SIZES = {
    "t2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2v-1.3B": ("480*832", "832*480"),
    "i2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "flf2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2i-14B": tuple(SIZE_CONFIGS.keys()),  # configs/__init__.py:48
}


def dit_config_for_task(task: str, **kw) -> wan_dit.WanConfig:
    """Map a training-config task string (t2v-1.3b, i2v-14b-720p, ...) to a
    WanConfig (NAME_MAPPING semantics, train_prfl.py:86-93)."""
    t = task.lower()
    if t.startswith("t2v-1.3b"):
        return wan_dit.t2v_1_3b(**kw)
    if t.startswith("t2i"):
        return wan_dit.t2v_14b(**kw)
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
