"""Generation pipelines: WanT2V / WanI2V / WanFLF2V."""

from .pipeline import GenerateConfig, WanFLF2V, WanI2V, WanT2V  # noqa: F401
