"""Data layer: latent-cache dataset, samplers, loaders (python + native)."""

from . import dataset, loader, native_loader, utils  # noqa: F401
