"""Training: PAVRM/PRFL/SFT steps, optimizer, LoRA, EMA, distillation."""

from . import common, distill, ema, lora, pavrm, prfl  # noqa: F401
