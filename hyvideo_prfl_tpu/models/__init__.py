"""Model zoo: Wan DiT, causal 3D VAE, umT5-XXL, CLIP ViT-H/14, XLM-R,
reward heads."""

from . import clip, reward, rope, t5, vae, wan_dit, xlm_roberta  # noqa: F401
