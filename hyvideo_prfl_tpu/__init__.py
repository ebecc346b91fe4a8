"""HY-Video-PRFL-TPU: a TPU-native post-training framework for video diffusion models.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Tencent-Hunyuan/HY-Video-PRFL (reference: /root/reference):

* PAVRM — process-aware latent video reward models trained on noisy latents
  (pointwise BCE and pairwise Bradley-Terry objectives).
* PRFL — process reward feedback learning: no-grad rollout of the denoising
  chain to a random mid timestep, one gradient-carrying denoise step, reward
  scoring via a frozen trimmed DiT + query-attention + MLP head, hinge loss.

Everything is designed TPU-first: a single `jax.sharding.Mesh` with
("data", "sp") axes replaces NCCL process groups, FSDP and xfuser; attention
runs as a Pallas flash-attention kernel; schedulers are pure functions over
small state pytrees so rollouts compile into one `lax.scan`/`fori_loop`.
"""

__version__ = "0.1.0"
