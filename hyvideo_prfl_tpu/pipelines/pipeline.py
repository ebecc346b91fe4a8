"""Video generation pipelines: T2V, I2V, FLF2V.

Parity target: reference `wan/text2video.py`, `wan/image2video.py`,
`wan/first_last_frame2video.py` generate() flows (survey 3.4):
latent sizing from max_area + aspect, i2v mask construction (first frame
repeated 4x into the mask channels, image2video.py:262-269), classifier-free
guidance with cond/uncond forwards, UniPC (or Euler flow-match) sampling,
VAE decode.

TPU-native: the whole denoising loop is ONE jitted lax.scan (two DiT calls
per step for CFG) — no per-step python dispatch; static latent shapes per
(resolution, frames) bucket; sequence length already a multiple of the sp
mesh axis by bucket construction.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import wan_dit
from ..schedulers import flow_match as fm
from ..schedulers import unipc


def latent_size_for(max_area: int, aspect: float,
                    vae_stride=(4, 8, 8), patch_size=(1, 2, 2),
                    num_frames: int = 81, sp_size: int = 1
                    ) -> Tuple[int, int, int]:
    """(F, H, W) latent grid from pixel budget (image2video.py:237-248).

    sp_size: total sequence-parallel degree (ring * ulysses). The token
    count F * H/ph * W/pw must divide by it for the Ulysses all_to_all and
    the ring rotation (the reference instead rounds seq_len up to a multiple
    of sp, image2video.py:246-248; with static shapes we widen W by one
    patch at a time until the grid divides — at 720p/480p scales this is at
    most a ~1% pixel-budget change)."""
    lat_f = (num_frames - 1) // vae_stride[0] + 1
    lat_h = round(math.sqrt(max_area * aspect) / vae_stride[1] / patch_size[1]) * patch_size[1]
    lat_w = round(math.sqrt(max_area / aspect) / vae_stride[2] / patch_size[2]) * patch_size[2]
    if sp_size > 1:
        tokens = lambda w: lat_f * (lat_h // patch_size[1]) * (w // patch_size[2])
        while tokens(lat_w) % sp_size:
            lat_w += patch_size[2]
    return lat_f, lat_h, lat_w


def i2v_mask(lat_f: int, lat_h: int, lat_w: int,
             last_frame: bool = False) -> jnp.ndarray:
    """4-channel conditioning mask per latent frame [F, H, W, 4].

    Pixel-time mask has 1s on frame 0 (and the last frame for flf2v), 0
    elsewhere; the first frame is repeated 4x so the (4n+1)-frame video maps
    to latent frames as (4, 4, ..., 4) groups (image2video.py:262-269,
    first_last_frame2video.py mask).
    """
    t_pix = (lat_f - 1) * 4 + 1
    msk = np.zeros((t_pix,), np.float32)
    msk[0] = 1.0
    if last_frame:
        msk[-1] = 1.0
    msk = np.concatenate([np.repeat(msk[:1], 4), msk[1:]])  # [4*lat_f]
    msk = msk.reshape(lat_f, 4)
    out = np.broadcast_to(msk[:, None, None, :], (lat_f, lat_h, lat_w, 4))
    return jnp.asarray(out)


@dataclasses.dataclass
class GenerateConfig:
    sampling_steps: int = 40
    guide_scale: float = 5.0
    shift: float = 5.0
    sample_solver: str = "unipc"  # unipc | euler
    num_train_timesteps: int = 1000


class WanPipeline:
    """Shared cond/uncond CFG sampling over a Wan DiT."""

    def __init__(self, dit_cfg: wan_dit.WanConfig, params: Dict,
                 policy=None, vae=None, vae_params=None,
                 batch_cfg: bool = True):
        self.cfg = dit_cfg
        self.model = wan_dit.WanModel(dit_cfg, policy)
        self.params = params
        self.vae = vae
        self.vae_params = vae_params
        # batch_cfg: run the cond/uncond pair as ONE 2B-batch forward
        # (fewer dispatches, better MXU utilization at small batch) instead
        # of the reference's two sequential forwards (image2video.py:357-374)
        self.batch_cfg = batch_cfg

    def _velocity_cfg(self, x, t, context, context_null, guide_scale,
                      y=None, clip_fea=None, grid=None):
        if self.batch_cfg:
            b = x.shape[0]
            x2 = jnp.concatenate([x, x], axis=0)
            ctx2 = jnp.concatenate([context, context_null], axis=0)
            t2 = jnp.broadcast_to(jnp.atleast_1d(t), (b,))
            t2 = jnp.concatenate([t2, t2], axis=0)
            y2 = jnp.concatenate([y, y], axis=0) if y is not None else None
            clip2 = (jnp.concatenate([clip_fea, clip_fea], axis=0)
                     if clip_fea is not None else None)
            out = self.model.apply(self.params, x2, t2, ctx2,
                                   y=y2, clip_fea=clip2, grid=grid)
            cond, uncond = out[:b], out[b:]
        else:
            cond = self.model.apply(self.params, x, t, context,
                                    y=y, clip_fea=clip_fea, grid=grid)
            uncond = self.model.apply(self.params, x, t, context_null,
                                      y=y, clip_fea=clip_fea, grid=grid)
        return uncond + guide_scale * (cond - uncond)

    def _to_tokens(self, video):
        """Video -> token-cell solver layout, ONCE, outside the scan
        (wan_dit.patchify_sharded docstring has the layout rationale)."""
        return wan_dit.patchify_sharded(video, self.cfg.patch_size,
                                        self.model.policy)

    def _to_video(self, tokens, grid):
        """Token-cell -> video, ONCE, outside the scan."""
        return wan_dit.unpatchify_sharded(tokens, grid, self.cfg.patch_size,
                                          self.model.policy)

    def sample(self, rng, latent_shape, context, context_null,
               gen: GenerateConfig, y=None, clip_fea=None) -> jnp.ndarray:
        """Full denoising chain -> clean latents [B, F, H, W, C].

        The scan carries the solver state in token-cell layout (see
        wan_dit.patchify): noise is patchified once before the loop and the
        result unpatchified once after, so no video<->token layout boundary
        exists inside the compiled denoising loop."""
        noise = jax.random.normal(rng, latent_shape, jnp.float32)
        noise_t, grid = self._to_tokens(noise)
        y_t = (self._to_tokens(y)[0] if y is not None else None)

        def vel(x, t):
            return self._velocity_cfg(
                x, t, context, context_null, gen.guide_scale,
                y=y_t, clip_fea=clip_fea, grid=grid,
            )

        if gen.sample_solver == "unipc":
            sched = unipc.unipc_schedule(
                gen.sampling_steps, shift=gen.shift,
                num_train_timesteps=gen.num_train_timesteps,
            )
            x, _ = unipc.rollout(sched, vel, noise_t)
            return self._to_video(x, grid)
        if gen.sample_solver in ("dpm++", "dpm"):
            from ..schedulers import dpm as dpm_mod

            sched = dpm_mod.dpm_schedule(
                gen.sampling_steps, shift=gen.shift,
                num_train_timesteps=gen.num_train_timesteps,
            )
            x, _ = dpm_mod.rollout(sched, vel, noise_t)
            return self._to_video(x, grid)
        if gen.sample_solver == "euler":
            sched = fm.inference_schedule(
                gen.sampling_steps, shift=gen.shift,
                num_train_timesteps=gen.num_train_timesteps,
            )

            def body(i, x):
                return fm.euler_step(sched, vel(x, sched.timesteps[i]), x, i)

            x = jax.lax.fori_loop(0, sched.num_steps, body, noise_t)
            return self._to_video(x, grid)
        raise ValueError(f"unknown solver {gen.sample_solver}")

    def sample_teacache(self, rng, latent_shape, context, context_null,
                        gen: GenerateConfig, thresh: float = 0.2,
                        coeffs_key: str = "t2v-14b",
                        y=None, clip_fea=None) -> jnp.ndarray:
        """Denoising chain with TeaCache residual-reuse step skipping
        (ops/teacache.py; reference model.py:621-654). One compiled scan;
        lax.cond skips the block stack when the gate says so."""
        from ..models.wan_dit import time_embed_only
        from ..ops import teacache as tc
        from ..schedulers import unipc as unipc_mod

        cfg = self.cfg
        b, f, hh, ww, _ = latent_shape
        pt, ph, pw = cfg.patch_size
        seq = (f // pt) * (hh // ph) * (ww // pw)
        coeffs = tc.COEFFICIENTS[coeffs_key]
        n = gen.sampling_steps
        sched = unipc_mod.unipc_schedule(
            n, shift=gen.shift, num_train_timesteps=gen.num_train_timesteps)

        noise = jax.random.normal(rng, latent_shape, jnp.float32)
        noise_t, grid = self._to_tokens(noise)
        y_t = (self._to_tokens(y)[0] if y is not None else None)
        gate0 = tc.init_state(b, cfg.dim, seq)
        res0 = jnp.zeros((b, seq, cfg.dim), jnp.float32)

        def vel(x, t, i, extra):
            gate, res_c, res_u = extra
            e = time_embed_only(self.params, cfg, jnp.full((b,), t))
            skip, gate = tc.should_skip(gate, e, i, n, thresh, coeffs)

            if self.batch_cfg:
                # cond/uncond as ONE 2B-batch forward (matches sample());
                # residual caches ride along in the same batch split
                x2 = jnp.concatenate([x, x], axis=0)
                ctx2 = jnp.concatenate([context, context_null], axis=0)
                res2 = jnp.concatenate([res_c, res_u], axis=0)
                y2 = (jnp.concatenate([y_t, y_t], axis=0)
                      if y_t is not None else None)
                clip2 = (jnp.concatenate([clip_fea, clip_fea], axis=0)
                         if clip_fea is not None else None)
                out, _, res_new = self.model.apply(
                    self.params, x2, jnp.full((2 * b,), t), ctx2,
                    y=y2, clip_fea=clip2, grid=grid,
                    skip_blocks=skip, residual_in=res2, output_residual=True)
                cond, uncond = out[:b], out[b:]
                res_c, res_u = res_new[:b], res_new[b:]
            else:
                def fwd(ctx, res):
                    out, _, res_new = self.model.apply(
                        self.params, x, t, ctx, y=y_t, clip_fea=clip_fea,
                        grid=grid, skip_blocks=skip, residual_in=res,
                        output_residual=True)
                    return out, res_new

                cond, res_c = fwd(context, res_c)
                uncond, res_u = fwd(context_null, res_u)
            v = uncond + gen.guide_scale * (cond - uncond)
            return v, (gate, res_c, res_u)

        # the SAME scan as sample() — solver stepping shared by construction
        x_final, _, _ = unipc_mod.rollout(
            sched, vel, noise_t, extra_init=(gate0, res0, res0))
        return self._to_video(x_final, grid)

    def decode(self, latents):
        assert self.vae is not None, "pipeline built without a VAE"
        return self.vae.apply(self.vae_params, latents,
                              method=self.vae.decode)


class WanT2V(WanPipeline):
    """Text-to-video (wan/text2video.py)."""

    def generate(self, rng, context, context_null, lat_f, lat_h, lat_w,
                 gen: Optional[GenerateConfig] = None,
                 decode: bool = False):
        gen = gen or GenerateConfig(shift=5.0, sampling_steps=50)
        b = context.shape[0]
        shape = (b, lat_f, lat_h, lat_w, 16)
        lat = self.sample(rng, shape, context, context_null, gen)
        return self.decode(lat) if decode else lat


class WanI2V(WanPipeline):
    """Image-to-video (wan/image2video.py). `cond_latent` is the VAE
    encoding of [first_frame, zeros...] ([B, F, H, W, 16])."""

    def generate(self, rng, context, context_null, clip_fea, cond_latent,
                 gen: Optional[GenerateConfig] = None,
                 decode: bool = False):
        gen = gen or GenerateConfig(shift=5.0, sampling_steps=40)
        b, lat_f, lat_h, lat_w, _ = cond_latent.shape
        msk = jnp.broadcast_to(
            i2v_mask(lat_f, lat_h, lat_w)[None],
            (b, lat_f, lat_h, lat_w, 4),
        )
        y = jnp.concatenate([msk, cond_latent], axis=-1)  # [.., 20]
        shape = (b, lat_f, lat_h, lat_w, 16)
        lat = self.sample(rng, shape, context, context_null, gen,
                          y=y, clip_fea=clip_fea)
        return self.decode(lat) if decode else lat


class WanFLF2V(WanPipeline):
    """First+last-frame-to-video (wan/first_last_frame2video.py):
    mask marks first AND last frames; CLIP context is 514 tokens."""

    def generate(self, rng, context, context_null, clip_fea, cond_latent,
                 gen: Optional[GenerateConfig] = None,
                 decode: bool = False):
        gen = gen or GenerateConfig(shift=5.0, sampling_steps=40)
        b, lat_f, lat_h, lat_w, _ = cond_latent.shape
        msk = jnp.broadcast_to(
            i2v_mask(lat_f, lat_h, lat_w, last_frame=True)[None],
            (b, lat_f, lat_h, lat_w, 4),
        )
        y = jnp.concatenate([msk, cond_latent], axis=-1)
        shape = (b, lat_f, lat_h, lat_w, 16)
        lat = self.sample(rng, shape, context, context_null, gen,
                          y=y, clip_fea=clip_fea)
        return self.decode(lat) if decode else lat
