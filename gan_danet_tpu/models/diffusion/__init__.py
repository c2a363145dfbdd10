"""Latent-diffusion stack (capability parity: the reference's
1.encoder / 2.vae / 3.unet / 4.train / 5.test notebooks — a Stable-
Diffusion-from-scratch tutorial kept as scaffolding for the LFS-stripped
`Diffusion+Model.ipynb` GRACE variant, SURVEY.md §2.4).

Components:
  text_encoder  CLIP-style causal transformer (tokens -> (B, L, D) context)
  vae           conv VAE, image <-> latent (factor-8, 4 channels, 0.18215
                scaling convention)
  unet          conditional denoiser with timestep embedding and
                cross-attention on context tokens
  ddpm          DDPM noise scheduler (SD scaled-linear betas, add_noise /
                step / set_timesteps)
  pipeline      training loss (noise-pred MSE, frozen VAE/encoder, grad
                accumulation) + CFG sampling `generate`; includes the
                GRACE conditioning adapter (aux-raster tokens instead of
                text) — the downscaling-diffusion variant the reference
                planned but never shipped
"""
from gan_danet_tpu.models.diffusion.ddpm import DDPMScheduler  # noqa: F401
from gan_danet_tpu.models.diffusion.text_encoder import TextEncoder  # noqa: F401
from gan_danet_tpu.models.diffusion.vae import VAE  # noqa: F401
from gan_danet_tpu.models.diffusion.unet import UNet  # noqa: F401
from gan_danet_tpu.models.diffusion.pipeline import (  # noqa: F401
    DiffusionConfig,
    LatentDiffusion,
)
