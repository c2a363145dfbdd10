"""Latent-diffusion training + sampling pipeline (behavioural parity:
reference 4.train.ipynb / 5.test.ipynb), generalised to GRACE rasters.

Training (4.train cells 3-5): frozen VAE + condition encoder; UNet
predicts the noise added to the 0.18215-scaled latents at a random
timestep; MSE loss; AdamW(1e-5, 0.9/0.999, wd 0.01, eps 1e-8); gradient
accumulation x4 with global-norm clip 1.0 before each optimizer step
(cell 5: loss/4, clip_grad_norm_(1.0), step every 4th micro-batch).

Sampling (5.test `generate`): start from N(0,1) latents, 50 DDPM steps
with classifier-free guidance 7.5 (conditional/unconditional pair), VAE
decode at /0.18215.

TPU-first: the reference Python-loops both hot paths. Here an epoch of
training is ONE jitted lax.scan over on-device batch gathers
(`train_epochs`, the train/loops.py pattern), and the 50-step CFG
sampling loop is ONE jitted lax.scan over precomputed scheduler
coefficient tables (`generate`; DDPMScheduler.step_tables) — per-step
Python dispatch costs 8-60x wall on remote backends (DESIGN.md §6). The
per-batch `train_batch` and the Python-loop `generate(jit=False)` are
kept as oracles; tests pin scan == loop.

Conditioning: either text tokens through the CLIP-style encoder (tutorial
parity) or — the GRACE adapter — a conv patch-encoder over the
[lr GRACE | aux] stack producing context tokens, which turns the stack
into the conditional downscaling-diffusion model the missing
`Diffusion+Model.ipynb` was meant to be.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from gan_danet_tpu.models.diffusion.ddpm import DDPMScheduler
from gan_danet_tpu.models.diffusion.text_encoder import TextEncoder
from gan_danet_tpu.models.diffusion.unet import UNet
from gan_danet_tpu.models.diffusion.vae import VAE


class RasterConditionEncoder(nn.Module):
    """Conv patch encoder: (B, H, W, C_cond) -> (B, N_tokens, context_dim)
    context tokens for cross-attention (the GRACE analogue of the text
    encoder)."""

    context_dim: int = 256
    patch: int = 4

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.context_dim // 2, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(cond)
        x = nn.silu(x)
        x = nn.Conv(self.context_dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch")(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


@dataclass
class DiffusionConfig:
    latent_channels: int = 4
    vae_channels: Tuple[int, ...] = (32, 64)
    unet_channels: Tuple[int, ...] = (32, 64)
    context_dim: int = 128
    heads: int = 4
    image_channels: int = 1
    cond_channels: Optional[int] = None     # None => text conditioning
    vocab_size: int = 49408
    num_train_timesteps: int = 1000
    guidance_scale: float = 7.5
    num_inference_steps: int = 50
    lr: float = 1e-5
    weight_decay: float = 0.01
    grad_accum: int = 4
    # reference 4.train.ipynb cell 5: clip_grad_norm_(unet.parameters(),
    # 1.0) on the ACCUMULATED gradient before every optimizer step; 0
    # disables (torch clips the sum of loss/4 micro-grads == the mean
    # grad, which is exactly what optax.MultiSteps hands the inner chain)
    clip_norm: float = 1.0
    # compute dtype for the UNet/VAE ('float32' | 'bfloat16'); params,
    # normalization statistics, softmax logits, the VAE's latent-moment
    # and reconstruction heads, and the loss all stay float32 — the same
    # mixed-precision policy as the GAN path. The condition encoders are
    # tiny and frozen; they stay f32. Default f32 because bf16 measured
    # NEUTRAL on the v5e train step (96.41 vs 96.52 ms at B=4, 88x176 —
    # bench.py diffusion_train_step{,_bf16}): XLA already runs f32
    # matmuls at bf16 single-pass rate and the step is occupancy-bound at
    # channels 32-64, so f32 precision is free here.
    dtype: str = "float32"


class LatentDiffusion:
    """Bundles VAE + condition encoder + UNet + scheduler with jitted
    train/sample paths."""

    def __init__(self, config: DiffusionConfig = DiffusionConfig(),
                 seed: int = 0,
                 sample_image_hw: Tuple[int, int] = (32, 32),
                 sample_cond_shape: Optional[Tuple[int, ...]] = None,
                 mesh=None):
        """mesh (a core.meshes mesh with a 'data' axis) makes the scanned
        training epoch data-parallel: the dataset is replicated and every
        gathered batch is sharding-constrained over 'data', so GSPMD
        partitions the UNet step with gradient allreduce over ICI — the
        same contract as ModelTrainer/AETrainer (tests assert mesh ==
        single-device losses)."""
        self.config = config
        self.mesh = mesh
        c = config
        # the VAE downsamples 2^(stages-1) and the SD-topology UNet
        # downsamples at EVERY level (reference 3.unet.ipynb), so the
        # image size must divide the whole ladder — fail here with the
        # formula instead of an opaque concatenate shape error deep inside
        # UNet init (cli.py crops with the same divisor)
        div = 2 ** (len(c.vae_channels) - 1) * 2 ** len(c.unet_channels)
        h, w = sample_image_hw
        if h % div or w % div:
            raise ValueError(
                f"sample_image_hw {sample_image_hw} must be divisible by "
                f"{div} (= 2^(len(vae_channels)-1) * 2^len(unet_channels) "
                f"= 2^{len(c.vae_channels) - 1} * 2^{len(c.unet_channels)}); "
                f"crop to ({h - h % div}, {w - w % div})")
        self.scheduler = DDPMScheduler(c.num_train_timesteps)
        compute_dtype = (jnp.bfloat16 if c.dtype in ("bfloat16", "bf16")
                         else jnp.float32)
        self.vae = VAE(c.vae_channels, c.latent_channels, c.image_channels,
                       dtype=compute_dtype)
        self.unet = UNet(c.latent_channels, c.latent_channels,
                         c.unet_channels, c.context_dim, c.heads,
                         dtype=compute_dtype)
        if c.cond_channels is None:
            self.cond_encoder = TextEncoder(c.vocab_size, 77, c.context_dim,
                                            c.heads, layers=2)
            cond_sample = jnp.zeros((1, 77), jnp.int32)
        else:
            self.cond_encoder = RasterConditionEncoder(c.context_dim)
            shape = sample_cond_shape or (1, *sample_image_hw, c.cond_channels)
            cond_sample = jnp.zeros(shape, jnp.float32)

        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
        img = jnp.zeros((1, *sample_image_hw, c.image_channels))
        self.vae_params = self.vae.init(
            {"params": k1}, img, k1)["params"]
        self.cond_params = self.cond_encoder.init(k2, cond_sample)["params"]

        f = 2 ** (len(c.vae_channels) - 1)
        lat = jnp.zeros((1, sample_image_hw[0] // f, sample_image_hw[1] // f,
                         c.latent_channels))
        ctx = self.cond_encoder.apply({"params": self.cond_params}, cond_sample)
        self.unet_params = self.unet.init(k3, lat, ctx,
                                          jnp.zeros((1,), jnp.int32))["params"]
        self._latent_factor = f

        tx = optax.adamw(c.lr, b1=0.9, b2=0.999, eps=1e-8,
                         weight_decay=c.weight_decay)
        if c.clip_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(c.clip_norm), tx)
        if c.grad_accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=c.grad_accum)
        self.tx = tx
        self.opt_state = tx.init(self.unet_params)
        self._key = k4
        self.step = 0

        def train_step(unet_params, opt_state, image, cond, key):
            knoise, kt, kvae = jax.random.split(key, 3)
            context = self.cond_encoder.apply({"params": self.cond_params},
                                              cond)
            mean, logvar = self.vae.apply({"params": self.vae_params}, image,
                                          method=VAE.encode)
            z = self.vae.apply({"params": self.vae_params}, mean, logvar,
                               kvae, method=VAE.sample)
            z = z * self.vae.scaling_factor
            noise = jax.random.normal(knoise, z.shape, z.dtype)
            t = jax.random.randint(kt, (z.shape[0],), 0,
                                   c.num_train_timesteps)
            z_noisy = self.scheduler.add_noise(z, noise, t)

            def loss_fn(p):
                pred = self.unet.apply({"params": p}, z_noisy, context, t)
                return jnp.mean((pred - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(unet_params)
            updates, opt_state = self.tx.update(grads, opt_state, unet_params)
            return optax.apply_updates(unet_params, updates), opt_state, loss

        self._train_step_core = train_step
        self._train_step = jax.jit(train_step)

        # whole-epoch scan (train/loops.py pattern): the dataset lives in
        # HBM, batches are index-gathers, the optimizer step (incl. the
        # MultiSteps accumulation counter) is carried through the scan —
        # one compiled program per epoch instead of n_batches dispatches
        constraint = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from gan_danet_tpu.core.meshes import DATA_AXIS

            constraint = NamedSharding(mesh, P(DATA_AXIS))

        def epoch_fn(unet_params, opt_state, images, conds, idx, key):
            def body(carry, ids):
                p, o, key = carry
                key, k = jax.random.split(key)
                img = jnp.take(images, ids, axis=0)
                cnd = jnp.take(conds, ids, axis=0)
                if constraint is not None:
                    img = jax.lax.with_sharding_constraint(img, constraint)
                    cnd = jax.lax.with_sharding_constraint(cnd, constraint)
                p, o, loss = train_step(p, o, img, cnd, k)
                return (p, o, key), loss

            (p, o, key), losses = jax.lax.scan(
                body, (unet_params, opt_state, key), idx)
            return p, o, key, losses

        # donate params + opt state: buffers are reused across epochs
        # instead of copied (train_epochs reassigns both from the return)
        self._epoch_fn = jax.jit(epoch_fn, donate_argnums=(0, 1))

        def denoise_pair(unet_params, z, context, context_uncond, t):
            both_z = jnp.concatenate([z, z])
            both_ctx = jnp.concatenate([context_uncond, context])
            both_t = jnp.concatenate([t, t])
            out = self.unet.apply({"params": unet_params}, both_z, both_ctx,
                                  both_t)
            uncond, cond = jnp.split(out, 2)
            return uncond + c.guidance_scale * (cond - uncond)

        self._denoise_pair = jax.jit(denoise_pair)

        # the whole CFG sampling loop as ONE program: lax.scan over the
        # precomputed coefficient tables (DDPMScheduler.step_tables); the
        # key schedule mirrors the Python oracle exactly (split per step,
        # normal drawn per step, sigma=0 makes the terminal step
        # deterministic), so scan == loop to f32 table rounding
        def sample_fn(unet_params, z, context, context_u, tables, key):
            def body(carry, i):
                z, key = carry
                t_arr = jnp.full((z.shape[0],), tables["t"][i], jnp.int32)
                eps = denoise_pair(unet_params, z, context, context_u, t_arr)
                key, kstep = jax.random.split(key)
                noise = jax.random.normal(kstep, z.shape, z.dtype)
                z = self.scheduler.step_scan(eps, i, z, tables, noise)
                return (z, key), None

            (z, _), _ = jax.lax.scan(body, (z, key),
                                     jnp.arange(tables["t"].shape[0]))
            return z

        self._sample_fn = jax.jit(sample_fn)
        self._decode = jax.jit(
            lambda z: self.vae.apply({"params": self.vae_params},
                                     z / self.vae.scaling_factor,
                                     method=VAE.decode))

    # ------------------------------------------------------------------
    def train_batch(self, image: jnp.ndarray, cond: jnp.ndarray) -> float:
        """One micro-batch (oracle path — one dispatch per batch; use
        train_epochs for the scanned device-resident loop)."""
        self._key, k = jax.random.split(self._key)
        self.unet_params, self.opt_state, loss = self._train_step(
            self.unet_params, self.opt_state, image, cond, k)
        self.step += 1
        return float(loss)

    # ------------------------------------------------------------------
    def train_epochs(
        self,
        image: jnp.ndarray,            # (N, H, W, C_img)
        cond: jnp.ndarray,             # (N, H, W, C_cond) or (N, 77) tokens
        epochs: int = 1,
        batch_size: int = 1,
        shuffle: bool = True,
        shuffle_seed: int = 0,
    ) -> list:
        """Device-resident training: the dataset moves to HBM once and
        each epoch compiles to ONE lax.scan program over shuffled batch
        gathers (reference 4.train.ipynb cell 5 Python-loops epochs x
        batches with a shuffle=True DataLoader). Remainder samples that
        don't fill a batch are dropped, like the oracle loop in
        cli.cmd_diffusion and the reference's accumulation window.
        Returns per-micro-batch losses (epochs * n_batches floats)."""
        n = int(image.shape[0])
        bs = int(batch_size)
        n_batches = n // bs
        if n_batches == 0:
            raise ValueError(f"batch_size {bs} exceeds dataset size {n}")
        images = jnp.asarray(image)
        conds = jnp.asarray(cond)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            images = jax.device_put(images, rep)
            conds = jax.device_put(conds, rep)
        rng = np.random.default_rng(shuffle_seed)
        losses = []
        for _ in range(int(epochs)):
            order = rng.permutation(n) if shuffle else np.arange(n)
            idx = jnp.asarray(order[: n_batches * bs].reshape(n_batches, bs)
                              .astype(np.int32))
            self.unet_params, self.opt_state, self._key, ls = self._epoch_fn(
                self.unet_params, self.opt_state, images, conds, idx,
                self._key)
            self.step += n_batches
            losses.extend(float(x) for x in np.asarray(ls))
        return losses

    # ------------------------------------------------------------------
    def save_checkpoint(self, directory) -> str:
        """Full-state orbax checkpoint (UNet params, optimizer state incl.
        the MultiSteps accumulation counters, PRNG key, step) — the same
        real-resume contract as ModelTrainer (the reference's diffusion
        notebook saves weights-only at the END of 400 epochs,
        4.train.ipynb cell 5/6)."""
        from gan_danet_tpu.core.checkpoint import save_train_state

        return save_train_state(directory, self._train_state(),
                                step=self.step)

    def restore_checkpoint(self, path) -> None:
        from gan_danet_tpu.core.checkpoint import restore_train_state

        state = restore_train_state(path, self._train_state())
        as_dev = jax.tree.map(jnp.asarray, state)
        self.unet_params = as_dev["unet_params"]
        self.opt_state = as_dev["opt_state"]
        self._key = as_dev["key"]
        self.step = int(state["step"])

    def _train_state(self):
        return {"unet_params": self.unet_params,
                "opt_state": self.opt_state,
                "key": self._key,
                "step": np.int64(self.step)}

    # ------------------------------------------------------------------
    def generate(
        self,
        cond: jnp.ndarray,
        uncond: Optional[jnp.ndarray] = None,
        image_hw: Optional[Tuple[int, int]] = None,
        num_inference_steps: Optional[int] = None,
        key: Optional[jax.Array] = None,
        jit: bool = True,
    ) -> jnp.ndarray:
        """CFG sampling (reference 5.test `generate`): 50 UNet denoise
        steps, conditional/unconditional pair, VAE decode.

        jit=True (default) runs the whole loop as ONE compiled lax.scan
        over precomputed coefficient tables; jit=False is the per-step
        Python oracle (one dispatch + host scheduler math per step) kept
        for parity testing — both consume the identical key schedule, so
        they agree to f32 table rounding (tests/test_diffusion.py)."""
        c = self.config
        key = key if key is not None else jax.random.PRNGKey(0)
        b = cond.shape[0]
        f = self._latent_factor
        if image_hw is None:
            hw = (32, 32)
        else:
            hw = image_hw
        z = jax.random.normal(key, (b, hw[0] // f, hw[1] // f,
                                    c.latent_channels))
        context = self.cond_encoder.apply({"params": self.cond_params}, cond)
        if uncond is None:
            uncond = jnp.zeros_like(cond)
        context_u = self.cond_encoder.apply({"params": self.cond_params},
                                            uncond)

        steps = num_inference_steps or c.num_inference_steps
        if jit:
            tables = self.scheduler.step_tables(steps)
            z = self._sample_fn(self.unet_params, z, context, context_u,
                                tables, key)
            return self._decode(z)
        timesteps = self.scheduler.set_timesteps(steps)
        for t in timesteps:
            key, kstep = jax.random.split(key)
            t_arr = jnp.full((b,), int(t), jnp.int32)
            eps = self._denoise_pair(self.unet_params, z, context, context_u,
                                     t_arr)
            z = self.scheduler.step(eps, int(t), z, key=kstep)
        return self._decode(z)
