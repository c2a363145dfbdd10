"""The fused GAN train step (behavioural parity: GAN_DANet_train.ipynb
cell 0 `ModelTrainer.train`), redesigned as a single jitted function.

Per-batch semantics (faithful):
  1. inputs: lr = bicubic x0.5 of GRACE-0.5deg; down_aux = bicubic x0.25 of
     the 45ch aux stack; x = concat -> (B, 22, 45, 46)
  2. G forward in train mode (batch stats update once per batch)
  3. D update first: BCE(real=GRACE-0.25deg -> 1) + BCE(detached fake -> 0),
     halved; AdamW(4e-4, betas 0.5/0.999, wd 1e-4)
  4. G update against the *updated* D: (1-w)*MSE + w*adv + TV + perceptual,
     curriculum w = epoch/epochs; AdamW(2e-4)

TPU-first details: the whole D-then-G sequence compiles into one XLA
program; batches shard over the mesh 'data' axis (gradient allreduce over
ICI is inserted by XLA from sharding annotations); compute dtype is
configurable bf16 with f32 params/BN stats.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gan_danet_tpu.models.losses import GeneratorLoss, discriminator_loss
from gan_danet_tpu.ops.resize import resize2d


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    d_params: Any
    d_opt_state: Any


def build_inputs(batch: Dict[str, jnp.ndarray], coarse_hw: Tuple[int, int]):
    """Training input construction (the 'core trick', SURVEY.md §2.5):
    coarsen both modalities to the 0.5deg-halved grid and concat."""
    lr = resize2d(batch["lr05"], coarse_hw, "bicubic")
    down_aux = resize2d(batch["aux"], coarse_hw, "bicubic")
    return jnp.concatenate([lr, down_aux], axis=-1)


def make_train_step(
    generator,
    discriminator,
    g_loss: GeneratorLoss,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    coarse_hw: Tuple[int, int],
    compute_dtype: jnp.dtype = jnp.float32,
) -> Callable:
    """Returns jitted step(state, batch, loss_weight) -> (state, metrics)."""

    def step(state: GANTrainState, batch, loss_weight):
        # build_inputs stays f32 (bf16-before-resize was measured NEUTRAL
        # inside the fused step — XLA overlaps the resize DMA; DESIGN.md §8)
        x = build_inputs(batch, coarse_hw).astype(compute_dtype)
        real = batch["lr025"].astype(compute_dtype)

        # --- G forward ONCE via vjp: the same `fake` feeds the D update
        # (detached) and the G update (gradients pulled back through the
        # saved linearisation) — exactly the reference's reuse of one
        # autograd graph, and one full G forward cheaper than re-running
        # the generator inside the G loss. ---
        def gen_fwd(g_params):
            out, mutated = generator.apply(
                {"params": g_params, "batch_stats": state.g_batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return out, mutated["batch_stats"]

        fake, gen_vjp, new_g_stats = jax.vjp(gen_fwd, state.g_params,
                                             has_aux=True)

        # --- D update (fake detached) ---
        # ONE batched apply over concat(real, fake): Discriminator1 has no
        # cross-batch coupling (convs + LeakyReLU + linears, no BN), so this
        # is semantics-preserving and halves dispatch/pipeline overhead at
        # the small 88x180 spatial size.
        def d_loss_fn(d_params):
            both = jnp.concatenate([real, jax.lax.stop_gradient(fake)], axis=0)
            logits = discriminator.apply({"params": d_params}, both)
            bsz = real.shape[0]
            return discriminator_loss(logits[:bsz], logits[bsz:])

        loss_d, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt_state,
                                           state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # --- G update against the updated D (reference ordering) ---
        def g_loss_from_fake(fake_):
            fake_logits = discriminator.apply({"params": new_d_params}, fake_)
            total, aux = g_loss(fake_logits, fake_.astype(jnp.float32),
                                real.astype(jnp.float32), loss_weight)
            return total, aux

        (loss_g, aux), fake_grad = jax.value_and_grad(
            g_loss_from_fake, has_aux=True)(fake)
        (g_grads,) = gen_vjp(fake_grad)
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt_state,
                                           state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params,
            g_batch_stats=new_g_stats,
            g_opt_state=new_g_opt,
            d_params=new_d_params,
            d_opt_state=new_d_opt,
        )
        metrics = {"loss_d": loss_d, "loss_g": loss_g, **aux}
        return new_state, metrics

    jitted = jax.jit(step)
    jitted.raw = step  # unjitted form for member-stacking/shard_map wrapping
    return jitted


def make_eval_step(generator, coarse_hw, compute_dtype=jnp.float32) -> Callable:
    """Eval forward: same coarsened-input construction, BN running stats
    (reference ModelTrainer.evaluate)."""

    def step(g_params, g_batch_stats, batch):
        x = build_inputs(batch, coarse_hw).astype(compute_dtype)
        pred = generator.apply(
            {"params": g_params, "batch_stats": g_batch_stats}, x, train=False,
        )
        return pred.astype(jnp.float32)

    return jax.jit(step)


@functools.lru_cache(maxsize=64)
def _jitted_gen_init(generator):
    """Per-module jitted init. flax linen Modules are frozen dataclasses
    (hash/eq by configuration), so equal-config modules share one compiled
    init — without this cache every ensemble member re-jitted a fresh
    lambda and recompiled the identical program through the remote-compile
    tunnel (~minutes per member)."""
    return jax.jit(lambda k, x: generator.init(k, x, train=True))


@functools.lru_cache(maxsize=64)
def _jitted_disc_init(discriminator):
    return jax.jit(discriminator.init)


def init_gan_state(
    generator,
    discriminator,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    sample_batch: Dict[str, jnp.ndarray],
    coarse_hw: Tuple[int, int],
    seed: int = 42,
) -> GANTrainState:
    x = build_inputs(jax.tree.map(jnp.asarray, sample_batch), coarse_hw)
    kg, kd = jax.random.split(jax.random.PRNGKey(seed))
    # jit the inits: unjitted flax init dispatches thousands of tiny ops
    # (minutes over a remote-tunnel TPU); one compiled program is seconds
    g_vars = _jitted_gen_init(generator)(kg, x)
    fake_shape = jax.eval_shape(
        lambda v, x: generator.apply(
            {"params": v["params"],
             "batch_stats": v.get("batch_stats", {})}, x, train=False),
        g_vars, x,
    )
    d_vars = _jitted_disc_init(discriminator)(kd, jnp.zeros(fake_shape.shape,
                                                            fake_shape.dtype))
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars["params"],
        g_batch_stats=g_vars.get("batch_stats", {}),
        g_opt_state=g_tx.init(g_vars["params"]),
        d_params=d_vars["params"],
        d_opt_state=d_tx.init(d_vars["params"]),
    )
