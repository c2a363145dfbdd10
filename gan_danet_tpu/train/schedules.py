"""Learning-rate schedules.

`cosine_warm_restarts` replicates torch CosineAnnealingWarmRestarts
(T_0, T_mult=2, eta_min) stepped once per EPOCH (the reference calls
scheduler.step() at epoch end, GAN_DANet_train.ipynb cell 0), expressed as
an optax schedule over the global step count.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_warm_restarts(
    base_lr: float,
    steps_per_epoch: int,
    t_0: int = 10,
    t_mult: int = 2,
    eta_min: float = 1e-6,
):
    """lr(epoch) = eta_min + (base-eta_min) * (1 + cos(pi*t_cur/T_i)) / 2,
    where epochs accumulate in cycles of length T_0, T_0*t_mult, ... ."""
    if t_mult < 1:
        raise ValueError("t_mult must be >= 1")

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        epoch = jnp.floor(epoch)
        if t_mult == 1:
            t_cur = jnp.mod(epoch, t_0)
            t_i = jnp.asarray(t_0, jnp.float32)
        else:
            # cycle k starts at T_0*(t_mult^k - 1)/(t_mult - 1)
            ratio = epoch * (t_mult - 1) / t_0 + 1.0
            k = jnp.floor(jnp.log(ratio) / np.log(t_mult))
            start = t_0 * (jnp.power(float(t_mult), k) - 1.0) / (t_mult - 1)
            t_i = t_0 * jnp.power(float(t_mult), k)
            t_cur = epoch - start
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))
        return eta_min + (base_lr - eta_min) * cos

    return schedule
