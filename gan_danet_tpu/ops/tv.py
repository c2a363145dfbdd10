"""Anisotropic total-variation loss, matching TVLoss
(reference models/losses.py:76-87):

  weight * 2 * (sum(dh^2)/count_h + sum(dw^2)/count_w) / batch_size

NHWC layout.
"""
from __future__ import annotations

import jax.numpy as jnp


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """x: (B, H, W, C)."""
    xf = x.astype(jnp.float32)
    b = x.shape[0]
    dh = xf[:, 1:, :, :] - xf[:, :-1, :, :]
    dw = xf[:, :, 1:, :] - xf[:, :, :-1, :]
    h_tv = jnp.sum(dh * dh) / dh.size
    w_tv = jnp.sum(dw * dw) / dw.size
    # Faithful quirk: the reference normalises by element count (which already
    # includes B) AND divides by batch size again — that extra /B is part of
    # the loss scale and must be matched for training-dynamics parity.
    return weight * 2.0 * (h_tv + w_tv) / b
