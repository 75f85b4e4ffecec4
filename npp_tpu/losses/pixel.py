"""Pixel-space losses (reference: models/mse_calculator.py:13-29)."""
from __future__ import annotations

import jax.numpy as jnp

from .robust import AdaptiveLossParams, adaptive_lossfun, general_lossfun


def img2mse(pred: jnp.ndarray, gt: jnp.ndarray, loss_type: str,
            adaptive: AdaptiveLossParams | None = None,
            mask: jnp.ndarray | None = None,
            scale_lo: float = 1e-5) -> jnp.ndarray:
    """Masked robust pixel loss (reference: mse_calculator.py:13-27).

    mask weights known pixels 1.0 and unknown 0.3 via
    diff = diff*mask + (1-mask)*diff*0.3.

    scale_lo bounds the adaptive scale below (cfg.adaptive_scale_lo;
    reference default 1e-5 — see the config comment for why extended
    schedules raise it).
    """
    diff = pred - gt
    if mask is not None:
        diff = diff * mask + (1.0 - mask) * diff * 0.3

    if loss_type == 'robust_loss':
        loss = general_lossfun(diff, alpha=jnp.asarray(2.0), scale=jnp.asarray(0.1))
    elif loss_type == 'l2':
        loss = jnp.square(diff)
    elif loss_type == 'robust_loss_adaptive':
        if adaptive is None:
            raise ValueError('robust_loss_adaptive requires AdaptiveLossParams')
        loss = adaptive_lossfun(diff.reshape(-1, diff.shape[-1]), adaptive,
                                scale_lo=scale_lo)
    else:
        raise ValueError(f'Unknown loss_type: {loss_type}')
    return jnp.mean(loss)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """reference: mse_calculator.py:29."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
