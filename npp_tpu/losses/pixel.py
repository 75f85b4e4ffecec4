"""Pixel-space losses (reference: models/mse_calculator.py:13-29)."""
from __future__ import annotations

import jax.numpy as jnp

from .robust import (AdaptiveLossParams, adaptive_alpha, adaptive_lossfun,
                     adaptive_scale, general_lossfun, nllfun)


def img2mse(pred: jnp.ndarray, gt: jnp.ndarray, loss_type: str,
            adaptive: AdaptiveLossParams | None = None,
            mask: jnp.ndarray | None = None,
            scale_lo: float = 1e-5, layout: str = 'nc') -> jnp.ndarray:
    """Masked robust pixel loss (reference: mse_calculator.py:13-27).

    mask weights known pixels 1.0 and unknown 0.3 via
    diff = diff*mask + (1-mask)*diff*0.3.

    scale_lo bounds the adaptive scale below (cfg.adaptive_scale_lo;
    reference default 1e-5 — see the config comment for why extended
    schedules raise it).

    layout (cfg.robust_layout; TPU-repo addition, value-identical):
    'nc' = the reference's (rows, channels) residual, whose minor dim 3 is
    lane-padded to 128 on TPU; 'cn' evaluates the same elementwise NLL on
    the transposed (channels, rows) residual (params broadcast per-row),
    trading a 42x lane pad for an 8/3 sublane pad.
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
        if layout == 'cn':
            x = diff.reshape(-1, diff.shape[-1]).T       # (C, N)
            a = adaptive_alpha(adaptive)                 # (1, C)
            s = adaptive_scale(adaptive, scale_lo=scale_lo)
            loss = nllfun(x, a.T, s.T)
        else:
            loss = adaptive_lossfun(diff.reshape(-1, diff.shape[-1]),
                                    adaptive, scale_lo=scale_lo)
    else:
        raise ValueError(f'Unknown loss_type: {loss_type}')
    return jnp.mean(loss)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """reference: mse_calculator.py:29."""
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
