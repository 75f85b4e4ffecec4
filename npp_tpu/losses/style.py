"""Gram-matrix style loss (reference: models/style_loss.py:8-74), NHWC.

Uses VGG16 enc_1..enc_3 = outputs after the first three maxpools
(reference: style_loss.py:11-14 slices torchvision vgg16.features at
[:5], [5:10], [10:17]). Inputs are raw [0,1] patches — the reference does NOT
ImageNet-normalise here.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..nn.features import VGG16_BLOCKS, VGG16_STYLE_TAPS, VGGFeatures
from ..nn.pretrained import load_tower_params
from .robust import AdaptiveLossParams, adaptive_init, adaptive_lossfun

STYLE_CHNS = (64, 128, 256)


class StyleLoss:
    def __init__(self, use_adaptive: bool = False, dtype=jnp.float32):
        self.use_adaptive = use_adaptive
        self.module = VGGFeatures(blocks=VGG16_BLOCKS, dtype=dtype)
        self.params = load_tower_params('vgg16', self.module,
                                        jnp.zeros((1, 64, 64, 3)))

    def init_adaptive(self) -> Tuple[AdaptiveLossParams, ...]:
        """One AdaptiveLossFunction per layer over the flattened Gram
        (num_dims = C^2; reference: style_loss.py:18-23)."""
        return tuple(adaptive_init(c * c) for c in STYLE_CHNS)

    def features(self, img: jnp.ndarray):
        outs = self.module.apply({'params': self.params}, img)
        return [outs[t] for t in VGG16_STYLE_TAPS]

    def __call__(self, a_img: jnp.ndarray, b_img: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 adaptive: Optional[Tuple[AdaptiveLossParams, ...]] = None,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        a_feats = self.features(a_img)
        b_feats = self.features(b_img)
        v = None if valid is None else valid.astype(jnp.float32)
        loss = 0.0
        for i, (fa, fb) in enumerate(zip(a_feats, b_feats)):
            n, h, w, c = fa.shape
            av = jnp.moveaxis(fa, -1, 1).reshape(n, c, h * w)
            bv = jnp.moveaxis(fb, -1, 1).reshape(n, c, h * w)
            ga = jnp.einsum('ncp,ndp->ncd', av, av)
            gb = jnp.einsum('ncp,ndp->ncd', bv, bv)
            denom = c * h * w

            def agg(per_sample):
                if weight is not None:
                    t = per_sample * weight
                    if v is not None:
                        t = t * v
                    return jnp.sum(t)
                if v is not None:
                    return jnp.sum(per_sample * v) / jnp.maximum(jnp.sum(v), 1.0)
                return jnp.mean(per_sample)

            if not self.use_adaptive:
                per = jnp.mean(jnp.abs(ga - gb) / denom, axis=(1, 2))
                loss = loss + agg(per)
            else:
                if adaptive is None:
                    raise ValueError('use_adaptive requires adaptive params')
                resid = (ga - gb).reshape(n, c * c)
                per = jnp.mean(adaptive_lossfun(resid, adaptive[i]) / denom,
                               axis=-1)
                loss = loss + agg(per)
        return loss
