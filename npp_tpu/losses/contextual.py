"""Contextual (CX) loss in JAX, NHWC.

Functional port of the cosine-distance contextual loss
(reference: externel_lib/contextual_loss/functional.py:9-63,127-186 and
modules/contextual.py:9-68). Only the VGG19/relu3_4 path the reference
exercises is kept; the CoBi bilateral variant is dead code there
(SURVEY.md §2.4).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.features import (VGG19_BLOCKS, VGG19_CX_TAP, VGGFeatures,
                           imagenet_normalize)
from ..nn.pretrained import load_tower_params


def compute_cosine_distance(x: jnp.ndarray, y: jnp.ndarray,
                            feat_valid: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """x, y: (N, H, W, C) -> dist (N, HW_x, HW_y)
    (reference: functional.py:127-163).

    feat_valid: optional (N, H, W) mask — the mean-shift statistic is then
    computed over valid positions only, so pad features cannot shift the
    cosine geometry of the valid ones."""
    # mean-shift by channel-wise mean of y over batch+space
    if feat_valid is not None:
        v = feat_valid[..., None].astype(y.dtype)
        y_mu = (jnp.sum(y * v, axis=(0, 1, 2), keepdims=True)
                / jnp.maximum(jnp.sum(v, axis=(0, 1, 2), keepdims=True), 1.0))
    else:
        y_mu = jnp.mean(y, axis=(0, 1, 2), keepdims=True)
    xc = x - y_mu
    yc = y - y_mu
    xn = xc / (jnp.linalg.norm(xc, axis=-1, keepdims=True) + 1e-12)
    yn = yc / (jnp.linalg.norm(yc, axis=-1, keepdims=True) + 1e-12)
    n, h, w, c = x.shape
    xm = xn.reshape(n, h * w, c)
    ym = yn.reshape(n, h * w, c)
    sim = jnp.einsum('npc,nqc->npq', xm, ym)
    sim = jnp.clip(sim, 0.0, 1.0)
    return 1.0 - sim


def compute_l1_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """|sum_c (x(p) - y(q))| (reference: functional.py:166-177 — the
    channel SUM is taken before the abs, and there is no channel
    normalisation), NHWC inputs."""
    n, h, w, c = x.shape
    xs = jnp.sum(x.reshape(n, h * w, c), axis=-1)   # (N, P)
    ys = jnp.sum(y.reshape(n, h * w, c), axis=-1)
    dist = jnp.abs(xs[:, :, None] - ys[:, None, :])
    return jnp.maximum(dist, 0.0)


def compute_l2_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(reference: functional.py:166-186), NHWC inputs."""
    n, h, w, c = x.shape
    xv = x.reshape(n, h * w, c)
    yv = y.reshape(n, h * w, c)
    x_s = jnp.sum(xv ** 2, axis=-1)  # (N, P)
    y_s = jnp.sum(yv ** 2, axis=-1)
    ab = jnp.einsum('npc,nqc->npq', xv, yv)
    dist = y_s[:, None, :] - 2 * ab + x_s[:, :, None]
    return jnp.maximum(dist, 0.0)


def compute_relative_distance(dist_raw: jnp.ndarray) -> jnp.ndarray:
    dist_min = jnp.min(dist_raw, axis=2, keepdims=True)
    return dist_raw / (dist_min + 1e-5)


def compute_cx(dist_tilde: jnp.ndarray, band_width: float) -> jnp.ndarray:
    w = jnp.exp((1.0 - dist_tilde) / band_width)
    return w / jnp.sum(w, axis=2, keepdims=True)


def contextual_loss(x: jnp.ndarray, y: jnp.ndarray, band_width: float = 0.5,
                    weight: Optional[jnp.ndarray] = None,
                    loss_type: str = 'cosine',
                    valid: Optional[jnp.ndarray] = None,
                    feat_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CX loss on feature maps (NHWC) (reference: functional.py:9-63).

    valid: optional (N,) bool — static-shape replacement for the reference's
    ragged patch drops: invalid samples contribute 0 and the unweighted
    aggregation becomes a masked mean over the survivors.

    feat_valid: optional (N, H, W) position mask, applied to BOTH x and y
    (the use case is aligned same-region crops). Invalid positions are
    excluded from the match entirely: they cannot be matched to (their
    distance is pushed out of the relative-distance min and the softmax),
    cannot win the per-target max, and are dropped from the final mean.
    With feature maps that were zero-padded spatially, the loss over the
    valid region is then independent of the pad extent (up to boundary
    receptive fields of the feature extractor).
    """
    if loss_type == 'cosine':
        dist_raw = compute_cosine_distance(x, y, feat_valid)
    elif loss_type == 'l1':
        dist_raw = compute_l1_distance(x, y)
    elif loss_type == 'l2':
        dist_raw = compute_l2_distance(x, y)
    else:
        raise ValueError(f'unsupported loss_type {loss_type!r}')
    if feat_valid is not None:
        fv = feat_valid.reshape(feat_valid.shape[0], -1)  # (N, P)
        fvd = fv.astype(dist_raw.dtype)
        # invalid target columns: never the min, softmax weight exp(-big)=0
        dist_raw = jnp.where(fv[:, None, :] > 0, dist_raw,
                             jnp.asarray(1e9, dist_raw.dtype))
    dist_tilde = compute_relative_distance(dist_raw)
    cx = compute_cx(dist_tilde, band_width)
    if feat_valid is not None:
        # invalid source rows can't win the max (softmax weights are >= 0);
        # masked mean over valid target positions
        cx = jnp.max(cx * fvd[:, :, None], axis=1)           # (N, Q)
        cx = jnp.sum(cx * fvd, axis=1) / jnp.maximum(jnp.sum(fvd, 1), 1.0)
    else:
        cx = jnp.mean(jnp.max(cx, axis=1), axis=1)  # (N,)
    if weight is not None:
        term = -jnp.log(cx * weight + 1e-5)
        if valid is not None:
            term = term * valid
        return jnp.sum(term)
    term = -jnp.log(cx + 1e-5)
    if valid is not None:
        v = valid.astype(term.dtype)
        return jnp.sum(term * v) / jnp.maximum(jnp.sum(v), 1.0)
    return jnp.mean(term)


class ContextualLoss:
    """VGG19 relu3_4 contextual loss on [0,1] NHWC images
    (reference: modules/contextual.py:25-68)."""

    def __init__(self, band_width: float = 0.5, use_vgg: bool = True,
                 vgg_layer: str = VGG19_CX_TAP, dtype=jnp.float32):
        self.band_width = band_width
        self.use_vgg = use_vgg
        self.vgg_layer = vgg_layer
        if use_vgg:
            self.module = VGGFeatures(blocks=VGG19_BLOCKS, dtype=dtype)
            self.params = load_tower_params('vgg19', self.module,
                                            jnp.zeros((1, 64, 64, 3)))

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 valid: Optional[jnp.ndarray] = None,
                 spatial_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """spatial_mask: optional (N, H, W, 1) image-resolution mask of REAL
        content; feature positions with (approximately) no overlap with it
        are excluded from the CX match — used by the proposal ranking to
        keep bucketed zero-pad crop area out of the score
        (cfg.cx_mask_pad; round-2 advisor finding on crop_bucket)."""
        if self.use_vgg:
            x = self.module.apply({'params': self.params},
                                  imagenet_normalize(x))[self.vgg_layer]
            y = self.module.apply({'params': self.params},
                                  imagenet_normalize(y))[self.vgg_layer]
            # The similarity chain (cosine distance -> relative distance ->
            # softmax) always runs in f32, whatever cfg.feature_dtype set
            # for the tower: bf16's 8-bit mantissa quantizes the relative
            # distances around the softmax's operating point and distorts
            # the GRADIENT (measured 5.6x grad-norm inflation at flagship
            # patch scales while the VALUE stayed within 9% — the round-5
            # feat_bf16 quality A/Bs were dominated by this, not by dtype
            # noise). The tower convs are the HBM-bound part; the chain's
            # f32 cost is minor. Regression:
            # tests/test_losses.py::test_feature_dtype_bf16_grad_close.
            x = x.astype(jnp.float32)
            y = y.astype(jnp.float32)
        feat_valid = None
        if spatial_mask is not None:
            n, fh, fw = x.shape[0], x.shape[1], x.shape[2]
            frac = jax.image.resize(
                spatial_mask.astype(jnp.float32),
                (spatial_mask.shape[0], fh, fw, 1), method='linear')
            feat_valid = jnp.broadcast_to(
                (frac[..., 0] > 1e-3).astype(jnp.float32), (n, fh, fw))
        return contextual_loss(x, y, self.band_width, weight, valid=valid,
                               feat_valid=feat_valid)
