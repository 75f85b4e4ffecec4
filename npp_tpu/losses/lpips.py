"""LPIPS perceptual metric/loss in JAX (NHWC).

Functional port of the reference's modified LPIPS
(reference: externel_lib/lpips/lpips.py:27-133), including the repo's two
modifications: per-layer adaptive-robust diffs (`use_robust`,
lpips.py:103-113) and spatial mode (upsampled per-layer maps, :115-124) used
by the segmentation criterion (NPP_segmentation/train.py:360-389).

The conv tower weights resolve through npp_tpu.nn.pretrained (converted
checkpoints or deterministic fallback); the linear calibration heads ship as
converted assets (externel_lib/lpips/weights/v0.1/*.pth).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.features import (ALEX_LPIPS_TAPS, SQUEEZE_LPIPS_TAPS, VGG16_BLOCKS,
                           VGG16_LPIPS_TAPS, AlexNetFeatures,
                           SqueezeNetFeatures, VGGFeatures)
from ..nn.pretrained import load_lpips_lins, load_tower_params
from .robust import AdaptiveLossParams, adaptive_init, adaptive_lossfun

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

LPIPS_CHNS = {
    'vgg': (64, 128, 256, 512, 512),
    'alex': (64, 192, 384, 256, 256),
    'squeeze': (64, 128, 256, 384, 384, 512, 512),
}


def normalize_tensor(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Channel-unit-norm (reference: lpips/__init__.py:41-43). NHWC."""
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


class LPIPS:
    """Callable LPIPS. Images are NHWC float.

    __call__(in0, in1, use_robust=False, adaptive=None, normalize=False,
             spatial=False, ret_per_layer=False)
      normalize=True maps [0,1] inputs to [-1,1] first
      adaptive: per-layer AdaptiveLossParams tuple (trainable) for use_robust
    """

    def __init__(self, net: str = 'vgg', lpips: bool = True,
                 dtype=jnp.float32):
        self.net = net
        self.lpips = lpips
        self.chns = LPIPS_CHNS[net]
        if net == 'vgg':
            self.module = VGGFeatures(blocks=VGG16_BLOCKS, dtype=dtype)
            self.taps: Sequence[str] = VGG16_LPIPS_TAPS
            tower_name = 'vgg16'
        elif net == 'alex':
            self.module = AlexNetFeatures(owt=False, dtype=dtype)
            self.taps = ALEX_LPIPS_TAPS
            tower_name = 'alexnet_tv'
        elif net == 'squeeze':
            self.module = SqueezeNetFeatures(dtype=dtype)
            self.taps = SQUEEZE_LPIPS_TAPS
            tower_name = 'squeeze_tv'
        else:
            raise ValueError(f'unsupported LPIPS net {net!r}')
        self.params = load_tower_params(tower_name, self.module,
                                        jnp.zeros((1, 64, 64, 3)))
        lins = load_lpips_lins(net)
        if lins is None:
            # uncalibrated fallback: uniform positive head (baseline average)
            lins = {f'lin{i}': jnp.ones((c,)) / c for i, c in enumerate(self.chns)}
        self.lins = [lins[f'lin{i}'] for i in range(len(self.chns))]

    def init_adaptive(self) -> Tuple[AdaptiveLossParams, ...]:
        """Trainable per-layer robust latents (reference: lpips.py:57-61)."""
        return tuple(adaptive_init(c) for c in self.chns)

    def features(self, img: jnp.ndarray) -> List[jnp.ndarray]:
        outs = self.module.apply({'params': self.params}, img)
        return [outs[t] for t in self.taps]

    def __call__(self, in0: jnp.ndarray, in1: jnp.ndarray,
                 use_robust: bool = False,
                 adaptive: Optional[Tuple[AdaptiveLossParams, ...]] = None,
                 normalize: bool = False, spatial: bool = False,
                 ret_per_layer: bool = False, robust_layout: str = 'nc'):
        if normalize:
            in0 = 2.0 * in0 - 1.0
            in1 = 2.0 * in1 - 1.0
        in0 = (in0 - _SHIFT) / _SCALE
        in1 = (in1 - _SHIFT) / _SCALE

        feats0 = self.features(in0)
        feats1 = self.features(in1)

        res = []
        for kk, (f0, f1) in enumerate(zip(feats0, feats1)):
            d = normalize_tensor(f0) - normalize_tensor(f1)
            if use_robust:
                if adaptive is None:
                    raise ValueError('use_robust requires adaptive params')
                n, h, w, c = d.shape
                if robust_layout == 'cn' and self.lpips:
                    # value-identical transposed evaluation (see
                    # losses/pixel.py img2mse layout): the per-layer robust
                    # NLL and the lin-weighted channel sum both run on
                    # (C, N*H*W) — lane dim is the 128-multiple row count
                    # instead of the sometimes-64 channel count, and the
                    # channel sum never transposes back
                    from .robust import adaptive_alpha, adaptive_scale, nllfun
                    x = d.reshape(-1, c).T                       # (C, NHW)
                    a = adaptive_alpha(adaptive[kk])             # (1, C)
                    s = adaptive_scale(adaptive[kk])
                    lf = nllfun(x, a.T, s.T)                     # (C, NHW)
                    m = jnp.sum(lf * self.lins[kk][:, None],
                                axis=0).reshape(n, h, w, 1)
                    if spatial:
                        m = jax.image.resize(
                            m, (m.shape[0], in0.shape[1], in0.shape[2], 1),
                            method='bilinear')
                    else:
                        m = jnp.mean(m, axis=(1, 2), keepdims=True)
                    res.append(m)
                    continue
                diff = adaptive_lossfun(d.reshape(-1, c), adaptive[kk])
                diff = diff.reshape(n, h, w, c)
            else:
                diff = jnp.square(d)
            if self.lpips:
                m = jnp.sum(diff * self.lins[kk], axis=-1, keepdims=True)
            else:
                m = jnp.sum(diff, axis=-1, keepdims=True)
            if spatial:
                m = jax.image.resize(m, (m.shape[0], in0.shape[1],
                                         in0.shape[2], 1), method='bilinear')
            else:
                m = jnp.mean(m, axis=(1, 2), keepdims=True)
            res.append(m)

        val = sum(res[1:], res[0])
        if ret_per_layer:
            return val, res
        return val
