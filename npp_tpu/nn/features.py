"""Pretrained conv feature towers (AlexNet / VGG16 / VGG19) in flax, NHWC.

These back the proposal stage's feature search and the three patch losses
(reference: models/alexnet.py, externel_lib/lpips/pretrained_networks.py,
externel_lib/contextual_loss/modules/vgg.py, models/style_loss.py:10-14).

Layout is NHWC (TPU-native); weight conversion from torch OIHW checkpoints is
handled in `npp_tpu.nn.pretrained`. Each tower returns a dict of named
activations; callers consume the subset they need and XLA dead-code-eliminates
the rest of the graph.

Capture-point naming:
 - VGG:    relu{block}_{idx} after each ReLU, pool{block} after each maxpool.
 - AlexNet: conv1 (pre-ReLU, the proposal feature; reference:
   models/model_def.py:113-116 hooks features[0]) and relu1..relu5
   (the LPIPS-alex taps, reference: pretrained_networks.py:66-74).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# (convs_per_block, channels) per block
VGG16_BLOCKS: Tuple[Tuple[int, int], ...] = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))
VGG19_BLOCKS: Tuple[Tuple[int, int], ...] = ((2, 64), (2, 128), (4, 256), (4, 512), (4, 512))

# LPIPS taps (reference: pretrained_networks.py:106-114 / torchvision layout)
VGG16_LPIPS_TAPS = ('relu1_2', 'relu2_2', 'relu3_3', 'relu4_3', 'relu5_3')
ALEX_LPIPS_TAPS = ('relu1', 'relu2', 'relu3', 'relu4', 'relu5')
SQUEEZE_LPIPS_TAPS = tuple(f'relu{i}' for i in range(1, 8))
# Style-loss taps: torchvision vgg16.features[:5], [5:10], [10:17]
# end after the block's maxpool (reference: models/style_loss.py:11-14)
VGG16_STYLE_TAPS = ('pool1', 'pool2', 'pool3')
# Contextual default tap (reference: contextual_loss/modules/contextual.py:29)
VGG19_CX_TAP = 'relu3_4'

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class VGGFeatures(nn.Module):
    """VGG-16/19 conv tower; returns all relu/pool activations by name."""

    blocks: Tuple[Tuple[int, int], ...] = VGG16_BLOCKS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        outs: Dict[str, jnp.ndarray] = {}
        x = x.astype(self.dtype)
        conv_idx = 0
        for b, (n_convs, ch) in enumerate(self.blocks, start=1):
            for i in range(1, n_convs + 1):
                x = nn.Conv(ch, (3, 3), padding=1, name=f'conv{conv_idx}',
                            dtype=self.dtype)(x)
                conv_idx += 1
                x = nn.relu(x)
                outs[f'relu{b}_{i}'] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            outs[f'pool{b}'] = x
        return outs


class AlexNetFeatures(nn.Module):
    """AlexNet conv tower.

    owt=True reproduces the reference's local checkpoint variant
    (conv1 padding 5, padded maxpools; reference: models/alexnet.py:18-32);
    owt=False is the torchvision layout used by LPIPS-alex
    (conv1 padding 2, unpadded maxpools).
    """

    owt: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        outs: Dict[str, jnp.ndarray] = {}
        x = x.astype(self.dtype)
        p1 = 5 if self.owt else 2
        pool_pad = ((1, 1), (1, 1)) if self.owt else 'VALID'

        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=p1, name='conv0',
                    dtype=self.dtype)(x)
        outs['conv1'] = x
        x = nn.relu(x)
        outs['relu1'] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)

        x = nn.Conv(192, (5, 5), padding=2, name='conv1', dtype=self.dtype)(x)
        x = nn.relu(x)
        outs['relu2'] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)

        x = nn.Conv(384, (3, 3), padding=1, name='conv2', dtype=self.dtype)(x)
        x = nn.relu(x)
        outs['relu3'] = x
        x = nn.Conv(256, (3, 3), padding=1, name='conv3', dtype=self.dtype)(x)
        x = nn.relu(x)
        outs['relu4'] = x
        x = nn.Conv(256, (3, 3), padding=1, name='conv4', dtype=self.dtype)(x)
        x = nn.relu(x)
        outs['relu5'] = x
        return outs


def _ceil_max_pool(x: jnp.ndarray, window: int = 3,
                   stride: int = 2) -> jnp.ndarray:
    """torch MaxPool2d(ceil_mode=True): pad bottom/right with -inf just
    enough that the last partial window is kept (pad <= stride-1, so no
    window starts inside the padding)."""
    h, w = x.shape[1], x.shape[2]
    ph = (-(h - window)) % stride
    pw = (-(w - window)) % stride
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class Fire(nn.Module):
    """SqueezeNet fire module: 1x1 squeeze -> parallel 1x1/3x3 expands,
    each ReLU'd, channel-concatenated (torchvision squeezenet1_1.Fire)."""

    squeeze: int
    expand: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name='squeeze',
                            dtype=self.dtype)(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name='expand1x1',
                             dtype=self.dtype)(s))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=1,
                             name='expand3x3', dtype=self.dtype)(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """SqueezeNet 1.1 feature tower, the LPIPS 'squeeze' trunk
    (reference: externel_lib/lpips/pretrained_networks.py:5-54; slice taps
    relu1..relu7 with channels 64/128/256/384/384/512/512). Fire modules are
    named by their torchvision features index for weight conversion."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        outs: Dict[str, jnp.ndarray] = {}
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding='VALID',
                    name='conv0', dtype=self.dtype)(x)
        x = nn.relu(x)
        outs['relu1'] = x
        x = _ceil_max_pool(x)
        x = Fire(16, 64, name='fire3', dtype=self.dtype)(x)
        x = Fire(16, 64, name='fire4', dtype=self.dtype)(x)
        outs['relu2'] = x
        x = _ceil_max_pool(x)
        x = Fire(32, 128, name='fire6', dtype=self.dtype)(x)
        x = Fire(32, 128, name='fire7', dtype=self.dtype)(x)
        outs['relu3'] = x
        x = _ceil_max_pool(x)
        x = Fire(48, 192, name='fire9', dtype=self.dtype)(x)
        outs['relu4'] = x
        x = Fire(48, 192, name='fire10', dtype=self.dtype)(x)
        outs['relu5'] = x
        x = Fire(64, 256, name='fire11', dtype=self.dtype)(x)
        outs['relu6'] = x
        x = Fire(64, 256, name='fire12', dtype=self.dtype)(x)
        outs['relu7'] = x
        return outs


def imagenet_normalize(img01: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std on [0,1] NHWC images."""
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD
