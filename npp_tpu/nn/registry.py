"""Named feature-extractor registry (reference: models/model_def.py:22-36).

The reference registers alexnet/alexnet5/resnet/vgg defs but only the
AlexNet conv1 hook is functional (its ResNet/VGG defs import modules that do
not exist — SURVEY.md §2.4); here every registered name works.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from .features import (ALEX_LPIPS_TAPS, VGG16_BLOCKS, VGG19_BLOCKS,
                       AlexNetFeatures, VGGFeatures)
from .pretrained import load_tower_params


def get_feature_extractor(name: str):
    """Returns (apply_fn, default_tap): apply_fn(img_nhwc) -> {tap: act}."""
    if name == 'alexnet':
        module, weights, tap = AlexNetFeatures(owt=True), 'alexnet_owt', 'conv1'
    elif name == 'alexnet_tv':
        module, weights, tap = AlexNetFeatures(owt=False), 'alexnet_tv', 'relu1'
    elif name == 'vgg16':
        module, weights, tap = VGGFeatures(blocks=VGG16_BLOCKS), 'vgg16', 'relu3_3'
    elif name == 'vgg19':
        module, weights, tap = VGGFeatures(blocks=VGG19_BLOCKS), 'vgg19', 'relu3_4'
    else:
        raise NotImplementedError(f'Unknown model name: {name}.')
    params = load_tower_params(weights, module, jnp.zeros((1, 64, 64, 3)))

    def apply_fn(img):
        return module.apply({'params': params}, img)

    return apply_fn, tap


def get_available_models():
    """reference: model_def.py:18-19."""
    return ['alexnet', 'alexnet_tv', 'vgg16', 'vgg19']
