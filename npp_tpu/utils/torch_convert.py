"""Torch checkpoint -> flax-naming converter (lazy torch dependency).

Maps torchvision `features.{i}.weight/bias` (OIHW) onto the sequential
`conv{n}/kernel,bias` (HWIO) naming of npp_tpu.nn.features towers.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _seq_conv_map(state: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """Renumber features.{idx} conv layers to conv0..N in index order."""
    conv_ids = sorted({int(k.split('.')[1]) for k in state
                       if k.startswith('features.') and k.endswith('.weight')
                       and state[k].ndim == 4})
    out = {}
    for n, i in enumerate(conv_ids):
        w = np.asarray(state[f'features.{i}.weight'])  # (O, I, H, W)
        b = np.asarray(state[f'features.{i}.bias'])
        out[f'conv{n}/kernel'] = w.transpose(2, 3, 1, 0)  # HWIO
        out[f'conv{n}/bias'] = b
    return out


def _squeeze_map(state: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """torchvision squeezenet1_1: features.0 conv + Fire modules at indices
    3,4,6,7,9,10,11,12 with squeeze/expand1x1/expand3x3 convs each."""
    def hwio(w):
        return np.asarray(w).transpose(2, 3, 1, 0)

    out = {'conv0/kernel': hwio(state['features.0.weight']),
           'conv0/bias': np.asarray(state['features.0.bias'])}
    for i in (3, 4, 6, 7, 9, 10, 11, 12):
        for part in ('squeeze', 'expand1x1', 'expand3x3'):
            out[f'fire{i}/{part}/kernel'] = hwio(
                state[f'features.{i}.{part}.weight'])
            out[f'fire{i}/{part}/bias'] = np.asarray(
                state[f'features.{i}.{part}.bias'])
    return out


def convert_state_dict(name: str, path: str) -> Dict[str, np.ndarray]:
    import torch
    state = torch.load(path, map_location='cpu')
    if hasattr(state, 'state_dict'):
        state = state.state_dict()
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, 'numpy')}
    if name in ('alexnet_owt', 'alexnet_tv', 'vgg16', 'vgg19'):
        return _seq_conv_map(state)
    if name == 'squeeze_tv':
        return _squeeze_map(state)
    raise ValueError(f'No converter for weight set {name!r}')
