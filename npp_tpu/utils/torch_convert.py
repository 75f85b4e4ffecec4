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


def convert_state_dict(name: str, path: str) -> Dict[str, np.ndarray]:
    import torch
    state = torch.load(path, map_location='cpu')
    if hasattr(state, 'state_dict'):
        state = state.state_dict()
    state = {k: v.numpy() for k, v in state.items() if hasattr(v, 'numpy')}
    if name in ('alexnet_owt', 'alexnet_tv', 'vgg16', 'vgg19'):
        return _seq_conv_map(state)
    raise ValueError(f'No converter for weight set {name!r}')
