#!/usr/bin/env python
"""Convert torchvision/torch checkpoints into npp_tpu weight assets.

Usage:
  python scripts/convert_torch_weights.py vgg16 /path/to/vgg16-*.pth
  python scripts/convert_torch_weights.py alexnet_owt /path/to/alexnet-owt-4df8aa71.pth

Writes npp_tpu/assets/<name>.npz (HWIO kernels, conv0..N naming). With
converted vgg16/vgg19/alexnet_owt/alexnet_tv assets present, LPIPS/contextual/
style losses and the proposal conv features match the published pretrained
behaviour; without them a deterministic fallback init is used (see
npp_tpu/nn/pretrained.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from npp_tpu.nn.pretrained import ASSET_DIR
from npp_tpu.utils.torch_convert import convert_state_dict


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        return 1
    name, path = sys.argv[1], sys.argv[2]
    flat = convert_state_dict(name, path)
    out = os.path.join(ASSET_DIR, f'{name}.npz')
    np.savez(out, **flat)
    print(f'wrote {out}: ' + ', '.join(f'{k}{v.shape}' for k, v in flat.items()))
    return 0


if __name__ == '__main__':
    sys.exit(main())
