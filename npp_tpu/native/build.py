"""Build the native host-side extensions (C++ -> .so, loaded via ctypes).

Run directly (`python npp_tpu/native/build.py`) or let the lazy loader in
npp_tpu.segmentation.graphcut compile on first use. Artefacts are cached next
to the sources keyed by a source hash.
"""
from __future__ import annotations

import hashlib
import os
import subprocess
import sys

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))


def build_library(name: str = 'graphcut', force: bool = False) -> str:
    src = os.path.join(NATIVE_DIR, f'{name}.cpp')
    with open(src, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = os.path.join(NATIVE_DIR, 'build')
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f'lib{name}-{digest}.so')
    if os.path.exists(out) and not force:
        return out
    cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17', src, '-o', out]
    subprocess.run(cmd, check=True)
    return out


if __name__ == '__main__':
    for lib in ['graphcut']:
        print(build_library(lib, force='--force' in sys.argv))
