"""Weight registry for the pretrained conv towers.

The reference relies on torchvision's downloaded ImageNet checkpoints
(VGG16/VGG19/AlexNet) plus a local `alexnet-owt-4df8aa71.pth`
(reference: models/alexnet.py:50-55, README.md:36-38). This environment has
no torchvision and no network egress, so weights resolve in this order:

 1. `npp_tpu/assets/<name>.npz`            (converted, committed or user-made)
 2. `$NPP_TPU_WEIGHTS_DIR/<name>.npz`      (user-supplied directory)
 3. `$NPP_TPU_TORCH_WEIGHTS/<name>.pth`    (converted on the fly via torch)
 4. analytic structured weights            (nn/analytic.py: Gabor stem +
                                            orthogonal mixing; default
                                            fallback, flagged 'analytic')
 5. deterministic flat random init         (NPP_TPU_FALLBACK=random)

The fallback keeps every pipeline runnable with usable *relative* perceptual
signals (measured: scripts/ab_fallback_weights.py), but absolute LPIPS values
will NOT match the published metric. `WeightReport` records which path was
taken so callers/logs can surface it. `scripts/convert_torch_weights.py`
produces the .npz files from torchvision checkpoints offline.

Known names: alexnet_owt, alexnet_tv, vgg16, vgg19,
             lpips_lin_vgg, lpips_lin_alex, lpips_lin_squeeze.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'assets')


@dataclass
class WeightReport:
    name: str
    source: str   # 'asset' | 'weights_dir' | 'torch' | 'analytic' | 'random'

    @property
    def pretrained(self) -> bool:
        """True only for converted checkpoints. Analytic weights are
        structured but NOT calibrated to the reference's thresholds."""
        return self.source not in ('random', 'analytic')


_REPORTS: Dict[str, WeightReport] = {}

# Process-level tower-param cache. Every LPIPS()/ContextualLoss()/style
# construction used to re-resolve (and, on the analytic path, re-generate)
# its tower; behind the TPU relay the flax `module.init` alone cost tens of
# seconds of remote compile per tower, paid once per image in the suite.
# Params are immutable trees — sharing one instance is safe.
_PARAM_CACHE: Dict[tuple, tuple] = {}


def weight_reports() -> Dict[str, WeightReport]:
    return dict(_REPORTS)


def _find_npz(name: str) -> Optional[str]:
    cands = [os.path.join(ASSET_DIR, f'{name}.npz')]
    wd = os.environ.get('NPP_TPU_WEIGHTS_DIR')
    if wd:
        cands.append(os.path.join(wd, f'{name}.npz'))
    for c in cands:
        if os.path.exists(c):
            return c
    return None


def _torch_convert(name: str) -> Optional[Dict[str, np.ndarray]]:
    td = os.environ.get('NPP_TPU_TORCH_WEIGHTS')
    if not td:
        return None
    path = os.path.join(td, f'{name}.pth')
    if not os.path.exists(path):
        return None
    from ..utils.torch_convert import convert_state_dict  # lazy: torch import
    return convert_state_dict(name, path)


def _flat_to_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """'conv0/kernel' -> {'conv0': {'kernel': arr}}."""
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split('/')
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return tree


def _analytic_cache_path(name: str, shapes, seed: int) -> Optional[str]:
    """Disk cache for generated analytic towers (the QR decompositions cost
    ~15 s of host time per process). Lives under $NPP_TPU_AOT_CACHE when
    set; keyed by tower name, seed, the analytic generator's source hash,
    and the shape signature."""
    root = os.environ.get('NPP_TPU_AOT_CACHE')
    if not root:
        return None
    import hashlib
    h = hashlib.sha256()
    src = os.path.join(os.path.dirname(__file__), 'analytic.py')
    with open(src, 'rb') as f:
        h.update(f.read())
    h.update(str(seed).encode())
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        h.update(f'{path}{tuple(leaf.shape)}'.encode())
    return os.path.join(root, f'tower-{name}-{h.hexdigest()[:16]}.npz')


def _analytic_disk_cache_load(name, shapes, seed) -> Optional[Dict[str, np.ndarray]]:
    path = _analytic_cache_path(name, shapes, seed)
    if path is None or not os.path.exists(path):
        return None
    try:
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    except Exception:
        return None


def _analytic_disk_cache_save(name, params, seed) -> None:
    path = _analytic_cache_path(name, params, seed)
    if path is None:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        flat = {'/'.join(str(p.key) for p in pth): np.asarray(leaf)
                for pth, leaf in
                jax.tree_util.tree_flatten_with_path(params)[0]}
        tmp = f'{path}.tmp.{os.getpid()}'
        with open(tmp, 'wb') as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except Exception:
        pass


def load_tower_params(name: str, module, example_input) -> Dict[str, Any]:
    """Resolve a conv tower's params: converted weights if available, else a
    deterministic fallback init. Returns a flax 'params' tree (cached per
    process; the tree is shared between callers and must not be mutated)."""
    fallback = os.environ.get('NPP_TPU_FALLBACK', 'analytic')
    cache_key = (name, fallback, os.environ.get('NPP_TPU_WEIGHTS_DIR'),
                 os.environ.get('NPP_TPU_TORCH_WEIGHTS'))
    hit = _PARAM_CACHE.get(cache_key)
    if hit is not None:
        params, report = hit
        _REPORTS[name] = report
        return params

    flat = None
    src = 'random'
    npz = _find_npz(name)
    if npz is not None:
        with np.load(npz) as f:
            flat = {k: f[k] for k in f.files}
        src = 'asset' if npz.startswith(ASSET_DIR) else 'weights_dir'
    else:
        converted = _torch_convert(name)
        if converted is not None:
            flat = converted
            src = 'torch'

    if flat is not None:
        params = _flat_to_tree(flat)
    else:
        seed = int.from_bytes(name.encode()[:4].ljust(4, b'\0'), 'little')
        if fallback == 'analytic':
            # Structured training-free weights (Gabor stem + orthogonal
            # mixing; see nn/analytic.py) depend only on kernel SHAPES and
            # the seed — eval_shape gets those without compiling/executing
            # the init program (tens of seconds through the TPU relay).
            from .analytic import structured_tower_params
            shapes = jax.eval_shape(module.init, jax.random.PRNGKey(seed),
                                    example_input)['params']
            flat = _analytic_disk_cache_load(name, shapes, seed)
            if flat is not None:
                params = _flat_to_tree(flat)
            else:
                params = structured_tower_params(shapes, seed)
                _analytic_disk_cache_save(name, params, seed)
                params = jax.tree.map(jnp.asarray, params)
            src = 'analytic'
        else:
            params = module.init(jax.random.PRNGKey(seed),
                                 example_input)['params']
    report = WeightReport(name, src)
    _REPORTS[name] = report
    _PARAM_CACHE[cache_key] = (params, report)
    return params


def load_lpips_lins(net: str = 'vgg') -> Optional[Dict[str, jnp.ndarray]]:
    """LPIPS linear calibration heads (converted from
    externel_lib/lpips/weights/v0.1/<net>.pth; shapes (C,) per layer)."""
    npz = _find_npz(f'lpips_lin_{net}')
    if npz is None:
        _REPORTS[f'lpips_lin_{net}'] = WeightReport(f'lpips_lin_{net}', 'random')
        return None
    with np.load(npz) as f:
        out = {k: jnp.asarray(f[k]) for k in f.files}
    _REPORTS[f'lpips_lin_{net}'] = WeightReport(f'lpips_lin_{net}', 'asset')
    return out
