"""Feature stack for periodicity detection (reference:
NPP_proposal/feature_searching.py:14-69).

Defaults follow the reference's shipped configuration: the `--gray_only` and
`--edge_searching` flags are store_false (presence DISABLES), so the default
pipeline is grayscale + canny-edge features with no conv tower
(reference: options/arg_config.py:122-126). The AlexNet-conv1 path
(gray_only=False) is fully supported and runs the owt conv tower on TPU.
"""
from __future__ import annotations

from typing import Tuple

import cv2
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndimage

from ..nn.features import AlexNetFeatures, IMAGENET_MEAN, IMAGENET_STD
from ..nn.pretrained import load_tower_params


def pad_multiple_of(img: np.ndarray, multiple: int) -> np.ndarray:
    """Right/bottom zero pad to a multiple (reference: utils/ops.py:87-93)."""
    h, w = img.shape[:2]
    hh = -(-h // multiple) * multiple
    ww = -(-w // multiple) * multiple
    if (h, w) == (hh, ww):
        return img
    pad = [(0, hh - h), (0, ww - w)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad)


def canny_edges(img_u8: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Masked canny (reference: utils/miscs.py:22-33).

    cv2.Canny runs with the optimized dispatch DISABLED: this OpenCV
    build's SIMD Canny path has a content-dependent heap-corruption bug
    (glibc "double free or corruption" abort) on small dense-edge inputs —
    deterministic on a 64x80 quarter-res near-periodic synthetic, first
    hit by scripts/eval_remapping.py. The scalar path is bit-identical on
    every bundled example (both act2edge channels, measured) and costs ms
    at detection resolutions. Regression: tests/test_proposal_search.py::
    test_canny_dense_small_image_no_crash."""
    if img_u8.ndim == 3:
        img_u8 = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
    blur = cv2.GaussianBlur(img_u8, (3, 3), 0)
    m = ndimage.binary_erosion(mask, iterations=4).astype(np.float64)
    opt = cv2.useOptimized()
    try:
        cv2.setUseOptimized(False)
        edges = cv2.Canny(blur, 10, 100)
    finally:
        cv2.setUseOptimized(opt)
    return edges * m


def normalize_to_uint8(arr: np.ndarray, channel_idx=(1, 2)) -> np.ndarray:
    """Per-channel spatial min-max to uint8 (reference: miscs.py:42-48).

    No epsilon in the denominator: np.uint8 TRUNCATES, so nudging the scale
    by even 1e-12 drops every exactly-integer value to the level below and
    flips canny pixels downstream (caught by tests/test_pipeline_parity.py).
    Constant channels (max == min) divide safely to 0 instead of the
    reference's NaN."""
    amax = arr.max(axis=channel_idx, keepdims=True)
    amin = arr.min(axis=channel_idx, keepdims=True)
    rng = amax - amin
    out = np.divide(arr - amin, rng, out=np.zeros_like(arr, dtype=np.float64),
                    where=rng != 0)
    return np.uint8(out * 255)


_alex_cache = {}


def _alexnet_conv1(img_u8: np.ndarray) -> np.ndarray:
    """Stride-4 conv1 activation of the owt AlexNet (reference:
    feature_searching.py:25-32, models/model_def.py:99-116 hooks the pre-ReLU
    conv output)."""
    if 'mod' not in _alex_cache:
        mod = AlexNetFeatures(owt=True)
        params = load_tower_params('alexnet_owt', mod, jnp.zeros((1, 64, 64, 3)))
        _alex_cache['mod'] = mod
        _alex_cache['params'] = params
    mod, params = _alex_cache['mod'], _alex_cache['params']
    x = pad_multiple_of(img_u8.astype(np.float32) / 255.0, 32)
    x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    out = mod.apply({'params': params}, jnp.asarray(x[None]))['conv1']
    return np.asarray(out[0])  # (H/4, W/4, 64) incl. padding


def im2act(img_u8: np.ndarray, mask: np.ndarray, gray_only: bool = True
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Build the (C, h, w) feature stack at 1/4 resolution
    (reference: feature_searching.py:14-51): [conv1?] + gray + mask, all
    multiplied by the downsampled unknown mask. Returns (activation, mask)."""
    img_u8 = img_u8[..., :3]
    h, w = img_u8.shape[:2]
    nh, nw = h // 4, w // 4

    m = cv2.resize(mask.astype(np.float64), (nw, nh),
                   interpolation=cv2.INTER_NEAREST)

    gray = cv2.cvtColor(img_u8, cv2.COLOR_RGB2GRAY)
    gray = cv2.resize(gray, (nw * 2, nh * 2))
    gray = cv2.resize(gray, (nw, nh)).astype(np.float64)

    if gray_only:
        act = np.stack([gray, m])
    else:
        conv = _alexnet_conv1(img_u8)[:nh, :nw]          # (nh, nw, 64)
        act = np.concatenate([np.moveaxis(conv, -1, 0), gray[None], m[None]], 0)
    return act * m[None], m


def act2edge(act: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-channel canny on the normalised activation, summed
    (reference: feature_searching.py:54-69)."""
    act_u8 = normalize_to_uint8(act, channel_idx=(1, 2))
    edge = np.zeros((1,) + act.shape[1:])
    for c in range(act_u8.shape[0]):
        edge += canny_edges(act_u8[c], mask) / 255.0
    return np.concatenate([edge, mask[None]], 0)
