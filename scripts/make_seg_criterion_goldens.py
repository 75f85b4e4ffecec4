#!/usr/bin/env python
"""Segmentation-criterion parity goldens vs the reference (VERDICT round-3
next #6): run the reference's refinement criterion
(NPP_segmentation/train.py:333-406) on CPU torch with the SAME alex conv
tower injected on both sides (our analytic fallback exported to a
torchvision stub; the LPIPS alex linear heads are the reference's own
shipped v0.1 assets, converted bit-exactly on our side) — isolating the
criterion MACHINERY (grayscale, L1 threshold, spatial-LPIPS per-layer maps
+ thresholds, mask logic, fill-holes + remove-small-objects) from the
unobtainable-pretrained-weights question.

The criterion is a pure function of (pred, blur, valid, init non-periodic
mask, thresholds): no fit is involved, so the fixture asserts map-level
(rtol) and mask-level (exact) parity with autocalibration OFF
(cfg.seg_autocal='off').

Reference deps not vendored in /root/reference and absent here are
replicated inline with their documented semantics, on the REFERENCE side
of the run: kornia.rgb_to_grayscale (0.299/0.587/0.114 weights) and
skimage.morphology.remove_small_objects (connected-component size filter,
connectivity=1 — on the reference's (H, W, 1) array that is 4-connectivity
in-plane).

Run from the repo root; writes tests/goldens/seg_criterion_parity.npz.
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = '/root/reference'
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'tests', 'goldens')

import numpy as np

H, W = 160, 192
L1_THRESH, LPIPS_THRESH, LPIPS_LAYERS = 0.15, 0.3, 1


def scenario():
    """pred/blur/valid/init-mask built so every criterion branch is
    exercised: (a) well-fit periodic texture inside the init non-periodic
    mask (error << thresholds -> reclassified periodic), (b) a surviving
    blob core (error >> thresholds -> stays non-periodic), (c) error
    OUTSIDE the init mask (must be ignored by criterion 2 by construction),
    (d) a small speck (< min_size -> removed by morphology), (e) an
    invalid-border strip. Error magnitudes sit far from the thresholds so
    fp drift between torch and jax towers cannot flip a mask pixel."""
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[:H, :W].astype(np.float64)
    blur = np.stack([0.5 + 0.3 * np.sin(2 * np.pi * yy / 12.0),
                     0.5 + 0.3 * np.cos(2 * np.pi * xx / 16.0),
                     0.5 + 0.1 * np.sin(2 * np.pi * (yy + xx) / 14.0)], -1)
    blur = np.clip(blur + rng.randn(H, W, 3) * 0.01, 0.02, 0.98)

    valid = np.ones((H, W, 1))
    valid[:4] = 0
    valid[:, :4] = 0

    init_np = np.zeros((H, W), bool)
    init_np[30:90, 40:110] = True          # big init non-periodic region
    init_np[120:150, 130:180] = True       # second region, fully well-fit
    init_np[100:106, 20:26] = True         # speck (< 500 px)

    pred = blur.copy()
    # (b) surviving core: strong structured error inside the first region
    core = ((yy - 55) ** 2 / 18 ** 2 + (xx - 70) ** 2 / 24 ** 2) < 1
    pred[core] = np.clip(blur[core] + 0.45, 0, 1)
    # (d) the speck fails both criteria too (then dies to min_size)
    pred[100:106, 20:26] = np.clip(blur[100:106, 20:26] - 0.5, 0, 1)
    # (c) error outside the init mask: criterion 2 is blind there by
    # construction (lpips map is init-masked), criterion 1 is not — the
    # reference marks it non-periodic via ~(&), fill_holes permitting
    pred[20:28, 150:170] = np.clip(blur[20:28, 150:170] + 0.5, 0, 1)
    return pred, blur, valid, init_np


def _stub_torchvision():
    import torch
    import torch.nn as tnn
    import jax.numpy as jnp
    from npp_tpu.nn.features import AlexNetFeatures
    from npp_tpu.nn.pretrained import load_tower_params

    module = AlexNetFeatures(owt=False)
    params = load_tower_params('alexnet_tv', module,
                               jnp.zeros((1, 64, 64, 3)))

    def conv(name, cin, cout, k, stride=1, pad=0):
        c = tnn.Conv2d(cin, cout, k, stride=stride, padding=pad)
        kk = np.asarray(params[name]['kernel'])       # (kh, kw, cin, cout)
        with torch.no_grad():
            c.weight.copy_(torch.tensor(kk.transpose(3, 2, 0, 1).copy()))
            c.bias.copy_(torch.tensor(np.asarray(params[name]['bias']).copy()))
        return c

    def features():
        return tnn.Sequential(
            conv('conv0', 3, 64, 11, 4, 2), tnn.ReLU(True),
            tnn.MaxPool2d(3, 2),
            conv('conv1', 64, 192, 5, 1, 2), tnn.ReLU(True),
            tnn.MaxPool2d(3, 2),
            conv('conv2', 192, 384, 3, 1, 1), tnn.ReLU(True),
            conv('conv3', 384, 256, 3, 1, 1), tnn.ReLU(True),
            conv('conv4', 256, 256, 3, 1, 1), tnn.ReLU(True),
            tnn.MaxPool2d(3, 2))

    class _Wrapped(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = features()

    tv = types.ModuleType('torchvision')
    tv.models = types.ModuleType('torchvision.models')
    tv.models.alexnet = lambda pretrained=True, **kw: _Wrapped()
    tv.transforms = types.ModuleType('torchvision.transforms')
    tv.transforms.functional = types.ModuleType(
        'torchvision.transforms.functional')
    for name, mod in (('torchvision', tv), ('torchvision.models', tv.models),
                      ('torchvision.transforms', tv.transforms),
                      ('torchvision.transforms.functional',
                       tv.transforms.functional)):
        sys.modules[name] = mod
    if not hasattr(np, 'float'):
        np.float = float
    pr = types.ModuleType('pkg_resources')
    pr.resource_stream = lambda pkg, path: open(
        f'{REF}/externel_lib/robust_loss_pytorch/{path}', 'rb')
    sys.modules.setdefault('pkg_resources', pr)
    sys.modules.setdefault('torch_dct', types.ModuleType('torch_dct'))
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self


def remove_small_objects(mask2d, min_size=500, connectivity=1):
    """skimage.morphology.remove_small_objects semantics (the reference's
    (H, W, 1) call is 4-connectivity in-plane)."""
    import scipy.ndimage as ndimage
    structure = ndimage.generate_binary_structure(2, connectivity)
    lab, _ = ndimage.label(mask2d, structure=structure)
    sizes = np.bincount(lab.ravel())
    keep = sizes >= min_size
    keep[0] = False
    return keep[lab]


def reference_criterion():
    sys.path.insert(0, REF)
    sys.path.insert(0, f'{REF}/externel_lib')
    import torch
    import scipy.ndimage as ndimage
    # models/helpers.py:8 / lpips robust heads build AdaptiveLossFunction
    # with device=0 (cuda); force them onto CPU before lpips is imported
    # (the make_ranking_goldens.py recipe)
    import externel_lib.robust_loss_pytorch as rlp
    _orig_alf = rlp.AdaptiveLossFunction

    class _CpuALF(_orig_alf):
        def __init__(self, *a, **kw):
            kw['device'] = 'cpu'
            super().__init__(*a, **kw)

    rlp.AdaptiveLossFunction = _CpuALF
    import robust_loss_pytorch as rlp_bare
    rlp_bare.AdaptiveLossFunction = _CpuALF
    import externel_lib.lpips as lpips

    pred_np, blur_np, valid_np, init_np = scenario()
    pred_rgb_img = torch.Tensor(pred_np[None].astype(np.float32))
    blur_img = torch.Tensor(blur_np[None].astype(np.float32))
    valid_mask = torch.Tensor(valid_np[None].astype(np.float32))
    non_period_mask = torch.Tensor(
        init_np[None, None].astype(np.float32))       # (1, 1, H, W)

    gray_w = torch.tensor([0.299, 0.587, 0.114]).view(1, 3, 1, 1)

    def rgb_to_grayscale(x):   # kornia semantics
        return (x * gray_w).sum(1, keepdim=True)

    # ---- the criterion body, NPP_segmentation/train.py:338-395 verbatim
    pred_rgb_img = pred_rgb_img * valid_mask
    pred_rgb_img_ = (pred_rgb_img * valid_mask).permute(0, 3, 1, 2)
    pred_rgb_img_ = rgb_to_grayscale(pred_rgb_img_)
    blur_img_ = (blur_img * valid_mask).permute(0, 3, 1, 2)
    blur_img_ = rgb_to_grayscale(blur_img_)

    l1_img = torch.sum(abs(pred_rgb_img_ - blur_img_), 1, keepdim=True)
    l1_img = torch.clamp(l1_img, min=0, max=0.99)
    l1_img_mask = l1_img < L1_THRESH
    l1_img = l1_img * valid_mask.permute(0, 3, 1, 2)

    metric_func = lpips.LPIPS(net='alex', spatial=True)
    _, lpips_img_list = metric_func(pred_rgb_img_, blur_img_, False,
                                    retPerLayer=True, normalize=True)

    non_period_mask_final = None
    lpips_maps, lpips_masks = [], []
    for i in range(LPIPS_LAYERS):
        lpips_img = lpips_img_list[i]
        lpips_img_non_period = non_period_mask * lpips_img
        lpips_img_mask_i = (lpips_img_non_period < LPIPS_THRESH)
        period_mask_final_i = lpips_img_mask_i & l1_img_mask
        non_period_mask_final_i = \
            (~period_mask_final_i.cpu()[0, 0]).float().numpy()
        lpips_maps.append(lpips_img_non_period.detach()[0, 0].numpy())
        lpips_masks.append(lpips_img_mask_i.cpu()[0, 0].numpy())
        non_period_mask_final = non_period_mask_final_i \
            if non_period_mask_final is None \
            else non_period_mask_final + non_period_mask_final_i

    non_period_mask_final = non_period_mask_final > 0
    non_period_mask_final = ndimage.binary_fill_holes(
        non_period_mask_final).astype(np.float64)
    final = remove_small_objects(non_period_mask_final.astype(bool),
                                 min_size=500, connectivity=1)

    np.savez(f'{OUT}/seg_criterion_parity.npz',
             pred=pred_np, blur=blur_np, valid=valid_np,
             init_np=init_np,
             thresholds=np.array([L1_THRESH, LPIPS_THRESH, LPIPS_LAYERS]),
             l1_img=l1_img.detach()[0, 0].numpy(),
             l1_mask=l1_img_mask.detach()[0, 0].numpy(),
             lpips_map_0=lpips_maps[0], lpips_mask_0=lpips_masks[0],
             final_mask=final)
    print('final non-periodic frac:', final.mean())


if __name__ == '__main__':
    os.makedirs(OUT, exist_ok=True)
    _stub_torchvision()
    reference_criterion()
    print(f'wrote {OUT}/seg_criterion_parity.npz')
