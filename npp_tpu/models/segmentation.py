"""Segmentation task: separate the periodic region from non-periodic content
(reference: NPP_segmentation/train.py:28-415). Coarse SLIC+GMM+graph-cut
proposes a periodic region (loader), NPP-Net is fit on the blurred image, and
the region is refined by thresholding L1 + spatial-LPIPS error maps."""
from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndimage

from ..losses.lpips import LPIPS
from ..utils.io import write_gray, write_rgb
from .loaders import load_segmentation
from .pipeline import TaskSpec, fit_image
from .trainer import FitState

SEGMENTATION_TASK = TaskSpec(name='segmentation')

_GRAY = np.array([0.299, 0.587, 0.114])  # kornia rgb_to_grayscale weights


def remove_small_objects(mask: np.ndarray, min_size: int = 500,
                         connectivity: int = 1) -> np.ndarray:
    """skimage.morphology.remove_small_objects equivalent
    (reference: NPP_segmentation/train.py:395)."""
    structure = ndimage.generate_binary_structure(2, connectivity)
    lab, n = ndimage.label(mask, structure=structure)
    sizes = np.bincount(lab.ravel())
    keep = sizes >= min_size
    keep[0] = False
    return keep[lab]


def refine_segmentation(cfg, data, pred_img: np.ndarray,
                        lpips_alex: LPIPS,
                        cache: Dict = None) -> Dict[str, np.ndarray]:
    """The two-criterion refinement (reference:
    NPP_segmentation/train.py:333-406): L1 < l1_thresh AND spatial
    LPIPS < lpips_thresh per layer; morphology post-processing.

    cache: optional dict shared across calls with IDENTICAL (pred_img,
    data) — stores the spatial-LPIPS per-layer maps, which depend only on
    those inputs, so criterion-option sweeps (seg_color_criterion /
    seg_refine_*) skip the repeated tower forward."""
    valid = data.valid_mask
    blur_img = data.extra['blur_img']
    non_period = data.extra['non_period_mask'][..., 0]

    pred_gray = ((pred_img * valid) @ _GRAY)[..., None]     # (H, W, 1)
    blur_gray = ((blur_img * valid) @ _GRAY)[..., None]

    if getattr(cfg, 'seg_color_criterion', False):
        # color-aware variant (cfg-gated, default off): max per-channel
        # |diff| catches isoluminant anomalies the reference's grayscale
        # criterion (train.py:340-344) cannot see
        l1_img = np.clip(
            np.abs((pred_img - blur_img) * valid).max(-1), 0, 0.99)
    else:
        l1_img = np.clip(np.abs(pred_gray - blur_gray).sum(-1), 0, 0.99)
    l1_ok = l1_img < cfg.l1_thresh

    if cache is not None and 'per_layer' in cache:
        per_layer = cache['per_layer']
    else:
        val, per_layer = lpips_alex(
            jnp.asarray(pred_gray[None], jnp.float32),
            jnp.asarray(blur_gray[None], jnp.float32),
            use_robust=False, normalize=True, spatial=True,
            ret_per_layer=True)
        # Reference quirk mirrored for parity (externel_lib/lpips/
        # lpips.py:127-129): `val = res[0]; val += res[l]` accumulates IN
        # PLACE, aliasing the returned per-layer list's first entry to the
        # TOTAL map. With the shipped default lpips_layers=1
        # (arg_config.py:221-224) the reference criterion therefore
        # thresholds the ALL-LAYER sum, not layer 0 — verified against a
        # reference-executed golden (tests/test_pipeline_parity.py::
        # test_seg_criterion_parity_vs_reference).
        per_layer = [val] + list(per_layer[1:])
        if cache is not None:
            cache['per_layer'] = per_layer

    # The reference's lpips_thresh (0.3) is calibrated for the pretrained
    # AlexNet LPIPS. When the tower runs on fallback random weights (no
    # torchvision in the environment) the spatial maps are uncalibrated, so
    # rescale them per image: the 95th percentile of the map over the
    # well-fit periodic train region maps to half the threshold. With
    # converted pretrained weights this branch is inactive;
    # cfg.seg_autocal ('auto'|'off'|'on') overrides the automatic choice
    # (parity fixtures run 'off' to assert reference-exact semantics).
    autocal_mode = getattr(cfg, 'seg_autocal', 'auto')
    if autocal_mode == 'auto':
        from ..nn.pretrained import weight_reports
        rep = weight_reports().get('alexnet_tv')
        autocal = rep is not None and not rep.pretrained
    else:
        autocal = autocal_mode == 'on'
    periodic_ref = (data.mask[..., 0] > 0.5) & (valid[..., 0] > 0.5)

    # Hysteresis (cfg-gated, 1.0 = reference behaviour): REMOVING an init
    # non-periodic pixel demands stronger evidence than adding one. The
    # reference's single threshold erodes blob boundaries whose partially
    # reconstructed edges sit just under l1_thresh/lpips_thresh, while
    # init-mask overshoot (well-fit periodic texture) scores far under —
    # a stricter removal threshold separates the two regimes.
    hyst = float(getattr(cfg, 'seg_refine_hysteresis', 1.0))
    init_np = non_period > 0.5
    if hyst != 1.0:
        l1_ok = np.where(init_np, l1_img < cfg.l1_thresh * hyst, l1_ok)

    non_period_final = None
    lpips_maps = []
    lpips_masks = []
    for i in range(cfg.lpips_layers):
        lp = np.asarray(per_layer[i][0, ..., 0])
        if autocal and periodic_ref.any():
            p95 = float(np.percentile(lp[periodic_ref], 95))
            lp = lp * (0.5 * cfg.lpips_thresh / max(p95, 1e-8))
        lp_np = non_period * lp
        lpips_maps.append(lp_np)
        lp_ok = lp_np < cfg.lpips_thresh
        if hyst != 1.0:
            # keep the saved mask artifact consistent with the actual
            # per-pixel decision (like l1_ok above)
            lp_ok = np.where(init_np, lp_np < cfg.lpips_thresh * hyst,
                             lp_ok)
        lpips_masks.append(lp_ok)
        period_i = lp_ok & l1_ok
        np_i = (~period_i).astype(np.float64)
        non_period_final = np_i if non_period_final is None \
            else non_period_final + np_i

    non_period_final = non_period_final > 0
    if getattr(cfg, 'seg_texture_criterion', False):
        # Texture-energy cue (cfg-gated, default off = reference
        # behaviour): the render-error criteria cannot flag SMOOTH
        # anomalies — the INR renders flat content trivially well, so a
        # smooth non-periodic region (the bundled 9f80de08 patch-plate)
        # passes both error criteria under every variant. Mark valid
        # pixels whose local texture energy (grayscale std over a
        # seg_texture_window box) sits far below the PERIODIC region's
        # own low quantile as non-periodic. Additive only: the cue can
        # keep/add evidence, never remove it, so error-criterion
        # behaviour elsewhere is untouched.
        win = int(getattr(cfg, 'seg_texture_window', 9))
        beta = float(getattr(cfg, 'seg_texture_beta', 0.5))
        g = blur_gray[..., 0]
        mean = ndimage.uniform_filter(g, win)
        sq = ndimage.uniform_filter(g * g, win)
        energy = np.sqrt(np.maximum(sq - mean * mean, 0.0))
        if periodic_ref.any():
            thr = beta * float(np.percentile(energy[periodic_ref], 25))
            non_period_final = non_period_final | (
                (energy < thr) & (valid[..., 0] > 0.5))
    if getattr(cfg, 'seg_refine_protect', False):
        # Anti-erosion guard (cfg-gated, default off = reference
        # behaviour). The reference refinement shrinks blobs at their
        # boundaries wherever the INR partially reconstructs edge pixels
        # (measured: mean synthetic-GT IoU 0.642 init -> 0.586 refined,
        # BASELINE.md); the blob CORE keeps failing both criteria. Restore
        # every connected component of the init non-periodic mask that
        # retains ANY refined evidence (component-level geodesic
        # reconstruction): a component the fit fully explains has no
        # surviving core and is still removed whole. Runs BEFORE
        # remove_small_objects so a core eroded below min_size still
        # counts as evidence.
        init_mask = non_period > 0.5
        lab, n = ndimage.label(init_mask,
                               ndimage.generate_binary_structure(2, 1))
        if n:
            keep = np.zeros(n + 1, bool)
            keep[np.unique(lab[non_period_final & init_mask])] = True
            keep[0] = False
            non_period_final = non_period_final | keep[lab]
    non_period_final = ndimage.binary_fill_holes(non_period_final)
    non_period_final = remove_small_objects(non_period_final, min_size=500,
                                            connectivity=1)
    oh, ow = data.orig_shape
    return {
        'non_period_mask': non_period_final.astype(np.float64)[:oh, :ow, None],
        'l1_img': (l1_img * valid[..., 0])[:oh, :ow],
        'l1_mask': l1_ok[:oh, :ow],
        'lpips_maps': [m[:oh, :ow] for m in lpips_maps],
        'lpips_masks': [m[:oh, :ow] for m in lpips_masks],
    }


def overlay(img: np.ndarray, non_period_mask: np.ndarray,
            valid_mask: np.ndarray, alpha: float = 0.7) -> np.ndarray:
    """Green non-periodic overlay (reference: train.py:398-406)."""
    np_color = np.array([0.0, 1.0, 0.0])
    m = non_period_mask
    vis = img * alpha + (1 - alpha) * (np_color * m + img * (1 - m))
    return vis * valid_mask


def save_refinement(save_dir: str, i: int, data, pred: np.ndarray,
                    res: Dict[str, np.ndarray]) -> None:
    """Write the per-eval artifact set (reference: NPP_segmentation/
    train.py:357,390,398-406) — shared by the sequential eval_hook and the
    batched suite path."""
    d = os.path.join(save_dir, f'testset_{i:06d}')
    write_gray(os.path.join(d, 'l1_diff_img.png'), res['l1_img'])
    # inverted threshold masks, matching the reference's
    # ~l1_img_mask / ~lpips_img_mask_i saves (train.py:357,390)
    write_gray(os.path.join(d, 'l1_img_mask.png'),
               (~res['l1_mask']).astype(np.float64))
    for j, lp in enumerate(res['lpips_maps']):
        write_gray(os.path.join(d, f'lpips_diff_img_{j}.png'),
                   np.clip(lp, 0, 1))
        write_gray(os.path.join(d, f'lpips_img_mask_{j}.png'),
                   (~res['lpips_masks'][j]).astype(np.float64))
    oh, ow = data.orig_shape
    write_rgb(os.path.join(d, 'segment.png'),
              overlay(data.img[:oh, :ow], res['non_period_mask'],
                      data.valid_mask[:oh, :ow]))
    # raw refined mask (no reference equivalent — the reference only saves
    # the overlay): lets offline scorers compute IoU from saved artifacts
    # without refitting
    write_gray(os.path.join(d, 'segment_mask.png'),
               (np.asarray(res['non_period_mask'])[..., 0] > 0
                ).astype(np.float64)[:oh, :ow])
    write_rgb(os.path.join(d, 'pred_rgb_img.png'),
              (pred * data.valid_mask)[:oh, :ow])


def run_segmentation(cfg, save: bool = True):
    data = load_segmentation(cfg)
    name = cfg.datadir.rstrip('/').split('/')[-1]
    expname = f'{cfg.expname}_top{cfg.p_topk}'
    save_dir = os.path.join(cfg.basedir, expname, name)
    if save:
        oh, ow = data.orig_shape
        write_gray(os.path.join(save_dir, 'segment_init.png'),
                   (data.extra['non_period_mask'] > 0).astype(np.float64)[:oh, :ow])

    lpips_alex = LPIPS(net='alex')
    results = {}

    def eval_hook(i: int, state: FitState, render):
        h, w = data.img.shape[:2]
        pred = np.asarray(render(state.params, h, w))
        res = refine_segmentation(cfg, data, pred, lpips_alex)
        results[i] = res
        frac = float(res['non_period_mask'].mean())
        print(f"[segmentation] eval@{i}: non-periodic fraction={frac:.3f}")
        if save:
            save_refinement(save_dir, i, data, pred, res)

    result = fit_image(cfg, SEGMENTATION_TASK, data, eval_hook=eval_hook,
                       log_every=cfg.i_print)
    if not results:  # ensure at least one refinement at the end
        h, w = data.img.shape[:2]
        pred = np.asarray(result.render(result.state.params, h, w))
        results[cfg.N_iters - 1] = refine_segmentation(cfg, data, pred,
                                                       lpips_alex)
    return result, results
