"""Completion task: inpaint the unknown region of a near-periodic image
(reference: NPP_completion/train.py:20-343)."""
from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.pixel import img2mse, mse2psnr
from ..utils.io import write_rgb
from .loaders import load_completion
from .pipeline import TaskSpec, fit_image
from .trainer import FitState

COMPLETION_TASK = TaskSpec(name='completion')


def seam_residual_correction(pred: np.ndarray, masked: np.ndarray,
                             known: np.ndarray, hole: np.ndarray,
                             value_range: float = 1.0) -> np.ndarray:
    """Diffuse the known-region render error into the hole and return the
    corrected prediction (cfg.comp_seam='residual'; no reference
    equivalent — the reference pastes the raw render into the hole,
    NPP_completion/train.py:317-322).

    err = masked - pred on the known region is Navier-Stokes-inpainted
    across the hole, giving a smooth membrane that (a) matches the render
    error at the hole boundary — the composite becomes C0-continuous with
    the known content, TELEA's one PSNR advantage — and (b) removes
    low-frequency tint/phase offset inside the hole while preserving the
    INR's lattice texture.

    value_range: the image value range is [0, value_range] shifted to be
    symmetric — i.e. residuals span [-value_range, value_range] and are
    quantized into uint8 over that span for the cv2 round-trip. Pass 2.0
    for normalize_type=2 ([-1,1] tanh images), else the default 1.0."""
    import cv2
    scale = 127.5 / float(value_range)
    err = np.where(known[..., None] > 0.5, masked - pred, 0.0)
    err_u8 = np.uint8(np.clip(err * scale + 127.5, 0, 255))
    hole_u8 = np.uint8(hole * 255)
    filled = cv2.inpaint(err_u8, hole_u8, 3, cv2.INPAINT_NS)
    err_filled = (filled.astype(np.float64) - 127.5) / scale
    return np.where(hole[..., None] > 0.5, pred + err_filled, pred)


def evaluate(data, params, render, adaptive_pix, loss_type: str,
             comp_seam: str = 'none', normalize_type: int = 1,
             compute_seam: bool = None,
             return_pred: bool = False) -> Dict[str, np.ndarray]:
    """Render and compose the reference's output set
    (reference: NPP_completion/train.py:270-331), plus PSNR metrics.

    The seam-corrected composite (see seam_residual_correction) is emitted
    as 'pred_rgb_img_comp_seam' with its 'val_psnr_seam' metric;
    comp_seam='residual' additionally makes it the primary
    'pred_rgb_img_comp' output. compute_seam controls whether the seam
    outputs are produced at all (a host-side cv2 inpaint of the full
    canvas): default None computes them only when comp_seam='residual' —
    final/suite evals pass True so the diagnostic artifacts and seam
    metrics always exist there, while per-i_testset eval hooks skip the
    host stall.

    return_pred: additionally emit the raw full-canvas render as 'pred'
    (numpy) — snapshot selection (cfg.comp_snapshot='best') stores it so
    the selected milestone's outputs can be re-composed at the end via
    compose_outputs without re-rendering."""
    h, w = data.img.shape[:2]
    pred = render(params, h, w)                       # (H, W, 3)
    out = compose_outputs(pred, data, adaptive_pix, loss_type,
                          comp_seam=comp_seam, normalize_type=normalize_type,
                          compute_seam=compute_seam)
    if return_pred:
        out['pred'] = np.asarray(pred)
    return out


def compose_outputs(pred, data, adaptive_pix, loss_type: str,
                    comp_seam: str = 'none', normalize_type: int = 1,
                    compute_seam: bool = None) -> Dict[str, np.ndarray]:
    """Compose the output set + metrics from an already-rendered canvas
    (see evaluate). Also emits 'heldout_psnr' when `data` carries held-out
    validation blocks (models/heldout.py) — computed against the blocks'
    KNOWN input content, never the hole GT."""
    if compute_seam is None:
        compute_seam = comp_seam == 'residual'
    pred = jnp.asarray(pred, jnp.float32)
    mask = jnp.asarray(data.mask, jnp.float32)
    valid = jnp.asarray(data.valid_mask, jnp.float32)
    img = jnp.asarray(data.img, jnp.float32)
    masked = jnp.asarray(data.masked_img, jnp.float32)

    train_img = pred * mask * valid
    val_img = pred * (1.0 - mask) * valid
    comp = val_img + masked * mask

    tc = data.i_train
    vc = data.i_val
    oh, ow = data.orig_shape
    out = {
        'pred_rgb_train_img': np.asarray(train_img)[:oh, :ow],
        'pred_rgb_val_img': np.asarray(val_img)[:oh, :ow],
        'pred_rgb_img': np.asarray(pred * valid)[:oh, :ow],
        'pred_rgb_img_comp': np.asarray(comp)[:oh, :ow],
    }
    pred_seam = None
    if compute_seam:
        # seam-aware residual-corrected prediction (host-side cv2 inpaint)
        pred_np = np.asarray(pred, np.float64)
        known_np = np.asarray((data.mask * data.valid_mask)[..., 0])
        hole_np = np.asarray(((1 - data.mask) * data.valid_mask)[..., 0])
        pred_seam = seam_residual_correction(
            pred_np, np.asarray(data.masked_img, np.float64), known_np,
            hole_np, value_range=2.0 if normalize_type == 2 else 1.0)
        comp_seam_img = (pred_seam * (1.0 - np.asarray(data.mask)) *
                         np.asarray(data.valid_mask) +
                         np.asarray(data.masked_img) * np.asarray(data.mask))
        out['pred_rgb_img_comp_seam'] = comp_seam_img[:oh, :ow]
        if comp_seam == 'residual':
            out['pred_rgb_img_comp'] = out['pred_rgb_img_comp_seam']
    if len(tc):
        pt = pred[tc[:, 0], tc[:, 1]]
        gt = masked[tc[:, 0], tc[:, 1]]
        out['img_train_loss'] = float(img2mse(pt, gt, loss_type, adaptive_pix))
        out['train_psnr'] = float(mse2psnr(jnp.mean((pt - gt) ** 2)))
    if len(vc):
        pv = pred[vc[:, 0], vc[:, 1]]
        gv = img[vc[:, 0], vc[:, 1]]
        out['img_val_loss'] = float(img2mse(pv, gv, loss_type, adaptive_pix))
        out['val_psnr'] = float(mse2psnr(jnp.mean((pv - gv) ** 2)))
        if pred_seam is not None:
            pv_seam = pred_seam[vc[:, 0], vc[:, 1]]
            gv_np = np.asarray(gv)
            out['val_psnr_seam'] = float(mse2psnr(
                jnp.asarray(np.mean((pv_seam - gv_np) ** 2))))
    if 'heldout_mask' in data.extra:
        from .heldout import heldout_psnr
        hp = heldout_psnr(np.asarray(pred), data)
        if hp is not None:
            out['heldout_psnr'] = hp
    return out


def heldout_views(data, cfg):
    """Build the fit-side and eval-side views for cfg.comp_heldout
    (models/heldout.py). Returns (data_fit, data_eval, snapshot_best):
    data_fit has the held-out blocks carved (training treats them like the
    real hole); data_eval keeps the ORIGINAL mask/known content (composites
    paste true content over the blocks) plus the heldout extras so
    evaluate() emits 'heldout_psnr'. snapshot_best = the 'best' snapshot
    policy is active AND blocks were actually placeable."""
    import dataclasses

    from .heldout import carve_heldout
    data_fit = carve_heldout(data, cfg)
    if data_fit is data or 'heldout_mask' not in data_fit.extra:
        return data, data, False
    extra = dict(data.extra)
    extra.update({k: data_fit.extra[k] for k in
                  ('heldout_rects', 'heldout_mask', 'heldout_gt')})
    data_eval = dataclasses.replace(data, extra=extra)
    return data_fit, data_eval, \
        getattr(cfg, 'comp_snapshot', 'last') == 'best'


def run_completion(cfg, save: bool = True):
    """End-to-end completion on one detected example dir."""
    data = load_completion(cfg)
    name = cfg.datadir.rstrip('/').split('/')[-1]
    expname = f'{cfg.expname}_top{cfg.p_topk}'
    save_dir = os.path.join(cfg.basedir, expname, name)

    data_fit, data_eval, snapshot_best = heldout_views(data, cfg)

    evals = {}
    best = {}   # best-heldout snapshot: score/iter/pred/adaptive

    def eval_hook(i: int, state: FitState, render):
        # seam outputs: skip the host cv2 inpaint on intermediate evals
        # unless seam compositing is active; the FINAL testset still gets
        # the diagnostic artifact (compare_telea's _seam columns read it)
        final_eval = i + cfg.i_testset > cfg.N_iters - 1
        res = evaluate(data_eval, state.params, render,
                       state.params['adaptive_pix'], cfg.loss_type,
                       comp_seam=getattr(cfg, 'comp_seam', 'none'),
                       normalize_type=cfg.normalize_type,
                       compute_seam=final_eval or None,
                       return_pred=snapshot_best)
        evals[i] = {k: v for k, v in res.items() if np.isscalar(v)}
        ho = res.get('heldout_psnr')
        print(f"[completion] eval@{i}: "
              f"train_psnr={res.get('train_psnr', float('nan')):.2f} "
              f"val_psnr={res.get('val_psnr', float('nan')):.2f}" +
              (f" heldout_psnr={ho:.2f}" if ho is not None else ""))
        if snapshot_best and ho is not None and \
                ho > best.get('score', -np.inf):
            # tree-map, NOT np.asarray: under loss_type='adaptive' the
            # latent is an AdaptiveParams pytree, which np.asarray would
            # collapse into one ndarray (crashes img2mse at re-compose)
            best.update(score=ho, iter=i, pred=res['pred'],
                        adaptive=jax.tree.map(
                            np.asarray, state.params['adaptive_pix']))
        if save:
            d = os.path.join(save_dir, f'testset_{i:06d}')
            for key in ('pred_rgb_train_img', 'pred_rgb_val_img',
                        'pred_rgb_img', 'pred_rgb_img_comp',
                        'pred_rgb_img_comp_seam'):
                if key in res:
                    write_rgb(os.path.join(d, f'{key}.png'), res[key])
            oh, ow = data.orig_shape
            write_rgb(os.path.join(d, 'gt_rgb_img.png'),
                      (data.img * data.valid_mask)[:oh, :ow])
            write_rgb(os.path.join(d, 'input_rgb_img.png'),
                      (data.masked_img * data.valid_mask)[:oh, :ow])

    result = fit_image(cfg, COMPLETION_TASK, data_fit, eval_hook=eval_hook,
                       log_every=cfg.i_print)
    final = evaluate(data_eval, result.state.params, result.render,
                     result.state.params['adaptive_pix'], cfg.loss_type,
                     comp_seam=getattr(cfg, 'comp_seam', 'none'),
                     normalize_type=cfg.normalize_type, compute_seam=True)
    final['snapshot_iter'] = cfg.N_iters - 1
    if snapshot_best and best and \
            best['score'] > final.get('heldout_psnr', -np.inf):
        # the held-out criterion prefers an earlier milestone: re-compose
        # the final output set from that snapshot's stored render
        final = compose_outputs(best['pred'], data_eval, best['adaptive'],
                                cfg.loss_type,
                                comp_seam=getattr(cfg, 'comp_seam', 'none'),
                                normalize_type=cfg.normalize_type,
                                compute_seam=True)
        final['snapshot_iter'] = best['iter']

    # final LPIPS of the composited output vs gt (the paper's second headline
    # metric; absolute values require converted pretrained towers)
    percep = result.components.percep
    if percep is None:
        from ..losses.lpips import LPIPS
        percep = LPIPS(net='vgg')
    comp = jnp.asarray(final['pred_rgb_img_comp'], jnp.float32)[None]
    oh, ow = data.orig_shape
    gt = jnp.asarray((data.img * data.valid_mask)[:oh, :ow], jnp.float32)[None]
    final['val_lpips'] = float(jnp.mean(percep(comp, gt, normalize=True)))
    comp_s = jnp.asarray(final['pred_rgb_img_comp_seam'], jnp.float32)[None]
    final['val_lpips_seam'] = float(jnp.mean(percep(comp_s, gt,
                                                    normalize=True)))
    if save:
        # the SELECTED output set, wherever the criterion landed; sorts
        # after every testset_NNNNNN dir so compare_telea reads it
        d = os.path.join(save_dir, 'testset_final')
        for key in ('pred_rgb_img', 'pred_rgb_img_comp',
                    'pred_rgb_img_comp_seam'):
            if key in final:
                write_rgb(os.path.join(d, f'{key}.png'), final[key])
    return result, final, evals
