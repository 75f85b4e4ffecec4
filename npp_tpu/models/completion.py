"""Completion task: inpaint the unknown region of a near-periodic image
(reference: NPP_completion/train.py:20-343)."""
from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..losses.pixel import img2mse, mse2psnr
from ..utils.io import write_rgb
from .loaders import load_completion
from .pipeline import TaskSpec, fit_image
from .trainer import FitState

COMPLETION_TASK = TaskSpec(name='completion')


def evaluate(data, params, render, adaptive_pix, loss_type: str
             ) -> Dict[str, np.ndarray]:
    """Render and compose the reference's output set
    (reference: NPP_completion/train.py:270-331), plus PSNR metrics."""
    h, w = data.img.shape[:2]
    pred = render(params, h, w)                       # (H, W, 3)
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
    return out


def run_completion(cfg, save: bool = True):
    """End-to-end completion on one detected example dir."""
    data = load_completion(cfg)
    name = cfg.datadir.rstrip('/').split('/')[-1]
    expname = f'{cfg.expname}_top{cfg.p_topk}'
    save_dir = os.path.join(cfg.basedir, expname, name)

    evals = {}

    def eval_hook(i: int, state: FitState, render):
        res = evaluate(data, state.params, render,
                       state.params['adaptive_pix'], cfg.loss_type)
        evals[i] = {k: v for k, v in res.items() if np.isscalar(v)}
        print(f"[completion] eval@{i}: "
              f"train_psnr={res.get('train_psnr', float('nan')):.2f} "
              f"val_psnr={res.get('val_psnr', float('nan')):.2f}")
        if save:
            d = os.path.join(save_dir, f'testset_{i:06d}')
            for key in ('pred_rgb_train_img', 'pred_rgb_val_img',
                        'pred_rgb_img', 'pred_rgb_img_comp'):
                write_rgb(os.path.join(d, f'{key}.png'), res[key])
            oh, ow = data.orig_shape
            write_rgb(os.path.join(d, 'gt_rgb_img.png'),
                      (data.img * data.valid_mask)[:oh, :ow])
            write_rgb(os.path.join(d, 'input_rgb_img.png'),
                      (data.masked_img * data.valid_mask)[:oh, :ow])

    result = fit_image(cfg, COMPLETION_TASK, data, eval_hook=eval_hook,
                       log_every=cfg.i_print)
    final = evaluate(data, result.state.params, result.render,
                     result.state.params['adaptive_pix'], cfg.loss_type)

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
    return result, final, evals
