#!/usr/bin/env python
"""Quantify remapping (VERDICT round-3 weak #3 / next #5): the bundled
record was one example, one metric. This harness adds

 1. SYNTHETIC ground truth: sharp near-periodic images with a known region
    Gaussian-blurred -> the full pipeline (search -> blur detection ->
    weighted fit -> re-render) must restore the blurred region. Metrics vs
    the SHARP original: blur-region PSNR + bbox LPIPS, clear-region PSNR
    (fidelity), against classical baselines the INR must beat:
    the blurred input itself (identity floor) and unsharp masking at two
    strengths (the classical local-sharpening answer; it can only amplify
    surviving frequencies, while the INR re-renders the lattice).
 2. BUNDLED example: clear-region + full-image PSNR/LPIPS fidelity (no
    sharp GT exists; the blur region is judged synthetically).
 3. One-lever A/B (--ab-style / --ab-iters): style loss off vs on
    (reference: NPP_remapping/train.py:253-261) or a 2x extended schedule.

Run on the TPU:
  python scripts/eval_remapping.py [--iters-scale 1.0] [--out DIR]
      [--n-synth 2] [--ab-style] [--ab-iters] [--skip-bundled]
Prints one JSON line per (example, arm) and a summary.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_blur_example(seed, h=256, w=320):
    """Sharp near-periodic lattice with fine detail (square-ish waves keep
    high harmonics for the blur to destroy) + an elliptical Gaussian-blurred
    region. Returns (sharp, blurred, blur_mask)."""
    import cv2
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    py, px = rng.choice([12, 14, 16]), rng.choice([14, 16, 20])
    ph = rng.uniform(0, 2 * np.pi, 3)

    def sq(t):   # soft square wave: sharp edges, band-limited enough
        return np.tanh(3.0 * np.sin(t))

    base = np.asarray([0.52, 0.48, 0.45])
    osc = np.stack([sq(2 * np.pi * xx / px + ph[0]),
                    sq(2 * np.pi * yy / py + ph[1]),
                    sq(2 * np.pi * (xx / px + yy / py) + ph[2])], -1)
    amp = np.asarray([0.2, 0.17, 0.12])
    sharp = np.clip(base + amp * osc + rng.randn(h, w, 3) * 0.01, 0, 1)

    cy, cx_ = rng.randint(h // 3, 2 * h // 3), rng.randint(w // 3, 2 * w // 3)
    ry, rx = rng.randint(50, 70), rng.randint(60, 85)
    blur_mask = (((yy - cy) / ry) ** 2 + ((xx - cx_) / rx) ** 2 < 1)
    blurred_full = cv2.GaussianBlur(sharp, (0, 0), 2.5)
    blurred = np.where(blur_mask[..., None], blurred_full, sharp)
    return sharp, blurred, blur_mask


def psnr(a, b, m):
    mse = ((a - b) ** 2 * m[..., None]).sum() / (m.sum() * 3.0)
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


_LPIPS = None


def lpips_val(a, b):
    global _LPIPS
    import jax.numpy as jnp
    if _LPIPS is None:
        from npp_tpu.losses.lpips import LPIPS
        _LPIPS = LPIPS(net='vgg')
    return float(np.mean(np.asarray(
        _LPIPS(jnp.asarray(a[None], jnp.float32),
               jnp.asarray(b[None], jnp.float32), normalize=True))))


def bbox_lpips(pred, gt, mask):
    """LPIPS on the blur-region bbox, pred composited into gt context
    (compare_telea.py's protocol)."""
    ys, xs = np.nonzero(mask)
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    m3 = mask[..., None]
    comp = pred * m3 + gt * (1 - m3)
    return lpips_val(comp[y0:y1, x0:x1], gt[y0:y1, x0:x1])


def unsharp(img, mask, sigma=2.0, amount=1.5):
    """Classical local sharpening: unsharp mask applied in `mask` only."""
    import cv2
    hp = img - cv2.GaussianBlur(img, (0, 0), sigma)
    out = np.clip(img + amount * hp, 0, 1)
    m3 = mask[..., None]
    return out * m3 + img * (1 - m3)


def ensure_search(name, in_dir, out_root, search_iters):
    """Detection + ranking for one example (idempotent via the odgt)."""
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.proposal.search import run_search

    det_root = os.path.join(out_root, 'detected')
    det_dir = os.path.join(det_root, name)
    if not os.path.exists(os.path.join(det_dir, 'config.odgt')):
        scfg = replace(SearchConfig(), datadir=in_dir, outdir=det_root)
        if search_iters:
            scfg = replace(scfg, N_iters=search_iters)
        run_search(scfg)
    return det_dir


def run_arm(name, in_dir, out_root, arm, cfg_kw, iters_scale, search_iters):
    from npp_tpu.config import RemappingConfig, replace
    from npp_tpu.models.remapping import run_remapping

    det_dir = ensure_search(name, in_dir, out_root, search_iters)
    cfg = replace(RemappingConfig(), datadir=det_dir,
                  basedir=os.path.join(out_root, 'results', arm), **cfg_kw)
    if iters_scale != 1.0:
        cfg = replace(cfg, N_iters=max(2, int(cfg.N_iters * iters_scale)),
                      i_testset=max(1, int(cfg.i_testset * iters_scale)))
    result, final, _ = run_remapping(cfg)
    return cfg, result, final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters-scale', type=float, default=1.0)
    ap.add_argument('--out', default='/tmp/npp_remap_eval')
    ap.add_argument('--n-synth', type=int, default=2)
    ap.add_argument('--skip-bundled', action='store_true')
    ap.add_argument('--search-iters', type=int, default=None,
                    help='override ranking fit iters (CPU smoke)')
    ap.add_argument('--ab-style', action='store_true',
                    help="add a style_weight=0 arm (A/B the reference's "
                         'style loss, NPP_remapping/train.py:253-261)')
    ap.add_argument('--ab-iters', action='store_true',
                    help='add a 2x-schedule arm (the completion lever '
                         'applied to remapping)')
    args = ap.parse_args()

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()

    import cv2

    arms = [('ref', {}, args.iters_scale)]
    if args.ab_style:
        arms.append(('style0', {'use_style_loss': False}, args.iters_scale))
    if args.ab_iters:
        arms.append(('iters2x', {}, args.iters_scale * 2.0))

    # ---- phase 1: write every synthetic input, then run EVERY search,
    # before any LPIPS/fit program executes. Mirrors run_suite's phase
    # order (all searches first): the one session that interleaved a
    # VGG-LPIPS eval before a search died with glibc heap corruption
    # inside cv2.Canny (detection's host phase) on the axon relay —
    # keeping all host-side cv2 detection work ahead of the big loss-tower
    # programs sidesteps the interaction and reuses compiled shapes better.
    synth_names = []
    for s in range(args.n_synth):
        name = f'synth_blur{s}'
        in_dir = os.path.join(args.out, 'input', name)
        os.makedirs(in_dir, exist_ok=True)
        sharp, blurred, blur_mask = synth_blur_example(seed=300 + s)
        cv2.imwrite(os.path.join(in_dir, 'gt_img.png'),
                    np.uint8(blurred[..., ::-1] * 255))
        cv2.imwrite(os.path.join(in_dir, 'masked_img.png'),
                    np.uint8(blurred[..., ::-1] * 255))
        for m in ('unknown_mask.png', 'valid_mask.png'):
            cv2.imwrite(os.path.join(in_dir, m),
                        np.full(blurred.shape[:2], 255, np.uint8))
        np.save(os.path.join(in_dir, 'sharp_gt.npy'), sharp)
        np.save(os.path.join(in_dir, 'blur_mask.npy'), blur_mask)
        synth_names.append((name, in_dir))

    bundled = []
    if not args.skip_bundled:
        in_root = '/root/reference/data/remapping/input'
        bundled = [(n, os.path.join(in_root, n))
                   for n in sorted(os.listdir(in_root))
                   if os.path.exists(os.path.join(in_root, n, 'gt_img.png'))]

    import time as _time
    for name, in_dir in synth_names + bundled:
        t0 = _time.time()
        ensure_search(name, in_dir, args.out, args.search_iters)
        print(f'[remap-eval] search {name}: {_time.time() - t0:.1f}s',
              file=sys.stderr, flush=True)

    records = []
    for name, in_dir in synth_names:
        sharp = np.load(os.path.join(in_dir, 'sharp_gt.npy'))
        blur_mask = np.load(os.path.join(in_dir, 'blur_mask.npy'))
        # quantize the input exactly as the pipeline reads it back
        inp = cv2.imread(os.path.join(in_dir, 'gt_img.png'))[..., ::-1] / 255.0

        # classical baselines on the blur region, vs the sharp original
        base_rows = {
            'identity': inp,
            'unsharp_1.5': unsharp(inp, blur_mask, 2.0, 1.5),
            'unsharp_3': unsharp(inp, blur_mask, 2.0, 3.0),
        }
        rec = {'example': name,
               'blur_frac': round(float(blur_mask.mean()), 3)}
        for bname, bimg in base_rows.items():
            rec[f'psnr_blur_{bname}'] = round(psnr(bimg, sharp, blur_mask), 2)
            rec[f'lpips_blur_{bname}'] = round(
                bbox_lpips(bimg, sharp, blur_mask), 4)

        for arm, kw, iscale in arms:
            cfg, result, final = run_arm(name, in_dir, args.out, arm, kw,
                                         iscale, args.search_iters)
            pred = np.asarray(final['pred_rgb_img'], np.float64)
            pred = pred[:sharp.shape[0], :sharp.shape[1]]
            rec[f'psnr_blur_ours_{arm}'] = round(
                psnr(pred, sharp, blur_mask), 2)
            rec[f'lpips_blur_ours_{arm}'] = round(
                bbox_lpips(pred, sharp, blur_mask), 4)
            rec[f'psnr_clear_ours_{arm}'] = round(
                psnr(pred, sharp, ~blur_mask), 2)
            rec[f'iters_per_sec_{arm}'] = round(result.iters_per_sec, 2)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    for name, in_dir in bundled:
        rec = {'example': name}
        for arm, kw, iscale in arms:
            cfg, result, final = run_arm(name, in_dir, args.out, arm, kw,
                                         iscale, args.search_iters)
            for k in ('train_psnr', 'val_psnr', 'full_lpips',
                      'clear_lpips'):
                if k in final:
                    rec[f'{k}_{arm}'] = round(float(final[k]), 4)
        records.append(rec)
        print(json.dumps(rec), flush=True)

    synth = [r for r in records if r['example'].startswith('synth')]
    if synth:
        best_base_psnr = [max(r['psnr_blur_identity'],
                              r['psnr_blur_unsharp_1.5'],
                              r['psnr_blur_unsharp_3']) for r in synth]
        best_base_lpips = [min(r['lpips_blur_identity'],
                               r['lpips_blur_unsharp_1.5'],
                               r['lpips_blur_unsharp_3']) for r in synth]
        summary = {
            'beats_best_baseline_psnr': sum(
                r['psnr_blur_ours_ref'] > b
                for r, b in zip(synth, best_base_psnr)),
            'beats_best_baseline_lpips': sum(
                r['lpips_blur_ours_ref'] < b
                for r, b in zip(synth, best_base_lpips)),
            'total': len(synth)}
        print(json.dumps({'summary': summary}), flush=True)
    with open(os.path.join(args.out, 'remap_records.json'), 'w') as f:
        json.dump(records, f, indent=1)


if __name__ == '__main__':
    main()
