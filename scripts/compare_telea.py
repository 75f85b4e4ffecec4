#!/usr/bin/env python
"""Hole-region PSNR: our completion outputs vs cv2 TELEA diffusion inpainting
(the classical baseline the INR must beat; BASELINE.md completion table).

Usage: python scripts/compare_telea.py --suite-out /tmp/npp_suite
Reads <suite-out>/completion/results/completion_top*/<name>/testset_*/
pred_rgb_img_comp.png (latest testset) and the bundled inputs; prints one
JSON line per example and a summary.
"""
import argparse
import glob
import json
import os
import sys

import cv2
import numpy as np


def psnr(a, b, m):
    mse = ((a - b) ** 2 * m).sum() / (m.sum() * 3.0)
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


_LPIPS = None


def lpips_val(a, b):
    """Scalar LPIPS-vgg (analytic towers + calibrated lin heads when
    pretrained checkpoints are absent — valid for RELATIVE comparison)."""
    global _LPIPS
    import jax.numpy as jnp
    if _LPIPS is None:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from npp_tpu.losses.lpips import LPIPS
        _LPIPS = LPIPS(net='vgg')
    return float(_LPIPS(jnp.asarray(a[None], jnp.float32),
                        jnp.asarray(b[None], jnp.float32),
                        normalize=True)[0, 0, 0, 0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--suite-out', default='/tmp/npp_suite')
    ap.add_argument('--input-root',
                    default='/root/reference/data/completion/input')
    args = ap.parse_args()

    rows = []
    for name in sorted(os.listdir(args.input_root)):
        in_dir = os.path.join(args.input_root, name)
        if not os.path.exists(os.path.join(in_dir, 'gt_img.png')):
            continue
        gt = cv2.imread(os.path.join(in_dir, 'gt_img.png'))[..., ::-1] / 255.0
        masked = cv2.imread(os.path.join(in_dir, 'masked_img.png'))[..., ::-1] / 255.0
        unk = cv2.imread(os.path.join(in_dir, 'unknown_mask.png'), 0) / 255.0
        valid = cv2.imread(os.path.join(in_dir, 'valid_mask.png'), 0) / 255.0
        hole = ((unk < 0.5) & (valid > 0.5)).astype(np.float64)[..., None]

        # TELEA baseline on the masked image
        telea = cv2.inpaint(np.uint8(masked[..., ::-1] * 255),
                            np.uint8((unk < 0.5) * 255), 3,
                            cv2.INPAINT_TELEA)[..., ::-1] / 255.0
        p_telea = psnr(telea, gt, hole)

        # our latest prediction
        pats = sorted(glob.glob(os.path.join(
            args.suite_out, 'completion', 'results', 'completion_top*', name,
            'testset_*', 'pred_rgb_img_comp.png')))
        row = {'example': name, 'hole_frac': round(float(hole.mean()), 3),
               'psnr_telea': round(p_telea, 2)}
        if pats:
            ours = cv2.imread(pats[-1])[..., ::-1] / 255.0
            if ours.shape != gt.shape:
                ours = ours[:gt.shape[0], :gt.shape[1]]
            row['psnr_ours'] = round(psnr(ours, gt, hole), 2)
            row['beats_telea'] = row['psnr_ours'] > row['psnr_telea']
            # perceptual comparison over the hole bbox (hole-composited)
            ys, xs = np.nonzero(hole[..., 0])
            y0, y1 = ys.min(), ys.max() + 1
            x0, x1 = xs.min(), xs.max() + 1
            row['lpips_telea'] = round(lpips_val(
                (telea * hole + gt * (1 - hole))[y0:y1, x0:x1],
                gt[y0:y1, x0:x1]), 4)
            row['lpips_ours'] = round(lpips_val(
                (ours * hole + gt * (1 - hole))[y0:y1, x0:x1],
                gt[y0:y1, x0:x1]), 4)
            row['beats_telea_lpips'] = row['lpips_ours'] < row['lpips_telea']
            row['pred'] = pats[-1]
            # seam-aware residual-corrected composite, when saved
            seam_path = pats[-1].replace('pred_rgb_img_comp.png',
                                         'pred_rgb_img_comp_seam.png')
            if os.path.exists(seam_path):
                seam = cv2.imread(seam_path)[..., ::-1] / 255.0
                if seam.shape != gt.shape:
                    seam = seam[:gt.shape[0], :gt.shape[1]]
                row['psnr_ours_seam'] = round(psnr(seam, gt, hole), 2)
                row['lpips_ours_seam'] = round(lpips_val(
                    (seam * hole + gt * (1 - hole))[y0:y1, x0:x1],
                    gt[y0:y1, x0:x1]), 4)
        rows.append(row)
        print(json.dumps(row))

    done = [r for r in rows if 'psnr_ours' in r]
    if done:
        print(json.dumps({'summary': {
            'beats_telea': sum(r['beats_telea'] for r in done),
            'beats_telea_lpips': sum(r.get('beats_telea_lpips', False)
                                     for r in done),
            'total': len(done),
            'mean_margin_db': round(float(np.mean(
                [r['psnr_ours'] - r['psnr_telea'] for r in done])), 2),
            'beats_telea_seam': sum(
                r.get('psnr_ours_seam', -1e9) > r['psnr_telea']
                for r in done),
            'mean_margin_db_seam': round(float(np.mean(
                [r.get('psnr_ours_seam', r['psnr_ours']) - r['psnr_telea']
                 for r in done])), 2)}}))


if __name__ == '__main__':
    main()
