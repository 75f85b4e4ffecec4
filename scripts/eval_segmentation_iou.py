#!/usr/bin/env python
"""Quantify segmentation (VERDICT round-1 next #5): mask IoU instead of an
unanchored non-periodic fraction.

Two measurements:
 1. SYNTHETIC ground truth: generated near-periodic images with pasted
    non-periodic objects and a known non-periodic mask. Full pipeline
    (search -> coarse seg -> fit -> refinement) runs at (scaled) reference
    budgets; reports IoU of the refined mask AND of the coarse-init mask
    against GT — refinement must beat its init to justify the p95
    autocalibration.
 2. BUNDLED examples: IoU of refined vs coarse-init (no GT exists for them;
    the refinement delta + visual artifacts are the evidence).

Run on the TPU:
  python scripts/eval_segmentation_iou.py [--iters-scale 1.0] [--out DIR]
Prints one JSON line per example and a summary line.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_example(seed, h=256, w=320):
    """Near-periodic texture + non-periodic blobs, built so the superpixel
    color statistics behave like the bundled real examples: the texture
    oscillates around a CONSTANT local mean (period << superpixel size, so
    per-superpixel color means are uniform), while blobs have a distinct
    base color — the regime the coarse GMM+graph-cut is designed for
    (reference: loaders.py:141-205)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    py, px = rng.choice([8, 10, 12]), rng.choice([10, 12, 16])
    ph = rng.uniform(0, 2 * np.pi, 3)
    base = np.asarray([0.55, 0.5, 0.42])
    osc = np.stack([np.sin(2 * np.pi * xx / px + ph[0]),
                    np.sin(2 * np.pi * yy / py + ph[1]),
                    np.sin(2 * np.pi * (xx / px + yy / py) + ph[2])], -1)
    amp = np.asarray([0.22, 0.18, 0.1])
    img = base + amp * osc + rng.randn(h, w, 3) * 0.015
    gt_mask = np.zeros((h, w), bool)
    for b in range(2):  # two irregular blobs > remove_small_objects size
        cy, cx_ = rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4, 3 * w // 4)
        ry, rx = rng.randint(24, 40), rng.randint(28, 46)
        blob = ((yy - cy) / ry) ** 2 + ((xx - cx_) / rx) ** 2 < 1
        gt_mask |= blob
        # luminance-contrasting blob colors: the refinement criteria run on
        # GRAYSCALE maps (reference NPP_segmentation/train.py:340-344), so a
        # grayscale-isoluminant anomaly is invisible to criterion 1 by
        # design — measured and noted in BASELINE.md; the GT here stays in
        # the regime the algorithm targets.
        color = np.asarray([0.08, 0.1, 0.14]) if b == 0 \
            else np.asarray([0.92, 0.88, 0.8])
        tex = color + rng.randn(h, w, 3) * 0.05 \
            + 0.1 * np.sin(0.0004 * ((yy - cy) ** 2 + (xx - cx_) ** 2))[..., None]
        img = np.where(blob[..., None], tex, img)
    return np.clip(img, 0, 1), gt_mask


def synth_isoluminant(seed, h=256, w=320):
    """Synthetic whose planted blob is grayscale-ISOLUMINANT: a green shift
    compensated on R/B so |gray delta| stays under l1_thresh — invisible to
    the reference's grayscale criterion (measured round 2: halved refined
    IoU), the case cfg.seg_color_criterion exists for."""
    rng = np.random.RandomState(seed)
    img, gt_mask = synth_example(seed=200 + seed, h=h, w=w)
    img = img.copy()
    gray_w = np.asarray([0.299, 0.587, 0.114])
    d = 0.3
    shift = np.asarray([-d * gray_w[1] / (gray_w[0] + gray_w[2]), d,
                        -d * gray_w[1] / (gray_w[0] + gray_w[2])])
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    cy, cx_, ry, rx = h // 2, w // 3, 34, 40
    blob = ((yy - cy) / ry) ** 2 + ((xx - cx_) / rx) ** 2 < 1
    img = np.clip(np.where(blob[..., None], img + shift, img), 0, 1)
    return img, (gt_mask | blob)


def iou(a, b, care=None):
    """IoU of boolean masks; `care` (optional bool mask) restricts scoring
    to those pixels (used for valid-region and boundary-band-excluded
    scoring of the bundled GT)."""
    a = a.astype(bool)
    b = b.astype(bool)
    if care is not None:
        a, b = a & care, b & care
    u = (a | b).sum()
    return float((a & b).sum() / u) if u else 1.0


def load_bundled_gt(name, shape):
    """Hand/heuristic-annotated non-periodic GT for the bundled examples
    (scripts/make_bundled_seg_gt.py; asset PNGs in npp_tpu/assets/seg_gt).
    Returns (gt_mask, band_care) or (None, None): band_care excludes a 5 px
    band around the GT boundary (the annotation's stated uncertainty)."""
    import cv2
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'npp_tpu', 'assets', 'seg_gt', f'{name}_nonperiodic.png')
    if not os.path.exists(path):
        return None, None
    gt = cv2.imread(path, 0) > 128
    if gt.shape != shape:
        return None, None
    k = np.ones((11, 11), np.uint8)   # 5 px band each side of the edge
    g8 = gt.astype(np.uint8)
    band = (cv2.dilate(g8, k) > 0) & ~(cv2.erode(g8, k) > 0)
    return gt, ~band


def run_example(name, in_dir, out_root, iters_scale, search_iters=None,
                color_criterion=False, refine_protect=False,
                all_variants=False):
    import cv2
    import numpy as np
    from npp_tpu.config import (SearchConfig, SegmentationConfig, replace)
    from npp_tpu.proposal.search import run_search
    from npp_tpu.models.segmentation import (refine_segmentation,
                                             run_segmentation)

    det_root = os.path.join(out_root, 'detected')
    det_dir = os.path.join(det_root, name)
    if not os.path.exists(os.path.join(det_dir, 'config.odgt')):
        scfg = replace(SearchConfig(), datadir=in_dir, outdir=det_root)
        if search_iters:
            scfg = replace(scfg, N_iters=search_iters)
        run_search(scfg)
    cfg = replace(SegmentationConfig(), datadir=det_dir,
                  basedir=os.path.join(out_root, 'results'),
                  seg_color_criterion=color_criterion,
                  seg_refine_protect=refine_protect)
    if iters_scale != 1.0:
        cfg = replace(cfg, N_iters=max(2, int(cfg.N_iters * iters_scale)),
                      i_testset=max(1, int(cfg.i_testset * iters_scale)))
    result, results = run_segmentation(cfg)
    last = results[max(results)]
    variants = None
    if all_variants:
        # refinement is a HOST-side post-process of the fitted render: all
        # criterion-option combinations are computed from the SAME fit, so
        # their IoU deltas carry no fit-budget or rng confound
        from npp_tpu.losses.lpips import LPIPS
        from npp_tpu.models.loaders import load_segmentation
        data = load_segmentation(cfg)
        h, w = data.img.shape[:2]
        pred = np.asarray(result.render(result.state.params, h, w))
        lp = LPIPS(net='alex')
        variants = {}
        lp_cache = {}   # one tower forward shared by every variant
        # each variant is built from an EXPLICIT clean base (protect off,
        # hysteresis 1.0) so the grid labels describe exactly what ran,
        # regardless of the --protect flag on the primary run
        for cname, col in (('gray', False), ('color', True)):
            for vname, kw in (('', {}),
                              ('+protect', {'seg_refine_protect': True}),
                              ('+hyst.5', {'seg_refine_hysteresis': 0.5}),
                              ('+hyst.7', {'seg_refine_hysteresis': 0.7}),
                              ('+tex', {'seg_texture_criterion': True}),
                              ('+tex+hyst.5',
                               {'seg_texture_criterion': True,
                                'seg_refine_hysteresis': 0.5})):
                base = dict(seg_color_criterion=col,
                            seg_refine_protect=False,
                            seg_refine_hysteresis=1.0)
                base.update(kw)   # variant keys override the clean base
                vcfg = replace(cfg, **base)
                variants[cname + vname] = refine_segmentation(
                    vcfg, data, pred, lp, cache=lp_cache)
    return cfg, last, variants


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters-scale', type=float, default=1.0)
    ap.add_argument('--out', default='/tmp/npp_seg_iou')
    ap.add_argument('--n-synth', type=int, default=3)
    ap.add_argument('--skip-bundled', action='store_true')
    ap.add_argument('--search-iters', type=int, default=None,
                    help='override ranking fit iters (CPU smoke)')
    ap.add_argument('--color-criterion', action='store_true',
                    help='cfg.seg_color_criterion=True: per-channel L1 '
                         'refinement criterion (round-3 gated option)')
    ap.add_argument('--all-variants', action='store_true',
                    help='report IoU of every criterion-option combination '
                         '(gray/color x protect) computed from the SAME '
                         'fit — no fit-budget confound between variants')
    ap.add_argument('--protect', action='store_true',
                    help='cfg.seg_refine_protect=True: restore init '
                         'components that retain refined evidence '
                         '(round-3 gated anti-erosion option)')
    ap.add_argument('--isoluminant', action='store_true',
                    help='add a synthetic whose blob is grayscale-'
                         'isoluminant (the measured round-2 failure mode '
                         'of the reference grayscale criterion)')
    args = ap.parse_args()

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()   # the shared pool can stall backend init for minutes

    import cv2
    from npp_tpu.models.loaders import load_segmentation
    from npp_tpu.config import SegmentationConfig, replace

    records = []

    # ---- synthetic GT examples
    synth_ids = list(range(args.n_synth)) + ([99] if args.isoluminant else [])
    for s in synth_ids:
        name = f'synth{s}' if s != 99 else 'synth_isolum'
        in_dir = os.path.join(args.out, 'input', name)
        os.makedirs(in_dir, exist_ok=True)
        if s == 99:
            img, gt_mask = synth_isoluminant(seed=7)
        else:
            img, gt_mask = synth_example(seed=100 + s)
        cv2.imwrite(os.path.join(in_dir, 'gt_img.png'),
                    np.uint8(img[..., ::-1] * 255))
        cv2.imwrite(os.path.join(in_dir, 'masked_img.png'),
                    np.uint8(img[..., ::-1] * 255))
        cv2.imwrite(os.path.join(in_dir, 'unknown_mask.png'),
                    np.full(img.shape[:2], 255, np.uint8))
        cv2.imwrite(os.path.join(in_dir, 'valid_mask.png'),
                    np.full(img.shape[:2], 255, np.uint8))
        np.save(os.path.join(in_dir, 'gt_nonperiodic.npy'), gt_mask)

        cfg, last, variants = run_example(
            name, in_dir, args.out, args.iters_scale,
            search_iters=args.search_iters,
            color_criterion=args.color_criterion,
            refine_protect=args.protect, all_variants=args.all_variants)
        data = load_segmentation(replace(
            cfg, datadir=os.path.join(args.out, 'detected', name)))
        oh, ow = data.orig_shape
        init_mask = (data.extra['non_period_mask'] > 0)[..., 0][:oh, :ow]
        fin = last['non_period_mask'][..., 0] > 0
        rec = {'example': name,
               'iou_refined_vs_gt': round(iou(fin, gt_mask), 4),
               'iou_init_vs_gt': round(iou(init_mask, gt_mask), 4),
               'iou_refined_vs_init': round(iou(fin, init_mask), 4),
               'frac_refined': round(float(fin.mean()), 4),
               'frac_gt': round(float(gt_mask.mean()), 4)}
        if variants is not None:
            rec['variants_iou_vs_gt'] = {
                k: round(iou(v['non_period_mask'][..., 0] > 0, gt_mask), 4)
                for k, v in variants.items()}
        records.append(rec)
        print(json.dumps(rec))

    # ---- bundled examples: refined vs coarse-init
    if not args.skip_bundled:
        in_root = '/root/reference/data/segmentation/input'
        for name in sorted(os.listdir(in_root)):
            in_dir = os.path.join(in_root, name)
            if not os.path.exists(os.path.join(in_dir, 'gt_img.png')):
                continue
            cfg, last, variants = run_example(
                name, in_dir, args.out, args.iters_scale,
                search_iters=args.search_iters,
                color_criterion=args.color_criterion,
                refine_protect=args.protect,
                all_variants=args.all_variants)
            data = load_segmentation(replace(
                cfg, datadir=os.path.join(args.out, 'detected', name)))
            oh, ow = data.orig_shape
            init_mask = (data.extra['non_period_mask'] > 0)[..., 0][:oh, :ow]
            fin = last['non_period_mask'][..., 0] > 0
            rec = {'example': name,
                   'iou_refined_vs_init': round(iou(fin, init_mask), 4),
                   'frac_init': round(float(init_mask.mean()), 4),
                   'frac_refined': round(float(fin.mean()), 4)}
            gt, band_care = load_bundled_gt(name, fin.shape)
            if gt is not None:
                care = data.valid_mask[..., 0][:oh, :ow] > 0.5
                rec['iou_refined_vs_gt'] = round(iou(fin, gt, care), 4)
                rec['iou_init_vs_gt'] = round(iou(init_mask, gt, care), 4)
                # ±5 px GT boundary uncertainty scored as don't-care
                rec['iou_refined_vs_gt_band5'] = round(
                    iou(fin, gt, care & band_care), 4)
                rec['iou_init_vs_gt_band5'] = round(
                    iou(init_mask, gt, care & band_care), 4)
                if variants is not None:
                    rec['variants_iou_vs_gt'] = {
                        k: round(iou(v['non_period_mask'][..., 0] > 0, gt,
                                     care), 4)
                        for k, v in variants.items()}
            records.append(rec)
            print(json.dumps(rec))

    synth = [r for r in records if r['example'].startswith('synth')]
    if synth:
        summary = {
            'mean_iou_refined_vs_gt': round(
                float(np.mean([r['iou_refined_vs_gt'] for r in synth])), 4),
            'mean_iou_init_vs_gt': round(
                float(np.mean([r['iou_init_vs_gt'] for r in synth])), 4),
        }
        summary['refinement_beats_init'] = \
            summary['mean_iou_refined_vs_gt'] > summary['mean_iou_init_vs_gt']
        print(json.dumps({'summary': summary}))
    with open(os.path.join(args.out, 'iou_records.json'), 'w') as f:
        json.dump(records, f, indent=1)


if __name__ == '__main__':
    main()
