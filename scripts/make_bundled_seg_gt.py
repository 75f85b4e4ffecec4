#!/usr/bin/env python
"""Ground-truth non-periodic masks for the two bundled segmentation
examples (VERDICT round-4 next #6: the reference ships no GT for them,
NPP_segmentation/train.py:333-406 only writes overlays, so every prior
quality number was synthetic-only).

Annotation method (documented, deterministic, checked in as PNG assets
under npp_tpu/assets/seg_gt/):

- 20150911134909-9f80de08 (diamond-plate metal sheet): the non-periodic
  region is the smooth rectangular patch-plate (including the damage blob
  inside it). HAND-ANNOTATED as a quadrilateral — the plate boundary is a
  crisp machined edge; corners were read off 6-8x zooms of the corners.
  Boundary uncertainty is ~±3 px, which is why eval_segmentation_iou.py
  also reports a boundary-band-excluded IoU (5 px band around the GT
  boundary scored as don't-care).

- 20150911143214-ab2bbd55-sm (perspective-rectified tiled wall): the
  near-periodic lattice is the rectified MAIN wall face. Non-periodic GT =
  everything valid that is not that face: the sky triangle, the side
  building face left of the main wall's left edge (a perpendicular,
  unrectified surface — its tiles do not follow the detected lattice), and
  the foliage. Derived by a deterministic rule: (valid AND col < 148 [the
  main wall's left edge, vertical to ±1 px]) OR (HSV foliage: 35<H<90,
  S>40, connected components >= 800 px — the size gate excludes the wall's
  small blue accent tiles, which are periodic content). 5x5 morphological
  closing; clipped to the valid mask. Foliage gaps that show wall through
  the leaves stay periodic (the color rule, not a hull, defines the tree).

Run:  python scripts/make_bundled_seg_gt.py [--input-root ...] [--out ...]
Writes <out>/<name>_nonperiodic.png (255 = non-periodic, 0 = periodic,
scored only inside the example's valid mask) and prints a JSON line per
example.
"""
import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (x, y) corners TL TR BR BL of the patch-plate, hand-read from corner zooms
PLATE_QUAD = np.array([[137, 29], [323, 32], [320, 158], [134, 155]],
                      np.int32)
WALL_LEFT_EDGE_COL = 148     # ab2bbd55-sm main-wall left edge (vertical ±1px)
FOLIAGE_MIN_COMPONENT = 800  # px; excludes the wall's blue accent tiles


def gt_9f80de08(img, valid):
    m = np.zeros(img.shape[:2], np.uint8)
    cv2.fillPoly(m, [PLATE_QUAD], 1)
    return (m & valid).astype(np.uint8)


def gt_ab2bbd55(img, valid):
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    h, s = hsv[..., 0].astype(int), hsv[..., 1].astype(int)
    tree = ((h > 35) & (h < 90) & (s > 40) & (valid > 0)).astype(np.uint8)
    tree = cv2.morphologyEx(tree, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8))
    n, lab, stats, _ = cv2.connectedComponentsWithStats(tree)
    tree2 = np.zeros_like(tree)
    for i in range(1, n):
        if stats[i, cv2.CC_STAT_AREA] >= FOLIAGE_MIN_COMPONENT:
            tree2[lab == i] = 1
    left = np.zeros_like(tree2)
    left[:, :WALL_LEFT_EDGE_COL] = 1
    m = ((left & valid) | tree2).astype(np.uint8)
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8))
    return (m & valid).astype(np.uint8)


BUILDERS = {
    '20150911134909-9f80de08': gt_9f80de08,
    '20150911143214-ab2bbd55-sm': gt_ab2bbd55,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input-root',
                    default='/root/reference/data/segmentation/input')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'npp_tpu', 'assets', 'seg_gt'))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name, fn in BUILDERS.items():
        d = os.path.join(args.input_root, name)
        img = cv2.imread(os.path.join(d, 'gt_img.png'))
        valid = (cv2.imread(os.path.join(d, 'valid_mask.png'), 0)
                 > 128).astype(np.uint8)
        m = fn(img, valid)
        out_path = os.path.join(args.out, f'{name}_nonperiodic.png')
        cv2.imwrite(out_path, m * 255)
        print(json.dumps({
            'example': name, 'out': out_path,
            'nonperiodic_frac_of_valid':
                round(float(m[valid > 0].mean()), 4)}))


if __name__ == '__main__':
    main()
