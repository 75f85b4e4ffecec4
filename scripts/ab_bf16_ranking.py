#!/usr/bin/env python
"""bf16 sensitivity of proposal ranking (VERDICT round-1 weak #8): run the
full search ranking on one bundled example with matmul_precision float32 vs
bfloat16 and compare the candidate distances and the resulting top-3 set.

Run on the TPU: `python scripts/ab_bf16_ranking.py [example_dir]`.
Prints one JSON line with both distance vectors and the stability verdict.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    datadir = sys.argv[1] if len(sys.argv) > 1 else \
        '/root/reference/data/completion/input/20150911134724-de45790e'

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()   # the shared pool can stall backend init for minutes

    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.ranking import rank_proposals
    from npp_tpu.proposal.search_engine import search_periodicity_by_feat
    from npp_tpu.proposal.pseudo_mask import build_pseudo_split
    from npp_tpu.utils.io import read_example_dir

    base = SearchConfig()
    data = read_example_dir(datadir)
    masked_img = data['masked_img']
    unknown_mask = data['unknown_mask']
    valid_mask = data['valid_mask']
    oh, ow = masked_img.shape[:2]
    m = base.canvas_multiple or 64
    hh, ww = -(-oh // m) * m, -(-ow // m) * m
    pad3 = ((0, hh - oh), (0, ww - ow), (0, 0))
    masked_img = np.pad(masked_img, pad3)
    unknown_mask = np.pad(unknown_mask, pad3)
    valid_mask = np.pad(valid_mask, pad3)

    angles, periods, _ = search_periodicity_by_feat(
        np.uint8(masked_img * 255),
        np.uint8(valid_mask * unknown_mask)[..., 0],
        repeat_range=base.search_range, edge_searching=base.edge_searching,
        gray_only=base.gray_only)
    _, i_train, i_val = build_pseudo_split(unknown_mask, valid_mask)
    percep = LPIPS(net='vgg')
    cx = ContextualLoss(use_vgg=True)

    out = {'example': os.path.basename(datadir), 'n_candidates': len(angles)}
    dists = {}
    for prec in ('float32', 'bfloat16'):
        cfg = replace(base, matmul_precision=prec)
        d = rank_proposals(cfg, masked_img, i_train, i_val, angles, periods,
                           percep, cx)
        dists[prec] = d
        out[f'distances_{prec}'] = [round(float(x), 5) for x in d]

    top3 = {p: list(np.argsort(d, kind='stable')[:3]) for p, d in dists.items()}
    out['top3_float32'] = [int(i) for i in top3['float32']]
    out['top3_bfloat16'] = [int(i) for i in top3['bfloat16']]
    out['top3_set_stable'] = sorted(top3['float32']) == sorted(top3['bfloat16'])
    out['top1_stable'] = bool(top3['float32'][0] == top3['bfloat16'][0])
    rel = np.abs(dists['float32'] - dists['bfloat16']) / \
        np.maximum(np.abs(dists['float32']), 1e-9)
    out['max_rel_distance_diff'] = round(float(rel.max()), 5)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
