#!/usr/bin/env python
"""Same-session A/B: sequential per-image searches vs the images-axis
batched search (VERDICT round-3 next #1). One process, identical examples,
shared loss towers; arms ordered sequential-first so the batched arm never
benefits from arm-order (its suite-fit program is its own cost; the
per-image detect/eval programs it shares with the sequential arm are the
production steady state either way — report both orders via --order if in
doubt).

Checks the equivalence bar: identical odgt top-3 (angles+periods) per
image, with distance deltas reported (near-ties documented acceptable,
CLAUDE.md).

Run on the TPU:
  python scripts/ab_batched_search.py [--tasks completion,...]
      [--out /tmp/npp_ab_search] [--aot-cache DIR] [--arm seq|bat|both]
Prints one JSON line per example + a summary line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tasks', default='completion,segmentation,remapping')
    ap.add_argument('--input-root', default='/root/reference/data')
    ap.add_argument('--out', default='/tmp/npp_ab_search')
    ap.add_argument('--aot-cache', default=os.environ.get(
        'NPP_TPU_AOT_CACHE', ''))
    ap.add_argument('--arm', default='both', choices=['seq', 'bat', 'both'])
    ap.add_argument('--rank-iters', type=int, default=None)
    args = ap.parse_args()

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()

    import cv2
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.search import run_search, run_search_suite

    examples = []
    hh = ww = 0
    mult = SearchConfig().canvas_multiple or 64
    for task in args.tasks.split(','):
        in_dir = os.path.join(args.input_root, task, 'input')
        if not os.path.isdir(in_dir):
            continue
        for n in sorted(os.listdir(in_dir)):
            p = os.path.join(in_dir, n, 'gt_img.png')
            if os.path.exists(p):
                examples.append((task, n, os.path.join(in_dir, n)))
                im = cv2.imread(p)
                hh, ww = max(hh, im.shape[0]), max(ww, im.shape[1])
    canvas = (-(-hh // mult) * mult, -(-ww // mult) * mult)
    print(f'[ab] {len(examples)} examples, canvas {canvas}',
          file=sys.stderr, flush=True)

    percep = LPIPS(net='vgg')
    contextual = ContextualLoss(use_vgg=True)

    def cfg_for(task, name, d, sub):
        c = replace(SearchConfig(), datadir=d,
                    outdir=os.path.join(args.out, sub, task),
                    canvas_override=canvas, aot_cache_dir=args.aot_cache)
        return replace(c, N_iters=args.rank_iters) if args.rank_iters else c

    walls = {}
    seq_odgts = bat_odgts = None
    if args.arm in ('seq', 'both'):
        t0 = time.time()
        seq_odgts = [run_search(cfg_for(t, n, d, 'seq'), percep=percep,
                                contextual=contextual)
                     for t, n, d in examples]
        walls['sequential_s'] = round(time.time() - t0, 1)
        print(f'[ab] sequential arm: {walls["sequential_s"]}s',
              file=sys.stderr, flush=True)
    if args.arm in ('bat', 'both'):
        t0 = time.time()
        bat_odgts = run_search_suite(
            [cfg_for(t, n, d, 'bat') for t, n, d in examples],
            percep=percep, contextual=contextual)
        walls['batched_s'] = round(time.time() - t0, 1)
        print(f'[ab] batched arm: {walls["batched_s"]}s',
              file=sys.stderr, flush=True)

    rows = []
    if seq_odgts and bat_odgts:
        for (task, name, _), s, b in zip(examples, seq_odgts, bat_odgts):
            top3_match = (s['selected_periods'][:3] == b['selected_periods'][:3]
                          and s['selected_angles'][:3] == b['selected_angles'][:3])
            ds, db = np.asarray(s['distances']), np.asarray(b['distances'])
            k = min(len(ds), len(db))
            row = {'example': f'{task}/{name}', 'top3_match': bool(top3_match),
                   'max_distance_delta': round(
                       float(np.abs(ds[:k] - db[:k]).max()), 6),
                   'seq_top3': s['selected_periods'][:3],
                   'bat_top3': b['selected_periods'][:3]}
            rows.append(row)
            print(json.dumps(row), flush=True)
        summary = dict(walls)
        summary['speedup'] = round(walls['sequential_s'] /
                                   max(walls['batched_s'], 1e-9), 2)
        summary['top3_match'] = sum(r['top3_match'] for r in rows)
        summary['total'] = len(rows)
        print(json.dumps({'summary': summary}), flush=True)
    else:
        print(json.dumps({'summary': walls}), flush=True)


if __name__ == '__main__':
    main()
