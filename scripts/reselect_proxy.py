#!/usr/bin/env python
"""Re-select a detected dir's top-K proposals under a different ranking
proxy WITHOUT re-running the search: the odgt's rank_candidates block
(written by proposal/search.py since round 3) carries every candidate's
lattice and every proxy's score from the one-time vmapped eval.

Usage:
  python scripts/reselect_proxy.py <detected_dir> --proxy heldout_mse \
      [--out <new_detected_dir>] [--topk 10]

Without --out, rewrites <detected_dir>/config.odgt in place (keeping a
config.odgt.orig backup on first rewrite).

Also prints, for every proxy, the induced candidate ordering — the dry
analysis used by the round-3 proxy sweep.
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def reselect(info: dict, proxy: str, topk: int, order=None) -> dict:
    rc = info['rank_candidates']
    scores = {k: np.asarray(v) for k, v in rc['scores'].items()}
    if order is not None:
        order = np.asarray(order)[:topk]
        proxy = proxy or 'reference'
    else:
        if proxy not in scores:
            raise SystemExit(f'proxy {proxy!r} not in {sorted(scores)}')
        order = np.argsort(scores[proxy], kind='stable')[:topk]
    info = dict(info)
    info['selected_angles'] = [rc['angles'][i] for i in order]
    info['selected_periods'] = [rc['periods'][i] for i in order]
    info['selected_shifts'] = [rc['shifts'][i] for i in order]
    info['distances'] = [float(scores[proxy][i]) for i in order]
    info['distances_gate'] = [float(scores['reference'][i]) for i in order]
    info['rank_proxy'] = proxy
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('detected_dir')
    ap.add_argument('--proxy', default=None)
    ap.add_argument('--out', default=None)
    ap.add_argument('--topk', type=int, default=10)
    ap.add_argument('--order', default=None,
                    help='explicit comma-separated candidate indices '
                         '(detection order) overriding any proxy, e.g. '
                         '"1,0,2" to swap top-1/top-2')
    args = ap.parse_args()

    path = os.path.join(args.detected_dir, 'config.odgt')
    with open(path) as f:
        info = json.loads(f.readline())
    rc = info.get('rank_candidates')
    if not rc:
        raise SystemExit('odgt has no rank_candidates block (re-run search '
                         'with the round-3 code)')

    print(f'{args.detected_dir}: {len(rc["periods"])} candidates')
    for name, s in rc['scores'].items():
        order = np.argsort(np.asarray(s), kind='stable')
        tops = [f'{rc["periods"][i]}@{s[i]:.4g}' for i in order[:3]]
        print(f'  {name:12s}: ' + '  '.join(tops))

    if args.proxy is None and args.order is None:
        return
    order = [int(x) for x in args.order.split(',')] if args.order else None
    info = reselect(info, args.proxy, args.topk, order=order)
    out_dir = args.out or args.detected_dir
    if out_dir != args.detected_dir:
        shutil.copytree(args.detected_dir, out_dir, dirs_exist_ok=True)
    elif not os.path.exists(path + '.orig'):
        shutil.copy2(path, path + '.orig')
    with open(os.path.join(out_dir, 'config.odgt'), 'w') as f:
        f.write(json.dumps(info) + '\n')
    print(f'wrote {out_dir}/config.odgt (proxy={args.proxy}, '
          f'top periods {info["selected_periods"][:3]})')


if __name__ == '__main__':
    main()
