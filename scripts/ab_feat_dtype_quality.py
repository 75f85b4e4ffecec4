#!/usr/bin/env python
"""Quality impact of cfg.feature_dtype='bfloat16' (the measured +14.7%
step-speed lever, BASELINE round-5 robust_layout/feat_bf16 section) on a
REAL completion fit: same detected dir, same session, reference budget —
hole PSNR + LPIPS per arm. Converts the lever's "values drift within the
CPU closeness bound" caveat into a measured quality delta.

Run on the TPU:
  python scripts/ab_feat_dtype_quality.py [--example <name>] [--iters-scale 1.0]
One JSON line per arm + a summary line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--example', default='20150911134723-104840a8')
    ap.add_argument('--iters-scale', type=float, default=1.0)
    ap.add_argument('--out', default='/tmp/npp_fd_quality_ab')
    args = ap.parse_args()

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()

    from npp_tpu.config import CompletionConfig, SearchConfig, replace
    from npp_tpu.models.completion import run_completion
    from npp_tpu.proposal.search import run_search

    in_dir = os.path.join('/root/reference/data/completion/input',
                          args.example)
    det_root = os.path.join(args.out, 'detected')
    det_dir = os.path.join(det_root, args.example)
    if not os.path.exists(os.path.join(det_dir, 'config.odgt')):
        run_search(replace(SearchConfig(), datadir=in_dir, outdir=det_root))

    recs = []
    for arm, kw in (('f32', {}), ('bf16', {'feature_dtype': 'bfloat16'})):
        cfg = replace(CompletionConfig(), datadir=det_dir,
                      basedir=os.path.join(args.out, arm), **kw)
        if args.iters_scale != 1.0:
            cfg = replace(cfg,
                          N_iters=max(2, int(cfg.N_iters * args.iters_scale)),
                          i_testset=max(1, int(cfg.i_testset
                                               * args.iters_scale)))
        t0 = time.time()
        result, final, _ = run_completion(cfg)
        rec = {'arm': arm, 'wall_s': round(time.time() - t0, 1),
               'iters_per_sec': round(result.iters_per_sec, 2)}
        for k in ('val_psnr', 'val_psnr_seam', 'val_lpips', 'train_psnr'):
            if k in final:
                rec[k] = round(float(final[k]), 4)
        recs.append(rec)
        print(json.dumps(rec), flush=True)

    if len(recs) == 2 and 'val_psnr' in recs[0] and 'val_psnr' in recs[1]:
        print(json.dumps({'summary': {
            'example': args.example,
            'delta_val_psnr_db': round(recs[1]['val_psnr']
                                       - recs[0]['val_psnr'], 3),
            'delta_val_lpips': round(recs[1].get('val_lpips', 0)
                                     - recs[0].get('val_lpips', 0), 5),
            'speedup': round(recs[1]['iters_per_sec']
                             / max(recs[0]['iters_per_sec'], 1e-9), 3)}}),
            flush=True)


if __name__ == '__main__':
    main()
