#!/usr/bin/env python
"""Pre-compile a suite's search-stage executables into the AOT cache
(VERDICT round-3 next #8): detection FFT grids, the per-image ranking
lockstep-fit + vmapped-eval programs, and the images-axis suite fit — so a
fresh driver session pays seconds of deserialization instead of 2-7 min
relay compiles per program.

Programs are compiled WITHOUT running them (aot._AotWrapped.warm with
jax.ShapeDtypeStruct avals); the only device work is each example's
detection FFT grid (ms compute) executed while deriving the real shape
classes from the inputs via proposal.search._prepare_search (candidate
counts, pool lengths and eval-crop shapes are data-dependent, so the
shapes must come from the actual inputs, not guesses).

With --fits and existing detected dirs, additionally compiles the batched
task fit blocks by running ONE scan block per (task, bucket) through
parallel.runner.fit_images (the block program is the unit of compilation;
one block of compute is the price of exercising the real code path).

Usage:
  NPP_TPU_AOT_CACHE=/path python scripts/warm_aot.py \
      [--input-root /root/reference/data] [--tasks completion,...]
      [--fits --detected /tmp/npp_suite]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input-root', default='/root/reference/data')
    ap.add_argument('--tasks', default='completion,segmentation,remapping')
    ap.add_argument('--aot-cache', default=os.environ.get(
        'NPP_TPU_AOT_CACHE', ''))
    ap.add_argument('--no-suite-canvas', action='store_true',
                    help='per-image ranking canvases instead of the '
                         'suite-wide max (match run_suite --no-global-canvas)')
    ap.add_argument('--fits', action='store_true',
                    help='also compile batched task fit blocks (needs '
                         '--detected with config.odgt dirs)')
    ap.add_argument('--detected', default='',
                    help='suite out root with <task>/detected/<name> dirs')
    a = ap.parse_args()
    if not a.aot_cache:
        sys.exit('set --aot-cache or NPP_TPU_AOT_CACHE')

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()
    import jax
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.search import _prepare_search
    from npp_tpu.proposal import ranking as R
    from npp_tpu.utils import aot

    t_start = time.time()
    examples = []
    for task in a.tasks.split(','):
        in_dir = os.path.join(a.input_root, task, 'input')
        if os.path.isdir(in_dir):
            examples += [os.path.join(in_dir, n)
                         for n in sorted(os.listdir(in_dir))
                         if os.path.exists(os.path.join(in_dir, n,
                                                        'gt_img.png'))]
    print(f'[warm] {len(examples)} examples', file=sys.stderr, flush=True)

    # suite-wide ranking canvas (run_suite's default global canvas)
    import cv2
    mult = SearchConfig().canvas_multiple or 64
    canvas = ()
    if not a.no_suite_canvas:
        hh = ww = 0
        for d in examples:
            im = cv2.imread(os.path.join(d, 'gt_img.png'))
            if im is not None:
                hh, ww = max(hh, im.shape[0]), max(ww, im.shape[1])
        canvas = (-(-hh // mult) * mult, -(-ww // mult) * mult)
        print(f'[warm] suite canvas {canvas}', file=sys.stderr, flush=True)

    scfg = replace(SearchConfig(), aot_cache_dir=a.aot_cache,
                   canvas_override=canvas, outdir='/tmp/npp_warm_det')
    percep, cx = LPIPS(net='vgg'), ContextualLoss(use_vgg=True)
    report = {'programs': [], 'already_cached': 0}

    # _prepare_search runs detection (compiles + caches each FFT grid) and
    # yields the data-dependent ranking shapes
    preps = [_prepare_search(replace(scfg, datadir=d)) for d in examples]
    t_detect = time.time()
    print(f'[warm] detection grids done ({t_detect - t_start:.1f}s)',
          file=sys.stderr, flush=True)

    from npp_tpu.utils.pools import pad_pool_pow2
    n_cand = max(max(len(p['all_angles']) for p in preps),
                 scfg.rank_pad_candidates)
    hmax = max(p['masked_img'].shape[0] for p in preps)
    wmax = max(p['masked_img'].shape[1] for p in preps)
    f_bands = 2 + scfg.multires
    classes = set()
    pool_lens = []
    for p in preps:
        h, w = hmax, wmax
        padded, _ = pad_pool_pow2(p['i_train'], fill='tile')
        pool_lens.append(len(padded))
        _, _, n_chunks, ch_, cw_ = R._eval_inputs(
            scfg, (h, w), p['i_val'], (p['dh'], p['dw']))
        classes.add((h, w, n_cand, len(padded), n_chunks, ch_, cw_))

    def warm(fn, args, label):
        if not isinstance(fn, aot._AotWrapped):
            return
        t0 = time.time()
        hit = fn.warm(*args)
        report['programs'].append(
            {'name': label, 'cached': hit, 's': round(time.time() - t0, 1)})
        report['already_cached'] += int(hit)
        print(f'[warm] {label}: {"hit" if hit else "compiled"} '
              f'({time.time() - t0:.1f}s)', file=sys.stderr, flush=True)

    core = R._rank_core(scfg)
    params0 = core['params0']
    f32 = np.float32

    for statics in sorted(classes):
        h, w, nc, plen, n_chunks, ch_, cw_ = statics
        fit, eval_all, tx, _, _ = R._rank_programs(scfg, statics, percep, cx,
                                                   None, 'candidates')
        params = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct((nc,) + np.shape(x),
                                           np.asarray(x).dtype), params0)
        opt = jax.eval_shape(tx.init, params)
        sds = jax.ShapeDtypeStruct
        img_a = sds((h, w, 3), f32)
        warm(fit, (params, opt, sds((2,), np.uint32), img_a,
                   sds((plen, 2), np.int32), sds((), np.int32),
                   sds((nc, 2), f32), sds((nc, 2), f32),
                   sds((f_bands,), f32)),
             f'rank-fit-{h}x{w}-c{nc}-p{plen}')
        warm(eval_all, (params, img_a, sds((nc, 2), f32),
                        sds((nc, 2), f32), sds((f_bands,), f32),
                        sds((n_chunks, R._CHUNK, 2), np.int32),
                        sds((2,), np.int32)),
             f'rank-eval-{h}x{w}-c{nc}-{ch_}x{cw_}-v{n_chunks}')

    # the images-axis suite fit (run_suite --batched-search)
    n_img, plen = len(preps), max(pool_lens)
    sfit = R._suite_fit_program(scfg, (hmax, wmax, n_img, n_cand, plen),
                                None, 'images')
    if isinstance(sfit, aot._AotWrapped):
        sds = jax.ShapeDtypeStruct
        params = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct((n_img, n_cand) + np.shape(x),
                                           np.asarray(x).dtype), params0)
        opt = jax.eval_shape(core['tx'].init, params)
        warm(sfit, (params, opt, sds((2,), np.uint32),
                    sds((n_img, hmax, wmax, 3), f32),
                    sds((n_img, plen, 2), np.int32),
                    sds((n_img,), np.int32), sds((n_img, n_cand, 2), f32),
                    sds((n_img, n_cand, 2), f32),
                    sds((n_img, f_bands), f32)),
             f'rank-sfit-{hmax}x{wmax}-i{n_img}-c{n_cand}-p{plen}')

    if a.fits and a.detected:
        # exercise the real batched fit path for one block per task bucket
        from npp_tpu.config import (CompletionConfig, RemappingConfig,
                                    SegmentationConfig)
        from npp_tpu.models.completion import COMPLETION_TASK
        from npp_tpu.models.remapping import REMAPPING_TASK
        from npp_tpu.models.segmentation import SEGMENTATION_TASK
        from npp_tpu.models.loaders import (load_completion, load_remapping,
                                            load_segmentation)
        from npp_tpu.parallel.runner import fit_images
        spec = {'completion': (CompletionConfig, load_completion,
                               COMPLETION_TASK),
                'segmentation': (SegmentationConfig, load_segmentation,
                                 SEGMENTATION_TASK),
                'remapping': (RemappingConfig, load_remapping,
                              REMAPPING_TASK)}
        for task in a.tasks.split(','):
            det = os.path.join(a.detected, task, 'detected')
            if not os.path.isdir(det):
                continue
            Cfg, loader, tspec = spec[task]
            cfg = replace(Cfg(), aot_cache_dir=a.aot_cache,
                          aux_gate_ratio=1.25 if task == 'completion'
                          else 0.0)
            datas = [loader(replace(cfg, datadir=os.path.join(det, n)))
                     for n in sorted(os.listdir(det))
                     if os.path.exists(os.path.join(det, n, 'config.odgt'))]
            if not datas:
                continue
            cm = max(-(-max(d.img.shape[:2]) // 64) * 64 for d in datas)
            t0 = time.time()
            fit_images(cfg, tspec, datas, n_iters=8, canvas_multiple=cm,
                       block=8)
            print(f'[warm] fit block {task}: {time.time() - t0:.1f}s',
                  file=sys.stderr, flush=True)

    report['total_s'] = round(time.time() - t_start, 1)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
