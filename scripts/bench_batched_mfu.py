"""Aggregate-MFU scaling of the images-axis batched runner on ONE chip.

BASELINE.md's roofline reading: the single-image flagship step is
VPU/HBM-phase dominated (11.2% MFU), and batching fills one image's
elementwise phases with another's matmuls (25.4% at B=3). This script
measures that curve: fit B identical copies of bench.py's synthetic
flagship image via parallel.runner.fit_images for B in --batch-sizes and
report aggregate image-iters/s, achieved TFLOPS and MFU per B.

Method: per B, one short warmup call compiles the batched programs and
populates the AOT executable cache (--aot-dir), then one long timed call
measures. fit_images rebuilds its closures per call, so the timed call's
program acquisition goes through the AOT cache (seconds, amortised by
--iters) rather than the in-process jit cache. Every measurement prints
to stderr immediately (relay rule).

Usage: python scripts/bench_batched_mfu.py [--batch-sizes 1,3,5,6] [--iters 600]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch-sizes', default='1,3,5,6')
    ap.add_argument('--iters', type=int, default=600)
    ap.add_argument('--warmup-iters', type=int, default=50)
    ap.add_argument('--aot-dir', default='/tmp/npp_bench_mfu_aot')
    ap.add_argument('--embed-table', default=None,
                    choices=['', 'float32', 'bfloat16'],
                    help='override cfg.embed_table for the curve (default: '
                         'config default)')
    ap.add_argument('--table-max-mb', type=int, default=None,
                    help='override cfg.embed_table_max_mb (the HBM guard '
                         'disables B>1 tables at the default budget)')
    ap.add_argument('--control', action='store_true',
                    help='first measure the single-image blocked fit path '
                         'in-process (the session pool-slice anchor)')
    ap.add_argument('--robust-layout', default=None, choices=['nc', 'cn'],
                    help='override cfg.robust_layout (the round-4 roofline '
                         'layout-padding lever; A/B arm for VERDICT r4 #4)')
    ap.add_argument('--ab-robust-layout', action='store_true',
                    help='measure BOTH robust_layout arms (nc, cn) per B in '
                         'THIS process — paired-arm, same pool slice')
    ap.add_argument('--feature-dtype', default=None,
                    choices=['float32', 'bfloat16'],
                    help='override cfg.feature_dtype (loss-tower activation '
                         'dtype)')
    a = ap.parse_args()

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()   # the shared pool can stall backend init for minutes

    import jax
    import bench
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images

    cfg = replace(CompletionConfig(), aot_cache_dir=a.aot_dir)
    if a.embed_table is not None:
        cfg = replace(cfg, embed_table=a.embed_table)
    if a.table_max_mb is not None:
        cfg = replace(cfg, embed_table_max_mb=a.table_max_mb)
    if a.robust_layout is not None:
        cfg = replace(cfg, robust_layout=a.robust_layout)
    if a.feature_dtype is not None:
        cfg = replace(cfg, feature_dtype=a.feature_dtype)
    data = bench._synthetic_data(cfg)
    dev = jax.devices()[0]
    peak = bench.peak_bf16_flops(dev.device_kind)

    # analytic FLOPs/step for one image (identical config to bench.py)
    from npp_tpu.models.pipeline import build_components
    comps = build_components(cfg, data, COMPLETION_TASK)
    from npp_tpu.models.trainer import init_fit_state
    state, _ = init_fit_state(cfg, COMPLETION_TASK, comps.model,
                              comps.embedder, jax.random.PRNGKey(0),
                              comps.percep, comps.style)
    # raw FLOPs (bench.analytic_flops_per_step returns FLOPs, not GFLOPs)
    flops_step = bench.analytic_flops_per_step(cfg, state.params['mlp'])['total']
    print(f'[mfu] device={dev.device_kind} peak={peak / 1e12:.0f} TFLOPS '
          f'flops/img-step={flops_step / 1e9:.1f} GFLOP',
          file=sys.stderr, flush=True)

    # in-process control: the single-image production block path at the
    # same config — anchors the curve against the session's delivered
    # pool time-slice (absolute rates vary 2-3x across processes;
    # BASELINE.md variance accounting)
    control = None
    if a.control:
        from npp_tpu.models.trainer import init_fit_state as _ifs, \
            make_fit_block
        from npp_tpu.models.pipeline import make_fit_consts
        st, tx = _ifs(cfg, COMPLETION_TASK, comps.model, comps.embedder,
                      jax.random.PRNGKey(0), comps.percep, comps.style)
        blk = make_fit_block(cfg, COMPLETION_TASK, comps.model,
                             comps.embedder,
                             make_fit_consts(cfg, COMPLETION_TASK, data,
                                             bench.PATCH_SIZE),
                             comps.percep, comps.contextual, comps.style,
                             tx, bench.PATCH_NUM, bench.PATCH_SIZE, 50)
        rng = jax.random.PRNGKey(1)
        st, _ = blk(st, rng)
        jax.block_until_ready(st.params)
        t0 = time.time()
        for _ in range(4):
            rng, k = jax.random.split(rng)
            st, _ = blk(st, k)
        jax.block_until_ready(st.params)
        control = round(200 / (time.time() - t0), 2)
        print(f'[mfu] control single-image blocked path: {control} it/s',
              file=sys.stderr, flush=True)

    mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    layouts = ['nc', 'cn'] if a.ab_robust_layout else [None]
    rows = []
    for b in [int(x) for x in a.batch_sizes.split(',')]:
        datas = [data] * b
        for layout in layouts:
            run_cfg = replace(cfg, robust_layout=layout) if layout else cfg
            try:
                t0 = time.time()
                fit_images(run_cfg, COMPLETION_TASK, datas,
                           n_iters=a.warmup_iters, mesh=mesh,
                           canvas_multiple=64, block=a.warmup_iters)
                warm_s = time.time() - t0
                print(f'[mfu] B={b} layout={layout} warmup(compile/load) '
                      f'{warm_s:.1f}s', file=sys.stderr, flush=True)
                t0 = time.time()
                fit_images(run_cfg, COMPLETION_TASK, datas, n_iters=a.iters,
                           mesh=mesh, canvas_multiple=64, block=50)
                wall = time.time() - t0
            except Exception as e:
                print(f'[mfu] B={b} FAILED: {e!r}', file=sys.stderr,
                      flush=True)
                rows.append({'B': b, 'error': repr(e)})
                continue
            agg_ips = b * a.iters / wall
            achieved = agg_ips * flops_step
            row = {'B': b, 'wall_s': round(wall, 1),
                   'aggregate_image_iters_per_sec': round(agg_ips, 2),
                   'achieved_tflops': round(achieved / 1e12, 2),
                   'mfu': round(achieved / peak, 4)}
            if layout:
                row['robust_layout'] = layout
            rows.append(row)
            print(f'[mfu] {row}', file=sys.stderr, flush=True)

    print(json.dumps({'iters': a.iters, 'device': dev.device_kind,
                      'control_single_image_iters_per_sec': control,
                      'flops_per_image_step_gflop': round(flops_step / 1e9, 1),
                      'rows': rows}))


if __name__ == '__main__':
    main()
