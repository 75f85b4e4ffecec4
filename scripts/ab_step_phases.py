#!/usr/bin/env python
"""Attribute the flagship step's wall-clock to its phases by TOGGLING them,
in ONE session (pool-grant variance makes cross-session walls incomparable).

BASELINE.md's roofline says ~88% of the 74.6 ms flagship step is non-MXU
time; this measures where it actually goes by differencing configurations:

  arm 'full'        — production step (pixel robust + CX; LPIPS prob-gated)
  arm 'no_cx'       — contextual loss off (isolates CX VGG + similarity)
  arm 'pixel_plain' — adaptive robust loss -> plain l2 (isolates the
                      Barron spline + latent-alpha machinery)
  arm 'table'       — embed_table='float32' (isolates on-the-fly trig)
  arm 'table_bf16'  — embed_table='bfloat16'

Differences between arms attribute time to phases; residual = sampler +
Adam + dispatch. One JSON line per arm; summary at the end.

Run on the TPU:  python scripts/ab_step_phases.py [--blocks 6]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: flagship shapes + synthetic data


ARMS = [
    # embed_table='float32' is the production default since the round-4 A/B
    # (BASELINE.md), so 'full' already includes the table; 'no_table'
    # isolates the on-the-fly trig it replaced.
    ('full', {}),
    ('no_cx', {'use_contextual_loss': False}),
    ('no_perc', {'use_perceptual_loss': False}),
    ('pixel_plain', {'loss_type': 'l2'}),
    ('no_table', {'embed_table': ''}),
    ('table_bf16', {'embed_table': 'bfloat16'}),
    # bf16 activations inside the loss towers (LPIPS/CX/style convs +
    # normalize chains) — halves the HBM traffic of the dominant non-MXU
    # phase named by the round-4 MFU roofline (BASELINE.md). Params stay
    # f32; values drift within the CPU closeness test's bound
    # (tests/test_losses.py::test_feature_dtype_bf16_towers_close_to_f32).
    ('feat_bf16', {'feature_dtype': 'bfloat16'}),
    # transposed (channels, rows) adaptive-robust reductions + fused LPIPS
    # lin channel-sum — the round-4 roofline's named layout-padding lever
    # (config.robust_layout; value-identical, CPU parity-tested in
    # tests/test_losses.py)
    # NOTE since the round-5 adoption, default robust_layout='auto'
    # resolves to 'cn' on this single-image path — 'full' already includes
    # the transposed layout; 'robust_nc' isolates the pre-adoption layout.
    ('robust_cn', {'robust_layout': 'cn'}),
    ('robust_nc', {'robust_layout': 'nc'}),
    # composition of the two measured round-5 winners (robust_cn +9.9%,
    # feat_bf16 +14.7% same-session at flagship): are the savings additive?
    ('cn_bf16', {'robust_layout': 'cn', 'feature_dtype': 'bfloat16'}),
]


def run_arm(name: str, overrides: dict, n_blocks: int):
    import jax
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import build_components, make_fit_consts
    from npp_tpu.models.trainer import init_fit_state, make_fit_block

    try:
        cfg = replace(CompletionConfig(), **overrides)
    except TypeError as e:   # unknown knob on this config: record and skip
        print(json.dumps({'arm': name, 'skipped': str(e)}), flush=True)
        return None
    data = bench._synthetic_data(cfg)
    comps = build_components(cfg, data, COMPLETION_TASK)
    state, tx = init_fit_state(cfg, COMPLETION_TASK, comps.model,
                               comps.embedder, jax.random.PRNGKey(0),
                               comps.percep, comps.style)
    consts = make_fit_consts(cfg, COMPLETION_TASK, data, bench.PATCH_SIZE)
    run_block = make_fit_block(cfg, COMPLETION_TASK, comps.model,
                               comps.embedder, consts, comps.percep,
                               comps.contextual, comps.style, tx,
                               bench.PATCH_NUM, bench.PATCH_SIZE, bench.BLOCK)
    rng = jax.random.PRNGKey(1)
    print(f'[phases] arm {name}: compiling + warmup block', file=sys.stderr,
          flush=True)
    t0 = time.time()
    state, _ = run_block(state, rng)
    jax.block_until_ready(state.params)
    compile_s = time.time() - t0
    print(f'[phases] arm {name}: warmup {compile_s:.1f}s; measuring '
          f'{n_blocks} blocks', file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(n_blocks):
        rng, k = jax.random.split(rng)
        state, _ = run_block(state, k)
    jax.block_until_ready(state.params)
    wall = time.time() - t0
    iters = bench.BLOCK * n_blocks
    rec = {'arm': name, 'iters_per_sec': round(iters / wall, 3),
           'step_ms': round(1000.0 * wall / iters, 2),
           'compile_plus_first_s': round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--blocks', type=int, default=6)
    ap.add_argument('--arms', default=None,
                    help='comma-separated subset of arm names')
    args = ap.parse_args()

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()

    want = set(args.arms.split(',')) if args.arms else None
    recs = []
    for name, overrides in ARMS:
        if want is not None and name not in want:
            continue
        r = run_arm(name, overrides, args.blocks)
        if r:
            recs.append(r)
    base = next((r for r in recs if r['arm'] == 'full'), None)
    if base:
        for r in recs:
            r['delta_ms_vs_full'] = round(r['step_ms'] - base['step_ms'], 2)
    print(json.dumps({'summary': recs}), flush=True)


if __name__ == '__main__':
    main()
