#!/usr/bin/env python
"""A/B: cfg.embed_table (per-block precomputed canvas embedding + gather)
vs the on-the-fly trig chain, at bench.py's flagship configuration, in ONE
session (pool-grant variance makes cross-session walls incomparable).

The hypothesis (BASELINE.md roofline): ~88% of the flagship step is
non-MXU time, a chunk of it the per-step embedding trig (~82M
transcendentals over 59,392 rows x 1386 ch). A block of 50 steps re-embeds
2.97M rows; the canvas table is 196,608 rows once — a ~15x reduction in
trig work, paid for with one (H*W, 1386) table in HBM (f32 1.09 GB /
bf16 545 MB) and a 165 MB/step gather.

Run on the TPU:  python scripts/ab_embed_table.py
Prints one JSON line per arm to stdout, progress to stderr.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench.py: shapes + synthetic data


def run_arm(embed_table: str, n_blocks: int = 6):
    import jax
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import build_components, make_fit_consts
    from npp_tpu.models.trainer import init_fit_state, make_fit_block

    cfg = replace(CompletionConfig(), embed_table=embed_table)
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
    print(f"[ab] arm embed_table='{embed_table}': compiling + warmup block",
          file=sys.stderr, flush=True)
    t0 = time.time()
    state, _ = run_block(state, rng)
    jax.block_until_ready(state.params)
    compile_s = time.time() - t0
    print(f"[ab] warmup {compile_s:.1f}s; measuring {n_blocks} blocks",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(n_blocks):
        rng, k = jax.random.split(rng)
        state, _ = run_block(state, k)
    jax.block_until_ready(state.params)
    ips = bench.BLOCK * n_blocks / (time.time() - t0)
    # end-state pixel loss for a quality sanity check across arms
    loss = None
    rec = {'embed_table': embed_table or 'off',
           'blocked_iters_per_sec': round(ips, 3),
           'compile_plus_first_s': round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()
    recs = [run_arm(''), run_arm('bfloat16'), run_arm('float32')]
    base = recs[0]['blocked_iters_per_sec']
    for r in recs[1:]:
        r['speedup_vs_off'] = round(r['blocked_iters_per_sec'] / base, 3)
    print(json.dumps({'summary': recs}), flush=True)


if __name__ == '__main__':
    main()
