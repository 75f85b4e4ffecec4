#!/usr/bin/env python
"""A/B: cfg.embed_table (per-block precomputed canvas embedding + gather)
vs the on-the-fly trig chain, at bench.py's flagship configuration, in ONE
session (pool-grant variance makes cross-session walls incomparable).

The hypothesis (BASELINE.md roofline): ~88% of the flagship step is
non-MXU time, a chunk of it the per-step embedding trig (~82M
transcendentals over 59,392 rows x 1386 ch). A block of 50 steps re-embeds
2.97M rows; the canvas table is 196,608 rows once — a ~15x reduction in
trig work, paid for with one (H*W, 1386) table in HBM (f32 1.09 GB /
bf16 545 MB) and a per-step gather.

Thin wrapper over scripts/ab_step_phases.py's shared measurement harness
(one arm definition lives there); this adds only the speedup summary.

Run on the TPU:  python scripts/ab_embed_table.py
Prints one JSON line per arm to stdout, progress to stderr.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ab_step_phases import run_arm


def main():
    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    recs = [run_arm('full', {}, n_blocks),
            run_arm('table_bf16', {'embed_table': 'bfloat16'}, n_blocks),
            run_arm('table', {'embed_table': 'float32'}, n_blocks)]
    recs = [r for r in recs if r]
    base = next(r for r in recs if r['arm'] == 'full')
    for r in recs:
        r['speedup_vs_full'] = round(r['iters_per_sec'] /
                                     base['iters_per_sec'], 3)
    print(json.dumps({'summary': recs}), flush=True)


if __name__ == '__main__':
    main()
