#!/usr/bin/env python
"""A/B: cfg.feature_dtype='bfloat16' (loss-tower activations in bf16) vs
the reference-faithful f32 towers, at bench.py's flagship configuration,
in ONE session (pool-grant variance makes cross-session walls
incomparable).

The hypothesis (round-4 MFU roofline, BASELINE.md): after embed_table
removed the per-step trig, the dominant non-MXU phases are the loss
towers — LPIPS convs + normalize chains at 160² patches and the CX
VGG + softmax — whose f32[6,160,160,C] activation temps are HBM-bound.
bf16 activations halve that traffic (and let the tower convs hit the MXU
at its bf16 rate); params stay f32, so this is an activation-dtype knob
only. CPU closeness bound: tests/test_losses.py::
test_feature_dtype_bf16_towers_close_to_f32 (rtol 0.08).

Thin wrapper over scripts/ab_step_phases.py's shared harness.

Run on the TPU:  python scripts/ab_feature_dtype.py [n_blocks]
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
            run_arm('feat_bf16', {'feature_dtype': 'bfloat16'}, n_blocks)]
    recs = [r for r in recs if r]
    base = next(r for r in recs if r['arm'] == 'full')
    for r in recs:
        r['speedup_vs_full'] = round(r['iters_per_sec'] /
                                     base['iters_per_sec'], 3)
    print(json.dumps({'summary': recs}), flush=True)


if __name__ == '__main__':
    main()
