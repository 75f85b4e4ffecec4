"""Batched-vs-sequential fits, SAME session, SAME bucket — the clean
apples-to-apples for the images-axis SPMD runner (cross-session walls are
confounded by the TPU pool grant, which varies 2-3x; BASELINE.md variance
accounting).

Three bundled completion examples that share the patch-64 bucket are fit
(a) sequentially via fit_image (the suite's per-image path, same budgets)
and (b) concurrently via parallel.runner.fit_images, in one process on one
chip; reports both walls + per-image hole PSNR.

Usage: python scripts/bench_batched.py [--det-root /tmp/npp_suite_r3/completion/detected] [--iters N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NAMES = ['20150911134724-de45790e', '20150911134910-5dcfbc24',
         '20150914133158-7a2216fc-me']


def hole_psnr(pred, data):
    import jax.numpy as jnp
    from npp_tpu.losses.pixel import mse2psnr
    vc = data.i_val
    gv = jnp.asarray(data.img, jnp.float32)[vc[:, 0], vc[:, 1]]
    pv = pred[vc[:, 0], vc[:, 1]]
    return float(mse2psnr(jnp.mean((pv - gv) ** 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--det-root',
                    default='/tmp/npp_suite_r3/completion/detected')
    ap.add_argument('--iters', type=int, default=2000)
    args = ap.parse_args()

    from npp_tpu.utils.backend import wait_for_backend
    wait_for_backend()   # the shared pool can stall backend init for minutes

    import jax
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.loaders import load_completion
    from npp_tpu.models.pipeline import fit_image
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images, pad_to_canvas

    cfg = replace(CompletionConfig(), aux_gate_ratio=0.0,  # fixed top-K: one bucket
                  N_iters=args.iters + 1, i_testset=args.iters)
    datas = [load_completion(replace(cfg, datadir=f'{args.det_root}/{n}'))
             for n in NAMES]
    cm = max(-(-max(d.img.shape[:2]) // 64) * 64 for d in datas)
    print(f'[bench_batched] bucket canvas multiple: {cm}', file=sys.stderr)

    # ---- sequential (per-image programs, per-image canvases)
    t0 = time.time()
    seq_psnr = []
    for n, d in zip(NAMES, datas):
        # log_every=i_print matches the batched runner's gcd block rule,
        # so both paths consume the identical rng chain
        res = fit_image(replace(cfg, datadir=f'{args.det_root}/{n}'),
                        COMPLETION_TASK, d, log_every=cfg.i_print)
        h, w = d.img.shape[:2]
        pred = res.render(res.state.params, h, w)
        seq_psnr.append(hole_psnr(pred, d))
        print(f'[seq] {n}: hole PSNR {seq_psnr[-1]:.2f}', file=sys.stderr)
    seq_wall = time.time() - t0

    # ---- batched (one bucket, one chip)
    mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    t0 = time.time()
    states, ctxs = fit_images(cfg, COMPLETION_TASK, datas,
                              n_iters=args.iters, mesh=mesh,
                              canvas_multiple=cm, return_ctx=True)
    bat_wall = time.time() - t0
    from npp_tpu.parallel.batch import make_sharded_render
    pmesh = make_mesh(('pixels',), (1,), devices=jax.devices()[:1])
    srender = make_sharded_render(ctxs[0]['cfg'], ctxs[0]['model'], pmesh)
    bat_psnr = []
    for n, d, st, ctx in zip(NAMES, datas, states, ctxs):
        db = pad_to_canvas(d, *ctx['canvas'])
        pred = srender(st.params, ctx['embedder'], *ctx['canvas'])
        bat_psnr.append(hole_psnr(pred, db))
        print(f'[bat] {n}: hole PSNR {bat_psnr[-1]:.2f}', file=sys.stderr)

    import json
    print(json.dumps({
        'examples': NAMES, 'iters': args.iters,
        'sequential_wall_s': round(seq_wall, 1),
        'batched_wall_s': round(bat_wall, 1),
        'speedup': round(seq_wall / bat_wall, 2),
        'sequential_hole_psnr': [round(p, 2) for p in seq_psnr],
        'batched_hole_psnr': [round(p, 2) for p in bat_psnr],
        'max_abs_delta_db': round(max(abs(a - b) for a, b in
                                      zip(seq_psnr, bat_psnr)), 2),
    }))


if __name__ == '__main__':
    main()
