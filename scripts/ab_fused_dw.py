#!/usr/bin/env python
"""Hardware A/B: fused embed+matmul Pallas kernel vs XLA, fwd and fwd+bwd,
with both dW strategies (sequential accumulator vs parallel partials +
XLA tree-sum). Flagship fit-step shapes (VERDICT round-1 weak #6 /
ROADMAP #2). Run on the TPU: `python scripts/ab_fused_dw.py`.

Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=30, warmup=5):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from npp_tpu.config import CompletionConfig
    from npp_tpu.nn.embedder import make_task_embedder
    from npp_tpu.ops.fused_embed import EmbedGeom, fused_embed_matmul

    cfg = CompletionConfig()
    h, w = 384, 512
    n = 8192 + 2 * 160 * 160  # flagship rows/step
    f_out = 512

    angles = np.asarray([[90.0, 180.0]] * 3)
    periods = np.asarray([[24.0, 36.0]] * 3)
    emb = make_task_embedder(cfg, angles, periods, (h, w),
                             jax.random.PRNGKey(0))
    geom = EmbedGeom.from_embedder(emb)
    d_emb = emb.out_dim

    rng = np.random.RandomState(0)
    coords = jnp.asarray(
        rng.uniform(0, min(h, w) - 1, (n, 2)).astype(np.float32))
    w_mat = jnp.asarray(rng.randn(d_emb, f_out).astype(np.float32) * 0.02)
    b_vec = jnp.asarray(rng.randn(f_out).astype(np.float32))
    g_cot = jnp.asarray(rng.randn(n, f_out).astype(np.float32))

    print(f'# N={n} d_emb={d_emb} F={f_out} device={jax.devices()[0]}',
          file=sys.stderr)

    # ---- XLA reference path (embedding materialised per batch)
    @jax.jit
    def xla_fwd(w_mat, b_vec):
        return emb.embed(coords) @ w_mat + b_vec

    @jax.jit
    def xla_fwdbwd(w_mat, b_vec):
        def loss(w_mat, b_vec):
            return jnp.vdot(emb.embed(coords) @ w_mat + b_vec, g_cot)
        return jax.grad(loss, argnums=(0, 1))(w_mat, b_vec)

    results = {'xla_fwd_ms': timeit(xla_fwd, w_mat, b_vec),
               'xla_fwdbwd_ms': timeit(xla_fwdbwd, w_mat, b_vec)}

    # ---- fused kernel variants
    for partials in (False, True):
        for tile_n in (512, 1024, 2048):
            def make(partials=partials, tile_n=tile_n):
                def fwd(w_mat, b_vec):
                    return fused_embed_matmul(
                        coords, geom, w_mat, b_vec, res=(h, w),
                        freq_scales=cfg.freq_scales,
                        freq_offsets=cfg.freq_offsets,
                        angle_offsets=cfg.angle_offsets,
                        tile_n=tile_n, bwd_partials=partials)

                def fwdbwd(w_mat, b_vec):
                    def loss(w_mat, b_vec):
                        return jnp.vdot(fwd(w_mat, b_vec), g_cot)
                    return jax.grad(loss, argnums=(0, 1))(w_mat, b_vec)
                return jax.jit(fwd), jax.jit(fwdbwd)

            fwd_j, fwdbwd_j = make()
            key = f'fused_{"partials" if partials else "seq"}_t{tile_n}'
            try:
                results[key + '_fwd_ms'] = timeit(fwd_j, w_mat, b_vec)
                results[key + '_fwdbwd_ms'] = timeit(fwdbwd_j, w_mat, b_vec)
            except Exception as e:  # VMEM OOM at large tiles etc.
                results[key + '_error'] = f'{type(e).__name__}'[:60]
                continue
            # numerical check vs XLA
            dw_f, db_f = fwdbwd_j(w_mat, b_vec)
            dw_x, db_x = xla_fwdbwd(w_mat, b_vec)
            results[key + '_dw_maxerr'] = float(
                jnp.max(jnp.abs(dw_f - dw_x)) / jnp.max(jnp.abs(dw_x)))

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == '__main__':
    main()
