"""Shared per-image fit pipeline used by the three tasks.

Replaces the copy-pasted skeletons of the reference trainers
(NPP_completion/train.py / NPP_segmentation/train.py / NPP_remapping/train.py)
with one driver: build components -> staged fit (patch-size decay re-specialises
the compiled step, reference: NPP_completion/train.py:137-141) -> eval hooks.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.contextual import ContextualLoss
from ..losses.lpips import LPIPS
from ..losses.style import StyleLoss
from ..nn.embedder import make_task_embedder
from ..nn.mlp import NPPNet, NPPNetTop1
from .loaders import TaskData
from .sampler import build_sampler_consts
from .trainer import (FitConsts, FitState, TaskSpec, init_fit_state,
                      make_fit_step, make_render)


@dataclasses.dataclass
class Components:
    embedder: Any
    model: Any
    percep: Optional[LPIPS]
    contextual: Optional[ContextualLoss]
    style: Optional[StyleLoss]


def build_components(cfg, data: TaskData, task: TaskSpec) -> Components:
    h, w = data.img.shape[:2]
    embedder = make_task_embedder(cfg, np.asarray(data.selected_angles),
                                  np.asarray(data.selected_periods), (h, w),
                                  jax.random.PRNGKey(cfg.seed))
    k = min(cfg.p_topk, len(data.selected_angles))
    if k > 1:
        model = NPPNet(input_ch_periodic=embedder.top1_dim,
                       input_ch_periodic_aux=embedder.out_dim - embedder.top1_dim,
                       depth=cfg.netdepth, width=cfg.netwidth,
                       activation=cfg.activation)
    else:
        model = NPPNetTop1(input_ch_periodic=embedder.top1_dim,
                           depth=cfg.netdepth, width=cfg.netwidth,
                           activation=cfg.activation)
    # cfg.feature_dtype: activation dtype of the pretrained conv towers
    # inside the fit losses (params stay f32 — flax casts per-op). bf16
    # halves the HBM traffic of the loss towers' f32[N,160,160,C] temps,
    # the dominant non-MXU phase in the round-4 MFU roofline; default
    # float32 is the reference-faithful path.
    #
    # The CONTEXTUAL tower is exempt and always runs f32: CX is a
    # softmax-over-match-distances objective, and bf16-quantized features
    # reshuffle the matches — measured round 5 at flagship patch scales,
    # the bf16 CX gradient's cosine similarity to the f32 gradient is
    # 0.15 (norm first 5.6x high, 0.41x after keeping the similarity
    # chain f32) while the VALUE stays within 9%. A lever that redirects
    # the training signal is not a dtype optimization; the two TPU fit
    # A/Bs that showed +3.3/+5.2 dB "wins" were this effect
    # (results_round5.json `feat_bf16_quality`). LPIPS and style grads
    # track f32 within 1% (smooth normalize/Gram reductions, no match
    # competition), so bf16 stays available for them.
    fdt = jnp.bfloat16 if cfg.feature_dtype == 'bfloat16' else jnp.float32
    percep = LPIPS(net='vgg', dtype=fdt) if cfg.use_perceptual_loss else None
    contextual = ContextualLoss(use_vgg=True, dtype=jnp.float32) \
        if cfg.use_contextual_loss else None
    style = StyleLoss(use_adaptive=getattr(cfg, 'use_adaptive_style_loss', False),
                      dtype=fdt) \
        if task.use_style and getattr(cfg, 'use_style_loss', False) else None
    return Components(embedder, model, percep, contextual, style)


def _pad_coord_pool(pool: np.ndarray):
    from ..utils.pools import pad_pool_pow2
    padded, n = pad_pool_pow2(pool, fill='first')
    return jnp.asarray(padded), jnp.asarray(max(n, 1))


def make_fit_consts(cfg, task: TaskSpec, data: TaskData,
                    patch_size: int) -> FitConsts:
    pixel_img = data.masked_img if task.name != 'remapping' else data.img
    if task.pixel_mask_from_gt:
        pixel_mask = data.extra['clear_mask']
    else:
        pixel_mask = np.ones_like(data.mask)
    # sampler mask: known-region mask (mask * valid), task-appropriate
    sampler_mask = (data.mask * data.valid_mask)[..., 0] \
        if task.name != 'remapping' else data.mask[..., 0]
    sampler = build_sampler_consts(pixel_img, sampler_mask, data.i_train,
                                   data.i_val, data.selected_shifts, patch_size)
    pool, pool_n = _pad_coord_pool(data.i_train)
    return FitConsts(
        pixel_img=jnp.asarray(pixel_img, jnp.float32),
        pixel_mask=jnp.asarray(pixel_mask, jnp.float32),
        pool_train=pool, pool_train_n=pool_n, sampler=sampler)


@dataclasses.dataclass
class FitResult:
    state: FitState
    render: Callable
    components: Components
    history: List[Dict[str, float]]
    wall_time_s: float
    iters_per_sec: float


def fit_image(cfg, task: TaskSpec, data: TaskData,
              eval_hook: Optional[Callable[[int, FitState, Callable], None]] = None,
              log_every: Optional[int] = None,
              checkpoint_dir: Optional[str] = None,
              metrics_path: Optional[str] = None) -> FitResult:
    """The reference's per-task training loop as one driver
    (reference: NPP_completion/train.py:133-264).

    checkpoint_dir: save FitState every i_testset iters and resume from the
    latest checkpoint if one exists (capability absent in the reference,
    SURVEY.md §5). metrics_path: JSONL metric stream.
    """
    from ..utils.debug import MetricLogger
    comps = build_components(cfg, data, task)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, k_init = jax.random.split(rng)
    state, tx = init_fit_state(cfg, task, comps.model, comps.embedder, k_init,
                               comps.percep, comps.style)
    render = make_render(cfg, comps.model, comps.embedder)
    logger = MetricLogger(metrics_path)

    start_iter = 1
    if checkpoint_dir:
        from ..utils.checkpoint import latest_checkpoint, restore_fit_state
        latest = latest_checkpoint(checkpoint_dir)
        if latest:
            state = restore_fit_state(latest, state)
            start_iter = int(state.step) + 1
            print(f'[fit] resumed from {latest} at iter {start_iter}')

    import math

    patch_size = data.patch_size
    patch_num = cfg.patch_num
    # fast-forward the patch-size schedule when resuming
    n_decays = 0 if start_iter <= cfg.patch_size_decay else \
        (start_iter - 1) // cfg.patch_size_decay
    for _ in range(n_decays):
        if patch_size > 31:
            patch_size //= 2
            patch_num *= 2

    # scan-block size: the gcd of the event cadences, so eval/log boundaries
    # fall between blocks. Blocks amortise per-call dispatch latency (a real
    # cost behind a relay tunnel); patch-size decays apply at block starts
    # (at most `block-1` iterations later than the reference's schedule —
    # immaterial, and the reference's own final-step decay is skipped anyway).
    block = math.gcd(cfg.i_testset, log_every or cfg.i_testset)
    use_blocks = block >= 8

    stage_cache: Dict = {}

    def build_step(ps, pn, blk):
        """One jitted program per (patch_size, patch_num, block) stage,
        cached so the prewarm thread and the main loop share the SAME jit
        callable (a rebuilt wrapper would re-trace and recompile)."""
        key = (ps, pn, blk)
        if key in stage_cache:
            return stage_cache[key]
        consts = make_fit_consts(cfg, task, data, ps)
        if blk:
            from .trainer import make_fit_block
            fn = make_fit_block(cfg, task, comps.model, comps.embedder,
                                consts, comps.percep, comps.contextual,
                                comps.style, tx, pn, ps, blk)
        else:
            fn = make_fit_step(cfg, task, comps.model, comps.embedder,
                               consts, comps.percep, comps.contextual,
                               comps.style, tx, pn, ps)
        from ..utils import aot
        cache_dir = aot.cache_dir_from(cfg)
        if cache_dir:
            # consts + embedder are CLOSED OVER (baked into the executable
            # as constants), so their data is part of the cache key: a
            # fresh session re-fitting the SAME image skips the relay
            # compile; a different image misses (the batched runner's
            # data-as-arguments programs share across images instead)
            extra = aot.digest_arrays(
                {'consts': consts, 'emb': comps.embedder._asdict(),
                 'percep': comps.percep.params if comps.percep else 0,
                 'cx': comps.contextual.params if comps.contextual else 0,
                 'style': comps.style.params if comps.style else 0})
            fn = aot.aot_cached(fn, f'fit-{task.name}-{ps}x{pn}-b{blk}',
                                cache_dir, cfg=cfg, extra=extra)
        stage_cache[key] = fn
        return fn

    step_fn = build_step(patch_size, patch_num, block if use_blocks else 0)
    single_step_fn = None

    # ---- compile-ahead (VERDICT round-2 next #6): the NEXT patch-decay
    # stage's program compiles 2-7 min through the remote-compile relay and
    # the persistent cache is unusable there (CLAUDE.md), so overlap that
    # compile with the CURRENT stage's optimisation instead: a daemon
    # thread calls the next stage's jitted block once with the live state
    # (pure function; the throwaway 1-block execution costs seconds) while
    # the main stream keeps fitting. If the boundary arrives first, the
    # main thread simply blocks on the same jit-internal compile lock it
    # would have hit anyway.
    prewarmed = set()

    def prewarm_next_stage(i0: int, state_now):
        if not (use_blocks and getattr(cfg, 'compile_ahead', True)):
            return
        due_at = (n_decays + 1) * cfg.patch_size_decay
        nxt_ps, nxt_pn = patch_size // 2, patch_num * 2
        if not (patch_size > 31 and due_at < cfg.N_iters - 10 and
                i0 >= due_at - cfg.patch_size_decay and
                (nxt_ps, nxt_pn) not in prewarmed):
            return
        prewarmed.add((nxt_ps, nxt_pn))
        fn = build_step(nxt_ps, nxt_pn, block)
        import threading

        def warm():
            try:
                fn(state_now, jax.random.PRNGKey(0))
            except Exception as e:   # never take down the fit
                print(f'[fit] compile-ahead failed: {e!r}')

        threading.Thread(target=warm, daemon=True).start()

    history: List[Dict[str, float]] = []
    t0 = time.time()

    def maybe_decay(i0: int):
        nonlocal patch_size, patch_num, step_fn, single_step_fn, n_decays
        due = (i0 - 1) // cfg.patch_size_decay if i0 > 1 else 0
        if due > n_decays and patch_size > 31 and cfg.N_iters - i0 > 10:
            while n_decays < due and patch_size > 31:
                n_decays += 1
                patch_size //= 2
                patch_num *= 2
            step_fn = build_step(patch_size, patch_num,
                                 block if use_blocks else 0)
            single_step_fn = None

    def post_step(i, state, metrics):
        if log_every and i % log_every == 0:
            m = {k_: float(v) for k_, v in metrics.items()}
            m['iter'] = i
            history.append(m)
            logger.log(kind='train', task=task.name, **m)
            print(f"[{task.name}] iter {i} " +
                  " ".join(f"{k_}={v:.4g}" for k_, v in m.items()
                           if k_ != 'iter'))
        if i % cfg.i_testset == 0 and i > 0:
            if eval_hook is not None:
                eval_hook(i, state, render)
            if checkpoint_dir:
                from ..utils.checkpoint import save_fit_state
                save_fit_state(f'{checkpoint_dir}/step_{i}', state)

    i = start_iter
    while i < cfg.N_iters:
        maybe_decay(i)
        remaining = cfg.N_iters - i
        if use_blocks and remaining >= block and (i - 1) % block == 0:
            rng, k = jax.random.split(rng)
            state, metrics = step_fn(state, k)
            prewarm_next_stage(i, state)
            i += block
            post_step(i - 1, state, metrics)
        else:
            if single_step_fn is None:
                single_step_fn = build_step(patch_size, patch_num, 0)
            rng, k = jax.random.split(rng)
            state, metrics = single_step_fn(state, k)
            post_step(i, state, metrics)
            i += 1
    jax.block_until_ready(state.params)
    wall = time.time() - t0
    logger.log(kind='fit_done', task=task.name, wall_time_s=wall,
               iters=cfg.N_iters - start_iter)
    logger.close()
    return FitResult(state=state, render=render, components=comps,
                     history=history, wall_time_s=wall,
                     iters_per_sec=(cfg.N_iters - start_iter) / max(wall, 1e-9))
