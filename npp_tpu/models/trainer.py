"""Per-image fit engine: one jitted train step, all losses fused.

TPU-first redesign of the reference's per-task training loops
(reference: NPP_completion/train.py:133-264, NPP_segmentation/train.py:148-286,
NPP_remapping/train.py:175-296), which share one skeleton and differ only in
pixel-loss source/weighting and the style-loss term. Here that skeleton is a
single loss builder parameterised by a TaskSpec:

 - embeddings are computed on the fly from (N, 2) coords inside the step
   (no (H, W, 1386) precompute; reference materialises it at
   NPP_completion/train.py:89-105);
 - the patch sampler is a pure function of the rng key (masked validity
   instead of skip-iteration, see models/sampler.py);
 - branch-dependent loss terms (perceptual only on 'same', comp-paste only on
   'val') are lax.cond / where on the traced source index — one compiled
   program for all branches;
 - adaptive-loss latents live in the params pytree and ride the same Adam
   (reference collects them into grad_vars by hand, helpers.py:144-158);
 - LR schedule lr0 * 0.1^(step / (lrate_decay*100)) via optax
   (reference: NPP_completion/train.py:256-264).

`build_loss_fn` takes the embedder and per-image constants as ARGUMENTS (not
closures) so the same loss program serves both the single-image jitted step
and the multi-image vmap/shard_map path in npp_tpu.parallel.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.contextual import ContextualLoss
from ..losses.lpips import LPIPS
from ..losses.pixel import img2mse
from ..losses.robust import adaptive_init
from ..losses.style import StyleLoss
from .sampler import (SOURCE_SAME, SOURCE_VAL, PatchBatch, SamplerConsts,
                      sample_patches)


class FitState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TaskSpec:
    """Static per-task differences."""

    name: str
    use_style: bool = False
    pixel_mask_from_gt: bool = False  # remapping: weight by clear mask values


class FitConsts(NamedTuple):
    """Device-resident per-image constants for the fit (a pytree, so it can
    carry a leading batch axis under vmap)."""

    pixel_img: jnp.ndarray      # (H, W, 3) gt source for the pixel loss
    pixel_mask: jnp.ndarray     # (H, W, 1) weights for the pixel loss
    pool_train: jnp.ndarray     # (Nt, 2) int32 padded train-coord pool
    pool_train_n: jnp.ndarray   # () int32
    sampler: SamplerConsts


def make_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return lambda step: cfg.lrate * (0.1 ** (step / (cfg.lrate_decay * 100.0)))


def apply_model(model, params, embedder, coords, warp=None):
    """Uniform forward: embed on the fly, apply the MLP (XLA fuses
    coords -> warp -> sin/cos -> first matmul; a hand-written Pallas fusion
    was removed after losing the hardware A/B — see config.py note).

    `params` is the full fit-params dict ({'mlp': ..., 'warp'?: ...}).
    With a warp module, coordinates pass through the learnable smooth
    deformation first (nn/warp.py; models perspective drift of the
    lattice); a warp module without matching params is an error — silently
    skipping it would render a different function than was trained
    (round-2 advisor finding)."""
    mlp_params = params['mlp'] if isinstance(params, dict) and 'mlp' in params \
        else params
    if warp is not None:
        if not (isinstance(params, dict) and 'warp' in params):
            raise ValueError("warp module present but params carry no "
                             "'warp' tree — pass the full fit-params dict")
        from ..nn.warp import warp_coords
        coords = warp_coords(warp, params['warp'], coords, embedder.res)
    return model.apply({'params': mlp_params}, embedder.embed(coords))


def init_fit_state(cfg, task: TaskSpec, model, embedder, rng,
                   percep: Optional[LPIPS], style: Optional[StyleLoss]
                   ) -> Tuple[FitState, optax.GradientTransformation]:
    mlp_params = model.init(rng, jnp.zeros((1, embedder.out_dim)))['params']
    params: Dict[str, Any] = {
        'mlp': mlp_params,
        'adaptive_pix': adaptive_init(3),
    }
    from ..nn.warp import make_warp
    warp = make_warp(cfg)
    if warp is not None:
        params['warp'] = warp.init(jax.random.fold_in(rng, 7),
                                   jnp.zeros((1, 2)))['params']
    if percep is not None and cfg.use_adaptive_perceptual_loss:
        params['adaptive_percep'] = percep.init_adaptive()
    if style is not None and getattr(cfg, 'use_adaptive_style_loss', False):
        params['adaptive_style'] = style.init_adaptive()
    tx = optax.adam(make_schedule(cfg), b1=0.9, b2=0.999)
    return FitState(params, tx.init(params), jnp.int32(0)), tx


def build_loss_fn(cfg, task: TaskSpec, model,
                  percep: Optional[LPIPS], contextual: Optional[ContextualLoss],
                  style: Optional[StyleLoss], patch_num: int, patch_size: int):
    """Returns loss_fn(params, embedder, consts, rng) -> (loss, metrics)."""
    topk = cfg.num_real_patch_per_sample
    n_rand = cfg.N_rand
    use_cx = cfg.use_contextual_loss and contextual is not None
    use_perc = cfg.use_perceptual_loss and percep is not None
    use_style = task.use_style and getattr(cfg, 'use_style_loss', False) \
        and style is not None

    from ..nn.warp import make_warp
    warp = make_warp(cfg)

    def mlp_rgb(params, embedder, coords):
        from ..nn.mlp import render_activation
        raw = apply_model(model, params, embedder,
                          coords.astype(jnp.float32), warp=warp)
        return render_activation(raw, cfg.normalize_type)

    def loss_fn(params, embedder, consts: FitConsts, rng):
        if cfg.matmul_precision != 'default':
            ctx = jax.default_matmul_precision(cfg.matmul_precision)
        else:
            import contextlib
            ctx = contextlib.nullcontext()
        with ctx:
            return _loss_fn_inner(params, embedder, consts, rng)

    def _loss_fn_inner(params, embedder, consts: FitConsts, rng):
        k_pix, k_patch = jax.random.split(rng)
        batch: PatchBatch = sample_patches(
            k_patch, consts.sampler, patch_num, patch_size, topk,
            cfg.invalid_ratio, cfg.no_reg_sampling)

        # ---- pixel batch (reference: NPP_completion/train.py:172-178)
        idx = jax.random.randint(k_pix, (n_rand,), 0, consts.pool_train_n)
        pix_coords = consts.pool_train[idx]
        gt_rgb = consts.pixel_img[pix_coords[:, 0], pix_coords[:, 1]]
        gt_mask = consts.pixel_mask[pix_coords[:, 0], pix_coords[:, 1]]

        # ---- one fused MLP forward over pixels + patch pixels
        patch_coords = batch.fake_coords.reshape(-1, 2)
        all_coords = jnp.concatenate([pix_coords, patch_coords], 0)
        pred = mlp_rgb(params, embedder, all_coords)
        pred_pix = pred[:n_rand]
        pred_patch = pred[n_rand:].reshape(patch_num, patch_size, patch_size, 3)

        metrics = {}
        loss = jnp.float32(0.0)
        if not cfg.no_pix_loss:
            pix_loss = img2mse(pred_pix, gt_rgb, cfg.loss_type,
                               params['adaptive_pix'], gt_mask,
                               scale_lo=getattr(cfg, 'adaptive_scale_lo',
                                                1e-5),
                               layout=getattr(cfg, 'robust_layout', 'nc'))
            loss = loss + pix_loss
            metrics['pixel'] = pix_loss

        # ---- assemble NHWC patch tensors, (P*K, S, S, C)
        pk = patch_num * topk
        pred_t = jnp.broadcast_to(pred_patch[:, None],
                                  (patch_num, topk) + pred_patch.shape[1:])
        pred_t = pred_t.reshape(pk, patch_size, patch_size, 3)
        real_rgb = batch.real_rgb.reshape(pk, patch_size, patch_size, 3)
        real_mask = batch.real_mask.reshape(pk, patch_size, patch_size, 1)
        fake_rgb = jnp.broadcast_to(batch.fake_rgb[:, None],
                                    (patch_num, topk) + batch.fake_rgb.shape[1:]
                                    ).reshape(pk, patch_size, patch_size, 3)
        fake_mask = jnp.broadcast_to(batch.fake_mask[:, None],
                                     (patch_num, topk) + batch.fake_mask.shape[1:]
                                     ).reshape(pk, patch_size, patch_size, 1)
        valid = batch.valid.reshape(pk)
        weight = batch.weight.reshape(pk) if cfg.use_patch_weight else None

        # comp-paste for 'val' batches (reference: train.py:228-236)
        is_val = batch.source == SOURCE_VAL
        if cfg.use_comp:
            comp = fake_rgb * fake_mask + pred_t * (1.0 - fake_mask)
            cx_pred = jnp.where(is_val, comp, pred_t)
        else:
            cx_pred = pred_t

        if use_cx:
            cx = contextual(cx_pred * real_mask, real_rgb * real_mask,
                            weight=weight, valid=valid)
            loss = loss + cx * cfg.contextual_weight
            metrics['contextual'] = cx

        if use_perc:
            # only on 'same' batches (reference: train.py:239-251)
            def perc_on(_):
                per = percep(pred_t * real_mask, fake_rgb * real_mask,
                             use_robust=cfg.use_adaptive_perceptual_loss,
                             adaptive=params.get('adaptive_percep'),
                             normalize=True,
                             robust_layout=getattr(cfg, 'robust_layout',
                                                   'nc'))
                per = per.reshape(pk)
                if weight is not None:
                    return jnp.sum(per * weight * valid)
                v = valid.astype(per.dtype)
                return jnp.sum(per * v) / jnp.maximum(jnp.sum(v), 1.0)

            perc = jax.lax.cond(batch.source == SOURCE_SAME, perc_on,
                                lambda _: jnp.float32(0.0), operand=None)
            loss = loss + perc * cfg.perceptual_weight
            metrics['perceptual'] = perc

        if use_style:
            # (reference: NPP_remapping/train.py:255-262)
            st_pred = jnp.where(is_val, fake_rgb * fake_mask +
                                pred_t * (1.0 - fake_mask), pred_t) \
                if cfg.use_comp else pred_t
            st = style(st_pred * real_mask, real_rgb * real_mask,
                       weight=weight, adaptive=params.get('adaptive_style'),
                       valid=valid)
            loss = loss + st * cfg.style_weight
            metrics['style'] = st

        metrics['source'] = batch.source
        return loss, metrics

    return loss_fn


def make_fit_step_core(cfg, task: TaskSpec, model, embedder,
                       consts: FitConsts, percep, contextual, style, tx,
                       patch_num: int, patch_size: int):
    """Un-jitted single step (state, rng) -> (state, metrics)."""
    from ..config import replace as _replace, resolve_robust_layout
    cfg = _replace(cfg, robust_layout=resolve_robust_layout(cfg, False))
    loss_fn = build_loss_fn(cfg, task, model, percep, contextual, style,
                            patch_num, patch_size)

    def step_fn(state: FitState, rng, emb=embedder):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, emb, consts, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics['loss'] = loss
        return FitState(params, opt_state, state.step + 1), metrics

    return step_fn


def make_fit_step(cfg, task: TaskSpec, model, embedder, consts: FitConsts,
                  percep: Optional[LPIPS], contextual: Optional[ContextualLoss],
                  style: Optional[StyleLoss], tx, patch_num: int,
                  patch_size: int):
    """Build the jitted single-image step for one (image, patch-size) stage."""
    return jax.jit(make_fit_step_core(cfg, task, model, embedder, consts,
                                      percep, contextual, style, tx,
                                      patch_num, patch_size))


def make_fit_block(cfg, task: TaskSpec, model, embedder, consts: FitConsts,
                   percep, contextual, style, tx, patch_num: int,
                   patch_size: int, block: int):
    """`block` optimisation steps per device call via lax.scan — amortises
    host->device dispatch (significant behind a relay tunnel: per-call
    latency would otherwise bound throughput, not compute). Returns
    run_block(state, rng) -> (state, last-step metrics)."""
    core = make_fit_step_core(cfg, task, model, embedder, consts, percep,
                              contextual, style, tx, patch_num, patch_size)

    # cfg.embed_table: precompute the canvas embedding ONCE per block and
    # gather rows inside the scan — one full-canvas trig pass (H*W rows)
    # replaces `block` per-step passes (block * (N_rand + patch px) rows).
    # Built inside the jit so the table is an intermediate, not a giant
    # executable constant; invalid with warp (non-integer coords) and
    # pointless for tiny blocks.
    from ..nn.embedder import TaskEmbedder, make_embedding_table
    from ..nn.warp import make_warp
    table_dtype = {'float32': jnp.float32, 'bfloat16': jnp.bfloat16}.get(
        getattr(cfg, 'embed_table', ''))
    use_table = (table_dtype is not None and block >= 8 and
                 make_warp(cfg) is None and
                 isinstance(embedder, TaskEmbedder))
    if use_table:
        # HBM guard: at large canvases the (H*W, D) table outgrows its win
        # (cfg.embed_table_max_mb) — fall back to the on-the-fly trig chain
        h_, w_ = embedder.res
        mb = int(h_) * int(w_) * embedder.out_dim * \
            jnp.dtype(table_dtype).itemsize / 1e6
        max_mb = int(getattr(cfg, 'embed_table_max_mb', 2048))
        use_table = mb <= max_mb
        if (not use_table and table_dtype == jnp.float32 and
                getattr(cfg, 'embed_table_degrade', False) and
                mb / 2 <= max_mb):
            # cfg-gated bf16 fallback (quantizes the embedding values;
            # see config.embed_table_degrade for the adoption bar)
            table_dtype = jnp.bfloat16
            use_table = True

    @jax.jit
    def run_block(state: FitState, rng):
        emb = make_embedding_table(embedder, table_dtype) if use_table \
            else embedder
        keys = jax.random.split(rng, block)

        def body(st, k):
            st, metrics = core(st, k, emb)
            return st, metrics

        state, metrics_seq = jax.lax.scan(body, state, keys)
        last = jax.tree.map(lambda x: x[-1], metrics_seq)
        return state, last

    return run_block


def make_render(cfg, model, embedder, chunk: int = 1 << 16):
    """Chunked full-frame renderer (replaces the reference's chunk=20000
    python eval loops, NPP_completion/train.py:277-308). Static shapes via
    padding to a multiple of `chunk`; lax.map keeps peak memory at one chunk's
    activations."""
    from ..nn.mlp import render_activation
    from ..nn.warp import make_warp

    import contextlib
    warp = make_warp(cfg)

    @partial(jax.jit, static_argnames=('h', 'w'))
    def render_image(params, h: int, w: int):
        coords = jnp.stack(jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                        indexing='ij'), -1).reshape(-1, 2)
        n = coords.shape[0]
        pad = (-n) % chunk
        coords = jnp.pad(coords, ((0, pad), (0, 0)))
        coords = coords.reshape(-1, chunk, 2).astype(jnp.float32)

        def body(c):
            raw = apply_model(model, params, embedder, c, warp=warp)
            return render_activation(raw, cfg.normalize_type)

        ctx = jax.default_matmul_precision(cfg.matmul_precision) \
            if cfg.matmul_precision != 'default' else contextlib.nullcontext()
        with ctx:
            out = jax.lax.map(body, coords)
        return out.reshape(-1, 3)[:n].reshape(h, w, 3)

    return render_image
