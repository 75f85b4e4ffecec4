"""User-facing batched multi-image fitting.

`fit_images` replaces the reference's sequential bash loop over examples
(reference: run_completion.sh:1-14) with bucketed SPMD fits: images are
grouped by (padded resolution, patch size), padded into a common canvas
(valid_mask=0 outside), and each bucket advances as ONE compiled program with
the batch axis sharded over the 'images' mesh axis — a v5e-8 fits 8+ images
concurrently while amortising compilation across the whole bucket.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loaders import TaskData
from ..models.pipeline import build_components, make_fit_consts
from ..models.trainer import FitState, TaskSpec
from ..nn.embedder import make_task_embedder
from .batch import (init_batched_state, make_batched_fit_block,
                    make_batched_fit_step, stack_consts, stack_embedders)
from .mesh import make_mesh, shard_leading_axis


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pad_to_canvas(data: TaskData, h: int, w: int) -> TaskData:
    """Zero-pad an example into an (h, w) canvas; padded area is invalid."""
    oh, ow = data.img.shape[:2]
    if (oh, ow) == (h, w):
        return data

    def pad_img(x):
        return np.pad(x, ((0, h - oh), (0, w - ow), (0, 0)))

    extra = {k: (pad_img(v) if isinstance(v, np.ndarray) and v.ndim == 3
                 and v.shape[:2] == (oh, ow) else v)
             for k, v in data.extra.items()}
    # keep the loader's original dims if present; otherwise the pre-pad
    # dims ARE the original (outputs crop back with data.orig_shape)
    extra.setdefault('orig_shape', (oh, ow))
    return dataclasses.replace(
        data, img=pad_img(data.img), masked_img=pad_img(data.masked_img),
        mask=pad_img(data.mask), valid_mask=pad_img(data.valid_mask),
        extra=extra)


def _pad_pools_to_common(consts_list):
    """FitConsts/SamplerConsts pools may pad to different power-of-two
    lengths per image; re-pad every array leaf to the bucket max so stacking
    works. Counts (pool_*_n) already bound the valid region."""
    def pad_leaf(*leaves):
        shapes = [l.shape for l in leaves]
        target = tuple(max(s[d] for s in shapes) for d in range(len(shapes[0])))
        out = []
        for l in leaves:
            pad = [(0, t - s) for s, t in zip(l.shape, target)]
            if any(p[1] for p in pad):
                mode = 'edge' if l.dtype in (jnp.int32, jnp.int64) else 'constant'
                l = jnp.asarray(np.pad(np.asarray(l), pad, mode=mode))
            out.append(l)
        return out

    leaves_list = [jax.tree.flatten(c) for c in consts_list]
    treedef = leaves_list[0][1]
    padded = [pad_leaf(*group) for group in zip(*[l for l, _ in leaves_list])]
    return [jax.tree.unflatten(treedef, [p[i] for p in padded])
            for i in range(len(consts_list))]




def fit_images(cfg, task: TaskSpec, datas: Sequence[TaskData],
               n_iters: Optional[int] = None, mesh=None,
               canvas_multiple: int = 64,
               per_image: Optional[Sequence[dict]] = None,
               return_ctx: bool = False,
               block: Optional[int] = None,
               milestone_hook=None) -> List[FitState]:
    """Fit all images concurrently (one bucket per padded shape + patch
    size). Returns the per-image FitStates in input order.

    Per-image configuration (round-3, VERDICT #2):
    - aux rank-gating: each TaskData arrives with its own gated proposal
      list (loaders apply cfg.aux_gate_ratio per image); the EFFECTIVE K
      is part of the bucket key, so a gated image fits with exactly the
      architecture the sequential path gives it (NPPNetTop1 for k=1;
      NPPNet with (k-1) aux blocks otherwise — a top-1-padded shared
      program was measured 0.4 dB worse on the gated example).
      aux_gate_ratio=0 (reference fixed-top-K) maximises bucket sharing;
    - per_image[i] optional overrides (currently: 'warp_field') become part
      of the bucket key — images with different warp settings compile
      separate (still batched) programs;
    - per-image patch schedules ride the (patch_size) bucket key.

    return_ctx: additionally return a per-image ctx dict (model, embedder,
    bucket canvas, cfg) for rendering/eval of the batched results.

    milestone_hook(i, idxs, state): called at fit_image's eval cadence
    (every iteration i with i % cfg.i_testset == 0, i > 0; pipeline.py:241)
    with the bucket's ORIGINAL image indices and the batched DEVICE state
    (row j of a state leaf belongs to datas[idxs[j]]; rows beyond len(idxs)
    are mesh-padding repeats). On the default gcd block path every
    milestone coincides with a dispatch boundary (blk divides i_testset);
    an EXPLICIT `block` that does not divide i_testset silently skips the
    milestones inside a block. Used by run_suite --batched for
    cfg.comp_snapshot='best' held-out snapshot selection.
    """
    n_iters = n_iters if n_iters is not None else cfg.N_iters - 1
    if mesh is None:
        mesh = make_mesh(('images',))
    n_dev = mesh.shape['images']
    overrides = [dict(o) for o in per_image] if per_image is not None \
        else [{} for _ in datas]

    buckets: Dict[Tuple, List[int]] = {}
    for i, d in enumerate(datas):
        h = _round_up(d.img.shape[0], canvas_multiple)
        w = _round_up(d.img.shape[1], canvas_multiple)
        k_eff = min(cfg.p_topk, len(d.selected_angles))
        key = (h, w, d.patch_size, k_eff,
               tuple(sorted(overrides[i].items())))
        buckets.setdefault(key, []).append(i)

    results: List[Optional[FitState]] = [None] * len(datas)
    ctxs: List[Optional[dict]] = [None] * len(datas)
    for (h, w, patch_size, k_eff, okey), idxs in buckets.items():
        bcfg = dataclasses.replace(cfg, **dict(okey)) if okey else cfg
        group = [pad_to_canvas(datas[i], h, w) for i in idxs]
        # coordinate-normalisation dims: each image's TIGHT loader canvas
        # (pre-bucket) — normalising by the shared bucket canvas would make
        # a small image's embedding depend on the bucket's largest image
        # (the same leak the ranking stage fixed; measured -0.9 dB on the
        # round-3 batched suite before this fix)
        dims = [datas[i].img.shape[:2] for i in idxs]
        # round the batch up to a multiple of the mesh size by repeating
        b = _round_up(len(group), n_dev)
        padded_group = group + [group[-1]] * (b - len(group))
        dims = dims + [dims[-1]] * (b - len(dims))

        embedders = [
            make_task_embedder(bcfg, np.asarray(d.selected_angles),
                               np.asarray(d.selected_periods), dims[j],
                               jax.random.PRNGKey(bcfg.seed))
            for j, d in enumerate(padded_group)]
        comps = build_components(bcfg, padded_group[0], task)
        model = comps.model

        # same init-key derivation as fit_image (models/pipeline.py):
        # rng chain from PRNGKey(seed), k_init = second split half
        rng0, k_init = jax.random.split(jax.random.PRNGKey(bcfg.seed))
        state, tx = init_batched_state(bcfg, task, model, embedders, k_init,
                                       comps.percep, comps.style)
        consts_list = _pad_pools_to_common([
            make_fit_consts(bcfg, task, d, patch_size) for d in padded_group])
        consts = stack_consts(consts_list)
        emb_b = stack_embedders(embedders)

        state = shard_leading_axis(state, mesh)
        consts = shard_leading_axis(consts, mesh)

        # patch-size decay schedule (same cadence as fit_image; stages
        # rebuild the batched step + constants at decay boundaries).
        # lax.scan blocks amortise dispatch latency (~1s/call via the
        # relay). Default block follows fit_image's gcd-of-cadences rule so
        # the batched rng chain MATCHES the sequential one split-for-split
        # (per-image fits then differ only by cross-program float
        # reassociation).
        ps, pn = patch_size, bcfg.patch_num
        if block is None:
            import math
            blk = math.gcd(bcfg.i_testset,
                           getattr(bcfg, 'i_print', bcfg.i_testset) or
                           bcfg.i_testset)
            # fit_image disables blocks below gcd 8 and consumes ONE rng
            # split per iteration; mirror that exactly or the batched key
            # chain diverges from the sequential one
            use_blocks = blk >= 8
        else:
            # an EXPLICIT block is honoured as given (callers like the MFU
            # bench choose their own dispatch granularity; sequential-chain
            # parity only governs the default gcd path)
            blk = block
            use_blocks = blk > 1
        if not use_blocks:
            blk = 1   # static shape for the (unused) block program

        stage_fns: Dict = {}

        # HBM guard for cfg.embed_table (default on, round-4 A/B): B
        # per-image tables over the bucket canvas; skip the table path when
        # they would exceed cfg.embed_table_max_mb (concrete dims here —
        # inside the jitted block the embedder's int leaves are tracers)
        table_itemsize = {'float32': 4, 'bfloat16': 2}.get(
            getattr(bcfg, 'embed_table', ''), 0)
        table_mb = len(embedders) * h * w * embedders[0].out_dim * \
            table_itemsize / 1e6
        max_mb = int(getattr(bcfg, 'embed_table_max_mb', 2048))
        grid_for_table = (h, w) if table_itemsize and table_mb <= max_mb \
            else None
        if (table_itemsize == 4 and grid_for_table is None and
                getattr(bcfg, 'embed_table_degrade', False) and
                table_mb / 2 <= max_mb):
            # cfg-gated: halve the table bytes instead of losing it entirely
            # (bf16 values quantize the embedding, so this bends the batched
            # path's sequential-equivalence — see config.embed_table_degrade)
            bcfg = dataclasses.replace(bcfg, embed_table='bfloat16')
            grid_for_table = (h, w)
            print(f'[runner] embed_table degraded to bfloat16: '
                  f'{table_mb:.0f} MB f32 > {max_mb} MB budget', flush=True)
        elif table_itemsize and grid_for_table is None:
            print(f'[runner] embed_table skipped: {table_mb:.0f} MB of '
                  f'tables > embed_table_max_mb', flush=True)

        def build(ps_, pn_):
            # cached per stage so the compile-ahead thread and the decay
            # path share ONE jit callable (a rebuilt wrapper would
            # re-trace and recompile)
            if (ps_, pn_) in stage_fns:
                return stage_fns[(ps_, pn_)]
            bfn = make_batched_fit_block(bcfg, task, model, comps.percep,
                                         comps.contextual, comps.style, tx,
                                         pn_, ps_, blk, mesh=mesh,
                                         grid_hw=grid_for_table)
            single = make_batched_fit_step(bcfg, task, model, comps.percep,
                                           comps.contextual, comps.style, tx,
                                           pn_, ps_, mesh=mesh)
            from ..utils import aot
            cache_dir = aot.cache_dir_from(bcfg)
            if cache_dir:
                # image data (consts, embedders, state) are ARGUMENTS of
                # the batched programs, so one cache entry serves every
                # image/bucket of the same shapes across sessions; the
                # closed-over tower params + model/mesh identity go into
                # the key
                extra = aot.digest_arrays({
                    'percep': comps.percep.params if comps.percep else 0,
                    'cx': comps.contextual.params if comps.contextual else 0,
                    'style': comps.style.params if comps.style else 0,
                }) + f'{type(model).__name__}/{k_eff}/' \
                     f'{dict(mesh.shape)}'.encode()
                # distinct names: a blk=1 block program and the single-step
                # program share avals, so a shared name would collide
                bfn = aot.aot_cached(
                    bfn, f'bfit-{task.name}-{ps_}x{pn_}-blk{blk}',
                    cache_dir, cfg=bcfg, extra=extra)
                single = aot.aot_cached(
                    single, f'bfit-{task.name}-{ps_}x{pn_}-single',
                    cache_dir, cfg=bcfg, extra=extra)
            stage_fns[(ps_, pn_)] = (bfn, single)
            return bfn, single

        consts_cache: Dict = {}

        def stage_consts(ps_):
            # memoised: prewarm stacks the next stage's constants on the
            # main thread; the decay boundary reuses them
            if ps_ not in consts_cache:
                consts_cache[ps_] = shard_leading_axis(
                    stack_consts(_pad_pools_to_common(
                        [make_fit_consts(bcfg, task, d, ps_)
                         for d in padded_group])), mesh)
            return consts_cache[ps_]

        prewarmed = set()

        def prewarm_next(i0, nd, ps_, pn_, state_now):
            """Compile the NEXT decay stage's batched block in the
            background while the current stage fits (see
            models/pipeline.py compile-ahead note). The program is built
            and the stage constants are stacked on the MAIN thread (so the
            stage_fns check-then-act can't race a concurrent build), and
            everything the thread touches is bound by value — the bucket
            loop rebinds `build`/`emb_b`/`stage_consts` for the next
            bucket, and a late-binding closure would run bucket A's state
            against bucket B's programs."""
            due_at = (nd + 1) * bcfg.patch_size_decay
            if not (use_blocks and getattr(bcfg, 'compile_ahead', True) and
                    ps_ > 31 and due_at < n_total - 10 and
                    i0 >= due_at - bcfg.patch_size_decay and
                    (ps_ // 2, pn_ * 2) not in prewarmed):
                return
            prewarmed.add((ps_ // 2, pn_ * 2))
            blk2, _ = build(ps_ // 2, pn_ * 2)
            consts2 = stage_consts(ps_ // 2)
            import threading

            def warm(fn=blk2, e=emb_b, c=consts2, st=state_now):
                try:
                    fn(st, e, c, jax.random.PRNGKey(0))
                except Exception as ex:
                    print(f'[fit_images] compile-ahead failed: {ex!r}')

            threading.Thread(target=warm, daemon=True).start()

        step_blk, step_one = build(ps, pn)
        rng = rng0
        # iteration loop MIRRORS models/pipeline.py::fit_image exactly
        # (same block alignment, same decay-at-block-start semantics, same
        # one-split-per-dispatch rng chain), so a batched fit consumes the
        # identical key sequence as its sequential counterpart.
        n_total = n_iters + 1          # == cfg.N_iters of the sequential path
        n_decays = 0
        i = 1
        while i < n_total:
            due = (i - 1) // bcfg.patch_size_decay if i > 1 else 0
            if due > n_decays and ps > 31 and n_total - i > 10:
                while n_decays < due and ps > 31:
                    n_decays += 1
                    ps //= 2
                    pn *= 2
                consts = stage_consts(ps)
                step_blk, step_one = build(ps, pn)
            remaining = n_total - i
            if use_blocks and remaining >= blk and (i - 1) % blk == 0:
                rng, k = jax.random.split(rng)
                state, _ = step_blk(state, emb_b, consts, k)
                prewarm_next(i, n_decays, ps, pn, state)
                i += blk
            else:
                rng, k = jax.random.split(rng)
                state, _ = step_one(state, emb_b, consts, k)
                i += 1
            if milestone_hook is not None and i - 1 > 0 and \
                    (i - 1) % bcfg.i_testset == 0:
                milestone_hook(i - 1, idxs, state)
        jax.block_until_ready(state.params)
        # per-image states go back as HOST numpy: a slice of the sharded
        # batch stays committed to the images-mesh devices, which a
        # downstream program on a different mesh (e.g. the 1-device render
        # mesh in run_suite --batched) rejects as an incompatible-devices
        # error; uncommitted host arrays transfer wherever they're used
        for j, i in enumerate(idxs):
            results[i] = jax.tree.map(lambda x, jj=j: np.asarray(x[jj]),
                                      state)
            ctxs[i] = {'model': model, 'embedder': embedders[j],
                       'canvas': (h, w), 'cfg': bcfg}
    if return_ctx:
        return results, ctxs
    return results
