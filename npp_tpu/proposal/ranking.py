"""Proposal ranking: fit a light NPP-Net per candidate periodicity and score
the held-out pseudo-mask region (reference: NPP_proposal/search.py:78-219).

The reference loops candidates in Python, rebuilding model/optimizer each time
(search.py:85-113). Here all candidates advance in lockstep: one compiled
program, parameters stacked on a leading candidate axis, `vmap` over the
candidate-dependent embedding/loss, `lax.scan` over the N_iters fit
(SURVEY.md §2.3 "vmap is the new for-loop"). The reference reseeds
per-candidate so every candidate sees the same init and the same pixel
batches (search.py:91-92) — replicated here by broadcasting one init and
sharing batch indices across the candidate axis.

Round-3: the fit/eval programs take ALL per-image data (image canvas, pixel
pool, candidate lattices, Fourier bands, normalisation dims, held-out
coordinates, crop origin) as ARGUMENTS instead of traced constants, so one
compiled executable serves every image of a static shape class — the
2-7 min relay compile is paid once per suite instead of once per image, and
the executables are AOT-cacheable across sessions (utils/aot.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.contextual import ContextualLoss
from ..losses.lpips import LPIPS
from ..losses.pixel import img2mse
from ..losses.robust import adaptive_init
from ..nn.embedder import fourier_encode, gaussian_freq_bands, normalize_coords, periodic_warp
from ..nn.mlp import NPPNetLight, render_activation
from ..config import nerf_embed_dim, periodic_embed_dim


def combine_scores(cfg, comps: dict) -> dict:
    """Host-side combination of the per-candidate score components into one
    distance per ranking proxy (lower = better). All proxies are computed
    from ONE device program's outputs, so sweeping proxies costs nothing
    beyond the single eval.

    Proxies:
      'reference'   30*LPIPS + 1*CX on the zero-canvas bbox crop — the
                    reference's objective (NPP_proposal/search.py:150-205).
      'window'      same perceptual score, but on the held-out window
                    COMPOSITED into the true image context: lattice-phase
                    errors at the window seam become visible to LPIPS/CX
                    (the bbox crop hides them behind the zero background).
      'mse'         log10 of the held-out pixel MSE (= -PSNR/10): ranks by
                    exactly what the completion metric measures.
      'heldout_mse' reference + rank_pix_weight * log10(MSE): perceptual
                    score regularised by held-out fidelity.
    """
    pw, cw = cfg.perceptual_weight, cfg.contextual_weight
    d_ref = pw * comps['lpips_bbox'] + cw * comps['cx_bbox']
    d_win = pw * comps['lpips_comp'] + cw * comps['cx_comp']
    d_pix = np.log10(np.maximum(comps['val_mse'], 1e-8))
    w_pix = float(getattr(cfg, 'rank_pix_weight', 1.0))
    return {
        'reference': d_ref,
        'window': d_win,
        'mse': d_pix,
        'heldout_mse': d_ref + w_pix * d_pix,
    }


# one (fit, eval, tx, params0) program bundle per static shape class —
# shared by every image the suite ranks on that class
_PROGRAM_CACHE: dict = {}

_CHUNK = 1 << 14


def _rank_core(cfg):
    """Model, init params, optimiser and the embedding/loss closures shared
    by the per-image and the suite (images-axis) fit programs. Nothing here
    depends on image data or static canvas shapes — all of that enters the
    programs as arguments."""
    from ..utils import aot
    key = ('core', aot._cfg_sig(cfg))
    hit = _PROGRAM_CACHE.get(key)
    if hit is not None:
        return hit

    p_dim = periodic_embed_dim(cfg, include_input=False)
    pos_dim = nerf_embed_dim(cfg, 2, include_input=True)
    model = NPPNetLight(
        input_ch_periodic_all=p_dim, n_scales=len(cfg.freq_scales),
        n_offsets=len(cfg.freq_offsets),
        n_angle_offsets=len(cfg.angle_offsets), depth=cfg.netdepth,
        width=cfg.netwidth, activation=cfg.activation)

    # one init broadcast to all candidates (reference reseeds per candidate)
    params0 = {
        'mlp': model.init(jax.random.PRNGKey(cfg.seed),
                          jnp.zeros((1, pos_dim)), jnp.zeros((1, p_dim)))['params'],
        'adaptive_pix': adaptive_init(3),
    }
    sched = lambda s: cfg.lrate * (0.1 ** (s / (cfg.lrate_decay * 100.0)))
    tx = optax.adam(sched, b1=0.9, b2=0.999)

    import contextlib

    def _precision_ctx():
        return jax.default_matmul_precision(cfg.matmul_precision) \
            if cfg.matmul_precision != 'default' else contextlib.nullcontext()

    def embed_pos(coords, norm_hw):
        return fourier_encode(
            normalize_coords(coords, (norm_hw[0], norm_hw[1])),
            norm_hw[2:], True)

    def embed_peri(coords, ang, per, norm_hw):
        return periodic_warp(coords, ang, per, cfg.freq_scales,
                             cfg.freq_offsets, cfg.angle_offsets,
                             (norm_hw[0], norm_hw[1]), include_input=False)

    def one_cand_loss(p, ang, per, coords, gt, norm_hw):
        with _precision_ctx():
            e_pos = embed_pos(coords, norm_hw)
            e_per = embed_peri(coords, ang, per, norm_hw)
            pred = render_activation(
                model.apply({'params': p['mlp']}, e_pos, e_per),
                cfg.normalize_type)
            return img2mse(pred, gt, cfg.loss_type, p['adaptive_pix'], None)

    core = {'model': model, 'params0': params0, 'tx': tx,
            'embed_pos': embed_pos, 'embed_peri': embed_peri,
            'one_cand_loss': one_cand_loss}
    _PROGRAM_CACHE[key] = core
    return core


def _rank_programs(cfg, statics, percep: LPIPS, contextual: ContextualLoss,
                   mesh, cand_axis: str):
    """Build (or fetch) the lockstep-fit and vmapped-eval programs for one
    static shape class `statics = (h, w, n_cand, pool_len, n_chunks, ch,
    cw)`. Per-image data are arguments (module docstring), so the returned
    callables are image-independent."""
    from ..utils import aot
    # the tower/mesh objects themselves key the cache (default object
    # hashing) — holding them strongly also pins their ids, so a
    # garbage-collected tower can never alias a stale program
    key = (aot._cfg_sig(cfg), statics, percep, contextual, mesh, cand_axis)
    hit = _PROGRAM_CACHE.get(key)
    if hit is not None:
        return hit

    h, w, n_cand, pool_len, n_chunks, ch, cw = statics

    def _shard_cands(tree):
        """Constrain candidate-leading leaves onto the mesh axis (scalar
        leaves, e.g. the Adam step count, stay replicated)."""
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = NamedSharding(mesh, P(cand_axis))
        rep = NamedSharding(mesh, P())

        def pick(x):
            return spec if getattr(x, 'ndim', 0) >= 1 and \
                x.shape[0] == n_cand else rep
        return jax.lax.with_sharding_constraint(
            tree, jax.tree.map(pick, tree))

    core = _rank_core(cfg)
    model, params0, tx = core['model'], core['params0'], core['tx']
    embed_pos, embed_peri = core['embed_pos'], core['embed_peri']
    one_cand_loss = core['one_cand_loss']

    @jax.jit
    def fit(params, opt_state, rng, img, pool, n_pool, angles, periods,
            norm_hw):
        params = _shard_cands(params)
        opt_state = _shard_cands(opt_state)

        def scan_step(carry, key):
            params, opt_state = carry
            idx = jax.random.randint(key, (cfg.N_rand,), 0, n_pool)
            coords = pool[idx].astype(jnp.float32)
            gt = img[pool[idx][:, 0], pool[idx][:, 1]]

            def per_cand(p, ang, per):
                return jax.value_and_grad(one_cand_loss)(
                    p, ang, per, coords, gt, norm_hw)

            losses, grads = jax.vmap(per_cand)(params, angles, periods)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.mean(losses)

        keys = jax.random.split(rng, cfg.N_iters)
        (params, opt_state), losses = jax.lax.scan(
            scan_step, (params, opt_state), keys)
        return params, losses

    @jax.jit
    def eval_all(params, img, angles, periods, norm_hw, val_pad, crop_org):
        """Render the held-out region for EVERY candidate and compute all
        score components in one program (vmap over the padded candidate
        axis). `val_pad` is (n_chunks, CHUNK, 2) int32 held-out coords,
        padded with the out-of-bounds sentinel (h, w): sentinel rows are
        DROPPED by the canvas scatters (jax out-of-bounds scatter
        semantics) and masked out of the MSE — exactly the rows the
        pre-round-3 implementation trimmed off statically."""
        params = _shard_cands(params)
        val_flat = val_pad.reshape(-1, 2)
        valid = (val_flat[:, 0] < h).astype(jnp.float32)          # (Nv,)
        n_val = jnp.maximum(jnp.sum(valid), 1.0)
        gt_vals = img[val_flat[:, 0], val_flat[:, 1]]             # clamped
        gt_canvas = jnp.zeros((h, w, 3)).at[
            val_flat[:, 0], val_flat[:, 1]].set(gt_vals)

        def crop(x):
            return jax.lax.dynamic_slice(
                x, (crop_org[0], crop_org[1], 0), (ch, cw, x.shape[-1]))

        gt_crop = crop(gt_canvas)[None]
        # context for the composited 'window' score: the image itself (true
        # values at the held-out window, identical for all candidates
        # elsewhere)
        ctx_crop = crop(img)
        val_in_crop = crop(jnp.zeros((h, w, 1)).at[
            val_flat[:, 0], val_flat[:, 1]].set(1.0))

        def one(p, ang, per):
            def body(c):
                cf = c.astype(jnp.float32)
                raw = model.apply({'params': p['mlp']},
                                  embed_pos(cf, norm_hw),
                                  embed_peri(cf, ang, per, norm_hw))
                return render_activation(raw, cfg.normalize_type)
            out = jax.lax.map(body, val_pad).reshape(-1, 3)
            pred = jnp.zeros((h, w, 3)).at[
                val_flat[:, 0], val_flat[:, 1]].set(out)
            pred_crop = crop(pred)[None]
            comp_crop = (ctx_crop * (1.0 - val_in_crop) +
                         pred_crop[0] * val_in_crop)[None]
            # cx_mask_pad: exclude feature positions outside the held-out
            # region from the bbox CX match — the bucketed crop's zero
            # expansion then cannot rescale near-tie distances through the
            # CX normalisation (round-2 advisor finding). The comp scores
            # need no mask: their crop is fully real content.
            cx_mask = val_in_crop[None] \
                if getattr(cfg, 'cx_mask_pad', False) else None
            return {
                'lpips_bbox': jnp.mean(percep(pred_crop, gt_crop,
                                              use_robust=False)),
                'cx_bbox': contextual(pred_crop, gt_crop,
                                      spatial_mask=cx_mask),
                'lpips_comp': jnp.mean(percep(comp_crop, ctx_crop[None],
                                              use_robust=False)),
                'cx_comp': contextual(comp_crop, ctx_crop[None]),
                'val_mse': jnp.sum(valid * jnp.sum((out - gt_vals) ** 2, -1))
                           / (3.0 * n_val),
            }

        return jax.vmap(one)(params, angles, periods)

    cache_dir = aot.cache_dir_from(cfg)
    if cache_dir:
        extra = aot.digest_arrays({
            'percep': percep.params, 'cx': contextual.params,
        }) + repr(statics).encode() + \
            (repr(dict(mesh.shape)) if mesh is not None else '').encode()
        fit = aot.aot_cached(fit, f'rank-fit-{h}x{w}-c{n_cand}-p{pool_len}',
                             cache_dir, cfg=cfg, extra=extra)
        eval_all = aot.aot_cached(
            eval_all, f'rank-eval-{h}x{w}-c{n_cand}-{ch}x{cw}-v{n_chunks}',
            cache_dir, cfg=cfg, extra=extra)

    # 'warmed' tracks whether the eval program has been compiled/executed
    # once in this process: the compile-ahead warm must run once per shape
    # class, not once per image (a warm on an already-compiled program is a
    # full throwaway candidate eval competing with the fit for the chip)
    bundle = (fit, eval_all, tx, params0, {'warmed': False})
    _PROGRAM_CACHE[key] = bundle
    return bundle


def _eval_inputs(cfg, canvas_hw, i_val, norm_res):
    """Held-out-region eval inputs for one image (search.py:150-205):
    returns (val_pad, crop_org, n_chunks, crop_h, crop_w).

    The crop bbox spans the val coords with exclusive ends (+1 so the
    bottom/right-most val row/column is inside the scored crop); the deepest
    VGG taps need >= 32 px; with crop_bucket > 0 the crop is additionally
    rounded up to a bucket multiple so the eval executable is shared across
    images (expansion area is zero in both pred and gt canvases, identical
    for every candidate, so within-image ranking is preserved to first
    order — the CX loss's normalized matching can in principle rescale
    near-tie distances through boundary receptive fields; cfg.cx_mask_pad
    counters that). The crop is clamped to the TIGHT image dims `norm_res`
    so bucketing never reads past the per-image region on a suite canvas.

    Held-out coords are chunked for lax.map and padded to a power-of-two
    chunk count with the out-of-bounds sentinel (h, w) — sentinel rows are
    dropped/masked inside the eval program."""
    h, w = canvas_hw
    nh, nw = norm_res
    val = np.asarray(i_val, np.int64)
    hmin, hmax = int(val[:, 0].min()), int(val[:, 0].max()) + 1
    wmin, wmax = int(val[:, 1].min()), int(val[:, 1].max()) + 1
    bucket = int(getattr(cfg, 'crop_bucket', 0))

    def _bucketed(lo, hi, limit):
        size = max(hi - lo, 32)
        if bucket:
            size = -(-size // bucket) * bucket
        size = min(size, limit)
        hi = min(limit, lo + size)
        lo = max(0, hi - size)
        return lo, hi
    hmin, hmax = _bucketed(hmin, hmax, nh)
    wmin, wmax = _bucketed(wmin, wmax, nw)

    n_chunks_min = -(-len(val) // _CHUNK)
    n_chunks = 1 << (max(n_chunks_min, 1) - 1).bit_length()
    val_np = np.full((n_chunks * _CHUNK, 2), (h, w), np.int32)
    val_np[:len(val)] = val.astype(np.int32)
    val_pad = jnp.asarray(val_np).reshape(n_chunks, _CHUNK, 2)
    crop_org = jnp.asarray([hmin, wmin], jnp.int32)
    return val_pad, crop_org, n_chunks, hmax - hmin, wmax - wmin


def _suite_fit_program(cfg, statics, mesh, images_axis: str):
    """Lockstep ranking fit over an (images, candidates) grid: ONE compiled
    program advances every candidate of every image of a suite together
    (VERDICT round-3 next #1 — the per-image sequential search was 3.3x the
    batched fit wall; reference loops images one at a time through
    search.py:85-207 via run_*.sh).

    `statics = (h, w, n_img, n_cand, pool_len)`. Per-image data are
    arguments, exactly like the per-image program: imgs (n_img, h, w, 3),
    pools (n_img, pool_len, 2), n_pools (n_img,), angles/periods
    (n_img, n_cand, 2), norm_hws (n_img, 2 + bands). Sequential
    equivalence: the inner per-image trace is the per-image program's
    scan_step verbatim (same key chain from PRNGKey(seed + 1), one randint
    per image per step bounded by that image's true pool count, shared
    batch indices across its candidates), so each image's trajectory equals
    its own sequential run; Adam is elementwise, making slots independent.

    With `mesh`, image-leading leaves shard over `images_axis` — images are
    independent, so no cross-chip traffic exists.
    """
    from ..utils import aot
    key = ('suite', aot._cfg_sig(cfg), statics, mesh, images_axis)
    hit = _PROGRAM_CACHE.get(key)
    if hit is not None:
        return hit

    h, w, n_img, n_cand, pool_len = statics
    core = _rank_core(cfg)
    tx, one_cand_loss = core['tx'], core['one_cand_loss']

    def _shard_imgs(tree):
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = NamedSharding(mesh, P(images_axis))
        rep = NamedSharding(mesh, P())

        def pick(x):
            return spec if getattr(x, 'ndim', 0) >= 1 and \
                x.shape[0] == n_img else rep
        return jax.lax.with_sharding_constraint(
            tree, jax.tree.map(pick, tree))

    @jax.jit
    def fit_suite(params, opt_state, rng, imgs, pools, n_pools, angles,
                  periods, norm_hws):
        params = _shard_imgs(params)
        opt_state = _shard_imgs(opt_state)

        def scan_step(carry, key):
            params, opt_state = carry

            def per_image(p, img, pool, n_pool, angs, pers, norm_hw):
                idx = jax.random.randint(key, (cfg.N_rand,), 0, n_pool)
                coords = pool[idx].astype(jnp.float32)
                gt = img[pool[idx][:, 0], pool[idx][:, 1]]

                def per_cand(pc, ang, per):
                    return jax.value_and_grad(one_cand_loss)(
                        pc, ang, per, coords, gt, norm_hw)

                return jax.vmap(per_cand)(p, angs, pers)

            losses, grads = jax.vmap(per_image)(
                params, imgs, pools, n_pools, angles, periods, norm_hws)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.mean(losses)

        keys = jax.random.split(rng, cfg.N_iters)
        (params, opt_state), losses = jax.lax.scan(
            scan_step, (params, opt_state), keys)
        return params, losses

    cache_dir = aot.cache_dir_from(cfg)
    if cache_dir:
        extra = repr(statics).encode() + \
            (repr(dict(mesh.shape)) if mesh is not None else '').encode()
        fit_suite = aot.aot_cached(
            fit_suite, f'rank-sfit-{h}x{w}-i{n_img}-c{n_cand}-p{pool_len}',
            cache_dir, cfg=cfg, extra=extra)

    _PROGRAM_CACHE[key] = fit_suite
    return fit_suite


def rank_proposals_suite(cfg, items, percep: LPIPS,
                         contextual: ContextualLoss, mesh=None,
                         images_axis: str = 'images'):
    """Rank every image of a suite with ONE lockstep fit over the
    (images, candidates) grid, then score each image with its own vmapped
    eval program — the exact executable the sequential path uses, so
    per-image scores match the sequential search (near-tie fp drift from
    the batched fit's different XLA schedule aside; CLAUDE.md).

    items: list of dicts per image with keys
      'masked_img' (H, W, 3) on a SHARED canvas, 'i_train', 'i_val',
      'all_angles', 'all_periods', 'norm_res' (tight per-image dims).
    Returns a list of (distances, comps) in item order.
    """
    assert items, 'rank_proposals_suite needs at least one item'
    h, w = items[0]['masked_img'].shape[:2]
    for it in items:
        assert it['masked_img'].shape[:2] == (h, w), \
            'suite ranking requires one shared canvas (pad first)'

    n_reals = [len(it['all_angles']) for it in items]
    n_cand = max(max(n_reals), int(getattr(cfg, 'rank_pad_candidates', 0)))
    n_img = len(items)
    if mesh is not None:
        nd = mesh.shape[images_axis]
        pad_img = -(-n_img // nd) * nd - n_img
        items = items + [items[-1]] * pad_img
        n_reals = n_reals + [n_reals[-1]] * pad_img
    else:
        pad_img = 0

    from ..utils.pools import pad_pool_pow2
    bands = gaussian_freq_bands(jax.random.PRNGKey(cfg.seed), cfg.multires)

    imgs, pools, n_pools, angs, pers, norm_hws = [], [], [], [], [], []
    pool_lens = []
    for it in items:
        padded, n_true = pad_pool_pow2(it['i_train'], fill='tile')
        pools.append(padded)
        pool_lens.append(len(padded))
        n_pools.append(max(n_true, 1))
        imgs.append(np.asarray(it['masked_img'], np.float32))
        a = np.asarray(it['all_angles'], np.float32)
        p = np.asarray(it['all_periods'], np.float32)
        if len(a) < n_cand:   # pad by repeating candidate 0 (discarded)
            a = np.concatenate([a, np.repeat(a[:1], n_cand - len(a), 0)], 0)
            p = np.concatenate([p, np.repeat(p[:1], n_cand - len(p), 0)], 0)
        angs.append(a)
        pers.append(p)
        nh, nw = it['norm_res']
        norm_hws.append(np.concatenate([np.asarray([nh, nw], np.float32),
                                        np.asarray(bands, np.float32)]))
    # shared pool length: re-tile each image's ORIGINAL pool to the max
    # pow2 (randint is bounded by the true count, so the tail is never
    # sampled and the per-image draw equals the sequential one)
    pool_len = max(pool_lens)
    for j, it in enumerate(items):
        if pool_lens[j] < pool_len:
            src = np.asarray(it['i_train'])
            reps = -(-pool_len // max(len(src), 1))
            pools[j] = np.tile(src, (reps, 1))[:pool_len].astype(np.int32) \
                if len(src) else np.zeros((pool_len, 2), np.int32)

    fit_suite = _suite_fit_program(cfg, (h, w, n_img + pad_img, n_cand,
                                         pool_len), mesh, images_axis)
    core = _rank_core(cfg)
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_img + pad_img, n_cand) + x.shape),
        core['params0'])
    opt_state = core['tx'].init(params)

    # per-image eval bundles: IDENTICAL statics to the sequential path
    # (per-image pow2 pool length), so the eval executables/AOT entries are
    # shared with it bit-for-bit. Warm each distinct eval shape class in the
    # background while the suite fit runs (the sequential path's
    # compile-ahead, across all images at once).
    evals = []
    for j, it in enumerate(items):
        nh, nw = it['norm_res']
        val_pad, crop_org, n_chunks, ch_, cw_ = _eval_inputs(
            cfg, (h, w), it['i_val'], (nh, nw))
        statics = (h, w, n_cand, pool_lens[j], n_chunks, ch_, cw_)
        _, eval_all, _, _, prog_meta = _rank_programs(
            cfg, statics, percep, contextual, None, 'candidates')
        evals.append((eval_all, prog_meta, val_pad, crop_org))
    if getattr(cfg, 'compile_ahead', True):
        import threading
        p0 = jax.tree.map(lambda x: x[0], params)
        for j, (eval_all, prog_meta, val_pad, crop_org) in enumerate(evals):
            if prog_meta['warmed']:
                continue
            prog_meta['warmed'] = True
            threading.Thread(
                target=lambda e=eval_all, v=val_pad, c=crop_org, jj=j:
                    e(p0, jnp.asarray(imgs[jj]), jnp.asarray(angs[jj]),
                      jnp.asarray(pers[jj]), jnp.asarray(norm_hws[jj]),
                      v, c),
                daemon=True).start()

    params, _ = fit_suite(
        params, opt_state, jax.random.PRNGKey(cfg.seed + 1),
        jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(pools)),
        jnp.asarray(np.asarray(n_pools, np.int32)),
        jnp.asarray(np.stack(angs)), jnp.asarray(np.stack(pers)),
        jnp.asarray(np.stack(norm_hws)))

    out = []
    for j in range(n_img):
        eval_all, prog_meta, val_pad, crop_org = evals[j]
        pj = jax.tree.map(lambda x: x[j], params)
        comps = {k: np.asarray(v)[:n_reals[j]]
                 for k, v in jax.device_get(
                     eval_all(pj, jnp.asarray(imgs[j]), jnp.asarray(angs[j]),
                              jnp.asarray(pers[j]),
                              jnp.asarray(norm_hws[j]), val_pad,
                              crop_org)).items()}
        prog_meta['warmed'] = True
        scores = combine_scores(cfg, comps)
        distances = np.asarray(scores[getattr(cfg, 'rank_proxy',
                                              'reference')])
        out.append((distances, comps))
    return out


def rank_proposals(cfg, masked_img: np.ndarray, i_train: np.ndarray,
                   i_val: np.ndarray, all_angles, all_periods,
                   percep: LPIPS, contextual: ContextualLoss,
                   norm_res=None, return_components: bool = False,
                   mesh=None, cand_axis: str = 'candidates',
                   params_override=None, bands_override=None):
    """Returns distance (lower = better periodicity) per candidate.

    norm_res: the TIGHT per-image (canvas_multiple) dims used to normalise
    positional Fourier coords and clamp the eval crop. With a suite-wide
    cfg.canvas_override the padded canvas dims would otherwise leak into
    every candidate's embedding, making a given image's distances depend on
    the suite's largest image (round-2 advisor finding); coords only ever
    come from the tight region, so normalising by it makes ranking
    identical across suite canvases while keeping padded static shapes.

    return_components: also return the raw per-candidate score components
    (see combine_scores) for offline proxy analysis.

    mesh: optional jax Mesh with a `cand_axis` axis — the candidate axis of
    the lockstep fit and of the vmapped eval is sharded across it (each
    chip fits/evaluates its own candidates; no cross-chip traffic: the
    candidates are independent). The reference fits candidates one after
    another on one GPU (search.py:85-113).
    """
    h, w = masked_img.shape[:2]
    nh, nw = norm_res if norm_res is not None else (h, w)
    n_real = len(all_angles)
    # pad the candidate axis to a static count (executable reuse across
    # images); padded slots repeat candidate 0 and their distances are
    # discarded before returning
    n_cand = max(n_real, int(getattr(cfg, 'rank_pad_candidates', 0)))
    if mesh is not None:
        nd = mesh.shape[cand_axis]
        n_cand = -(-n_cand // nd) * nd
    ang_np = np.asarray(all_angles, np.float32)
    per_np = np.asarray(all_periods, np.float32)
    if n_cand > n_real:
        pad = np.repeat(ang_np[:1], n_cand - n_real, axis=0)
        ang_np = np.concatenate([ang_np, pad], 0)
        per_np = np.concatenate([per_np,
                                 np.repeat(per_np[:1], n_cand - n_real, 0)], 0)
    angles = jnp.asarray(ang_np)    # (N, 2)
    periods = jnp.asarray(per_np)   # (N, 2)

    bands = jnp.asarray(bands_override, jnp.float32) \
        if bands_override is not None \
        else gaussian_freq_bands(jax.random.PRNGKey(cfg.seed), cfg.multires)

    img = jnp.asarray(masked_img, jnp.float32)
    # pad the pool to a power-of-two length (executable reuse across images);
    # the true count bounds the randint so repeats are never oversampled
    from ..utils.pools import pad_pool_pow2
    padded, n_true = pad_pool_pow2(i_train, fill='tile')
    train_pool = jnp.asarray(padded)
    n_pool = jnp.asarray(max(n_true, 1), jnp.int32)

    # normalisation dims + Fourier bands ride ONE argument vector so the
    # embedding closures stay image-independent: [nh, nw, band_0..band_F]
    norm_hw = jnp.concatenate([jnp.asarray([nh, nw], jnp.float32),
                               jnp.asarray(bands, jnp.float32)])

    val_pad, crop_org, n_chunks, ch_, cw_ = _eval_inputs(
        cfg, (h, w), i_val, (nh, nw))

    statics = (h, w, n_cand, train_pool.shape[0], n_chunks, ch_, cw_)
    fit, eval_all, tx, params0, prog_meta = _rank_programs(
        cfg, statics, percep, contextual, mesh, cand_axis)

    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_cand,) + x.shape), params0)
    opt_state = tx.init(params)

    if params_override is not None:
        # eval-only mode (parity fixtures): score the given per-candidate
        # params ({'mlp': tree with leading n_cand axis}) without fitting
        params = params_override
        assert jax.tree.leaves(params['mlp'])[0].shape[0] == n_cand, \
            'params_override must carry the padded candidate axis'
    else:
        if getattr(cfg, 'compile_ahead', True) and not prog_meta['warmed']:
            # the eval program compiles 2-7 min through the relay on its
            # first shape class; warm it on the INIT params (same
            # structure) in the background while the 300-iter lockstep fit
            # runs, so the compile hides behind the fit. Once per shape
            # class per process: later images reuse the compiled program
            # and a repeat warm would just burn chip time on a throwaway
            # candidate eval.
            prog_meta['warmed'] = True
            import threading
            p0 = params
            threading.Thread(
                target=lambda: eval_all(p0, img, angles, periods, norm_hw,
                                        val_pad, crop_org),
                daemon=True).start()
        params, _ = fit(params, opt_state, jax.random.PRNGKey(cfg.seed + 1),
                        img, train_pool, n_pool, angles, periods, norm_hw)

    comps = {k: np.asarray(v)[:n_real]
             for k, v in jax.device_get(
                 eval_all(params, img, angles, periods, norm_hw, val_pad,
                          crop_org)).items()}
    # any successful eval compiles the program — mark it so later images
    # never spawn a throwaway background warm (e.g. after an eval-only
    # params_override call, or with compile_ahead off)
    prog_meta['warmed'] = True
    scores = combine_scores(cfg, comps)
    proxy = getattr(cfg, 'rank_proxy', 'reference')
    distances = scores[proxy]
    for c in range(n_real):
        print(f'[search] candidate {c + 1}/{n_real} '
              f'distance={distances[c]:.4f} '
              f'(ref={scores["reference"][c]:.4f} '
              f'mse={comps["val_mse"][c]:.5f})')
    if return_components:
        return np.asarray(distances), comps
    return np.asarray(distances)
