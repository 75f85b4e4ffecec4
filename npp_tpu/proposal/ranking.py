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
    ang_np = np.asarray(all_angles, np.float32)
    per_np = np.asarray(all_periods, np.float32)
    if n_cand > n_real:
        pad = np.repeat(ang_np[:1], n_cand - n_real, axis=0)
        ang_np = np.concatenate([ang_np, pad], 0)
        per_np = np.concatenate([per_np,
                                 np.repeat(per_np[:1], n_cand - n_real, 0)], 0)
    angles = jnp.asarray(ang_np)    # (N, 2)
    periods = jnp.asarray(per_np)   # (N, 2)

    bands = jnp.asarray(bands_override) if bands_override is not None \
        else gaussian_freq_bands(jax.random.PRNGKey(cfg.seed), cfg.multires)
    p_dim = periodic_embed_dim(cfg, include_input=False)

    model = NPPNetLight(
        input_ch_periodic_all=p_dim, n_scales=len(cfg.freq_scales),
        n_offsets=len(cfg.freq_offsets),
        n_angle_offsets=len(cfg.angle_offsets), depth=cfg.netdepth,
        width=cfg.netwidth, activation=cfg.activation)

    def embed_pos(coords):
        return fourier_encode(normalize_coords(coords, (nh, nw)), bands, True)

    def embed_peri(coords, ang, per):
        return periodic_warp(coords, ang, per, cfg.freq_scales,
                             cfg.freq_offsets, cfg.angle_offsets, (nh, nw),
                             include_input=False)

    # one init broadcast to all candidates (reference reseeds per candidate)
    pos_dim = nerf_embed_dim(cfg, 2, include_input=True)
    params0 = {
        'mlp': model.init(jax.random.PRNGKey(cfg.seed),
                          jnp.zeros((1, pos_dim)), jnp.zeros((1, p_dim)))['params'],
        'adaptive_pix': adaptive_init(3),
    }
    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_cand,) + x.shape), params0)
    sched = lambda s: cfg.lrate * (0.1 ** (s / (cfg.lrate_decay * 100.0)))
    tx = optax.adam(sched, b1=0.9, b2=0.999)
    opt_state = tx.init(params)

    img = jnp.asarray(masked_img, jnp.float32)
    # pad the pool to a power-of-two length (executable reuse across images);
    # the true count bounds the randint so repeats are never oversampled
    from ..utils.pools import pad_pool_pow2
    padded, n_true = pad_pool_pow2(i_train, fill='tile')
    train_pool = jnp.asarray(padded)
    n_pool = jnp.asarray(max(n_true, 1), jnp.int32)

    import contextlib

    def _precision_ctx():
        return jax.default_matmul_precision(cfg.matmul_precision) \
            if cfg.matmul_precision != 'default' else contextlib.nullcontext()

    def one_cand_loss(p, ang, per, coords, gt):
        with _precision_ctx():
            e_pos = embed_pos(coords)
            e_per = embed_peri(coords, ang, per)
            pred = render_activation(
                model.apply({'params': p['mlp']}, e_pos, e_per),
                cfg.normalize_type)
            return img2mse(pred, gt, cfg.loss_type, p['adaptive_pix'], None)

    def scan_step(carry, key):
        params, opt_state = carry
        idx = jax.random.randint(key, (cfg.N_rand,), 0, n_pool)
        coords = train_pool[idx].astype(jnp.float32)
        gt = img[train_pool[idx][:, 0], train_pool[idx][:, 1]]

        def per_cand(p, ang, per):
            return jax.value_and_grad(one_cand_loss)(p, ang, per, coords, gt)

        losses, grads = jax.vmap(per_cand)(params, angles, periods)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), jnp.mean(losses)

    @jax.jit
    def fit(params, opt_state, rng):
        params = _shard_cands(params)
        opt_state = _shard_cands(opt_state)
        keys = jax.random.split(rng, cfg.N_iters)
        (params, opt_state), losses = jax.lax.scan(
            scan_step, (params, opt_state), keys)
        return params, losses

    # ---- evaluation on the held-out pseudo region (search.py:150-205)
    val = np.asarray(i_val, np.int64)
    # exclusive slice ends: +1 so the bottom/right-most val row/column is
    # inside the scored crop
    hmin, hmax = int(val[:, 0].min()), int(val[:, 0].max()) + 1
    wmin, wmax = int(val[:, 1].min()), int(val[:, 1].max()) + 1
    # the deepest VGG taps need >= 32 px; with crop_bucket > 0 additionally
    # round the crop up to a bucket multiple so the eval executable is
    # shared across images (expansion area is zero in both pred and gt
    # canvases, identical for every candidate, so within-image ranking is
    # preserved to first order — the CX loss's normalized matching can in
    # principle rescale near-tie distances through boundary receptive
    # fields). crop_bucket=0 keeps the tight (>=32 px) bbox. The crop is
    # clamped to the TIGHT image dims so bucketing never reads past the
    # per-image region on a suite canvas.
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
    val_j = jnp.asarray(val.astype(np.int32))

    chunk = 1 << 14
    pad = (-len(val)) % chunk
    val_pad = jnp.pad(val_j, ((0, pad), (0, 0))).reshape(-1, chunk, 2)

    gt_vals = img[val_j[:, 0], val_j[:, 1]]                   # (Nv, 3)
    gt_canvas = jnp.zeros((h, w, 3)).at[val_j[:, 0], val_j[:, 1]].set(gt_vals)
    gt_crop = gt_canvas[hmin:hmax, wmin:wmax][None]
    # context for the composited 'window' score: the image itself (true
    # values at the held-out window, identical for all candidates elsewhere)
    ctx_crop = img[hmin:hmax, wmin:wmax]
    val_in_crop = (jnp.zeros((h, w, 1)).at[val_j[:, 0], val_j[:, 1]].set(1.0)
                   )[hmin:hmax, wmin:wmax]

    @jax.jit
    def eval_all(params):
        """Render the held-out region for EVERY candidate and compute all
        score components in one program (vmap over the padded candidate
        axis; one compiled executable per suite, one dispatch per image)."""
        params = _shard_cands(params)

        def one(p, ang, per):
            def body(c):
                cf = c.astype(jnp.float32)
                raw = model.apply({'params': p['mlp']}, embed_pos(cf),
                                  embed_peri(cf, ang, per))
                return render_activation(raw, cfg.normalize_type)
            out = jax.lax.map(body, val_pad).reshape(-1, 3)[:len(val)]
            pred = jnp.zeros((h, w, 3)).at[val_j[:, 0], val_j[:, 1]].set(out)
            pred_crop = pred[hmin:hmax, wmin:wmax][None]
            comp_crop = (ctx_crop * (1.0 - val_in_crop) +
                         pred_crop[0] * val_in_crop)[None]
            return {
                'lpips_bbox': jnp.mean(percep(pred_crop, gt_crop,
                                              use_robust=False)),
                'cx_bbox': contextual(pred_crop, gt_crop),
                'lpips_comp': jnp.mean(percep(comp_crop, ctx_crop[None],
                                              use_robust=False)),
                'cx_comp': contextual(comp_crop, ctx_crop[None]),
                'val_mse': jnp.mean((out - gt_vals) ** 2),
            }

        return jax.vmap(one)(params, angles, periods)

    if params_override is not None:
        # eval-only mode (parity fixtures): score the given per-candidate
        # params ({'mlp': tree with leading n_cand axis}) without fitting
        params = params_override
        assert jax.tree.leaves(params['mlp'])[0].shape[0] == n_cand, \
            'params_override must carry the padded candidate axis'
    else:
        if getattr(cfg, 'compile_ahead', True):
            # the eval program's crop shape varies per image (bucketed),
            # costing a fresh 2-7 min relay compile; warm it on the INIT
            # params (same structure) in the background while the 300-iter
            # lockstep fit runs, so the compile hides behind the fit
            import threading
            p0 = params
            threading.Thread(target=lambda: eval_all(p0),
                             daemon=True).start()
        params, _ = fit(params, opt_state, jax.random.PRNGKey(cfg.seed + 1))

    comps = {k: np.asarray(v)[:n_real]
             for k, v in jax.device_get(eval_all(params)).items()}
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
