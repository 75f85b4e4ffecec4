"""Periodicity proposal orchestrator (reference: NPP_proposal/search.py:28-285):
detect candidate periodicities, rank them by light-model fits, write the
odgt record + lattice visualisations consumed by the task pipelines.

Two entry points:
  run_search        one image (the reference's per-image invocation);
  run_search_suite  every image of a suite through ONE lockstep ranking fit
                    over the (images, candidates) grid — the reference loops
                    images sequentially via run_*.sh; here the per-image
                    detection + pseudo-split stay host-side per image (they
                    are cheap and their FFT sizes are per-image exact) and
                    only the fit, the dominant wall, batches.
"""
from __future__ import annotations

import os
import sys
import time
from typing import Optional

import numpy as np

from ..losses.contextual import ContextualLoss
from ..losses.lpips import LPIPS
from ..utils.io import read_example_dir, write_odgt, write_rgb, write_gray
from ..utils.visualizer import GridProgram, mask2ltrb
from .pseudo_mask import build_pseudo_split
from .search_engine import search_periodicity_by_feat


def _backend_probe() -> float:
    """Force backend init up front and return its wall: on the shared-pool
    relay the first device op waits for the pool GRANT, which varies by
    minutes across sessions and would otherwise be misattributed to
    detection compute in the phase report."""
    t0 = time.time()
    import jax
    jax.block_until_ready(jax.jit(lambda a: a + 1.0)(jax.numpy.zeros(())))
    dt = time.time() - t0
    if dt > 1.0:
        print(f'[search] backend init {dt:.1f}s', file=sys.stderr, flush=True)
    return dt


def _prepare_search(cfg) -> dict:
    """Host phase of one search: read + tight-canvas pad + candidate
    detection + pseudo-split + ranking-canvas pad. Returns everything the
    ranking and the odgt writer need."""
    name = cfg.datadir.rstrip('/').split('/')[-1]
    file_dir = os.path.join(cfg.outdir, name)
    os.makedirs(file_dir, exist_ok=True)

    data = read_example_dir(cfg.datadir)
    masked_img = data['masked_img']
    gt_img = data['gt_img']
    unknown_mask = data['unknown_mask']
    valid_mask = data['valid_mask']

    # Two canvases:
    #  - DETECTION runs on the tight per-image canvas (canvas_multiple
    #    rounding only): the reference derives its shift search ranges from
    #    the image dimensions (feature_searching.py:267-277), so padding to
    #    a suite-wide canvas would inflate the candidate space and admit
    #    degenerate near-canvas-size lattices;
    #  - RANKING pads to cfg.canvas_override when set, so the 300-iter fit
    #    and eval executables are shared by every image of a suite.
    oh, ow = masked_img.shape[:2]
    m = getattr(cfg, 'canvas_multiple', 0)
    dh, dw = (-(-oh // m) * m, -(-ow // m) * m) if m else (oh, ow)
    if (dh, dw) != (oh, ow):
        pad3 = ((0, dh - oh), (0, dw - ow), (0, 0))
        masked_img = np.pad(masked_img, pad3)
        unknown_mask = np.pad(unknown_mask, pad3)
        valid_mask = np.pad(valid_mask, pad3)

    # ---- candidate detection (reference: loaders.py:28-32)
    from ..utils.aot import cache_dir_from
    all_angles, all_periods, all_shifts = search_periodicity_by_feat(
        np.uint8(masked_img * 255),
        np.uint8(valid_mask * unknown_mask)[..., 0],
        repeat_range=cfg.search_range, edge_searching=cfg.edge_searching,
        gray_only=cfg.gray_only, aot_dir=cache_dir_from(cfg))

    if not all_angles:
        raise RuntimeError(f'no periodicity candidates found for {name}')

    # ---- pseudo-mask split (reference: loaders.py:34-54). Computed BEFORE
    # the ranking-canvas pad: find_mask_centroid's separation threshold
    # scales with min(H, W) (pseudo_mask.py:19), so the split must see the
    # per-image canvas or small images on a large suite canvas would get
    # fewer/degenerate held-out windows. Coordinates stay valid afterwards
    # because the override pad only appends rows/columns.
    _, i_train, i_val = build_pseudo_split(unknown_mask, valid_mask)

    # ---- pad further to the suite-wide ranking canvas
    override = tuple(getattr(cfg, 'canvas_override', ()) or ())
    if override and (override[0] < dh or override[1] < dw):
        print(f'[search] canvas_override {override} smaller than image '
              f'({dh}x{dw}); keeping the per-image canvas')
        override = ()
    if override:
        pad3 = ((0, override[0] - dh), (0, override[1] - dw), (0, 0))
        masked_img = np.pad(masked_img, pad3)
        unknown_mask = np.pad(unknown_mask, pad3)
        valid_mask = np.pad(valid_mask, pad3)

    return {
        'cfg': cfg, 'name': name, 'file_dir': file_dir,
        'masked_img': masked_img, 'gt_img': gt_img,
        'unknown_mask': unknown_mask, 'valid_mask': valid_mask,
        'oh': oh, 'ow': ow, 'dh': dh, 'dw': dw,
        'all_angles': all_angles, 'all_periods': all_periods,
        'all_shifts': all_shifts, 'i_train': i_train, 'i_val': i_val,
    }


def _finish_search(prep: dict, distances: np.ndarray, rank_comps: dict
                   ) -> dict:
    """Build + write the odgt record and lattice visualisations
    (reference: search.py:221-280) from the ranking outputs."""
    from .ranking import combine_scores
    cfg = prep['cfg']
    file_dir = prep['file_dir']
    all_angles, all_periods = prep['all_angles'], prep['all_periods']
    all_shifts = prep['all_shifts']
    scores = combine_scores(cfg, rank_comps)

    k = min(cfg.topk_detection, len(distances))
    order = np.argsort(distances, kind='stable')[:k]

    best_shifts = [[list(map(float, all_shifts[i][j])) for j in range(2)]
                   for i in order]
    best_periods = [list(map(float, all_periods[i])) for i in order]
    best_angles = [list(map(float, all_angles[i])) for i in order]

    odgt = {
        'fpath_masked_img': f'{file_dir}/masked_img.png',
        'fpath_valid_mask': f'{file_dir}/valid_mask.png',
        'fpath_mask': f'{file_dir}/unknown_mask.png',
        'fpath_gt_img': f'{file_dir}/gt_img.png',
        'selected_angles': best_angles,
        'selected_periods': best_periods,
        'selected_shifts': best_shifts,
        'search_range': list(cfg.search_range),
        'epoch': cfg.N_iters,
        'distances': [float(distances[i]) for i in order],
        # aux rank-gating always uses the reference-proxy distances (their
        # ratios are the calibrated gate scale; other proxies can be
        # negative, see loaders._topk_periodicity)
        'distances_gate': [float(scores['reference'][i]) for i in order],
        'rank_proxy': getattr(cfg, 'rank_proxy', 'reference'),
        # every candidate's lattice + every proxy's score, in detection
        # order: enables offline proxy sweeps without re-running the search
        'rank_candidates': {
            'angles': [list(map(float, a)) for a in all_angles],
            'periods': [list(map(float, p)) for p in all_periods],
            'shifts': [[list(map(float, all_shifts[i][j])) for j in range(2)]
                       for i in range(len(all_shifts))],
            'scores': {name: [float(x) for x in s]
                       for name, s in scores.items()},
            'components': {name: [float(x) for x in c]
                           for name, c in rank_comps.items()},
        },
    }

    # ---- lattice visualisations (reference: search.py:249-269)
    # crop the padded canvas back before writing artefacts
    oh, ow = prep['oh'], prep['ow']
    masked_img = prep['masked_img'][:oh, :ow]
    unknown_mask = prep['unknown_mask'][:oh, :ow]
    valid_mask = prep['valid_mask'][:oh, :ow]
    ltrb = mask2ltrb(valid_mask[..., 0])
    vis_img = np.uint8(masked_img * 255)
    for i in range(k):
        vis = GridProgram(resolution=vis_img.shape[:2], base_point=ltrb[:2],
                          first_shift=best_shifts[i][0],
                          second_shift=best_shifts[i][1])
        reg_img, _ = vis.draw(vis_img.copy(), color=(255, 255, 0))
        write_rgb(os.path.join(file_dir, f'reg_img_{i}.png'), reg_img / 255.0)
        odgt[f'fpath_reg_img_{i}'] = f'{file_dir}/reg_img_{i}.png'

    write_gray(os.path.join(file_dir, 'valid_mask.png'), valid_mask)
    write_gray(os.path.join(file_dir, 'unknown_mask.png'), unknown_mask)
    write_rgb(os.path.join(file_dir, 'masked_img.png'), masked_img)
    write_rgb(os.path.join(file_dir, 'gt_img.png'), prep['gt_img'])
    write_odgt(file_dir, odgt)
    print(f'[search] wrote {file_dir}/config.odgt', flush=True)
    return odgt


def run_search(cfg, percep: Optional[LPIPS] = None,
               contextual: Optional[ContextualLoss] = None) -> dict:
    t_start = time.time()
    _backend_probe()
    t_backend = time.time()

    prep = _prepare_search(cfg)
    t_detect = time.time()
    print(f'[search] {len(prep["all_angles"])} candidates detected '
          f'({t_detect - t_start:.1f}s)')

    # ---- ranking (reference: search.py:78-219)
    if percep is None:
        percep = LPIPS(net='vgg')
    if contextual is None:
        contextual = ContextualLoss(use_vgg=True)
    from .ranking import rank_proposals
    distances, rank_comps = rank_proposals(
        cfg, prep['masked_img'], prep['i_train'], prep['i_val'],
        prep['all_angles'], prep['all_periods'], percep, contextual,
        norm_res=(prep['dh'], prep['dw']), return_components=True)
    t_rank = time.time()

    odgt = _finish_search(prep, distances, rank_comps)
    t_end = time.time()
    print(f'[search] phases: backend={t_backend - t_start:.1f}s '
          f'detect={t_detect - t_backend:.1f}s '
          f'rank={t_rank - t_detect:.1f}s artefacts={t_end - t_rank:.1f}s '
          f'total={t_end - t_start:.1f}s', file=sys.stderr, flush=True)
    return odgt


def run_search_suite(cfgs, percep: Optional[LPIPS] = None,
                     contextual: Optional[ContextualLoss] = None,
                     mesh=None, images_axis: str = 'images') -> list:
    """Search every image of a suite with ONE lockstep ranking fit
    (proposal/ranking.py::rank_proposals_suite). Detection, pseudo-split and
    odgt writing stay per-image (host-side, cheap, per-image-exact FFT
    sizes — batching detection would change FFT sizes and so candidate
    near-tie orderings for ms of gain; see BASELINE.md round 4).

    The images must share a ranking canvas: when cfg.canvas_override is not
    set (or does not cover every image), all images are padded to the
    elementwise max of their tight canvases — a pure pad that provably does
    not change any image's distances (positional normalisation is pinned to
    the tight dims; tests/test_ranking.py::test_ranking_invariant_to_suite_canvas).

    Returns odgt dicts in cfg order.
    """
    t_start = time.time()
    _backend_probe()
    t_backend = time.time()

    preps = [_prepare_search(cfg) for cfg in cfgs]
    t_detect = time.time()

    # unify the ranking canvas across the suite
    hmax = max(p['masked_img'].shape[0] for p in preps)
    wmax = max(p['masked_img'].shape[1] for p in preps)
    for p in preps:
        h, w = p['masked_img'].shape[:2]
        if (h, w) != (hmax, wmax):
            pad3 = ((0, hmax - h), (0, wmax - w), (0, 0))
            p['masked_img'] = np.pad(p['masked_img'], pad3)
            p['unknown_mask'] = np.pad(p['unknown_mask'], pad3)
            p['valid_mask'] = np.pad(p['valid_mask'], pad3)

    if percep is None:
        percep = LPIPS(net='vgg')
    if contextual is None:
        contextual = ContextualLoss(use_vgg=True)
    from .ranking import rank_proposals_suite
    items = [{'masked_img': p['masked_img'], 'i_train': p['i_train'],
              'i_val': p['i_val'], 'all_angles': p['all_angles'],
              'all_periods': p['all_periods'],
              'norm_res': (p['dh'], p['dw'])} for p in preps]
    ranked = rank_proposals_suite(cfgs[0], items, percep, contextual,
                                  mesh=mesh, images_axis=images_axis)
    t_rank = time.time()

    odgts = [_finish_search(p, d, c) for p, (d, c) in zip(preps, ranked)]
    t_end = time.time()
    print(f'[search-suite] {len(cfgs)} images: '
          f'backend={t_backend - t_start:.1f}s '
          f'detect={t_detect - t_backend:.1f}s '
          f'rank={t_rank - t_detect:.1f}s artefacts={t_end - t_rank:.1f}s '
          f'total={t_end - t_start:.1f}s', file=sys.stderr, flush=True)
    return odgts
