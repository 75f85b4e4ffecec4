"""Proposal ranking on CPU with tiny budgets: the true lattice must out-rank
a wrong one, and run_search must write a consumable odgt."""
import json
import os

import numpy as np
import pytest


def synth(h=64, w=72, py=12.0, px=16.0):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    img = np.stack([0.5 + 0.45 * np.sin(2 * np.pi * yy / py),
                    0.5 + 0.45 * np.cos(2 * np.pi * xx / px),
                    0.5 + 0.2 * np.sin(2 * np.pi * (yy / py + xx / px))], -1)
    return np.clip(img, 0, 1)


def test_rank_proposals_prefers_true_lattice():
    import jax
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.ranking import rank_proposals

    cfg = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=128,
                  N_iters=120)
    img = synth()
    h, w = img.shape[:2]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    val_mask = (yy > 24) & (yy < 40) & (xx > 28) & (xx < 44)
    i_val = np.stack(np.nonzero(val_mask), 1)
    i_train = np.stack(np.nonzero(~val_mask), 1)

    # pairing convention: angle 90 selects the x projection, so it pairs
    # with the x period (reference: feature_searching.py:143-155)
    angles = [[90.0, 180.0], [90.0, 180.0]]
    periods = [[16.0, 12.0], [7.0, 5.0]]   # true vs wrong
    d = rank_proposals(cfg, img, i_train, i_val, angles, periods,
                       LPIPS(net='vgg'), ContextualLoss(use_vgg=True))
    assert d.shape == (2,)
    assert d[0] < d[1], f'true lattice should score lower: {d}'


def test_run_search_e2e_writes_consumable_odgt(tmp_path):
    import cv2
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.proposal.search import run_search

    img = synth(80, 88)
    mask = np.ones(img.shape[:2])
    mask[30:40, 34:46] = 0
    d = tmp_path / 'in' / 'ex1'
    os.makedirs(d)
    cv2.imwrite(str(d / 'gt_img.png'), np.uint8(img[..., ::-1] * 255))
    cv2.imwrite(str(d / 'masked_img.png'),
                np.uint8((img * mask[..., None])[..., ::-1] * 255))
    cv2.imwrite(str(d / 'unknown_mask.png'), np.uint8(mask * 255))
    cv2.imwrite(str(d / 'valid_mask.png'),
                np.uint8(np.ones(img.shape[:2]) * 255))

    cfg = replace(SearchConfig(), datadir=str(d), outdir=str(tmp_path / 'det'),
                  netdepth=2, netwidth=32, N_rand=128, N_iters=60,
                  search_range=(2, 6, 2))
    odgt = run_search(cfg)
    out_dir = str(tmp_path / 'det' / 'ex1')
    assert os.path.exists(os.path.join(out_dir, 'config.odgt'))
    assert os.path.exists(os.path.join(out_dir, 'reg_img_0.png'))
    rec = json.loads(open(os.path.join(out_dir, 'config.odgt')).readline())
    assert len(rec['selected_periods']) >= 1
    assert rec['distances'] == sorted(rec['distances'])
    # detected displacement should land near the synthetic lattice
    best = np.asarray(rec['selected_shifts'][0])
    for s in best:
        dx, dy = s
        assert abs(dx / 16.0 - round(dx / 16.0)) < 0.3 or \
            abs(dy / 12.0 - round(dy / 12.0)) < 0.3


def test_rank_padding_and_crop_bucket_invariance():
    """Static-shape knobs (rank_pad_candidates, crop_bucket) must not change
    the returned distances' ordering or count vs the unpadded path."""
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.ranking import rank_proposals

    img = synth()
    h, w = img.shape[:2]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    val_mask = (yy > 24) & (yy < 40) & (xx > 28) & (xx < 44)
    i_val = np.stack(np.nonzero(val_mask), 1)
    i_train = np.stack(np.nonzero(~val_mask), 1)
    angles = [[90.0, 180.0], [90.0, 180.0], [90.0, 180.0]]
    periods = [[16.0, 12.0], [7.0, 5.0], [11.0, 23.0]]
    percep, cx = LPIPS(net='vgg'), ContextualLoss(use_vgg=True)

    base = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=128,
                   N_iters=40)
    d_plain = rank_proposals(replace(base, rank_pad_candidates=0,
                                     crop_bucket=0),
                             img, i_train, i_val, angles, periods, percep, cx)
    d_padded = rank_proposals(replace(base, rank_pad_candidates=9,
                                      crop_bucket=64),
                              img, i_train, i_val, angles, periods, percep, cx)
    assert d_plain.shape == d_padded.shape == (3,)
    # padded fit is bit-identical per candidate (same init, same batches);
    # only the eval crop differs (bucketed), which preserves ordering
    assert list(np.argsort(d_plain)) == list(np.argsort(d_padded))


def test_cx_mask_pad_reduces_bucket_sensitivity():
    """cfg.cx_mask_pad excludes the bucketed crop's zero expansion from the
    bbox CX match. Ordering safety is about MARGINS: a bucket-induced shift
    common to all candidates cannot flip near-ties, only candidate-relative
    drift can. Masking must shrink the pairwise-margin drift between the
    tight and bucketed crops (the residual is deep-layer boundary receptive
    fields only — measured here: masking makes the absolute drift nearly
    constant across candidates while the unmasked drift varies 3x), and the
    masked ordering must match the tight ordering."""
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.ranking import rank_proposals

    img = synth()
    h, w = img.shape[:2]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    val_mask = (yy > 24) & (yy < 40) & (xx > 28) & (xx < 44)
    i_val = np.stack(np.nonzero(val_mask), 1)
    i_train = np.stack(np.nonzero(~val_mask), 1)
    angles = [[90.0, 180.0], [90.0, 180.0], [90.0, 180.0]]
    periods = [[16.0, 12.0], [7.0, 5.0], [11.0, 23.0]]
    percep, cx = LPIPS(net='vgg'), ContextualLoss(use_vgg=True)
    base = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=128,
                   N_iters=40, rank_pad_candidates=0)

    def comps(bucket, mask):
        _, c = rank_proposals(
            replace(base, crop_bucket=bucket, cx_mask_pad=mask),
            img, i_train, i_val, angles, periods, percep, cx,
            return_components=True)
        return c['cx_bbox']

    cx_tight_m = comps(0, True)
    cx_bucket_m = comps(64, True)
    cx_tight_u = comps(0, False)
    cx_bucket_u = comps(64, False)

    def margin_drift(tight, bucket):
        """max over candidate pairs (i, j) of how much the margin
        (score_i - score_j) moves when the crop is bucketed."""
        mt = tight[:, None] - tight[None, :]
        mb = bucket[:, None] - bucket[None, :]
        return float(np.max(np.abs(mb - mt)))

    dm = margin_drift(cx_tight_m, cx_bucket_m)
    du = margin_drift(cx_tight_u, cx_bucket_u)
    assert dm < du, (dm, du, cx_tight_m, cx_bucket_m, cx_tight_u, cx_bucket_u)
    assert list(np.argsort(cx_tight_m)) == list(np.argsort(cx_bucket_m))


def test_ranking_invariant_to_suite_canvas():
    """With norm_res pinned to the tight per-image dims, the distances must
    not change when the image is padded to a larger suite canvas (round-2
    advisor finding: positional-coord normalisation leaked the override
    canvas into every candidate's embedding)."""
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.ranking import rank_proposals

    img = synth()
    h, w = img.shape[:2]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    val_mask = (yy > 24) & (yy < 40) & (xx > 28) & (xx < 44)
    i_val = np.stack(np.nonzero(val_mask), 1)
    i_train = np.stack(np.nonzero(~val_mask), 1)
    angles = [[90.0, 180.0], [90.0, 180.0]]
    periods = [[16.0, 12.0], [7.0, 5.0]]
    percep, cx = LPIPS(net='vgg'), ContextualLoss(use_vgg=True)
    cfg = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=128,
                  N_iters=30)

    d_tight = rank_proposals(cfg, img, i_train, i_val, angles, periods,
                             percep, cx, norm_res=(h, w))
    img_pad = np.pad(img, ((0, 128 - h), (0, 160 - w), (0, 0)))
    d_padded = rank_proposals(cfg, img_pad, i_train, i_val, angles, periods,
                              percep, cx, norm_res=(h, w))
    np.testing.assert_allclose(d_tight, d_padded, rtol=2e-4, atol=2e-5)


def test_combine_scores_proxies():
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.proposal.ranking import combine_scores

    comps = {'lpips_bbox': np.array([0.1, 0.2]),
             'cx_bbox': np.array([1.0, 0.5]),
             'lpips_comp': np.array([0.05, 0.30]),
             'cx_comp': np.array([0.5, 0.25]),
             'val_mse': np.array([0.01, 0.001])}
    cfg = replace(SearchConfig(), rank_pix_weight=0.5)
    s = combine_scores(cfg, comps)
    np.testing.assert_allclose(s['reference'], 30 * comps['lpips_bbox'] +
                               1 * comps['cx_bbox'])
    np.testing.assert_allclose(s['window'], 30 * comps['lpips_comp'] +
                               1 * comps['cx_comp'])
    np.testing.assert_allclose(s['mse'], [-2.0, -3.0])
    np.testing.assert_allclose(s['heldout_mse'],
                               s['reference'] + 0.5 * s['mse'])
    # candidate 0 has worse held-out MSE: the mse proxy must flip the order
    assert np.argsort(s['mse'])[0] == 1


def test_detection_independent_of_ranking_canvas(tmp_path, monkeypatch):
    """canvas_override must affect ONLY the ranking canvas: the detection
    stage sees the tight per-image canvas either way (the reference derives
    shift ranges from image dims, feature_searching.py:267-277 — a suite
    canvas would admit degenerate near-canvas-size lattices)."""
    import cv2
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.proposal import search as search_mod

    img = synth(80, 88)
    mask = np.ones(img.shape[:2])
    d = tmp_path / 'in' / 'ex1'
    os.makedirs(d)
    cv2.imwrite(str(d / 'gt_img.png'), np.uint8(img[..., ::-1] * 255))
    cv2.imwrite(str(d / 'masked_img.png'), np.uint8(img[..., ::-1] * 255))
    cv2.imwrite(str(d / 'unknown_mask.png'), np.uint8(mask * 255))
    cv2.imwrite(str(d / 'valid_mask.png'), np.uint8(mask * 255))

    seen = []
    real = search_mod.search_periodicity_by_feat

    def spy(img_u8, mask_u8, **kw):
        seen.append(img_u8.shape)
        return real(img_u8, mask_u8, **kw)

    monkeypatch.setattr(search_mod, 'search_periodicity_by_feat', spy)
    cfg = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=64,
                  N_iters=4, datadir=str(d), outdir=str(tmp_path / 'det'),
                  canvas_override=(192, 256))
    search_mod.run_search(cfg)
    # detection ran at the tight (canvas_multiple) canvas, not the override
    assert seen == [(128, 128, 3)]


def test_pseudo_split_independent_of_ranking_canvas(tmp_path, monkeypatch):
    """The pseudo train/val split must be computed on the per-image canvas:
    find_mask_centroid's separation threshold scales with min(H, W), so a
    suite-wide override canvas would degrade the held-out windows for
    smaller images (round-2 review finding)."""
    import cv2
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.proposal import search as search_mod

    img = synth(80, 88)
    mask = np.ones(img.shape[:2])
    d = tmp_path / 'in' / 'ex1'
    os.makedirs(d)
    cv2.imwrite(str(d / 'gt_img.png'), np.uint8(img[..., ::-1] * 255))
    cv2.imwrite(str(d / 'masked_img.png'), np.uint8(img[..., ::-1] * 255))
    cv2.imwrite(str(d / 'unknown_mask.png'), np.uint8(mask * 255))
    cv2.imwrite(str(d / 'valid_mask.png'), np.uint8(mask * 255))

    captured = {}
    real = search_mod.build_pseudo_split

    def spy(unknown, valid):
        captured['canvas'] = unknown.shape[:2]
        out = real(unknown, valid)
        captured['i_val'] = out[2].copy()
        return out

    monkeypatch.setattr(search_mod, 'build_pseudo_split', spy)
    base = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=64,
                   N_iters=4, datadir=str(d))
    search_mod.run_search(replace(base, outdir=str(tmp_path / 'det_a'),
                                  canvas_override=(256, 320)))
    a_canvas, a_val = captured['canvas'], captured['i_val']
    search_mod.run_search(replace(base, outdir=str(tmp_path / 'det_b')))
    b_canvas, b_val = captured['canvas'], captured['i_val']

    assert a_canvas == b_canvas == (128, 128)  # per-image, never the override
    np.testing.assert_array_equal(a_val, b_val)


def test_rank_proposals_suite_matches_sequential():
    """ONE lockstep (images, candidates) fit must reproduce each image's
    sequential ranking: same key chain, per-image pools/normalisation as
    arguments, Adam elementwise => independent slots (VERDICT round-3 #1)."""
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.proposal.ranking import rank_proposals, rank_proposals_suite

    cfg = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=128,
                  N_iters=40)
    percep, cx = LPIPS(net='vgg'), ContextualLoss(use_vgg=True)

    imgs = [synth(64, 72), synth(64, 88, py=9.0, px=21.0)]
    items, seq = [], []
    shared = (64, 88)
    for img in imgs:
        h, w = img.shape[:2]
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
        val_mask = (yy > 24) & (yy < 40) & (xx > 28) & (xx < 44)
        i_val = np.stack(np.nonzero(val_mask), 1)
        i_train = np.stack(np.nonzero(~val_mask), 1)
        angles = [[90.0, 180.0], [90.0, 180.0], [90.0, 180.0]]
        periods = [[16.0, 12.0], [7.0, 5.0], [11.0, 23.0]]
        d = rank_proposals(cfg, img, i_train, i_val, angles, periods,
                           percep, cx, norm_res=(h, w))
        seq.append(d)
        pad = np.pad(img, ((0, shared[0] - h), (0, shared[1] - w), (0, 0)))
        items.append({'masked_img': pad, 'i_train': i_train, 'i_val': i_val,
                      'all_angles': angles, 'all_periods': periods,
                      'norm_res': (h, w)})

    ranked = rank_proposals_suite(cfg, items, percep, cx)
    assert len(ranked) == 2
    for (d_b, _), d_s in zip(ranked, seq):
        np.testing.assert_allclose(d_b, d_s, rtol=2e-3, atol=2e-4)
        assert list(np.argsort(d_b)) == list(np.argsort(d_s))


def test_run_search_suite_matches_run_search(tmp_path):
    """run_search_suite must produce the same odgt top-K as per-image
    run_search (suite-canvas padding provably distance-invariant)."""
    import cv2
    import json
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.proposal.search import run_search, run_search_suite

    names = ['ex1', 'ex2']
    specs = [(80, 88, 12.0, 16.0), (72, 96, 10.0, 18.0)]
    for name, (h, w, py, px) in zip(names, specs):
        img = synth(h, w, py=py, px=px)
        mask = np.ones(img.shape[:2])
        mask[30:40, 34:46] = 0
        d = tmp_path / 'in' / name
        os.makedirs(d)
        cv2.imwrite(str(d / 'gt_img.png'), np.uint8(img[..., ::-1] * 255))
        cv2.imwrite(str(d / 'masked_img.png'),
                    np.uint8((img * mask[..., None])[..., ::-1] * 255))
        cv2.imwrite(str(d / 'unknown_mask.png'), np.uint8(mask * 255))
        cv2.imwrite(str(d / 'valid_mask.png'),
                    np.uint8(np.ones(img.shape[:2]) * 255))

    base = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=128,
                   N_iters=30, search_range=(2, 6, 2))
    seq_odgts = [run_search(replace(base, datadir=str(tmp_path / 'in' / n),
                                    outdir=str(tmp_path / 'det_seq')))
                 for n in names]
    bat_odgts = run_search_suite(
        [replace(base, datadir=str(tmp_path / 'in' / n),
                 outdir=str(tmp_path / 'det_bat')) for n in names])
    for n, s, b in zip(names, seq_odgts, bat_odgts):
        assert s['selected_periods'][:3] == b['selected_periods'][:3], n
        assert s['selected_angles'][:3] == b['selected_angles'][:3], n
        np.testing.assert_allclose(s['distances'], b['distances'],
                                   rtol=2e-3, atol=2e-4)
        # the batched odgt must be loadable from disk like the sequential
        rec = json.loads(open(os.path.join(
            str(tmp_path / 'det_bat'), n, 'config.odgt')).readline())
        assert len(rec['selected_periods']) >= 1
