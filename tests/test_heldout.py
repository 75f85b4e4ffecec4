"""Held-out synthetic validation holes + best-snapshot selection
(npp_tpu/models/heldout.py; cfg.comp_heldout / cfg.comp_snapshot)."""
import numpy as np
import pytest

from tests.test_e2e_completion import example_dir  # noqa: F401 (fixture)


def _toy_masks(h=48, w=56, hole=(18, 26, 20, 32)):
    known = np.ones((h, w))
    y0, y1, x0, x1 = hole
    known[y0:y1, x0:x1] = 0
    holem = 1 - known
    return known, holem


def test_plan_rects_lattice_aligned():
    from npp_tpu.models.heldout import plan_heldout_rects

    known, hole = _toy_masks()
    s1 = np.array([0.0, 14.0])   # (dy, dx)
    s2 = np.array([12.0, 0.0])
    rects = plan_heldout_rects(known, hole, s1, s2, n_blocks=2)
    assert len(rects) == 2
    cy, cx = (18 + 26) // 2, (20 + 32) // 2
    for (y0, x0, hh, ww) in rects:
        # fully inside the known region
        assert known[y0:y0 + hh, x0:x0 + ww].all()
        # centre is an integer lattice translate of the hole centre
        dy = y0 + hh / 2 - cy
        dx = x0 + ww / 2 - cx
        # solve dy,dx = i*s1 + j*s2 -> i = dx/14, j = dy/12 here
        i, j = dx / 14.0, dy / 12.0
        assert abs(i - round(i)) < 0.1 and abs(j - round(j)) < 0.1, (dy, dx)
    # no mutual overlap
    (a, b) = rects
    assert (a[0] + a[2] <= b[0] or b[0] + b[2] <= a[0] or
            a[1] + a[3] <= b[1] or b[1] + b[3] <= a[1])


def test_plan_rects_none_placeable():
    from npp_tpu.models.heldout import plan_heldout_rects

    # everything unknown except the hole's immediate ring: nothing fits
    known, hole = _toy_masks()
    known[:] = 0
    rects = plan_heldout_rects(known, hole, np.array([0.0, 14.0]),
                               np.array([12.0, 0.0]), n_blocks=1)
    assert rects == []


def test_carve_heldout_semantics(example_dir, tmp_path):  # noqa: F811
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.heldout import carve_heldout, heldout_coords
    from npp_tpu.models.loaders import load_completion

    cfg = replace(CompletionConfig(), datadir=example_dir,
                  comp_heldout=2, comp_snapshot='best')
    data = load_completion(cfg)
    fit = carve_heldout(data, cfg)
    assert fit is not data and 'heldout_mask' in fit.extra

    hm = fit.extra['heldout_mask'][..., 0] > 0.5
    hc = heldout_coords(fit)
    assert hc is not None and len(hc) == hm.sum()
    # carved out of the known mask and the fit image
    assert (fit.mask[..., 0][hm] == 0).all()
    assert (fit.masked_img[hm] == 0).all()
    # original content preserved for the criterion
    np.testing.assert_array_equal(fit.extra['heldout_gt'], data.masked_img)
    assert (data.masked_img[hm] != 0).any()
    # train pool excludes, val pool includes, the held-out pixels
    tset = {tuple(c) for c in fit.i_train}
    vset = {tuple(c) for c in fit.i_val}
    hset = {tuple(c) for c in hc}
    assert not (tset & hset)
    assert hset <= vset
    # the real hole is untouched
    real_hole = ((1 - data.mask) * data.valid_mask)[..., 0] > 0.5
    assert not (hm & real_hole).any()
    # deterministic (pure function of data + cfg)
    fit2 = carve_heldout(data, cfg)
    assert fit.extra['heldout_rects'] == fit2.extra['heldout_rects']


def test_carve_heldout_off_is_identity(example_dir):  # noqa: F811
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.heldout import carve_heldout
    from npp_tpu.models.loaders import load_completion

    cfg = replace(CompletionConfig(), datadir=example_dir)
    assert cfg.comp_heldout == 0   # reference-faithful default
    data = load_completion(cfg)
    assert carve_heldout(data, cfg) is data


def test_heldout_psnr_orders_quality(example_dir):  # noqa: F811
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.heldout import carve_heldout, heldout_psnr
    from npp_tpu.models.loaders import load_completion

    cfg = replace(CompletionConfig(), datadir=example_dir, comp_heldout=1)
    data = load_completion(cfg)
    fit = carve_heldout(data, cfg)
    perfect = data.masked_img.astype(np.float64)
    noisy = np.clip(perfect + 0.1, 0, 1)
    assert heldout_psnr(perfect, fit) > heldout_psnr(noisy, fit) + 10


def test_run_completion_snapshot_best(example_dir, tmp_path):  # noqa: F811
    """End-to-end: snapshot selection runs, reports the selected milestone,
    emits heldout_psnr at every eval, and writes the selected final set."""
    import os

    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import run_completion

    cfg = replace(CompletionConfig(), datadir=example_dir,
                  basedir=str(tmp_path / 'out'), netwidth=48, netdepth=4,
                  N_rand=256, patch_num=1, num_real_patch_per_sample=2,
                  N_iters=61, i_testset=20, i_print=20,
                  use_perceptual_loss=False,
                  comp_heldout=1, comp_snapshot='best')
    result, final, evals = run_completion(cfg, save=True)
    assert 'snapshot_iter' in final
    assert final['snapshot_iter'] in (20, 40, 60)
    for i, ev in evals.items():
        assert 'heldout_psnr' in ev, i
    # the selected snapshot's heldout score is the max over milestones
    best_ho = max(ev['heldout_psnr'] for ev in evals.values())
    assert final['heldout_psnr'] == pytest.approx(best_ho, abs=1e-6)
    name = example_dir.rstrip('/').split('/')[-1]
    d = os.path.join(str(tmp_path / 'out'), 'completion_top3', name,
                     'testset_final')
    assert os.path.exists(os.path.join(d, 'pred_rgb_img_comp.png'))
    # metrics are computed against the ORIGINAL data (real hole only)
    assert np.isfinite(final['val_psnr'])


def test_snapshot_recompose_with_adaptive_latents(example_dir, tmp_path,
                                                  monkeypatch):  # noqa: F811
    """Regression (round-4 suite crash): when an EARLIER milestone wins the
    held-out criterion, the final set is re-composed from that snapshot —
    whose stored adaptive-loss latent is a PYTREE (AdaptiveParams), not an
    ndarray. Force the earlier-milestone branch with a strictly decreasing
    held-out score."""
    import numpy as np

    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models import heldout as H
    from npp_tpu.models.completion import run_completion

    scores = iter([30.0, 20.0, 10.0, 5.0, 4.0, 3.0, 2.0])
    monkeypatch.setattr(H, 'heldout_psnr',
                        lambda pred, data: next(scores))

    cfg = replace(CompletionConfig(), datadir=example_dir,
                  basedir=str(tmp_path / 'out'), netwidth=48, netdepth=4,
                  N_rand=256, patch_num=1, num_real_patch_per_sample=2,
                  N_iters=61, i_testset=20, i_print=20,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  comp_heldout=1, comp_snapshot='best')
    assert cfg.loss_type == 'robust_loss_adaptive'
    result, final, evals = run_completion(cfg, save=False)
    assert final['snapshot_iter'] == 20
    assert np.isfinite(final['img_train_loss'])
    assert np.isfinite(final['val_psnr'])
