"""SLIC, superpixel stats, and coarse-pipeline behaviour tests."""
import numpy as np
import pytest


def test_rgb2lab_reference_values():
    from npp_tpu.segmentation.slic import rgb2lab
    import jax.numpy as jnp
    # white -> L=100, a=b=0; black -> 0
    lab = np.asarray(rgb2lab(jnp.asarray([[[1.0, 1.0, 1.0], [0, 0, 0]]])))
    np.testing.assert_allclose(lab[0, 0], [100, 0, 0], atol=0.1)
    np.testing.assert_allclose(lab[0, 1], [0, 0, 0], atol=0.1)
    # pure red (sRGB) ~ L=53.24, a=80.09, b=67.2
    lab = np.asarray(rgb2lab(jnp.asarray([[[1.0, 0.0, 0.0]]])))
    np.testing.assert_allclose(lab[0, 0], [53.24, 80.09, 67.2], atol=0.5)


def test_slic_two_tone_image():
    from npp_tpu.segmentation.slic import slic_segment
    rng = np.random.RandomState(0)
    img = rng.rand(60, 80, 3) * 0.1
    img[:, 40:] += 0.8
    seg = slic_segment(img, sp_size=15, relative_compact=0.2)
    assert seg.shape == (60, 80)
    assert seg.min() >= 1
    assert 5 <= len(np.unique(seg)) <= 40
    # no superpixel should straddle the strong vertical boundary badly:
    # check labels on far left never appear on far right
    left, right = set(np.unique(seg[:, :20])), set(np.unique(seg[:, 60:]))
    assert not (left & right)


def test_slic_masked():
    from npp_tpu.segmentation.slic import slic_segment
    rng = np.random.RandomState(0)
    img = rng.rand(50, 50, 3)
    mask = np.zeros((50, 50), bool)
    mask[10:40, 10:40] = True
    seg = slic_segment(img, sp_size=10, relative_compact=0.2, mask=mask)
    assert (seg[~mask] == 0).all()
    assert seg[mask].min() >= 1


def test_superpixel_stats_order_and_values():
    from npp_tpu.segmentation.features import superpixel_color_stats
    img = np.zeros((4, 4, 3))
    img[:, :2] = [1.0, 2.0, 3.0]
    seg = np.zeros((4, 4), int)
    seg[:, 2:] = 1
    f = superpixel_color_stats(img, seg)
    assert f.shape == (2, 9)
    np.testing.assert_allclose(f[0, :3], [1, 2, 3])   # mean
    np.testing.assert_allclose(f[1, :3], [0, 0, 0])
    np.testing.assert_allclose(f[0, 3:6], [1, 2, 3])  # median
    

def test_adjacency_edges():
    from npp_tpu.segmentation.features import segment_adjacency_edges
    seg = np.array([[0, 0, 1, 1], [2, 2, 3, 3]])
    e = segment_adjacency_edges(seg)
    assert {tuple(x) for x in e.tolist()} == {(0, 1), (0, 2), (1, 3), (2, 3)}


def test_coarse_segment_two_tone():
    from npp_tpu.segmentation.coarse import coarse_segment
    rng = np.random.RandomState(0)
    img = (rng.rand(80, 100, 3) * 0.2 * 255)
    img[:, 50:] += 0.7 * 255
    seg = coarse_segment(np.uint8(img), np.ones((80, 100), bool),
                         nb_classes=2, sp_size=15, sp_regul=0.2)
    assert seg.shape == (80, 100)
    # the two halves should (mostly) get different labels
    left = np.bincount(seg[:, :40].ravel(), minlength=2).argmax()
    right = np.bincount(seg[:, 60:].ravel(), minlength=2).argmax()
    assert left != right
    acc = max(((seg[:, :40] == left).mean() + (seg[:, 60:] == right).mean()) / 2, 0)
    assert acc > 0.9


def test_remove_small_objects():
    from npp_tpu.models.segmentation import remove_small_objects
    m = np.zeros((40, 40), bool)
    m[:20, :20] = True      # 400 px, kept with min_size 300
    m[30:32, 30:32] = True  # 4 px, removed
    out = remove_small_objects(m, min_size=300)
    assert out[:20, :20].all()
    assert not out[30:32, 30:32].any()


def test_refinement_autocalibration():
    """With fallback (random) LPIPS towers, the spatial maps are rescaled per
    image so the reference thresholds remain discriminative: a region whose
    reconstruction error is much higher than the periodic region's must be
    flagged non-periodic."""
    import types
    import numpy as np
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.segmentation import refine_segmentation
    from npp_tpu.config import SegmentationConfig, replace

    rng = np.random.RandomState(0)
    h, w = 96, 96
    blur = rng.rand(h, w, 3) * 0.05 + 0.5
    pred = blur.copy()
    pred[30:80, 30:80] += rng.rand(50, 50, 3) * 0.6  # badly-reconstructed block
    mask = np.ones((h, w, 1))
    non_period = np.zeros((h, w, 1))
    non_period[20:90, 20:90] = 1
    data = TaskData(img=blur, masked_img=blur, mask=mask,
                    valid_mask=np.ones((h, w, 1)),
                    i_train=np.zeros((1, 2), int), i_val=np.zeros((1, 2), int),
                    selected_shifts=[], selected_angles=[], selected_periods=[],
                    patch_size=16,
                    extra={'blur_img': blur, 'non_period_mask': non_period})
    cfg = SegmentationConfig()
    res = refine_segmentation(cfg, data, pred, LPIPS(net='alex'))
    frac = res['non_period_mask'].mean()
    assert frac > 0.05, f'badly-fit block should be flagged, got {frac}'
    # and the well-fit outside region should mostly stay periodic
    assert res['non_period_mask'][:15].mean() < 0.2


def test_color_criterion_catches_isoluminant_anomaly():
    """cfg.seg_color_criterion=True must flag a grayscale-isoluminant color
    anomaly that the reference's grayscale L1 criterion cannot see
    (round-2 measured failure: planted green blob halved refined IoU);
    with the option off, behaviour stays reference-identical."""
    import numpy as np
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.segmentation import _GRAY, refine_segmentation
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.config import SegmentationConfig, replace

    rng = np.random.RandomState(0)
    h, w = 96, 96
    blur = rng.rand(h, w, 3) * 0.05 + 0.5
    pred = blur.copy()
    # isoluminant color shift: +d on G, compensated on R/B so gray delta ~ 0
    d = 0.25
    shift = np.array([-d * _GRAY[1] / (_GRAY[0] + _GRAY[2]), d,
                      -d * _GRAY[1] / (_GRAY[0] + _GRAY[2])])
    pred[30:70, 30:70] += shift
    gray_delta = np.abs((pred - blur) @ _GRAY)
    assert gray_delta.max() < 0.02  # genuinely isoluminant

    mask = np.ones((h, w, 1))
    non_period = np.zeros((h, w, 1))
    non_period[20:90, 20:90] = 1
    data = TaskData(img=blur, masked_img=blur, mask=mask,
                    valid_mask=np.ones((h, w, 1)),
                    i_train=np.zeros((1, 2), int), i_val=np.zeros((1, 2), int),
                    selected_shifts=[], selected_angles=[],
                    selected_periods=[], patch_size=16,
                    extra={'blur_img': blur, 'non_period_mask': non_period})
    lp = LPIPS(net='alex')
    res_gray = refine_segmentation(SegmentationConfig(), data, pred, lp)
    res_color = refine_segmentation(
        replace(SegmentationConfig(), seg_color_criterion=True),
        data, pred, lp)
    blob = res_color['l1_img'][35:65, 35:65]
    assert (blob > SegmentationConfig().l1_thresh).mean() > 0.9
    # grayscale criterion is blind to the blob
    assert (res_gray['l1_img'][35:65, 35:65] >
            SegmentationConfig().l1_thresh).mean() < 0.1


def test_refine_protect_restores_eroded_blob_keeps_removals():
    """cfg.seg_refine_protect=True (round-3 gated option): an init
    non-periodic component whose CORE still fails the criteria must be
    restored whole (the reference refinement erodes its boundary band where
    the INR partially reconstructs edges), while a component the fit fully
    explains is still removed whole. Off = reference behaviour
    (bit-identical masks)."""
    import numpy as np
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.segmentation import refine_segmentation
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.config import SegmentationConfig, replace

    rng = np.random.RandomState(1)
    h, w = 128, 128
    blur = rng.rand(h, w, 3) * 0.05 + 0.5
    pred = blur.copy()
    # blob A (init 20:80, 20:80): only its CORE still mispredicts — the
    # boundary band is reconstructed, so the reference criteria erode it
    pred[35:65, 35:65] += 0.6
    # blob B (init 20:60, 90:120): fully reconstructed -> fully removed
    non_period = np.zeros((h, w, 1))
    non_period[20:80, 20:80] = 1
    non_period[20:60, 90:120] = 1
    data = TaskData(img=blur, masked_img=blur, mask=np.ones((h, w, 1)),
                    valid_mask=np.ones((h, w, 1)),
                    i_train=np.zeros((1, 2), int), i_val=np.zeros((1, 2), int),
                    selected_shifts=[], selected_angles=[],
                    selected_periods=[], patch_size=16,
                    extra={'blur_img': blur, 'non_period_mask': non_period})
    lp = LPIPS(net='alex')
    cfg = SegmentationConfig()
    res_off = refine_segmentation(cfg, data, pred, lp)
    res_on = refine_segmentation(
        replace(cfg, seg_refine_protect=True), data, pred, lp)

    off_mask = res_off['non_period_mask'][..., 0] > 0
    on_mask = res_on['non_period_mask'][..., 0] > 0
    # reference behaviour erodes blob A's boundary band
    assert off_mask[35:65, 35:65].mean() > 0.9       # core flagged
    assert off_mask[20:80, 20:80].mean() < 0.9       # ...but band eroded
    # protect restores the WHOLE init component of blob A
    assert on_mask[20:80, 20:80].mean() > 0.99
    # blob B has no surviving evidence: removed under both settings
    assert off_mask[20:60, 90:120].mean() < 0.05
    assert on_mask[20:60, 90:120].mean() < 0.05
    # protect only ever ADDS init-mask pixels
    assert not (off_mask & ~on_mask).any()


def test_refine_protect_off_is_reference_identical():
    """seg_refine_protect default-off path must produce the identical mask
    object content as before the option existed."""
    import numpy as np
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.segmentation import refine_segmentation
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.config import SegmentationConfig, replace

    rng = np.random.RandomState(2)
    h, w = 96, 96
    blur = rng.rand(h, w, 3) * 0.05 + 0.5
    pred = blur.copy()
    pred[30:80, 30:80] += rng.rand(50, 50, 3) * 0.6
    non_period = np.zeros((h, w, 1))
    non_period[20:90, 20:90] = 1
    data = TaskData(img=blur, masked_img=blur, mask=np.ones((h, w, 1)),
                    valid_mask=np.ones((h, w, 1)),
                    i_train=np.zeros((1, 2), int), i_val=np.zeros((1, 2), int),
                    selected_shifts=[], selected_angles=[],
                    selected_periods=[], patch_size=16,
                    extra={'blur_img': blur, 'non_period_mask': non_period})
    lp = LPIPS(net='alex')
    res_default = refine_segmentation(SegmentationConfig(), data, pred, lp)
    res_explicit = refine_segmentation(
        replace(SegmentationConfig(), seg_refine_protect=False),
        data, pred, lp)
    np.testing.assert_array_equal(res_default['non_period_mask'],
                                  res_explicit['non_period_mask'])


def test_refine_hysteresis_separates_erosion_from_overshoot():
    """cfg.seg_refine_hysteresis<1 (round-3 gated option): init non-periodic
    pixels whose error sits JUST under the threshold (partially
    reconstructed blob boundary) stay non-periodic, while init pixels whose
    error is far under it (well-fit periodic overshoot of the init mask)
    are still removed. 1.0 = reference behaviour (bit-identical)."""
    import numpy as np
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.segmentation import refine_segmentation
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.config import SegmentationConfig, replace

    rng = np.random.RandomState(3)
    h, w = 128, 128
    blur = rng.rand(h, w, 3) * 0.05 + 0.5
    pred = blur.copy()
    # isolate the HYSTERESIS mechanics on the L1 criterion: the LPIPS map
    # is now the reference's all-layer sum (the round-4 parity fix), whose
    # deep-layer upsampled receptive fields bleed tens of px past the band
    # edge — a non-binding lpips_thresh (with autocal off, which would
    # rescale the map back up to it) keeps criterion 2 out of the way
    cfg = replace(SegmentationConfig(), lpips_thresh=100.0,
                  seg_autocal='off')
    # blob core: way over thresh (stays non-periodic under everything)
    pred[40:60, 40:60] += 0.6
    # boundary band: error just UNDER the l1 threshold (gray delta ~0.8*t)
    band = np.zeros((h, w), bool)
    band[30:70, 30:70] = True
    band[40:60, 40:60] = False
    pred[band] = blur[band] + 0.8 * cfg.l1_thresh  # uniform shift per channel
    # init mask: blob + band + OVERSHOOT ring with ~zero error
    non_period = np.zeros((h, w, 1))
    non_period[20:80, 20:80] = 1
    data = TaskData(img=blur, masked_img=blur, mask=np.ones((h, w, 1)),
                    valid_mask=np.ones((h, w, 1)),
                    i_train=np.zeros((1, 2), int), i_val=np.zeros((1, 2), int),
                    selected_shifts=[], selected_angles=[],
                    selected_periods=[], patch_size=16,
                    extra={'blur_img': blur, 'non_period_mask': non_period})
    lp = LPIPS(net='alex')
    res_ref = refine_segmentation(cfg, data, pred, lp)
    res_h = refine_segmentation(
        replace(cfg, seg_refine_hysteresis=0.5), data, pred, lp)
    ref_mask = res_ref['non_period_mask'][..., 0] > 0
    h_mask = res_h['non_period_mask'][..., 0] > 0
    # reference: band (error < thresh) is eroded to the core
    assert ref_mask[band].mean() < 0.1
    # hysteresis keeps the band non-periodic (error > 0.5*thresh)...
    assert h_mask[band].mean() > 0.9
    # ...but still removes the near-zero-error overshoot ring (measured on
    # ring pixels beyond the spatial-LPIPS receptive-field bleed of the
    # band edge; adjacent ring pixels legitimately inherit band error)
    ring_far = np.zeros((h, w), bool)
    ring_far[20:80, 20:80] = True
    ring_far[26:74, 26:74] = False
    assert h_mask[ring_far].mean() < 0.1
    ring = np.zeros((h, w), bool)
    ring[20:80, 20:80] = True
    ring[30:70, 30:70] = False
    assert h_mask[ring].mean() < 0.35
    # factor 1.0 is bit-identical to the reference path
    res_one = refine_segmentation(
        replace(cfg, seg_refine_hysteresis=1.0), data, pred, lp)
    np.testing.assert_array_equal(res_ref['non_period_mask'],
                                  res_one['non_period_mask'])


def test_texture_criterion_flags_smooth_region_off_path_identical():
    """cfg.seg_texture_criterion (round-5 gated option): a SMOOTH
    non-periodic region passes both render-error criteria (the INR
    renders flat content trivially well — the bundled 9f80de08
    patch-plate), so only the texture-energy cue can flag it. The cue is
    additive only and off by default (bit-identical reference path)."""
    import numpy as np
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.segmentation import refine_segmentation
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.config import SegmentationConfig, replace

    rng = np.random.RandomState(5)
    h, w = 128, 128
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    # textured periodic background (period 8, strong local std)
    blur = (0.5 + 0.2 * np.sin(2 * np.pi * xx / 8)
            + 0.15 * np.sin(2 * np.pi * yy / 8))[..., None] \
        * np.ones(3) + rng.rand(h, w, 3) * 0.02
    # smooth plate: constant patch, rendered PERFECTLY by the fit
    plate = np.zeros((h, w), bool)
    plate[40:90, 50:110] = True
    blur[plate] = 0.55
    pred = blur.copy()   # zero render error everywhere -> criteria see nothing
    non_period = np.zeros((h, w, 1))   # init missed the plate entirely
    data = TaskData(img=blur, masked_img=blur, mask=np.ones((h, w, 1)),
                    valid_mask=np.ones((h, w, 1)),
                    i_train=np.zeros((1, 2), int), i_val=np.zeros((1, 2), int),
                    selected_shifts=[], selected_angles=[],
                    selected_periods=[], patch_size=16,
                    extra={'blur_img': blur, 'non_period_mask': non_period})
    lp = LPIPS(net='alex')
    cfg = replace(SegmentationConfig(), seg_autocal='off')
    res_ref = refine_segmentation(cfg, data, pred, lp)
    res_tex = refine_segmentation(
        replace(cfg, seg_texture_criterion=True), data, pred, lp)
    ref_mask = res_ref['non_period_mask'][..., 0] > 0
    tex_mask = res_tex['non_period_mask'][..., 0] > 0
    # reference criteria: blind to the smooth plate
    assert ref_mask[plate].mean() < 0.05
    # texture cue: flags the plate interior (window-eroded margin allowed)
    core = np.zeros((h, w), bool)
    core[46:84, 56:104] = True
    assert tex_mask[core].mean() > 0.9
    # additive only: periodic texture away from the plate stays periodic
    far = ~plate
    far[30:100, 40:120] = False
    assert tex_mask[far].mean() < 0.05
    # off-path bit-identical
    res_off = refine_segmentation(
        replace(cfg, seg_texture_criterion=False), data, pred, lp)
    np.testing.assert_array_equal(res_ref['non_period_mask'],
                                  res_off['non_period_mask'])
