"""IO round-trips, blur detection, CLI config building, visualizer."""
import json
import os

import numpy as np
import pytest


def test_odgt_roundtrip(tmp_path):
    from npp_tpu.utils.io import read_odgt, write_odgt
    rec = {
        'fpath_masked_img': 'somewhere/masked_img.png',
        'fpath_gt_img': ['somewhere/gt_img.png'],
        'selected_angles': [[100.0, 170.0]],
        'selected_periods': [[30.0, 40.0]],
        'selected_shifts': [[[30.0, 0.0], [0.0, 40.0]]],
        'distances': [0.5],
    }
    write_odgt(str(tmp_path), rec)
    back = read_odgt(str(tmp_path))
    assert back['selected_periods'] == [[30.0, 40.0]]
    # fpaths are remapped into the datadir (reference loaders.py:67-80)
    assert back['fpath_masked_img'] == os.path.join(str(tmp_path), 'masked_img.png')
    assert back['fpath_gt_img'] == os.path.join(str(tmp_path), 'gt_img.png')


def test_patch_size_formula():
    from npp_tpu.utils.io import patch_size_from_periods
    # clip(ceil32(max period), 64, 160) (reference: loaders.py:130-134)
    assert patch_size_from_periods([[30.0, 40.0]]) == 64
    assert patch_size_from_periods([[100.0, 90.0]]) == 128
    assert patch_size_from_periods([[300.0, 10.0]]) == 160
    assert patch_size_from_periods([[64.0, 10.0]]) == 96  # 64 + (32 - 0) = 96


def test_image_io_roundtrip(tmp_path):
    from npp_tpu.utils.io import read_rgb, write_rgb
    img = np.random.RandomState(0).rand(10, 12, 3)
    p = str(tmp_path / 'x.png')
    write_rgb(p, img)
    back = read_rgb(p)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_blur_map_detects_sharp_region():
    from npp_tpu.ops.blur import blur_map
    import cv2
    rng = np.random.RandomState(0)
    img = np.zeros((80, 80, 3))
    # sharp texture on the left, smooth on the right
    img[:, :40] = rng.rand(80, 40, 1)
    img[:, 40:] = 0.5
    u8 = np.uint8(img * 255)
    degree, clear = blur_map(u8, thresh=50)
    assert degree.shape == (80, 80)
    # degree in [0,1], and binary output is 0/255
    assert 0 <= degree.min() and degree.max() <= 1
    assert set(np.unique(clear)).issubset({0.0, 255.0})


def test_blur_with_mask_preserves_masked_zero():
    from npp_tpu.ops.blur import blur_with_mask
    img = np.ones((20, 20, 3)) * 200
    mask = np.ones((20, 20, 1))
    mask[:5] = 0
    out = blur_with_mask(img, mask)
    assert np.allclose(out[:5], 0)
    assert np.allclose(out[10:, :], 200, atol=1)


def test_cli_config_building():
    from npp_tpu.cli import build_config
    from npp_tpu.config import CompletionConfig
    cfg = build_config(CompletionConfig, [
        '--N_iters', '500', '--datadir', '/x', '--use_comp', 'false',
        '--lrate', '1e-3'])
    assert cfg.N_iters == 500 and cfg.datadir == '/x'
    assert cfg.use_comp is False and cfg.lrate == pytest.approx(1e-3)
    with pytest.raises(SystemExit):
        build_config(CompletionConfig, ['--nope', '1'])


def test_grid_program_draws_lattice():
    from npp_tpu.utils.visualizer import GridProgram, mask2ltrb
    img = np.zeros((64, 64, 3), np.uint8)
    gp = GridProgram(resolution=(64, 64), base_point=(10, 10),
                     first_shift=(16.0, 0.0), second_shift=(0.0, 16.0))
    drawn, line_mask = gp.draw(img)
    assert line_mask.sum() > 0
    assert drawn.max() > 0
    assert mask2ltrb(np.pad(np.ones((4, 6)), ((2, 3), (5, 1)))).tolist() == \
        [5, 2, 10, 5]


def test_pretrained_registry_fallback_flagged():
    from npp_tpu.nn.pretrained import weight_reports
    from npp_tpu.losses.lpips import LPIPS
    LPIPS(net='vgg')
    reports = weight_reports()
    assert 'vgg16' in reports
    # in this environment the tower falls back; the lin heads are assets
    assert reports['lpips_lin_vgg'].pretrained


def test_feature_extractor_registry():
    import jax.numpy as jnp
    from npp_tpu.nn.registry import get_available_models, get_feature_extractor
    assert 'alexnet' in get_available_models()
    fn, tap = get_feature_extractor('alexnet')
    out = fn(jnp.zeros((1, 64, 64, 3)))
    assert tap in out and out[tap].shape[-1] == 64
    import pytest
    with pytest.raises(NotImplementedError):
        get_feature_extractor('resnet34')


def test_pad_pool_pow2_edges():
    from npp_tpu.utils.pools import pad_pool_pow2
    import numpy as np
    p, n = pad_pool_pow2(np.zeros((0, 2)), fallback_row=(3, 4))
    assert n == 0 and p.tolist() == [[3, 4]]
    p, n = pad_pool_pow2(np.array([[1, 2], [3, 4], [5, 6]]), fill='tile')
    assert n == 3 and len(p) == 4 and p[3].tolist() == [1, 2]
    p, n = pad_pool_pow2(np.array([[1, 2], [3, 4], [5, 6]]), fill='first')
    assert p[3].tolist() == [1, 2]
    p, n = pad_pool_pow2(np.array([[7, 8]]))
    assert n == 1 and len(p) == 1


def test_aux_gate_ratio_topk():
    """Rank-gating of aux proposals by odgt ranking distance
    (npp_tpu/models/loaders.py::_topk_periodicity; TPU-repo addition,
    reference always consumes a fixed top-K, loaders/loaders.py:110-128)."""
    from npp_tpu.models.loaders import _topk_periodicity

    info = {
        'selected_shifts': [[[1, 0], [0, 1]], [[2, 0], [0, 2]],
                            [[3, 0], [0, 3]]],
        'selected_angles': [[90, 180]] * 3,
        'selected_periods': [[10, 10], [20, 20], [30, 30]],
        'distances': [1.0, 1.1, 1.5],
    }
    # disabled (default): fixed top-K, reference behaviour
    s, a, p = _topk_periodicity(info, 3, 0.0)
    assert len(p) == 3
    # gate at 1.2x: keeps top-2, drops the 1.5x candidate
    s, a, p = _topk_periodicity(info, 3, 1.2)
    assert len(p) == 2 and p == [[10, 10], [20, 20]]
    # tight gate: top-1 always survives
    s, a, p = _topk_periodicity(info, 3, 1.0)
    assert len(p) == 1
    # gating respects p_topk cap
    s, a, p = _topk_periodicity(info, 2, 10.0)
    assert len(p) == 2
    # no distances recorded -> gate is a no-op
    info2 = dict(info)
    del info2['distances']
    s, a, p = _topk_periodicity(info2, 3, 1.2)
    assert len(p) == 3
