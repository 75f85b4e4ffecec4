"""End-to-end completion on CPU: synthetic example dir + odgt on disk ->
run_completion -> output PNGs + improving PSNR. Exercises
loaders -> embedder -> sampler -> fused step -> render -> IO as one flow."""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def example_dir(tmp_path):
    import cv2
    h, w = 48, 56
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    img = np.stack([0.5 + 0.45 * np.sin(2 * np.pi * yy / 12.0),
                    0.5 + 0.45 * np.cos(2 * np.pi * xx / 14.0),
                    0.5 + 0.2 * np.sin(2 * np.pi * (yy / 12.0 + xx / 14.0))],
                   -1)
    mask = np.ones((h, w))
    mask[18:26, 20:32] = 0
    d = tmp_path / 'ex'
    os.makedirs(d)
    cv2.imwrite(str(d / 'gt_img.png'), np.uint8(img[..., ::-1] * 255))
    cv2.imwrite(str(d / 'masked_img.png'),
                np.uint8((img * mask[..., None])[..., ::-1] * 255))
    cv2.imwrite(str(d / 'unknown_mask.png'), np.uint8(mask * 255))
    cv2.imwrite(str(d / 'valid_mask.png'), np.uint8(np.ones((h, w)) * 255))
    odgt = {
        'fpath_masked_img': 'masked_img.png',
        'fpath_valid_mask': 'valid_mask.png',
        'fpath_mask': 'unknown_mask.png',
        'fpath_gt_img': 'gt_img.png',
        'selected_angles': [[90.0, 180.0]] * 3,
        'selected_periods': [[12.0, 14.0], [6.0, 7.0], [24.0, 28.0]],
        'selected_shifts': [[[14.0, 0.0], [0.0, 12.0]]] * 3,
    }
    with open(d / 'config.odgt', 'w') as f:
        json.dump(odgt, f)
        f.write('\n')
    return str(d)


def test_run_completion_end_to_end(example_dir, tmp_path):
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import run_completion

    cfg = replace(CompletionConfig(), datadir=example_dir,
                  basedir=str(tmp_path / 'out'), netwidth=48, netdepth=4,
                  N_rand=256, patch_num=1, num_real_patch_per_sample=2,
                  N_iters=61, i_testset=30, i_print=30,
                  use_perceptual_loss=False)
    # patch size formula would give 64 > image; shrink via loader override
    result, final, evals = run_completion(cfg, save=True)
    # loader computed patch size 64 > 48-px image: sampler pools clamp;
    # the run must still complete and improve
    assert np.isfinite(final['val_psnr'])
    out_root = os.path.join(str(tmp_path / 'out'), 'completion_top3')
    name = example_dir.rstrip('/').split('/')[-1]
    testset = os.path.join(out_root, name, 'testset_000060')
    assert os.path.exists(os.path.join(testset, 'pred_rgb_img_comp.png'))
    assert os.path.exists(os.path.join(testset, 'pred_rgb_img.png'))


def test_determinism_same_seed():
    """Same seed, same data -> bitwise-identical params after N steps."""
    import jax
    from npp_tpu.models.completion import COMPLETION_TASK
    from tests.test_trainer import run_steps, tiny_cfg, tiny_data

    cfg = tiny_cfg()
    s1, l1, _ = run_steps(cfg, COMPLETION_TASK, tiny_data(), n=5)
    s2, l2, _ = run_steps(cfg, COMPLETION_TASK, tiny_data(), n=5)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seam_residual_correction_removes_offset():
    """A constant low-frequency tint error inside the hole must be removed
    by the residual-corrected composite (cfg.comp_seam='residual'): the
    known-region error diffuses across the hole, so hole MSE drops by an
    order of magnitude while texture (here: the gt pattern) is preserved."""
    import numpy as np
    from npp_tpu.models.completion import seam_residual_correction

    h, w = 64, 72
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    img = np.stack([0.5 + 0.3 * np.sin(2 * np.pi * yy / 12.0),
                    0.5 + 0.3 * np.cos(2 * np.pi * xx / 14.0),
                    0.5 * np.ones((h, w))], -1)
    hole = np.zeros((h, w))
    hole[20:44, 24:52] = 1
    known = 1 - hole
    masked = img * known[..., None]
    pred = np.clip(img - 0.12, 0, 1)      # constant tint offset everywhere

    corrected = seam_residual_correction(pred, masked, known, hole)
    mse_before = float(np.mean((pred - img)[hole > 0.5] ** 2))
    mse_after = float(np.mean((corrected - img)[hole > 0.5] ** 2))
    assert mse_after < mse_before / 10, (mse_before, mse_after)
    # known region untouched
    np.testing.assert_array_equal(corrected[known > 0.5], pred[known > 0.5])

    # normalize_type=2 regime: [-1,1] images, residuals span [-2,2] — the
    # value_range=2 quantization must remove a tint whose magnitude exceeds
    # the default range's uint8 clip (1.2 > 1.0), which the old hard-coded
    # [-1,1] round-trip saturated
    img2 = img * 2.0 - 1.0
    masked2 = img2 * known[..., None]
    pred2 = img2 - 1.2                     # constant offset, |err| > 1
    corr2 = seam_residual_correction(pred2, masked2, known, hole,
                                     value_range=2.0)
    mse2_after = float(np.mean((corr2 - img2)[hole > 0.5] ** 2))
    corr2_wrong = seam_residual_correction(pred2, masked2, known, hole,
                                           value_range=1.0)
    mse2_wrong = float(np.mean((corr2_wrong - img2)[hole > 0.5] ** 2))
    assert mse2_after < mse2_wrong / 10, (mse2_after, mse2_wrong)
