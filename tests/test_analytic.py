"""Analytic (training-free) tower weights: filter-bank properties and
perceptual sanity of the structured fallback (npp_tpu/nn/analytic.py)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest


def test_gabor_stem_properties():
    from npp_tpu.nn.analytic import gabor_stem
    for k, out_ch in ((11, 64), (3, 64), (5, 16)):
        w = gabor_stem(k, 3, out_ch, seed=7)
        assert w.shape == (k, k, 3, out_ch)
        assert np.isfinite(w).all()
        # every filter has meaningful energy; band-pass ones are zero-mean
        norms = np.linalg.norm(w.reshape(-1, out_ch), axis=0)
        assert (norms > 0.5).all() and (norms < 4.0).all()
        means = np.abs(w.sum((0, 1)))  # (3, out_ch) per color channel
        frac_zero_mean = (means.max(0) < 1e-3).mean()
        assert frac_zero_mean > 0.8  # all but the low-pass slots
    # determinism
    a = gabor_stem(11, 3, 64, seed=7)
    b = gabor_stem(11, 3, 64, seed=7)
    np.testing.assert_array_equal(a, b)
    # filters are linearly independent (full numerical rank)
    w = gabor_stem(11, 3, 64, seed=7).reshape(-1, 64)
    assert np.linalg.matrix_rank(w, tol=1e-5) == 64


def test_orthogonal_kernel_isometry():
    from npp_tpu.nn.analytic import orthogonal_kernel
    w = orthogonal_kernel((3, 3, 64, 128), seed=3)
    m = w.reshape(-1, 128)  # fan_in 576 >= 128: orthonormal columns * gain
    g = m.T @ m
    np.testing.assert_allclose(g, 2.0 * np.eye(128), atol=1e-4)
    # fan_in < cout: orthonormal rows * gain
    w2 = orthogonal_kernel((1, 1, 16, 64), seed=3)
    m2 = w2.reshape(16, 64)
    np.testing.assert_allclose(m2 @ m2.T, 2.0 * np.eye(16), atol=1e-4)
    np.testing.assert_array_equal(w, orthogonal_kernel((3, 3, 64, 128), seed=3))


def test_towers_report_analytic_source():
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.nn.pretrained import weight_reports
    assert os.environ.get('NPP_TPU_FALLBACK', 'analytic') == 'analytic'
    LPIPS(net='vgg')
    rep = weight_reports()['vgg16']
    assert rep.source == 'analytic'
    assert not rep.pretrained  # analytic != calibrated


def _texture(h, w, px, py, seed=0):
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    rng = np.random.RandomState(seed)
    ph = rng.uniform(0, 2 * np.pi, 3)
    img = np.stack([0.5 + 0.25 * np.sin(2 * np.pi * xx / px + ph[0])
                    + 0.15 * np.sin(2 * np.pi * yy / py + ph[1]),
                    0.5 + 0.25 * np.cos(2 * np.pi * (xx + yy) / px + ph[2]),
                    np.full((h, w), 0.5)], -1)
    return np.clip(img, 0, 1).astype(np.float32)


def test_analytic_lpips_monotone_under_distortion():
    """Perceptual sanity: LPIPS on analytic towers must grow monotonically
    with both noise level and blur radius (what makes the fallback usable as
    a *relative* perceptual metric for ranking / patch losses)."""
    from npp_tpu.losses.lpips import LPIPS
    lp = LPIPS(net='vgg')
    img = _texture(64, 64, 12, 9)
    rng = np.random.RandomState(1)

    noise_d = []
    for s in (0.02, 0.06, 0.12, 0.25):
        noisy = np.clip(img + rng.randn(*img.shape).astype(np.float32) * s, 0, 1)
        noise_d.append(float(lp(jnp.asarray(img[None]), jnp.asarray(noisy[None]),
                                normalize=True)[0, 0, 0, 0]))
    assert all(b > a for a, b in zip(noise_d, noise_d[1:])), noise_d

    import scipy.ndimage as ndi
    blur_d = []
    for s in (0.5, 1.5, 3.0, 6.0):
        bl = ndi.gaussian_filter(img, (s, s, 0)).astype(np.float32)
        blur_d.append(float(lp(jnp.asarray(img[None]), jnp.asarray(bl[None]),
                               normalize=True)[0, 0, 0, 0]))
    assert all(b > a for a, b in zip(blur_d, blur_d[1:])), blur_d


def test_analytic_prefers_same_texture():
    """A lattice-shifted copy of the same texture must read closer than a
    different texture at equal pixel-MSE disadvantage — the property that
    makes proposal ranking meaningful without pretrained weights."""
    from npp_tpu.losses.lpips import LPIPS
    lp = LPIPS(net='vgg')
    rng = np.random.RandomState(2)
    img = np.clip(_texture(64, 64, 16, 8)
                  + rng.randn(64, 64, 3).astype(np.float32) * 0.02, 0, 1)
    # one full x-period is a lattice vector of every channel -> the rolled
    # copy is the same texture up to the (aperiodic) noise field
    same_shifted = np.roll(img, 16, axis=1)
    other = _texture(64, 64, 7, 13, seed=5)
    d_same = float(lp(jnp.asarray(img[None]), jnp.asarray(same_shifted[None]),
                      normalize=True)[0, 0, 0, 0])
    d_other = float(lp(jnp.asarray(img[None]), jnp.asarray(other[None]),
                       normalize=True)[0, 0, 0, 0])
    assert d_same < d_other


def test_fallback_env_reverts_to_random(monkeypatch):
    from npp_tpu.nn import pretrained
    from npp_tpu.nn.features import AlexNetFeatures
    monkeypatch.setenv('NPP_TPU_FALLBACK', 'random')
    m = AlexNetFeatures(owt=True)
    p = pretrained.load_tower_params('alexnet_owt_TESTRANDOM_', m,
                                     jnp.zeros((1, 64, 64, 3)))
    assert pretrained.weight_reports()['alexnet_owt_TESTRANDOM_'].source == 'random'
    monkeypatch.setenv('NPP_TPU_FALLBACK', 'analytic')
    p2 = pretrained.load_tower_params('alexnet_owt_TESTANALYTIC_', m,
                                      jnp.zeros((1, 64, 64, 3)))
    assert pretrained.weight_reports()['alexnet_owt_TESTANALYTIC_'].source == 'analytic'
    k_r = np.asarray(p['conv0']['kernel'])
    k_a = np.asarray(p2['conv0']['kernel'])
    assert k_r.shape == k_a.shape
    assert not np.allclose(k_r, k_a)
