"""Feature-tower semantics (vs torch conv/pool ground truth) and patch-loss
behaviour tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_flax_conv_matches_torch_padding():
    """nn.Conv(padding=int) must equal torch Conv2d same-padding semantics."""
    import torch
    import torch.nn.functional as F
    import flax.linen as nn

    rng = np.random.RandomState(0)
    x = rng.randn(1, 13, 17, 3).astype(np.float32)
    w = rng.randn(11, 11, 3, 8).astype(np.float32) * 0.05  # HWIO
    b = rng.randn(8).astype(np.float32)

    conv = nn.Conv(8, (11, 11), strides=(4, 4), padding=5)
    out = conv.apply({'params': {'kernel': jnp.asarray(w), 'bias': jnp.asarray(b)}},
                     jnp.asarray(x))

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    wt = torch.tensor(w).permute(3, 2, 0, 1)  # OIHW
    ot = F.conv2d(xt, wt, torch.tensor(b), stride=4, padding=5)
    ot = ot.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ot, rtol=1e-4, atol=1e-4)


def test_flax_maxpool_matches_torch():
    import torch
    import torch.nn.functional as F
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = rng.randn(1, 15, 19, 4).astype(np.float32)
    # torch MaxPool2d(3, 2, padding=1) vs flax pads with -inf: for positive and
    # negative values the semantics agree because torch pads with -inf too.
    out = nn.max_pool(jnp.asarray(x), (3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)))
    ot = F.max_pool2d(torch.tensor(x).permute(0, 3, 1, 2), 3, 2, padding=1)
    ot = ot.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ot, rtol=1e-6)


def test_tower_shapes():
    from npp_tpu.nn.features import AlexNetFeatures, VGGFeatures, VGG16_BLOCKS

    alex = AlexNetFeatures(owt=True)
    p = alex.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    outs = alex.apply(p, jnp.zeros((1, 64, 96, 3)))
    # conv1 stride 4, padding 5 on k=11: out = floor((64+10-11)/4)+1 = 16
    assert outs['conv1'].shape == (1, 16, 24, 64)

    vgg = VGGFeatures(blocks=VGG16_BLOCKS)
    p = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    outs = vgg.apply(p, jnp.zeros((1, 64, 64, 3)))
    assert outs['relu3_3'].shape == (1, 16, 16, 256)
    assert outs['pool3'].shape == (1, 8, 8, 256)
    assert outs['relu5_3'].shape == (1, 4, 4, 512)


@pytest.fixture(scope='module')
def imgs():
    rng = np.random.RandomState(0)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    b = np.clip(a + rng.randn(2, 32, 32, 3).astype(np.float32) * 0.2, 0, 1)
    return jnp.asarray(a), jnp.asarray(b)


def test_lpips_identity_and_order(imgs):
    from npp_tpu.losses.lpips import LPIPS
    a, b = imgs
    lp = LPIPS(net='vgg')
    same = lp(a, a, normalize=True)
    diff = lp(a, b, normalize=True)
    assert same.shape == (2, 1, 1, 1)
    assert float(jnp.max(same)) < 1e-5
    assert float(jnp.min(diff)) > float(jnp.max(same))


def test_lpips_spatial_mode(imgs):
    from npp_tpu.losses.lpips import LPIPS
    a, b = imgs
    lp = LPIPS(net='alex')
    val, per_layer = lp(a, b, normalize=True, spatial=True, ret_per_layer=True)
    assert val.shape == (2, 32, 32, 1)
    assert len(per_layer) == 5


def test_lpips_robust_grads(imgs):
    from npp_tpu.losses.lpips import LPIPS
    a, b = imgs
    lp = LPIPS(net='vgg')
    ad = lp.init_adaptive()

    def f(ad):
        return jnp.mean(lp(a, b, use_robust=True, adaptive=ad, normalize=True))

    val, g = jax.value_and_grad(f)(ad)
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(g)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in flat)


def test_contextual_loss_orders_similarity(imgs):
    from npp_tpu.losses.contextual import ContextualLoss
    a, b = imgs
    cx = ContextualLoss(use_vgg=True)
    same = float(cx(a, a))
    diff = float(cx(a, b))
    assert same < diff


def test_contextual_weighted_matches_reference_semantics(imgs):
    from npp_tpu.losses.contextual import contextual_loss
    a, b = imgs
    w = jnp.asarray([0.5, 0.5])
    out = contextual_loss(a, b, weight=w)
    assert np.isfinite(float(out))


def test_contextual_feat_valid_excludes_pad_exactly():
    """With feat_valid marking the tight region, the CX loss over
    zero-padded feature maps equals the tight-map loss exactly (the pad
    positions leave the match, the relative-distance min, the softmax and
    the mean); without the mask the pad rescales it."""
    from npp_tpu.losses.contextual import contextual_loss
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 6, 7, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 6, 7, 8)).astype(np.float32))
    tight = contextual_loss(x, y)

    xp = jnp.pad(x, ((0, 0), (0, 4), (0, 5), (0, 0)))
    yp = jnp.pad(y, ((0, 0), (0, 4), (0, 5), (0, 0)))
    fv = np.zeros((2, 10, 12), np.float32)
    fv[:, :6, :7] = 1.0
    masked = contextual_loss(xp, yp, feat_valid=jnp.asarray(fv))
    unmasked = contextual_loss(xp, yp)
    np.testing.assert_allclose(float(masked), float(tight), rtol=1e-5)
    assert abs(float(unmasked) - float(tight)) > 1e-3


def test_style_loss_zero_on_identical(imgs):
    from npp_tpu.losses.style import StyleLoss
    a, b = imgs
    sl = StyleLoss(use_adaptive=False)
    assert float(sl(a, a)) < 1e-6
    assert float(sl(a, b)) > 0


def test_style_loss_adaptive(imgs):
    from npp_tpu.losses.style import StyleLoss
    a, b = imgs
    sl = StyleLoss(use_adaptive=True)
    ad = sl.init_adaptive()

    def f(ad):
        return sl(a, b, adaptive=ad)

    val, g = jax.value_and_grad(f)(ad)
    assert np.isfinite(float(val))


def test_squeezenet_tower_matches_torch():
    """SqueezeNetFeatures must reproduce torchvision squeezenet1_1.features
    semantics (reference: externel_lib/lpips/pretrained_networks.py:5-54).
    Torch ground truth is built from plain torch layers (no torchvision)."""
    import torch
    import torch.nn as tnn

    class Fire(tnn.Module):
        def __init__(self, cin, s, e):
            super().__init__()
            self.squeeze = tnn.Conv2d(cin, s, 1)
            self.expand1x1 = tnn.Conv2d(s, e, 1)
            self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)
            self.relu = tnn.ReLU()

        def forward(self, x):
            x = self.relu(self.squeeze(x))
            return torch.cat([self.relu(self.expand1x1(x)),
                              self.relu(self.expand3x3(x))], 1)

    torch.manual_seed(0)
    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 3, stride=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(64, 16, 64), Fire(128, 16, 64),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(128, 32, 128), Fire(256, 32, 128),
        tnn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(256, 48, 192), Fire(384, 48, 192),
        Fire(384, 64, 256), Fire(512, 64, 256))

    # transplant torch weights into the flax tree
    def hwio(w):
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    params = {'conv0': {'kernel': hwio(feats[0].weight),
                        'bias': jnp.asarray(feats[0].bias.detach().numpy())}}
    for name, mod in zip(('fire3', 'fire4', 'fire6', 'fire7', 'fire9',
                          'fire10', 'fire11', 'fire12'),
                         (feats[3], feats[4], feats[6], feats[7], feats[9],
                          feats[10], feats[11], feats[12])):
        params[name] = {p: {'kernel': hwio(getattr(mod, p).weight),
                            'bias': jnp.asarray(
                                getattr(mod, p).bias.detach().numpy())}
                        for p in ('squeeze', 'expand1x1', 'expand3x3')}

    from npp_tpu.nn.features import SqueezeNetFeatures
    rng = np.random.RandomState(2)
    # odd spatial size exercises the ceil-mode padding path
    x = rng.rand(1, 65, 77, 3).astype(np.float32)
    outs = SqueezeNetFeatures().apply({'params': params}, jnp.asarray(x))

    with torch.no_grad():
        h = torch.tensor(x).permute(0, 3, 1, 2)
        taps = {}
        h = feats[1](feats[0](h)); taps['relu1'] = h
        h = feats[4](feats[3](feats[2](h))); taps['relu2'] = h
        h = feats[7](feats[6](feats[5](h))); taps['relu3'] = h
        h = feats[9](feats[8](h)); taps['relu4'] = h
        h = feats[10](h); taps['relu5'] = h
        h = feats[11](h); taps['relu6'] = h
        h = feats[12](h); taps['relu7'] = h

    for k, t in taps.items():
        np.testing.assert_allclose(
            np.asarray(outs[k]), t.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4, err_msg=k)


def test_lpips_squeeze_trunk(imgs):
    """LPIPS 'squeeze' plumbing: 7 layers, converted lin heads, runs in both
    scalar and spatial modes (reference lpips.py:52-53,72)."""
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.nn.pretrained import weight_reports
    a, b = imgs
    lp = LPIPS(net='squeeze')
    assert len(lp.lins) == 7 and lp.lins[0].shape == (64,)
    assert weight_reports()['lpips_lin_squeeze'].source == 'asset'
    same = lp(a, a, normalize=True)
    val, per_layer = lp(a, b, normalize=True, spatial=True,
                        ret_per_layer=True)
    assert float(jnp.max(same)) < 1e-5
    assert len(per_layer) == 7 and val.shape == (2, 32, 32, 1)


def test_feature_dtype_bf16_towers_close_to_f32(imgs):
    """cfg.feature_dtype wires the loss towers' activation dtype
    (models/pipeline.py::build_components). bf16 towers must track the f32
    values closely on smooth inputs — the knob trades HBM traffic for a
    bounded numeric drift, it must not change the loss's meaning."""
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    a, b = imgs
    for cls, kw in ((LPIPS, dict(net='vgg')),
                    (ContextualLoss, dict(use_vgg=True))):
        f32 = cls(dtype=jnp.float32, **kw)(a, b)
        bf16 = cls(dtype=jnp.bfloat16, **kw)(a, b)
        f32, bf16 = np.asarray(f32, np.float64), np.asarray(bf16, np.float64)
        assert np.all(np.isfinite(bf16))
        assert np.allclose(f32, bf16, rtol=0.08, atol=5e-3), (f32, bf16)


def test_build_components_consumes_feature_dtype():
    """The knob must reach the tower modules (it was dead config until
    round 4)."""
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.pipeline import build_components

    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3)
    ones = np.ones((32, 32, 1))
    coords = np.stack(np.nonzero(ones[..., 0]), 1)
    data = TaskData(img=img, masked_img=img, mask=ones, valid_mask=ones,
                    i_train=coords, i_val=coords[:1],
                    selected_angles=[[90.0, 180.0]],
                    selected_periods=[[8.0, 8.0]],
                    selected_shifts=[[[8.0, 0.0], [0.0, 8.0]]],
                    patch_size=16)
    cfg = replace(CompletionConfig(), p_topk=1,
                  feature_dtype='bfloat16')
    comps = build_components(cfg, data, COMPLETION_TASK)
    assert comps.percep.module.dtype == jnp.bfloat16
    # the CX tower is EXEMPT from feature_dtype (round 5): bf16-quantized
    # features reshuffle the softmax matches — measured grad cosine 0.15
    # vs f32 at flagship patch scales (models/pipeline.py comment,
    # results_round5.json feat_bf16_quality). CX always runs f32.
    assert comps.contextual.module.dtype == jnp.float32
    cfg32 = replace(cfg, feature_dtype='float32')
    comps32 = build_components(cfg32, data, COMPLETION_TASK)
    assert comps32.percep.module.dtype == jnp.float32


def test_feature_dtype_bf16_grad_direction():
    """Gradient-level safety of the feature_dtype lever (the round-5
    finding: VALUE closeness does not imply GRADIENT closeness for
    match-competition losses). LPIPS bf16 must track the f32 training
    signal (direction + magnitude); the CX bf16 tower demonstrably does
    not — which is why build_components exempts it (see
    test_build_components_consumes_feature_dtype)."""
    import jax
    from npp_tpu.losses.lpips import LPIPS

    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[:96, :96].astype(np.float64)
    base = 0.5 + 0.2 * np.sin(2 * np.pi * xx / 11)[..., None] \
        + 0.15 * np.sin(2 * np.pi * yy / 9)[..., None]
    a = np.clip(base + rng.rand(96, 96, 3) * 0.1, 0, 1)[None]
    b = np.clip(np.roll(base, 3, 1) + rng.rand(96, 96, 3) * 0.1, 0, 1)[None]
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)

    def grad_of(fn):
        g = jax.grad(lambda x: jnp.sum(fn(x, b, normalize=True)))(a)
        return np.asarray(g, np.float64).ravel()

    g32 = grad_of(LPIPS(net='vgg', dtype=jnp.float32))
    g16 = grad_of(LPIPS(net='vgg', dtype=jnp.bfloat16))
    cos = g32 @ g16 / (np.linalg.norm(g32) * np.linalg.norm(g16))
    ratio = np.linalg.norm(g16) / np.linalg.norm(g32)
    assert cos > 0.98, cos
    assert 0.8 < ratio < 1.25, ratio


def test_robust_layout_cn_value_identical(imgs):
    """cfg.robust_layout='cn' (transposed robust reductions, fused LPIPS
    lin channel-sum) is a LAYOUT knob: values must match 'nc' to float
    tolerance for both the LPIPS robust path and the pixel loss."""
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.losses.pixel import img2mse
    from npp_tpu.losses.robust import adaptive_init
    a, b = imgs
    lp = LPIPS(net='vgg')
    ad = lp.init_adaptive()
    v_nc = lp(a, b, use_robust=True, adaptive=ad, normalize=True)
    v_cn = lp(a, b, use_robust=True, adaptive=ad, normalize=True,
              robust_layout='cn')
    np.testing.assert_allclose(np.asarray(v_cn), np.asarray(v_nc),
                               rtol=2e-5, atol=2e-6)
    # spatial mode too (segmentation criterion path)
    s_nc = lp(a, b, use_robust=True, adaptive=ad, normalize=True,
              spatial=True)
    s_cn = lp(a, b, use_robust=True, adaptive=ad, normalize=True,
              spatial=True, robust_layout='cn')
    np.testing.assert_allclose(np.asarray(s_cn), np.asarray(s_nc),
                               rtol=2e-5, atol=2e-6)
    # pixel robust loss + its gradient wrt the latents
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.rand(257, 3), jnp.float32)
    gt = jnp.asarray(rng.rand(257, 3), jnp.float32)
    adp = adaptive_init(3)

    def f(adp, layout):
        return img2mse(pred, gt, 'robust_loss_adaptive', adp, layout=layout)

    v0, g0 = jax.value_and_grad(f)(adp, 'nc')
    v1, g1 = jax.value_and_grad(f)(adp, 'cn')
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    for x0, x1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                                   rtol=1e-5, atol=1e-7)


def test_resolve_robust_layout_auto():
    """'auto' maps to the measured per-path winners (round-5 A/B,
    results_round5.json robust_layout_ab): cn single-image, nc batched;
    explicit values pass through."""
    from npp_tpu.config import CompletionConfig, replace, \
        resolve_robust_layout
    cfg = CompletionConfig()
    assert cfg.robust_layout == 'auto'
    assert resolve_robust_layout(cfg, batched=False) == 'cn'
    assert resolve_robust_layout(cfg, batched=True) == 'nc'
    for explicit in ('nc', 'cn'):
        c = replace(cfg, robust_layout=explicit)
        assert resolve_robust_layout(c, batched=False) == explicit
        assert resolve_robust_layout(c, batched=True) == explicit
