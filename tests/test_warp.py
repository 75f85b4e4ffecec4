"""Learnable warp field (nn/warp.py): identity init, bounded output, and
end-to-end fit integration on a perspective-sheared lattice."""
import jax
import jax.numpy as jnp
import numpy as np


def test_warp_identity_init_and_bound():
    from npp_tpu.nn.warp import WarpField
    wf = WarpField(width=16, depth=2, max_px=8.0)
    p = wf.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))['params']
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (64, 2)),
                    jnp.float32)
    out = wf.apply({'params': p}, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero-init output
    # bound holds for arbitrary params
    p2 = jax.tree.map(lambda a: a + 100.0, p)
    out2 = wf.apply({'params': p2}, x)
    assert float(jnp.max(jnp.abs(out2))) <= 8.0 + 1e-5


def _sheared_lattice(h=72, w=80, px=12.0, shear=0.15):
    """x-period px, with the phase sheared linearly in y (perspective-like)."""
    yy, xx = np.mgrid[:h, :w].astype(np.float64)
    xs = xx + shear * yy            # sheared coordinate
    img = np.stack([0.5 + 0.4 * np.sin(2 * np.pi * xs / px),
                    0.5 + 0.4 * np.cos(2 * np.pi * xs / px),
                    np.full((h, w), 0.5)], -1)
    return np.clip(img, 0, 1)


def test_warp_field_fit_integration():
    """With warp_field on, the fit runs end-to-end (params carry 'warp',
    render works) and the learned warp becomes non-trivial on a sheared
    lattice given a deliberately wrong-but-close global period."""
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.loaders import TaskData
    from npp_tpu.models.pipeline import build_components, make_fit_consts
    from npp_tpu.models.trainer import (init_fit_state, make_fit_step,
                                        make_render)

    img = _sheared_lattice()
    h, w = img.shape[:2]
    mask = np.ones((h, w, 1))
    mask[30:44, 34:52] = 0
    valid = np.ones((h, w, 1))
    train = np.stack(np.nonzero((mask * valid)[..., 0]), 1)
    val = np.stack(np.nonzero(((1 - mask) * valid)[..., 0]), 1)
    data = TaskData(img=img, masked_img=img * mask, mask=mask,
                    valid_mask=valid, i_train=train, i_val=val,
                    selected_shifts=[[[12.0, 0.0], [0.0, 12.0]]],
                    selected_angles=[[90.0, 180.0]],
                    selected_periods=[[12.0, 12.0]], patch_size=16)

    cfg = replace(CompletionConfig(), p_topk=1, netdepth=2, netwidth=48,
                  N_rand=256, N_iters=150, warp_field=True, warp_max_px=6.0,
                  use_perceptual_loss=False, use_contextual_loss=False)
    from npp_tpu.models.completion import COMPLETION_TASK
    comps = build_components(cfg, data, COMPLETION_TASK)
    state, tx = init_fit_state(cfg, COMPLETION_TASK, comps.model,
                               comps.embedder, jax.random.PRNGKey(0),
                               comps.percep, comps.style)
    assert 'warp' in state.params
    consts = make_fit_consts(cfg, COMPLETION_TASK, data, data.patch_size)
    step = make_fit_step(cfg, COMPLETION_TASK, comps.model, comps.embedder,
                         consts, comps.percep, comps.contextual, comps.style,
                         tx, patch_num=cfg.patch_num,
                         patch_size=data.patch_size)
    key = jax.random.PRNGKey(1)
    for i in range(cfg.N_iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, k)
    assert np.isfinite(float(metrics['loss']))

    # the warp must have moved off identity to absorb the shear
    from npp_tpu.nn.warp import make_warp, warp_coords
    wf = make_warp(cfg)
    coords = jnp.asarray(np.stack(np.mgrid[0:h:8, 0:w:8], -1
                                  ).reshape(-1, 2), jnp.float32)
    delta = warp_coords(wf, state.params['warp'], coords,
                        comps.embedder.res) - coords
    assert float(jnp.max(jnp.abs(delta))) > 0.05

    render = make_render(cfg, comps.model, comps.embedder)
    out = np.asarray(render(state.params, h, w))
    assert out.shape == (h, w, 3) and np.isfinite(out).all()


def test_warp_field_off_keeps_params_clean():
    from npp_tpu.config import CompletionConfig, replace
    cfg = replace(CompletionConfig(), p_topk=1, netdepth=2, netwidth=32,
                  N_rand=64)
    from npp_tpu.nn.warp import make_warp
    assert make_warp(cfg) is None
