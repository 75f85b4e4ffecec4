"""Fit-step integration tests on CPU with tiny shapes: loss decreases,
all adaptive latents receive gradients, patch-size staging works."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.config import CompletionConfig, RemappingConfig, replace
from npp_tpu.models.completion import COMPLETION_TASK
from npp_tpu.models.remapping import REMAPPING_TASK
from npp_tpu.models.loaders import TaskData
from npp_tpu.models.pipeline import build_components, make_fit_consts
from npp_tpu.models.trainer import init_fit_state, make_fit_step, make_render


def tiny_data(h=40, w=48):
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    img = np.stack([0.5 + 0.4 * np.sin(2 * np.pi * yy / 10.0),
                    0.5 + 0.4 * np.cos(2 * np.pi * xx / 12.0),
                    0.5 * np.ones_like(yy)], -1)
    mask = np.ones((h, w, 1))
    mask[15:22, 18:28] = 0
    valid = np.ones((h, w, 1))
    train = np.stack(np.nonzero((mask * valid)[..., 0]), 1)
    val = np.stack(np.nonzero(((1 - mask) * valid)[..., 0]), 1)
    shifts = [[[12.0, 0.0], [0.0, 10.0]]] * 3
    angles = [[90.0, 180.0]] * 3
    periods = [[10.0, 12.0]] * 3
    return TaskData(img=img, masked_img=img * mask, mask=mask,
                    valid_mask=valid, i_train=train, i_val=val,
                    selected_shifts=shifts, selected_angles=angles,
                    selected_periods=periods, patch_size=16,
                    extra={'clear_mask': mask * valid})


def tiny_cfg(**kw):
    base = dict(netwidth=32, netdepth=4, N_rand=64, patch_num=1,
                num_real_patch_per_sample=2, use_perceptual_loss=False,
                use_contextual_loss=False)
    base.update(kw)
    return replace(CompletionConfig(), **base)


def run_steps(cfg, task, data, n=10, patch_size=16):
    comps = build_components(cfg, data, task)
    state, tx = init_fit_state(cfg, task, comps.model, comps.embedder,
                               jax.random.PRNGKey(0), comps.percep, comps.style)
    consts = make_fit_consts(cfg, task, data, patch_size)
    step = make_fit_step(cfg, task, comps.model, comps.embedder, consts,
                         comps.percep, comps.contextual, comps.style, tx,
                         cfg.patch_num, patch_size)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(n):
        rng, k = jax.random.split(rng)
        state, m = step(state, k)
        losses.append(float(m.get('pixel', m['loss'])))
    return state, losses, comps


def test_pixel_only_loss_decreases():
    cfg = tiny_cfg()
    state, losses, _ = run_steps(cfg, COMPLETION_TASK, tiny_data(), n=30)
    assert losses[-1] < losses[0]
    assert int(state.step) == 30


def test_full_loss_stack_grads_flow():
    cfg = tiny_cfg(use_contextual_loss=True, use_perceptual_loss=True)
    data = tiny_data()
    state, losses, comps = run_steps(cfg, COMPLETION_TASK, data, n=4)
    # adaptive pixel latents must have moved from init
    ap = state.params['adaptive_pix']
    assert float(jnp.abs(ap.latent_alpha).max()) > 0
    assert 'adaptive_percep' in state.params


def test_remapping_style_loss_runs():
    cfg = replace(RemappingConfig(), netwidth=32, netdepth=4, N_rand=64,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  use_style_loss=True)
    data = tiny_data()
    state, losses, comps = run_steps(cfg, REMAPPING_TASK, data, n=4)
    assert 'adaptive_style' in state.params
    assert np.isfinite(losses[-1])


def test_render_matches_shapes_and_range():
    cfg = tiny_cfg()
    data = tiny_data()
    state, _, comps = run_steps(cfg, COMPLETION_TASK, data, n=2)
    render = make_render(cfg, comps.model, comps.embedder, chunk=256)
    img = render(state.params['mlp'], 40, 48)
    assert img.shape == (40, 48, 3)
    assert float(img.min()) >= 0 and float(img.max()) <= 1


def test_no_pix_loss_flag():
    cfg = tiny_cfg(no_pix_loss=True, use_contextual_loss=True)
    data = tiny_data()
    state, _, comps = run_steps(cfg, COMPLETION_TASK, data, n=2)
    assert int(state.step) == 2
