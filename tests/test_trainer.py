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


def _run_block(cfg, task, data, block=8, patch_size=16):
    from npp_tpu.models.trainer import make_fit_block
    comps = build_components(cfg, data, task)
    state, tx = init_fit_state(cfg, task, comps.model, comps.embedder,
                               jax.random.PRNGKey(0), comps.percep,
                               comps.style)
    consts = make_fit_consts(cfg, task, data, patch_size)
    run = make_fit_block(cfg, task, comps.model, comps.embedder, consts,
                         comps.percep, comps.contextual, comps.style, tx,
                         cfg.patch_num, patch_size, block)
    state, metrics = run(state, jax.random.PRNGKey(1))
    return state, metrics


def test_embed_table_block_matches_on_the_fly():
    """cfg.embed_table='float32' gathers from a precomputed canvas table;
    on integer pixel coords that is the SAME function as the on-the-fly
    trig chain. Asserted at two levels: the gathered embedding matches
    base.embed to f32 trig accuracy (XLA's sin/cos argument reduction
    differs by ~1e-5 absolute across compilation contexts — both correct
    to f32 sin accuracy), and a whole scan-block of Adam steps stays
    within noise tolerance (that drift amplifies through the optimiser,
    so the end-of-block bound is looser)."""
    data = tiny_data()
    cfg = tiny_cfg(embed_table='float32')
    comps = build_components(cfg, data, COMPLETION_TASK)
    from npp_tpu.nn.embedder import make_embedding_table
    table = jax.jit(lambda: make_embedding_table(comps.embedder,
                                                 chunk=256).table)()
    rng = np.random.RandomState(3)
    coords = np.stack([rng.randint(0, 40, 64), rng.randint(0, 48, 64)],
                      -1).astype(np.float32)
    direct = np.asarray(comps.embedder.embed(jnp.asarray(coords)))
    idx = coords[:, 0].astype(int) * 48 + coords[:, 1].astype(int)
    np.testing.assert_allclose(np.asarray(table)[idx], direct, atol=3e-5)

    # embed_table defaults ON since round 4 — pin the off arm explicitly
    ref_state, ref_m = _run_block(tiny_cfg(embed_table=''), COMPLETION_TASK,
                                  data)
    tab_state, tab_m = _run_block(cfg, COMPLETION_TASK, data)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(tab_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    assert np.allclose(float(ref_m['loss']), float(tab_m['loss']),
                       rtol=1e-3, atol=1e-4)


def test_embed_table_bf16_close_and_warp_gated():
    """bfloat16 table stays close to f32 (matmul operands round to bf16
    under the default matmul_precision anyway); with warp_field on the
    table is silently ignored (warped coords are non-integer) — the block
    must still run and match the no-table warp path exactly."""
    data = tiny_data()
    ref_state, _ = _run_block(tiny_cfg(embed_table=''), COMPLETION_TASK, data)
    bf_state, _ = _run_block(tiny_cfg(embed_table='bfloat16'),
                             COMPLETION_TASK, data)
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(bf_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)
    warp_ref, _ = _run_block(tiny_cfg(warp_field=True), COMPLETION_TASK,
                             data, block=8)
    warp_tab, _ = _run_block(tiny_cfg(warp_field=True,
                                      embed_table='float32'),
                             COMPLETION_TASK, data, block=8)
    for a, b in zip(jax.tree.leaves(warp_ref.params),
                    jax.tree.leaves(warp_tab.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_embed_table_hbm_guard():
    """embed_table_max_mb below the table size must fall back to the
    on-the-fly chain — bit-identical to embed_table=''."""
    data = tiny_data()
    off_state, _ = _run_block(tiny_cfg(embed_table=''), COMPLETION_TASK,
                              data)
    g_state, _ = _run_block(tiny_cfg(embed_table='float32',
                                     embed_table_max_mb=0),
                            COMPLETION_TASK, data)
    for a, b in zip(jax.tree.leaves(off_state.params),
                    jax.tree.leaves(g_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_embed_table_degrade_bf16_fallback():
    """cfg.embed_table_degrade: when the f32 table busts the budget but a
    bf16 one fits, the block must take the bf16-table path (bit-identical
    to an explicit embed_table='bfloat16' run); with degrade OFF the same
    budget must fall back to on-the-fly trig (bit-identical to table '')."""
    data = tiny_data()
    cfg0 = tiny_cfg(embed_table='float32')
    comps = build_components(cfg0, data, COMPLETION_TASK)
    h, w = comps.embedder.res
    f32_mb = int(h) * int(w) * comps.embedder.out_dim * 4 / 1e6
    # budget between the bf16 and f32 table sizes (ceil so bf16 fits)
    mid_mb = max(1, int(-(-f32_mb // 2)))
    assert f32_mb > mid_mb >= f32_mb / 2

    deg_state, _ = _run_block(tiny_cfg(embed_table='float32',
                                       embed_table_max_mb=mid_mb,
                                       embed_table_degrade=True),
                              COMPLETION_TASK, data)
    bf_state, _ = _run_block(tiny_cfg(embed_table='bfloat16'),
                             COMPLETION_TASK, data)
    for a, b in zip(jax.tree.leaves(deg_state.params),
                    jax.tree.leaves(bf_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    nodeg_state, _ = _run_block(tiny_cfg(embed_table='float32',
                                         embed_table_max_mb=mid_mb),
                                COMPLETION_TASK, data)
    off_state, _ = _run_block(tiny_cfg(embed_table=''), COMPLETION_TASK,
                              data)
    for a, b in zip(jax.tree.leaves(nodeg_state.params),
                    jax.tree.leaves(off_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_no_pix_loss_flag():
    cfg = tiny_cfg(no_pix_loss=True, use_contextual_loss=True)
    data = tiny_data()
    state, _, comps = run_steps(cfg, COMPLETION_TASK, data, n=2)
    assert int(state.step) == 2


def test_remap_collapse_guard_returns_best_milestone(monkeypatch):
    """cfg.remap_guard (round-5 gated stability fix, default on): when the
    FINAL eval sits >remap_guard_db below the best milestone (the measured
    nondeterministic adaptive-scale collapse, results_round5.json
    `remapping_stability`), run_remapping returns the best-milestone
    snapshot; healthy finals are returned untouched."""
    import types
    import numpy as np
    from npp_tpu.config import RemappingConfig, replace
    from npp_tpu.models import remapping as R

    def fake_load(cfg):
        return types.SimpleNamespace(
            img=np.zeros((4, 4, 3)), valid_mask=np.ones((4, 4, 1)),
            orig_shape=(4, 4), extra={'clear_mask': np.ones((4, 4, 1))})

    def fake_evaluate(data, params, render, adaptive, loss_type,
                      percep=None):
        return {'train_psnr': float(params['psnr']),
                'val_psnr': float(params['psnr']),
                'pred_rgb_img': np.zeros((4, 4, 3))}

    trajectory = {'collapse': [(400, 20.0), (800, 30.0), (1200, 5.0)],
                  'healthy': [(400, 20.0), (800, 30.0), (1200, 31.0)]}

    def make_fit(traj):
        def fake_fit(cfg, task, data, eval_hook=None, log_every=None):
            st = None
            for it, psnr in traj:
                st = types.SimpleNamespace(
                    params={'psnr': np.float64(psnr),
                            'adaptive_pix': np.zeros(1)})
                eval_hook(it, st, render=None)
            return types.SimpleNamespace(state=st, render=None,
                                         iters_per_sec=1.0)
        return fake_fit

    monkeypatch.setattr(R, 'load_remapping', fake_load)
    monkeypatch.setattr(R, 'evaluate', fake_evaluate)
    cfg = replace(RemappingConfig(), datadir='/tmp/x', basedir='/tmp/y')

    monkeypatch.setattr(R, 'fit_image', make_fit(trajectory['collapse']))
    _, final, _ = R.run_remapping(cfg, save=False)
    assert final['train_psnr'] == 30.0          # best milestone restored
    assert final['collapse_guard_iter'] == 800.0

    monkeypatch.setattr(R, 'fit_image', make_fit(trajectory['healthy']))
    _, final, _ = R.run_remapping(cfg, save=False)
    assert final['train_psnr'] == 31.0          # untouched
    assert 'collapse_guard_iter' not in final

    # guard off = reference behaviour: the collapsed final is returned
    monkeypatch.setattr(R, 'fit_image', make_fit(trajectory['collapse']))
    _, final, _ = R.run_remapping(replace(cfg, remap_guard=False),
                                  save=False)
    assert final['train_psnr'] == 5.0
