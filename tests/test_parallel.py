"""Multi-device sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §2.3: images axis data-parallel, pixels axis for rendering)."""
import jax
import numpy as np
import pytest


def test_mesh_creation():
    from npp_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(('images',))
    assert mesh.shape['images'] == len(jax.devices())
    mesh2 = make_mesh(('images', 'pixels'), (4, 2))
    assert mesh2.shape == {'images': 4, 'pixels': 2}


def test_dryrun_multichip_8():
    """The driver's exact multi-chip validation path."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_forward():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_batched_step_matches_individual_sequential_steps():
    """One batched sharded step must EQUAL each image's sequential
    single-image step: same init key, same step key (the sequential path
    feeds every image the same PRNGKey chain), per-image consts."""
    import jax.numpy as jnp
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import make_fit_consts
    from npp_tpu.models.trainer import (FitState, init_fit_state,
                                        make_fit_step)
    from npp_tpu.parallel.batch import (init_batched_state,
                                        make_batched_fit_step, stack_consts,
                                        stack_embedders)
    from npp_tpu.parallel.mesh import make_mesh, shard_leading_axis
    from npp_tpu.nn.mlp import NPPNet
    from tests.test_trainer import tiny_data
    import dataclasses
    from npp_tpu.nn.embedder import make_task_embedder

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  matmul_precision='float32')
    datas = [dataclasses.replace(tiny_data(40, 48), patch_size=16),
             dataclasses.replace(tiny_data(36, 44), patch_size=16)]
    # pad the second image into the shared 40x48 canvas like the runner
    from npp_tpu.parallel.runner import pad_to_canvas
    dims = [d.img.shape[:2] for d in datas]
    datas = [pad_to_canvas(d, 40, 48) for d in datas]
    embedders = [make_task_embedder(cfg, np.asarray(d.selected_angles),
                                    np.asarray(d.selected_periods), dims[j],
                                    jax.random.PRNGKey(cfg.seed))
                 for j, d in enumerate(datas)]
    model = NPPNet(input_ch_periodic=embedders[0].top1_dim,
                   input_ch_periodic_aux=embedders[0].out_dim -
                   embedders[0].top1_dim,
                   depth=cfg.netdepth, width=cfg.netwidth,
                   activation=cfg.activation)

    k_init, k_step = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    state, tx = init_batched_state(cfg, COMPLETION_TASK, model, embedders,
                                   k_init, None, None)
    consts_list = [make_fit_consts(cfg, COMPLETION_TASK, d, 16)
                   for d in datas]
    from npp_tpu.parallel.runner import _pad_pools_to_common
    consts_common = _pad_pools_to_common(consts_list)
    step = make_batched_fit_step(cfg, COMPLETION_TASK, model, None, None,
                                 None, tx, cfg.patch_num, 16, mesh=mesh)
    new_state, metrics = step(shard_leading_axis(state, mesh),
                              stack_embedders(embedders),
                              shard_leading_axis(
                                  stack_consts(consts_common), mesh),
                              k_step)
    assert np.isfinite(float(metrics['loss']))

    for j in range(2):
        st_j, tx_j = init_fit_state(cfg, COMPLETION_TASK, model,
                                    embedders[j], k_init, None, None)
        sstep = make_fit_step(cfg, COMPLETION_TASK, model, embedders[j],
                              consts_list[j], None, None, None, tx_j,
                              cfg.patch_num, 16)
        seq_state, _ = sstep(st_j, k_step)
        for a, b in zip(jax.tree.leaves(seq_state.params),
                        jax.tree.leaves(new_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b[j]),
                                       rtol=2e-4, atol=2e-5)


def test_fit_images_bucketed_runner():
    """Two differently-sized tiny images padded into one bucket, fit
    concurrently on the virtual mesh."""
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data
    import dataclasses

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False)
    d1 = tiny_data(40, 48)
    d2 = tiny_data(36, 44)
    d1 = dataclasses.replace(d1, patch_size=16)
    d2 = dataclasses.replace(d2, patch_size=16)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    states = fit_images(cfg, COMPLETION_TASK, [d1, d2], n_iters=3, mesh=mesh,
                        canvas_multiple=16)
    assert len(states) == 2
    assert all(int(s.step) == 3 for s in states)
    k1 = jax.tree.leaves(states[0].params['mlp'])[0]
    k2 = jax.tree.leaves(states[1].params['mlp'])[0]
    assert not np.allclose(np.asarray(k1), np.asarray(k2))


def test_fit_images_applies_patch_decay(monkeypatch):
    """The batched runner must re-stage (halve patch size, double patch_num)
    at decay boundaries like the single-image path."""
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.parallel import runner as R
    from npp_tpu.parallel.mesh import make_mesh
    from tests.test_trainer import tiny_data

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  patch_size_decay=10)
    d = dataclasses.replace(tiny_data(48, 48), patch_size=32)

    seen = []
    orig = R.make_batched_fit_step

    def spy(*args, **kwargs):
        seen.append((args[-2], args[-1]))  # (patch_num, patch_size)
        return orig(*args, **kwargs)

    monkeypatch.setattr(R, 'make_batched_fit_step', spy)
    mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    R.fit_images(cfg, COMPLETION_TASK, [d], n_iters=30, mesh=mesh,
                 canvas_multiple=16)
    assert (1, 32) in seen and (2, 16) in seen, seen


def test_batched_fit_with_warp_field():
    """The learnable warp field must work under the batched SPMD path:
    warp params stack on the images axis, the vmapped loss sees them, and
    the pixel-sharded render consumes the full params dict."""
    import jax.numpy as jnp
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import make_fit_consts
    from npp_tpu.parallel.batch import (init_batched_state,
                                        make_batched_fit_step,
                                        make_sharded_render, stack_consts,
                                        stack_embedders)
    from npp_tpu.parallel.mesh import make_mesh, shard_leading_axis
    from npp_tpu.nn.mlp import NPPNet
    import __graft_entry__ as ge

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  warp_field=True, warp_max_px=4.0)
    datas, embedders = [], []
    for i in range(2):
        d, e = ge._tiny_setup(cfg, patch_size=16)
        datas.append(d)
        embedders.append(e)
    model = NPPNet(input_ch_periodic=embedders[0].top1_dim,
                   input_ch_periodic_aux=embedders[0].out_dim -
                   embedders[0].top1_dim,
                   depth=cfg.netdepth, width=cfg.netwidth,
                   activation=cfg.activation)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    state, tx = init_batched_state(cfg, COMPLETION_TASK, model, embedders,
                                   jax.random.PRNGKey(0), None, None)
    assert 'warp' in state.params  # stacked warp params
    consts = stack_consts([
        make_fit_consts(cfg, COMPLETION_TASK, d, 16) for d in datas])
    step = make_batched_fit_step(cfg, COMPLETION_TASK, model, None, None,
                                 None, tx, cfg.patch_num, 16, mesh=mesh)
    new_state, metrics = step(shard_leading_axis(state, mesh),
                              stack_embedders(embedders),
                              shard_leading_axis(consts, mesh),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    # warp params received gradient updates
    w0 = jax.tree.leaves(state.params['warp'])
    w1 = jax.tree.leaves(new_state.params['warp'])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(w0, w1))

    pmesh = make_mesh(('pixels',), (2,), devices=jax.devices()[:2])
    render = make_sharded_render(cfg, model, pmesh, chunk=1 << 8)
    p0 = jax.tree.map(lambda x: x[0], new_state.params)
    img = render(p0, embedders[0], 48, 56)
    assert img.shape == (48, 56, 3) and np.isfinite(np.asarray(img)).all()


def test_batched_segmentation_step_under_mesh():
    """Segmentation batched step (contextual ON, reference loss config)
    sharded over the images axis (VERDICT round-2 weak #5: multi-chip
    coverage for all three tasks)."""
    from npp_tpu.config import SegmentationConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.models.pipeline import make_fit_consts
    from npp_tpu.models.segmentation import SEGMENTATION_TASK
    from npp_tpu.parallel.batch import (init_batched_state,
                                        make_batched_fit_step, stack_consts,
                                        stack_embedders)
    from npp_tpu.parallel.mesh import make_mesh, shard_leading_axis
    from npp_tpu.nn.mlp import NPPNet
    import __graft_entry__ as ge

    cfg = replace(SegmentationConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2)
    datas, embedders = [], []
    for i in range(2):
        d, e = ge._tiny_setup(cfg, patch_size=16)
        datas.append(d)
        embedders.append(e)
    model = NPPNet(input_ch_periodic=embedders[0].top1_dim,
                   input_ch_periodic_aux=embedders[0].out_dim -
                   embedders[0].top1_dim,
                   depth=cfg.netdepth, width=cfg.netwidth,
                   activation=cfg.activation)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    cx = ContextualLoss(use_vgg=True)
    state, tx = init_batched_state(cfg, SEGMENTATION_TASK, model, embedders,
                                   jax.random.PRNGKey(0), None, None)
    consts = stack_consts([
        make_fit_consts(cfg, SEGMENTATION_TASK, d, 16) for d in datas])
    step = make_batched_fit_step(cfg, SEGMENTATION_TASK, model, None, cx,
                                 None, tx, cfg.patch_num, 16, mesh=mesh)
    new_state, metrics = step(shard_leading_axis(state, mesh),
                              stack_embedders(embedders),
                              shard_leading_axis(consts, mesh),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert np.asarray(new_state.step).tolist() == [1, 1]


def test_batched_remapping_step_style_and_perceptual_under_mesh():
    """Remapping batched step with STYLE loss + adaptive style latents +
    perceptual loss ON, sharded over the images axis: the round-2 dryrun
    covered completion only (VERDICT round-2 weak #5)."""
    import dataclasses
    from npp_tpu.config import RemappingConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.losses.style import StyleLoss
    from npp_tpu.models.pipeline import make_fit_consts
    from npp_tpu.models.remapping import REMAPPING_TASK
    from npp_tpu.parallel.batch import (init_batched_state,
                                        make_batched_fit_step, stack_consts,
                                        stack_embedders)
    from npp_tpu.parallel.mesh import make_mesh, shard_leading_axis
    from npp_tpu.nn.mlp import NPPNet
    import __graft_entry__ as ge

    cfg = replace(RemappingConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=True, use_style_loss=True,
                  use_adaptive_style_loss=True)
    datas, embedders = [], []
    for i in range(2):
        d, e = ge._tiny_setup(cfg, patch_size=16)
        d = dataclasses.replace(d, extra={'clear_mask': d.mask * d.valid_mask})
        datas.append(d)
        embedders.append(e)
    model = NPPNet(input_ch_periodic=embedders[0].top1_dim,
                   input_ch_periodic_aux=embedders[0].out_dim -
                   embedders[0].top1_dim,
                   depth=cfg.netdepth, width=cfg.netwidth,
                   activation=cfg.activation)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    percep = LPIPS(net='vgg')
    cx = ContextualLoss(use_vgg=True)
    style = StyleLoss(use_adaptive=True)
    state, tx = init_batched_state(cfg, REMAPPING_TASK, model, embedders,
                                   jax.random.PRNGKey(0), percep, style)
    # adaptive latents stacked on the images axis
    assert 'adaptive_percep' in state.params
    assert 'adaptive_style' in state.params
    consts = stack_consts([
        make_fit_consts(cfg, REMAPPING_TASK, d, 16) for d in datas])
    step = make_batched_fit_step(cfg, REMAPPING_TASK, model, percep, cx,
                                 style, tx, cfg.patch_num, 16, mesh=mesh)
    new_state, metrics = step(shard_leading_axis(state, mesh),
                              stack_embedders(embedders),
                              shard_leading_axis(consts, mesh),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    assert 'style' in metrics


def test_ranking_candidate_axis_sharded():
    """rank_proposals with a ('candidates',) mesh: lockstep fit + vmapped
    eval shard the candidate axis across devices; distances must match the
    unsharded path (the candidates are independent)."""
    from npp_tpu.config import SearchConfig, replace
    from npp_tpu.losses.contextual import ContextualLoss
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.proposal.ranking import rank_proposals

    h, w = 64, 72
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    img = np.clip(np.stack([0.5 + 0.45 * np.sin(2 * np.pi * yy / 12.0),
                            0.5 + 0.45 * np.cos(2 * np.pi * xx / 16.0),
                            0.5 * np.ones((h, w))], -1), 0, 1)
    val_mask = (yy > 24) & (yy < 40) & (xx > 28) & (xx < 44)
    i_val = np.stack(np.nonzero(val_mask), 1)
    i_train = np.stack(np.nonzero(~val_mask), 1)
    angles = [[90.0, 180.0], [90.0, 180.0]]
    periods = [[16.0, 12.0], [7.0, 5.0]]
    percep, cx = LPIPS(net='vgg'), ContextualLoss(use_vgg=True)
    cfg = replace(SearchConfig(), netdepth=2, netwidth=32, N_rand=64,
                  N_iters=20)

    d_plain = rank_proposals(cfg, img, i_train, i_val, angles, periods,
                             percep, cx)
    mesh = make_mesh(('candidates',), (4,), devices=jax.devices()[:4])
    d_sharded = rank_proposals(cfg, img, i_train, i_val, angles, periods,
                               percep, cx, mesh=mesh)
    np.testing.assert_allclose(d_plain, d_sharded, rtol=1e-5, atol=1e-6)


def test_fit_images_invariant_to_bucket_canvas():
    """Padding an image into a larger shared bucket canvas must not change
    its fit: coordinate normalisation uses the per-image tight dims
    (measured -0.9 dB on the round-3 batched suite when the bucket canvas
    leaked into the embedding)."""
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  matmul_precision='float32')
    d = dataclasses.replace(tiny_data(40, 48), patch_size=16)
    mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    s_tight = fit_images(cfg, COMPLETION_TASK, [d], n_iters=5, mesh=mesh,
                         canvas_multiple=8)[0]
    s_bucket = fit_images(cfg, COMPLETION_TASK, [d], n_iters=5, mesh=mesh,
                          canvas_multiple=64)[0]
    for a, b in zip(jax.tree.leaves(s_tight.params),
                    jax.tree.leaves(s_bucket.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_fit_images_chain_matches_sequential_fit_image():
    """The batched runner's FULL iteration loop (block alignment, decay
    semantics, rng chain) must reproduce fit_image's results end-to-end,
    not just one step."""
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import fit_image
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  matmul_precision='float32', N_iters=11, i_testset=10,
                  i_print=10, canvas_multiple=16)
    d = dataclasses.replace(tiny_data(40, 48), patch_size=16)
    seq = fit_image(cfg, COMPLETION_TASK, d, log_every=cfg.i_print)
    mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    bat = fit_images(cfg, COMPLETION_TASK, [d], mesh=mesh,
                     canvas_multiple=16)[0]
    assert int(bat.step) == int(seq.state.step)
    for a, b in zip(jax.tree.leaves(seq.state.params),
                    jax.tree.leaves(bat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_fit_images_chain_matches_sequential_when_gcd_below_8():
    """fit_image disables scan blocks when gcd(i_testset, i_print) < 8 and
    consumes one rng split PER ITERATION; the batched runner must follow
    (it used to fall back to block=100, silently diverging the key
    chain)."""
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import fit_image
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  matmul_precision='float32', N_iters=8, i_testset=5,
                  i_print=5, canvas_multiple=16)
    d = dataclasses.replace(tiny_data(40, 48), patch_size=16)
    seq = fit_image(cfg, COMPLETION_TASK, d, log_every=cfg.i_print)
    mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    bat = fit_images(cfg, COMPLETION_TASK, [d], mesh=mesh,
                     canvas_multiple=16)[0]
    assert int(bat.step) == int(seq.state.step)
    for a, b in zip(jax.tree.leaves(seq.state.params),
                    jax.tree.leaves(bat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_fit_images_segmentation_refine_and_remapping_eval():
    """The batched suite path for the OTHER two tasks (run_suite --batched,
    round 3): fit_images with SEGMENTATION_TASK / REMAPPING_TASK on the
    virtual mesh, then the host-side post-fit stage each task needs —
    refine_segmentation on the rendered batched params, and
    remapping.evaluate with the adaptive pixel state."""
    import dataclasses
    from npp_tpu.config import RemappingConfig, SegmentationConfig, replace
    from npp_tpu.losses.lpips import LPIPS
    from npp_tpu.models.remapping import REMAPPING_TASK
    from npp_tpu.models.remapping import evaluate as remap_evaluate
    from npp_tpu.models.segmentation import (SEGMENTATION_TASK,
                                             refine_segmentation)
    from npp_tpu.parallel.batch import make_sharded_render
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images, pad_to_canvas
    from tests.test_trainer import tiny_data

    # --- segmentation: 2 images, one bucket, fit + refine ---
    cfg = replace(SegmentationConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  N_iters=5, i_testset=4, i_print=4)
    datas = []
    for hw in ((40, 48), (36, 44)):
        d = dataclasses.replace(tiny_data(*hw), patch_size=16)
        blur = d.img.copy()
        non_period = (1 - d.mask)
        d = dataclasses.replace(
            d, masked_img=blur,
            extra={'blur_img': blur, 'non_period_mask': non_period})
        datas.append(d)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    states, ctxs = fit_images(cfg, SEGMENTATION_TASK, datas, mesh=mesh,
                              canvas_multiple=16, return_ctx=True)
    # render on a DIFFERENT (1-device) mesh than the 2-device fit — the
    # run_suite --batched scenario; fails if fit_images returns states
    # still committed to the images mesh
    pmesh = make_mesh(('pixels',), (1,), devices=jax.devices()[:1])
    lpips_alex = LPIPS(net='alex')
    for d, st, ctx in zip(datas, states, ctxs):
        d_b = pad_to_canvas(d, *ctx['canvas'])
        srender = make_sharded_render(ctx['cfg'], ctx['model'], pmesh,
                                      chunk=1 << 8)
        pred = np.asarray(srender(st.params, ctx['embedder'],
                                  *ctx['canvas']))
        res = refine_segmentation(cfg, d_b, pred, lpips_alex)
        oh, ow = d.img.shape[:2]
        assert res['non_period_mask'].shape == (oh, ow, 1)
        frac = float(res['non_period_mask'].mean())
        assert np.isfinite(frac) and 0.0 <= frac <= 1.0

    # --- remapping: 1 image, fit + evaluate (clear-mask pixel masking) ---
    rcfg = replace(RemappingConfig(), netwidth=32, netdepth=2, N_rand=32,
                   patch_num=1, num_real_patch_per_sample=2,
                   use_perceptual_loss=False, use_contextual_loss=False,
                   use_style_loss=False, N_iters=5, i_testset=4, i_print=4)
    rd = dataclasses.replace(tiny_data(40, 48), patch_size=16)
    mesh1 = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    (st,), (ctx,) = fit_images(rcfg, REMAPPING_TASK, [rd], mesh=mesh1,
                               canvas_multiple=16, return_ctx=True)
    d_b = pad_to_canvas(rd, *ctx['canvas'])
    pmesh1 = make_mesh(('pixels',), (1,), devices=jax.devices()[:1])
    srender = make_sharded_render(ctx['cfg'], ctx['model'], pmesh1,
                                  chunk=1 << 8)

    def render(params, hh, ww):
        return srender(params, ctx['embedder'], hh, ww)

    final = remap_evaluate(d_b, st.params, render,
                           st.params['adaptive_pix'], rcfg.loss_type)
    assert np.isfinite(final['train_psnr'])
    assert np.isfinite(final['val_psnr'])
    oh, ow = rd.img.shape[:2]
    assert final['pred_rgb_img'].shape == (oh, ow, 3)


def test_fit_images_chain_matches_sequential_across_decay_boundaries():
    """Chain parity THROUGH the patch-decay restages (the --preset quality
    path runs 3 stages): two decays (64->32->16) plus the skip-decay-in-
    final-10-iters rule must leave batched == sequential bit-for-bit in
    rng consumption and near-identical in params."""
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import fit_image
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  matmul_precision='float32', N_iters=35, i_testset=10,
                  i_print=10, patch_size_decay=10, canvas_multiple=16)
    d = dataclasses.replace(tiny_data(96, 112), patch_size=64)
    seq = fit_image(cfg, COMPLETION_TASK, d, log_every=cfg.i_print)
    mesh = make_mesh(('images',), (1,), devices=jax.devices()[:1])
    bat = fit_images(cfg, COMPLETION_TASK, [d], mesh=mesh,
                     canvas_multiple=16)[0]
    assert int(bat.step) == int(seq.state.step)
    for a, b in zip(jax.tree.leaves(seq.state.params),
                    jax.tree.leaves(bat.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_fit_images_embed_table_matches_off():
    """cfg.embed_table in the BATCHED runner: per-image embedding tables
    are built over the shared BUCKET canvas grid while their values keep
    each image's TIGHT-canvas normalisation (the canvas-leak rule). The
    fits must match the on-the-fly batched path to trig-noise tolerance —
    including the smaller image, whose table rows beyond its tight canvas
    exist (bucket index space) but are never gathered."""
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False)
    d1 = dataclasses.replace(tiny_data(40, 48), patch_size=16)
    d2 = dataclasses.replace(tiny_data(36, 44), patch_size=16)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    # embed_table defaults ON since round 4 — pin the off arm explicitly
    base = fit_images(replace(cfg, embed_table=''), COMPLETION_TASK,
                      [d1, d2], n_iters=16, mesh=mesh, canvas_multiple=16,
                      block=8)
    tab = fit_images(replace(cfg, embed_table='float32'), COMPLETION_TASK,
                     [d1, d2], n_iters=16, mesh=mesh, canvas_multiple=16,
                     block=8)
    for s_base, s_tab in zip(base, tab):
        for a, b in zip(jax.tree.leaves(s_base.params),
                        jax.tree.leaves(s_tab.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)
    # HBM guard: a budget below the table size must fall back to the
    # on-the-fly chain — bit-identical to embed_table=''
    guarded = fit_images(replace(cfg, embed_table='float32',
                                 embed_table_max_mb=0), COMPLETION_TASK,
                         [d1, d2], n_iters=16, mesh=mesh, canvas_multiple=16,
                         block=8)
    for s_base, s_g in zip(base, guarded):
        for a, b in zip(jax.tree.leaves(s_base.params),
                        jax.tree.leaves(s_g.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # embed_table_degrade: a budget between the bf16 and f32 TOTAL table
    # sizes (B images over the bucket canvas) must take the bf16-table
    # path — bit-identical to an explicit embed_table='bfloat16' run
    from npp_tpu.models.pipeline import build_components
    out_dim = build_components(cfg, d1, COMPLETION_TASK).embedder.out_dim
    f32_mb = 2 * 48 * 48 * out_dim * 4 / 1e6
    mid_mb = max(1, int(-(-f32_mb // 2)))
    assert f32_mb > mid_mb >= f32_mb / 2
    degraded = fit_images(replace(cfg, embed_table='float32',
                                  embed_table_max_mb=mid_mb,
                                  embed_table_degrade=True),
                          COMPLETION_TASK, [d1, d2], n_iters=16, mesh=mesh,
                          canvas_multiple=16, block=8)
    bf16 = fit_images(replace(cfg, embed_table='bfloat16'), COMPLETION_TASK,
                      [d1, d2], n_iters=16, mesh=mesh, canvas_multiple=16,
                      block=8)
    for s_d, s_b in zip(degraded, bf16):
        for a, b in zip(jax.tree.leaves(s_d.params),
                        jax.tree.leaves(s_b.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_images_milestone_hook_matches_prefix_run():
    """milestone_hook fires at fit_image's eval cadence (i % i_testset == 0)
    with the bucket's original indices, and the state it sees at iteration m
    is BIT-IDENTICAL to a fresh fit_images run of n_iters=m (the rng chain
    is a pure prefix — the hook observes, never perturbs)."""
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data

    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  i_testset=4, i_print=2)
    d1 = dataclasses.replace(tiny_data(40, 48), patch_size=16)
    d2 = dataclasses.replace(tiny_data(36, 44), patch_size=16)
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])

    fired = []

    def hook(i, idxs, state):
        fired.append((i, list(idxs), jax.tree.map(np.asarray, state.params)))

    fit_images(cfg, COMPLETION_TASK, [d1, d2], n_iters=8, mesh=mesh,
               canvas_multiple=16, milestone_hook=hook)
    assert [f[0] for f in fired] == [4, 8], fired
    assert fired[0][1] == [0, 1]

    prefix = fit_images(cfg, COMPLETION_TASK, [d1, d2], n_iters=4, mesh=mesh,
                        canvas_multiple=16)
    snap4 = fired[0][2]
    for j in range(2):
        row = jax.tree.map(lambda x, jj=j: x[jj], snap4)
        for a, b in zip(jax.tree.leaves(row),
                        jax.tree.leaves(prefix[j].params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
