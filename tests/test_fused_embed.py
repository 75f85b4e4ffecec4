"""Pallas fused embedding+matmul: numerical parity with the unfused path in
interpret mode (hardware parity covered by the TPU smoke script)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.config import CompletionConfig
from npp_tpu.nn.embedder import make_task_embedder
from npp_tpu.ops.fused_embed import EmbedGeom, embed_fn, fused_embed_matmul

CFG = CompletionConfig()
RES = (60, 72)


@pytest.fixture(scope='module')
def setup():
    angles = np.array([[100.0, 170.0], [10.0, 80.0], [45.0, 135.0]])
    periods = np.array([[17.0, 23.0], [11.0, 13.0], [29.0, 31.0]])
    emb = make_task_embedder(CFG, angles, periods, RES, jax.random.PRNGKey(0))
    coords = jnp.asarray(
        np.random.RandomState(0).uniform(0, 59, (300, 2)), jnp.float32)
    return emb, coords


def test_embed_fn_matches_task_embedder(setup):
    emb, coords = setup
    geom = EmbedGeom.from_embedder(emb)
    out = embed_fn(coords, geom, RES, CFG.freq_scales, CFG.freq_offsets,
                   CFG.angle_offsets)
    np.testing.assert_allclose(np.asarray(out), np.asarray(emb.embed(coords)),
                               rtol=1e-6, atol=1e-6)


def test_fused_matmul_matches_unfused(setup):
    emb, coords = setup
    geom = EmbedGeom.from_embedder(emb, 0, 1)  # top-1 only
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(emb.top1_dim, 64).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    got = fused_embed_matmul(coords, geom, w, b, res=RES,
                             freq_scales=CFG.freq_scales,
                             freq_offsets=CFG.freq_offsets,
                             angle_offsets=CFG.angle_offsets,
                             tile_n=128, interpret=True)
    want = emb.embed(coords)[:, :emb.top1_dim] @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


import pytest


@pytest.mark.parametrize('bwd_partials', [True, False])
def test_fused_grads_match(setup, bwd_partials):
    emb, coords = setup
    geom = EmbedGeom.from_embedder(emb, 0, 1)
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(emb.top1_dim, 32).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(32).astype(np.float32))

    def f_fused(w, b):
        out = fused_embed_matmul(coords, geom, w, b, res=RES,
                                 freq_scales=CFG.freq_scales,
                                 freq_offsets=CFG.freq_offsets,
                                 angle_offsets=CFG.angle_offsets,
                                 tile_n=128, bwd_partials=bwd_partials,
                                 interpret=True)
        return jnp.sum(jnp.sin(out))

    def f_ref(w, b):
        out = emb.embed(coords)[:, :emb.top1_dim] @ w + b
        return jnp.sum(jnp.sin(out))

    gw1, gb1 = jax.grad(f_fused, argnums=(0, 1))(w, b)
    gw2, gb2 = jax.grad(f_ref, argnums=(0, 1))(w, b)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb1), np.asarray(gb2),
                               rtol=2e-3, atol=2e-3)


def test_fused_model_matches_nppnet(setup):
    from npp_tpu.nn.fused_mlp import NPPNetFused, transplant_from_nppnet
    from npp_tpu.nn.mlp import NPPNet
    emb, coords = setup

    base = NPPNet(input_ch_periodic=emb.top1_dim,
                  input_ch_periodic_aux=emb.out_dim - emb.top1_dim,
                  depth=8, width=64, activation='snake')
    params = base.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, emb.out_dim)))['params']
    want = base.apply({'params': params}, emb.embed(coords))

    fused = NPPNetFused(top1_dim=emb.top1_dim,
                        aux_dim=emb.out_dim - emb.top1_dim, res=RES,
                        freq_scales=CFG.freq_scales,
                        freq_offsets=CFG.freq_offsets,
                        angle_offsets=CFG.angle_offsets, depth=8, width=64,
                        activation='snake', interpret=True)
    fparams = transplant_from_nppnet(params)
    got = fused.apply({'params': fparams}, coords,
                      EmbedGeom.from_embedder(emb, 0, 1),
                      EmbedGeom.from_embedder(emb, 1, None))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_fused_pipeline_path():
    """cfg.fused_embedding routes the fit through NPPNetFused; a short fit
    must run and reduce the pixel loss like the standard path."""
    from npp_tpu.config import replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from tests.test_trainer import run_steps, tiny_cfg, tiny_data

    cfg = replace(tiny_cfg(), fused_embedding=True)
    state, losses, comps = run_steps(cfg, COMPLETION_TASK, tiny_data(), n=10)
    from npp_tpu.nn.fused_mlp import NPPNetFused
    assert isinstance(comps.model, NPPNetFused)
    assert losses[-1] < losses[0]
