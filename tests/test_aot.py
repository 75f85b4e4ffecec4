"""AOT executable cache (utils/aot.py): key discrimination, disk
round-trip with identical outputs, and the fit_image integration path.

The backend must support PJRT executable (de)serialization — XLA:CPU and
the TPU relay both do (measured round 3, scripts/ab_aot_serialize.py);
tests skip cleanly if a backend does not.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.utils import aot


def _serialization_supported() -> bool:
    from jax.experimental import serialize_executable as se
    try:
        c = jax.jit(lambda x: x + 1).lower(jnp.zeros((4,))).compile()
        se.serialize(c)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _serialization_supported(),
    reason='backend does not support executable serialization')


def test_roundtrip_and_hit(tmp_path, monkeypatch):
    monkeypatch.setenv('NPP_TPU_AOT_SYNC', '1')
    x = jnp.arange(12.0).reshape(3, 4)
    f = jax.jit(lambda a: a @ a.T + 1.0)
    logs = []
    w1 = aot._AotWrapped(f, 'tiny', str(tmp_path), log=logs.append)
    out1 = np.asarray(w1(x))
    files = [f_ for f_ in os.listdir(tmp_path) if f_.endswith('.aot')]
    assert len(files) == 1, logs
    assert any('compiled' in m for m in logs)

    # a fresh wrapper instance must LOAD, not recompile
    logs2 = []
    w2 = aot._AotWrapped(f, 'tiny', str(tmp_path), log=logs2.append)
    out2 = np.asarray(w2(x))
    assert any('loaded' in m for m in logs2), logs2
    np.testing.assert_array_equal(out1, out2)


def test_wrapper_retraces_on_new_avals(tmp_path, monkeypatch):
    """The wrapper must resolve one executable PER aval signature, like the
    jit function it replaces — a single pinned executable raised an opaque
    XLA input-mismatch error on the second shape."""
    monkeypatch.setenv('NPP_TPU_AOT_SYNC', '1')
    f = jax.jit(lambda a: a * 2.0 + 1.0)
    w = aot._AotWrapped(f, 'shapes', str(tmp_path))
    a = jnp.arange(6.0).reshape(2, 3)
    b = jnp.arange(20.0).reshape(4, 5)
    np.testing.assert_array_equal(np.asarray(w(a)), np.asarray(a) * 2 + 1)
    np.testing.assert_array_equal(np.asarray(w(b)), np.asarray(b) * 2 + 1)
    # and dtype changes too
    c = jnp.ones((2, 3), jnp.bfloat16)
    assert w(c).dtype == jnp.bfloat16
    files = [f_ for f_ in os.listdir(tmp_path) if f_.endswith('.aot')]
    assert len(files) == 3


def test_key_discriminates(tmp_path):
    f = jax.jit(lambda a: a * 2)
    w = aot._AotWrapped(f, 'k', str(tmp_path))
    base = w._key((jnp.zeros((2, 2)),))
    # different avals
    assert w._key((jnp.zeros((3, 2)),)) != base
    assert w._key((jnp.zeros((2, 2), jnp.bfloat16),)) != base
    # different closure digest
    w_extra = aot._AotWrapped(f, 'k', str(tmp_path), extra=b'img0')
    assert w_extra._key((jnp.zeros((2, 2)),)) != base
    # different cfg
    w_cfg = aot._AotWrapped(f, 'k', str(tmp_path), cfg={'lrate': 1e-3})
    assert w_cfg._key((jnp.zeros((2, 2)),)) != base
    # non-semantic fields (paths / run labels) must NOT fragment the key
    w_a = aot._AotWrapped(f, 'k', str(tmp_path),
                          cfg={'lrate': 1e-3, 'datadir': '/a'})
    w_b = aot._AotWrapped(f, 'k', str(tmp_path),
                          cfg={'lrate': 1e-3, 'datadir': '/b'})
    assert w_a._key((jnp.zeros((2, 2)),)) == w_b._key((jnp.zeros((2, 2)),))
    # stable across instances
    w_same = aot._AotWrapped(f, 'k', str(tmp_path))
    assert w_same._key((jnp.zeros((2, 2)),)) == base


def test_digest_arrays_values_matter():
    a = {'x': jnp.ones((4,)), 'y': np.arange(3)}
    b = {'x': jnp.ones((4,)), 'y': np.arange(3)}
    c = {'x': jnp.ones((4,)) * 2, 'y': np.arange(3)}
    assert aot.digest_arrays(a) == aot.digest_arrays(b)
    assert aot.digest_arrays(a) != aot.digest_arrays(c)


def test_corrupt_entry_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv('NPP_TPU_AOT_SYNC', '1')
    x = jnp.ones((5,))
    f = jax.jit(lambda a: a - 3.0)
    w = aot._AotWrapped(f, 'c', str(tmp_path), log=lambda m: None)
    w(x)
    (path,) = [os.path.join(tmp_path, p) for p in os.listdir(tmp_path)]
    with open(path, 'wb') as fh:
        fh.write(b'garbage')
    logs = []
    w2 = aot._AotWrapped(f, 'c', str(tmp_path), log=logs.append)
    np.testing.assert_array_equal(np.asarray(w2(x)), np.asarray(f(x)))
    assert any('load failed' in m for m in logs)


def test_analytic_tower_disk_cache_roundtrip(tmp_path, monkeypatch):
    """Generated analytic towers persist to $NPP_TPU_AOT_CACHE and reload
    bit-identically in a 'fresh process' (cleared in-process cache)."""
    import npp_tpu.nn.pretrained as P
    from npp_tpu.losses.lpips import LPIPS

    monkeypatch.setenv('NPP_TPU_AOT_CACHE', str(tmp_path))
    monkeypatch.setattr(P, '_PARAM_CACHE', {})
    a = jax.tree.leaves(LPIPS(net='alex').params)
    assert any(f_.startswith('tower-') for f_ in os.listdir(tmp_path))
    monkeypatch.setattr(P, '_PARAM_CACHE', {})
    b = jax.tree.leaves(LPIPS(net='alex').params)
    monkeypatch.delenv('NPP_TPU_AOT_CACHE')
    monkeypatch.setattr(P, '_PARAM_CACHE', {})
    c = jax.tree.leaves(LPIPS(net='alex').params)
    for x, y, z in zip(a, b, c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        np.testing.assert_array_equal(np.asarray(x), np.asarray(z))


def test_detection_grid_rides_cache(tmp_path, monkeypatch):
    """feature_search with aot_dir: the FFT scorer executable is cached on
    disk, and a fresh program registry reloads it with identical grids."""
    monkeypatch.setenv('NPP_TPU_AOT_SYNC', '1')
    from npp_tpu.proposal import search_engine as se

    rng = np.random.default_rng(0)
    act = rng.normal(size=(3, 24, 20)).astype(np.float32)
    mask = (rng.uniform(size=(24, 20)) > 0.2).astype(np.float32)
    r1 = se.feature_search(act, mask, repeat_range=(3, 5, 1),
                           edge_searching=False, aot_dir=str(tmp_path))
    assert any(f_.startswith('det-grid-') and f_.endswith('.aot')
               for f_ in os.listdir(tmp_path))
    monkeypatch.setattr(se, '_GRID_PROGRAMS', {})
    r2 = se.feature_search(act, mask, repeat_range=(3, 5, 1),
                           edge_searching=False, aot_dir=str(tmp_path))
    r3 = se.feature_search(act, mask, repeat_range=(3, 5, 1),
                           edge_searching=False)
    np.testing.assert_allclose(np.asarray(r1[1]), np.asarray(r2[1]))
    np.testing.assert_allclose(np.asarray(r1[1]), np.asarray(r3[1]))


def test_batched_runner_uses_cache_under_mesh(tmp_path, monkeypatch):
    """fit_images on a 2-device mesh with the cache on: the sharded batched
    program serializes, reloads in a fresh wrapper, and reproduces the
    uncached result exactly (device assignment restored from the entry)."""
    monkeypatch.setenv('NPP_TPU_AOT_SYNC', '1')
    import dataclasses
    from npp_tpu.config import CompletionConfig, replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.parallel.mesh import make_mesh
    from npp_tpu.parallel.runner import fit_images
    from tests.test_trainer import tiny_data

    if len(jax.devices()) < 2:
        pytest.skip('needs >=2 devices')
    cfg = replace(CompletionConfig(), netwidth=32, netdepth=2, N_rand=32,
                  patch_num=1, num_real_patch_per_sample=2,
                  use_perceptual_loss=False, use_contextual_loss=False,
                  aot_cache_dir=str(tmp_path / 'aot'))
    datas = [dataclasses.replace(tiny_data(40, 48), patch_size=16),
             dataclasses.replace(tiny_data(36, 44), patch_size=16)]
    mesh = make_mesh(('images',), (2,), devices=jax.devices()[:2])
    s1 = fit_images(cfg, COMPLETION_TASK, datas, n_iters=3, mesh=mesh,
                    canvas_multiple=16)
    assert any(f_.endswith('.aot') for f_ in os.listdir(tmp_path / 'aot'))
    s2 = fit_images(cfg, COMPLETION_TASK, datas, n_iters=3, mesh=mesh,
                    canvas_multiple=16)
    s3 = fit_images(replace(cfg, aot_cache_dir=''), COMPLETION_TASK, datas,
                    n_iters=3, mesh=mesh, canvas_multiple=16)
    for a, b, c in zip(jax.tree.leaves(s1[0].params),
                       jax.tree.leaves(s2[0].params),
                       jax.tree.leaves(s3[0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_fit_image_uses_cache(tmp_path, monkeypatch):
    """fit_image with aot_cache_dir: first run compiles + saves, second run
    (fresh wrapper identity, same image/config) loads and matches the
    uncached trajectory exactly."""
    monkeypatch.setenv('NPP_TPU_AOT_SYNC', '1')
    from npp_tpu.config import replace
    from npp_tpu.models.completion import COMPLETION_TASK
    from npp_tpu.models.pipeline import fit_image
    from tests.test_trainer import tiny_cfg, tiny_data

    cfg = replace(tiny_cfg(), N_iters=17, i_testset=8, i_print=8,
                  aot_cache_dir=str(tmp_path / 'aot'))
    data = tiny_data()
    r1 = fit_image(cfg, COMPLETION_TASK, data)
    saved = [f_ for f_ in os.listdir(tmp_path / 'aot')
             if f_.endswith('.aot')]
    assert saved, 'no executable was cached'

    r2 = fit_image(cfg, COMPLETION_TASK, data)
    for a, b in zip(jax.tree.leaves(r1.state.params),
                    jax.tree.leaves(r2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg_off = replace(cfg, aot_cache_dir='')
    r3 = fit_image(cfg_off, COMPLETION_TASK, data)
    for a, b in zip(jax.tree.leaves(r1.state.params),
                    jax.tree.leaves(r3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_compiles_without_executing(tmp_path, monkeypatch):
    """warm() must compile + persist from ShapeDtypeStruct avals alone
    (scripts/warm_aot.py pre-compiles suite shape classes); the later real
    call must LOAD the in-memory executable, and a second warm must report
    the cache hit."""
    monkeypatch.setenv('NPP_TPU_AOT_SYNC', '1')
    calls = []

    def fn(a):
        calls.append(1)   # traced once at compile; never re-traced
        return a * 3.0

    f = jax.jit(fn)
    logs = []
    w = aot._AotWrapped(f, 'warm', str(tmp_path), log=logs.append)
    sds = jax.ShapeDtypeStruct((3, 4), np.float32)
    hit = w.warm(sds)
    assert hit is False
    files = [f_ for f_ in os.listdir(tmp_path) if f_.endswith('.aot')]
    assert len(files) == 1
    assert any('compiled' in m for m in logs)

    x = jnp.arange(12.0).reshape(3, 4)
    out = np.asarray(w(x))
    np.testing.assert_allclose(out, np.asarray(x) * 3.0)
    assert len(calls) == 1   # no retrace on the real call

    # a fresh wrapper's warm must hit the disk entry
    w2 = aot._AotWrapped(f, 'warm', str(tmp_path))
    assert w2.warm(sds) is True
