"""Embedder parity vs reference goldens (models/embedder.py semantics),
including exact channel ordering."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.nn import embedder as E

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens', 'embedder.npz')


@pytest.fixture(scope='module')
def g():
    return np.load(GOLDEN)


def _log_bands():
    return E.log_freq_bands(10, 9.0)


def test_fourier_encode_matches_reference(g):
    out = E.fourier_encode(jnp.asarray(g['coords']), _log_bands(), include_input=True)
    np.testing.assert_allclose(np.asarray(out), g['fourier_out'], rtol=1e-5, atol=1e-4)


def test_fourier_search_mode_matches_reference(g):
    res = tuple(int(v) for v in g['res'])
    coords = jnp.asarray(g['coords_yx'])
    out = E.fourier_encode(E.normalize_coords(coords, res), _log_bands(),
                           include_input=True)
    np.testing.assert_allclose(np.asarray(out), g['fourier_search_out'],
                               rtol=1e-5, atol=1e-4)


def test_periodic_warp_matches_reference(g):
    res = tuple(int(v) for v in g['res'])
    out = E.periodic_warp(jnp.asarray(g['coords_yx2']), jnp.asarray(g['angles']),
                          jnp.asarray(g['periods']), (1,), (0, -1, 1, 0.5, -0.5),
                          (0,), res, include_input=True)
    np.testing.assert_allclose(np.asarray(out), g['periodic_out'],
                               rtol=1e-4, atol=1e-4)


def test_periodic_warp_search_mode(g):
    res = tuple(int(v) for v in g['res'])
    out = E.periodic_warp(jnp.asarray(g['coords_yx2']), jnp.asarray(g['angles']),
                          jnp.asarray(g['periods']), (1,), (0, -1, 1, 0.5, -0.5),
                          (0,), res, include_input=False)
    np.testing.assert_allclose(np.asarray(out), g['periodic_search_out'],
                               rtol=1e-4, atol=1e-4)


def test_task_embedder_dims():
    import jax
    from npp_tpu.config import CompletionConfig
    cfg = CompletionConfig()
    angles = np.array([[100.0, 170.0]] * 3)
    periods = np.array([[37.0, 43.0]] * 3)
    te = E.make_task_embedder(cfg, angles, periods, (120, 180),
                              jax.random.PRNGKey(0))
    assert te.out_dim == 3 * 22 * 21  # SURVEY.md §2 C7: 1386 channels
    out = te.embed(jnp.zeros((5, 2)))
    assert out.shape == (5, 1386)


def test_task_embedder_blocks_are_proposal_major():
    """Top-1 proposal must occupy the first 462 channels (the MLP splits on
    this boundary, reference: networks.py:58-61)."""
    import jax
    from npp_tpu.config import CompletionConfig
    cfg = CompletionConfig()
    angles = np.array([[100.0, 170.0], [10.0, 80.0], [45.0, 135.0]])
    periods = np.array([[37.0, 43.0], [20.0, 25.0], [50.0, 60.0]])
    te = E.make_task_embedder(cfg, angles, periods, (120, 180),
                              jax.random.PRNGKey(0))
    te1 = E.make_task_embedder(cfg, angles[:1], periods[:1], (120, 180),
                               jax.random.PRNGKey(0))
    coords = jnp.asarray(np.random.RandomState(0).uniform(0, 100, (7, 2)))
    full = te.embed(coords)
    top1 = te1.embed(coords)
    np.testing.assert_allclose(np.asarray(full[:, :462]), np.asarray(top1),
                               rtol=1e-6)
