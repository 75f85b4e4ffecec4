"""MLP parity: load reference state_dicts into the flax modules and compare
outputs bit-for-bit (up to fp32 matmul reassociation)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.nn.mlp import NPPNet, NPPNetTop1, NPPNetLight

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'goldens')


def _sd(g, key):
    return jnp.asarray(g[f'sd_{key}'])


def _linear_params(g, torch_name):
    # torch Linear weight is (out, in); our kernel is (in, out)
    return {'kernel': _sd(g, f'{torch_name}.weight').T,
            'bias': _sd(g, f'{torch_name}.bias')}


def _trunk_params(g, depth):
    p = {}
    for i in range(depth):
        p[f'periodic_{i}'] = _linear_params(g, f'periodic_linears.{i}')
    p['feature1'] = _linear_params(g, 'feature_linear1')
    p['rgb'] = _linear_params(g, 'rgb_linear')
    p['pos_0'] = _linear_params(g, 'pos_linears.0')
    return p


def test_nppnet_matches_reference():
    g = np.load(os.path.join(GOLDEN_DIR, 'nppnet.npz'))
    model = NPPNet(input_ch_periodic=22 * 21, input_ch_periodic_aux=44 * 21,
                   depth=8, width=64, activation='snake')
    params = _trunk_params(g, 8)
    params['feature2'] = _linear_params(g, 'feature_linear2')
    params['scale_0'] = _linear_params(g, 'scale_linears.0')
    out = model.apply({'params': params}, jnp.asarray(g['x']))
    np.testing.assert_allclose(np.asarray(out), g['y'], rtol=1e-4, atol=1e-5)


def test_nppnet_top1_matches_reference():
    g = np.load(os.path.join(GOLDEN_DIR, 'nppnet_top1.npz'))
    model = NPPNetTop1(input_ch_periodic=22 * 21, depth=8, width=64,
                       activation='snake')
    params = _trunk_params(g, 8)
    out = model.apply({'params': params}, jnp.asarray(g['x']))
    np.testing.assert_allclose(np.asarray(out), g['y'], rtol=1e-4, atol=1e-5)


def test_nppnet_light_matches_reference():
    g = np.load(os.path.join(GOLDEN_DIR, 'nppnet_light.npz'))
    model = NPPNetLight(input_ch_periodic_all=20, n_scales=1, n_offsets=5,
                        n_angle_offsets=1, depth=4, width=32, activation='snake')
    params = _trunk_params(g, 4)
    out = model.apply({'params': params}, jnp.asarray(g['x_pos']),
                      jnp.asarray(g['x_peri']))
    np.testing.assert_allclose(np.asarray(out), g['y'], rtol=1e-4, atol=1e-5)


def test_init_shapes_full_size():
    """Canonical completion model: D=8, W=512, 1386-ch input (SURVEY.md §2 C8)."""
    model = NPPNet(input_ch_periodic=462, input_ch_periodic_aux=924,
                   depth=8, width=512, activation='snake')
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1386)))
    out = model.apply(params, jnp.zeros((4, 1386)))
    assert out.shape == (4, 3)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert n > 2e6  # 8x512 trunk plus fuse layers


def test_torch_linear_init_distribution():
    from npp_tpu.nn.mlp import TorchLinear
    lin = TorchLinear(64)
    params = lin.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))['params']
    bound = 1.0 / np.sqrt(100)
    k = np.asarray(params['kernel'])
    assert np.abs(k).max() <= bound + 1e-6
    assert np.abs(k).std() > bound / 4  # roughly uniform, not degenerate
