"""Golden-vector parity tests for the robust loss stack.

Goldens generated once from the reference torch implementation
(externel_lib/robust_loss_pytorch) — see tests/goldens/robust_loss.npz.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.losses import robust

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens', 'robust_loss.npz')


@pytest.fixture(scope='module')
def golden():
    return np.load(GOLDEN)


def test_general_lossfun_matches_reference(golden):
    out = robust.general_lossfun(
        jnp.asarray(golden['x']), jnp.asarray(golden['alpha']),
        jnp.asarray(golden['scale']))
    np.testing.assert_allclose(np.asarray(out), golden['general'],
                               rtol=1e-5, atol=1e-5)


def test_log_partition_matches_reference(golden):
    out = robust.log_base_partition_function(jnp.asarray(golden['alpha']))
    np.testing.assert_allclose(np.asarray(out), golden['log_partition'],
                               rtol=1e-5, atol=1e-5)


def test_nllfun_matches_reference(golden):
    out = robust.nllfun(jnp.asarray(golden['x']), jnp.asarray(golden['alpha']),
                        jnp.asarray(golden['scale']))
    np.testing.assert_allclose(np.asarray(out), golden['nll'],
                               rtol=1e-5, atol=1e-5)


def test_adaptive_init_maps_to_alpha1_scale1():
    p = robust.adaptive_init(3)
    np.testing.assert_allclose(np.asarray(robust.adaptive_alpha(p)), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(robust.adaptive_scale(p)), 1.0, atol=1e-6)


def test_adaptive_lossfun_shape_and_grad():
    import jax
    p = robust.adaptive_init(3)
    x = jnp.ones((16, 3)) * 0.1

    def f(p):
        return jnp.mean(robust.adaptive_lossfun(x, p))

    val, grads = jax.value_and_grad(f)(p)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)


def test_special_alphas_reduce_to_known_losses():
    x = jnp.linspace(-3, 3, 11)
    l2 = robust.general_lossfun(x, jnp.asarray(2.0), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(l2), 0.5 * np.asarray(x) ** 2, rtol=1e-6)
    cauchy = robust.general_lossfun(x, jnp.asarray(0.0), jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(cauchy),
                               np.log1p(0.5 * np.asarray(x) ** 2), rtol=1e-6)


def test_adaptive_scale_lo_floors_the_scale():
    """cfg.adaptive_scale_lo: with the latent ridden far negative (the
    measured extended-schedule failure mode, results_round4.json), a raised
    floor must bound the effective scale — img2mse with scale_lo=0.01 equals
    the NLL evaluated at scale exactly 0.01, and differs from the reference
    1e-5-floor default."""
    from npp_tpu.losses.pixel import img2mse
    p = robust.AdaptiveLossParams(
        latent_alpha=jnp.zeros((1, 3)),
        latent_scale=jnp.full((1, 3), -40.0))  # softplus(-40) ~ 0: at floor
    x = jnp.full((8, 3), 0.05)
    floored = img2mse(x, jnp.zeros_like(x), 'robust_loss_adaptive', p,
                      scale_lo=0.01)
    expected = jnp.mean(robust.nllfun(x, robust.adaptive_alpha(p),
                                      jnp.asarray(0.01)))
    np.testing.assert_allclose(float(floored), float(expected), rtol=1e-5)
    default = img2mse(x, jnp.zeros_like(x), 'robust_loss_adaptive', p)
    assert not np.isclose(float(floored), float(default))
    # the default (scale_lo omitted) must stay the reference's 1e-5 floor
    ref = jnp.mean(robust.nllfun(x, robust.adaptive_alpha(p),
                                 jnp.asarray(1e-5)))
    np.testing.assert_allclose(float(default), float(ref), rtol=1e-4)
