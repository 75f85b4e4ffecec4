"""General & adaptive robust loss (Barron, arXiv:1701.03077) in JAX.

Functional reimplementation of the subset of robust_loss_pytorch the
reference uses (reference: externel_lib/robust_loss_pytorch/{general.py:32-120,
adaptive.py:37-204, distribution.py:136-204, cubic_spline.py:24-100}).

The adaptive variant's trainable state is an explicit pytree
(`AdaptiveLossParams`) instead of hidden nn.Module parameters, so it folds
into the optimizer pytree directly (the reference collects these into
`grad_vars` by side effect, models/helpers.py:144-158).

The log-partition spline is the same binary asset as the reference's
`resources/partition_spline.npz` (data, not code), vendored under
npp_tpu/assets/.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_F32_EPS = float(np.finfo(np.float32).eps)
_LOG_MAX = 33e37
_EXP_MAX = 87.5


def log1p_safe(x):
    return jnp.log1p(jnp.minimum(x, _LOG_MAX))


def log_safe(x):
    return jnp.log(jnp.minimum(x, _LOG_MAX))


def expm1_safe(x):
    return jnp.expm1(jnp.minimum(x, _EXP_MAX))


def exp_safe(x):
    return jnp.exp(jnp.minimum(x, _EXP_MAX))


def affine_sigmoid(logits, lo=0.0, hi=1.0):
    """Maps reals to (lo, hi); 0 -> (lo+hi)/2 (reference: util.py:64-72)."""
    return jax.nn.sigmoid(logits) * (hi - lo) + lo


def inv_affine_sigmoid(probs, lo=0.0, hi=1.0):
    p = (probs - lo) / (hi - lo)
    return -np.log(1.0 / p - 1.0)


def affine_softplus(x, lo=0.0, ref=1.0):
    """Maps reals to (lo, inf); 0 -> ref (reference: util.py:87-96)."""
    shift = np.log(np.expm1(1.0))  # inv_softplus(1)
    return (ref - lo) * jax.nn.softplus(x + shift) + lo


def general_lossfun(x, alpha, scale):
    """rho(x, alpha, c), exact form (reference: general.py:32-120)."""
    sq = jnp.square(x / scale)
    loss_two = 0.5 * sq
    loss_zero = log1p_safe(0.5 * sq)
    loss_neginf = -jnp.expm1(-0.5 * sq)
    loss_posinf = expm1_safe(0.5 * sq)

    beta_safe = jnp.maximum(_F32_EPS, jnp.abs(alpha - 2.0))
    alpha_safe = jnp.where(alpha >= 0, 1.0, -1.0) * jnp.maximum(_F32_EPS, jnp.abs(alpha))
    loss_otherwise = (beta_safe / alpha_safe) * (
        jnp.power(sq / beta_safe + 1.0, 0.5 * alpha) - 1.0)

    return jnp.where(
        alpha == -jnp.inf, loss_neginf,
        jnp.where(alpha == 0.0, loss_zero,
                  jnp.where(alpha == 2.0, loss_two,
                            jnp.where(alpha == jnp.inf, loss_posinf,
                                      loss_otherwise))))


def interpolate1d(x, values, tangents):
    """Cubic Hermite spline with linear extrapolation
    (reference: cubic_spline.py:24-119)."""
    n = values.shape[0]
    x_lo = jnp.floor(jnp.clip(x, 0.0, n - 2)).astype(jnp.int32)
    x_hi = x_lo + 1
    t = x - x_lo.astype(x.dtype)
    t_sq = t * t
    t_cu = t * t_sq
    h01 = -2.0 * t_cu + 3.0 * t_sq
    h00 = 1.0 - h01
    h11 = t_cu - t_sq
    h10 = h11 - t_sq + t

    value_before = tangents[0] * t + values[0]
    value_after = tangents[-1] * (t - 1.0) + values[-1]
    value_mid = (values[x_lo] * h00 + values[x_hi] * h01 +
                 tangents[x_lo] * h10 + tangents[x_hi] * h11)
    return jnp.where(t < 0.0, value_before,
                     jnp.where(t > 1.0, value_after, value_mid))


def partition_spline_curve(alpha):
    """Nonlinearity applied to alpha before spline lookup
    (reference: distribution.py:79-115)."""
    return jnp.where(
        alpha < 4,
        (2.25 * alpha - 4.5) / (jnp.abs(alpha - 2.0) + 0.25) + alpha + 2.0,
        5.0 / 18.0 * log_safe(4.0 * alpha - 15.0) + 8.0)


@functools.lru_cache(maxsize=1)
def _load_spline():
    # Cache host-side numpy only: caching jnp arrays here would capture a
    # tracer if the first call happens under jit, poisoning later traces.
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        'assets', 'partition_spline.npz')
    with np.load(path, allow_pickle=False) as f:
        return (float(f['x_scale']), np.asarray(f['values']),
                np.asarray(f['tangents']))


def log_base_partition_function(alpha):
    """log(Z(alpha)) via the precomputed spline (reference:
    distribution.py:144-170)."""
    x_scale, values, tangents = _load_spline()
    x = partition_spline_curve(alpha)
    return interpolate1d(x * x_scale, jnp.asarray(values), jnp.asarray(tangents))


def nllfun(x, alpha, scale):
    """-log p(x | 0, alpha, c) (reference: distribution.py:172-204)."""
    loss = general_lossfun(x, alpha, scale)
    log_partition = jnp.log(scale) + log_base_partition_function(alpha)
    return loss + log_partition


class AdaptiveLossParams(NamedTuple):
    """Trainable latents of AdaptiveLossFunction (reference:
    adaptive.py:138-181). Both initialise to zeros: latent_alpha=0 maps to
    alpha_init=(lo+hi)/2=1.0 and latent_scale=0 maps to scale_init=1.0."""

    latent_alpha: jnp.ndarray  # (1, num_dims)
    latent_scale: jnp.ndarray  # (1, num_dims)


def adaptive_init(num_dims: int, dtype=jnp.float32) -> AdaptiveLossParams:
    return AdaptiveLossParams(
        latent_alpha=jnp.zeros((1, num_dims), dtype),
        latent_scale=jnp.zeros((1, num_dims), dtype))


def adaptive_alpha(p: AdaptiveLossParams, alpha_lo=0.001, alpha_hi=1.999):
    return affine_sigmoid(p.latent_alpha, alpha_lo, alpha_hi)


def adaptive_scale(p: AdaptiveLossParams, scale_lo=1e-5, scale_init=1.0):
    return affine_softplus(p.latent_scale, scale_lo, scale_init)


def adaptive_lossfun(x: jnp.ndarray, p: AdaptiveLossParams,
                     alpha_lo=0.001, alpha_hi=1.999,
                     scale_lo=1e-5, scale_init=1.0) -> jnp.ndarray:
    """NLL loss on a rank-2 residual [batch, num_dims]
    (reference: adaptive.py:182-204)."""
    return nllfun(x, adaptive_alpha(p, alpha_lo, alpha_hi),
                  adaptive_scale(p, scale_lo, scale_init))
