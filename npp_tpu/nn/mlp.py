"""NPP-Net MLP family in flax.

Three variants matching the reference's model zoo
(reference: models/networks.py:8-263):
 - NPPNet:      K>1 fit model — top-1 trunk + aux (top-2..K) branch + fuse.
 - NPPNetTop1:  K=1 fit model — trunk only.
 - NPPNetLight: search-mode model — trunk on periodic channels + raw-coord
   Fourier input into the head.

All dense layers use the PyTorch nn.Linear default init
(U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) for
trajectory-level parity; the reference's `weights_init_normal` is a no-op for
these models (it only matches "Conv"/"BatchNorm2d" classnames,
reference: models/helpers.py:65-71).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .activations import get_activation


class TorchLinear(nn.Module):
    """Dense layer with PyTorch nn.Linear default initialisation."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = 1.0 / jnp.sqrt(jnp.asarray(in_features, jnp.float32))

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param('kernel', uniform_init, (in_features, self.features))
        bias = self.param('bias', uniform_init, (self.features,))
        return x @ kernel + bias


class NPPNet(nn.Module):
    """Top-K fit model (reference: models/networks.py:8-95).

    input_ch_periodic / input_ch_periodic_aux are the channel counts AFTER the
    Fourier re-encode (the reference multiplies by freq_nerf internally;
    callers here pass the final widths directly).
    """

    input_ch_periodic: int
    input_ch_periodic_aux: int
    depth: int = 8
    width: int = 512
    output_ch: int = 3
    skips: Tuple[int, ...] = (4,)
    activation: str = 'snake'

    @nn.compact
    def __call__(self, x_periodic):
        act = get_activation(self.activation)
        inp = x_periodic[..., : self.input_ch_periodic]
        aux = x_periodic[..., self.input_ch_periodic:]

        h = inp
        for i in range(self.depth):
            h = act(TorchLinear(self.width, name=f'periodic_{i}')(h))
            if i in self.skips:
                h = jnp.concatenate([inp, h], axis=-1)
        feature1 = TorchLinear(self.width, name='feature1')(h)

        h = jnp.concatenate([feature1, aux], axis=-1)
        h = act(TorchLinear(self.width, name='scale_0')(h))
        feature2 = TorchLinear(self.width, name='feature2')(h)

        h = jnp.concatenate([feature1, feature2], axis=-1)
        h = act(TorchLinear(self.width // 2, name='pos_0')(h))
        return TorchLinear(self.output_ch, name='rgb')(h)


class NPPNetTop1(nn.Module):
    """Top-1 fit model (reference: models/networks.py:99-173)."""

    input_ch_periodic: int
    depth: int = 8
    width: int = 512
    output_ch: int = 3
    skips: Tuple[int, ...] = (4,)
    activation: str = 'snake'

    @nn.compact
    def __call__(self, x_periodic):
        act = get_activation(self.activation)
        inp = x_periodic[..., : self.input_ch_periodic]
        h = inp
        for i in range(self.depth):
            h = act(TorchLinear(self.width, name=f'periodic_{i}')(h))
            if i in self.skips:
                h = jnp.concatenate([inp, h], axis=-1)
        feature1 = TorchLinear(self.width, name='feature1')(h)
        h = act(TorchLinear(self.width // 2, name='pos_0')(feature1))
        return TorchLinear(self.output_ch, name='rgb')(h)


def light_channel_split(total_periodic: int, n_scales: int, n_offsets: int,
                        n_angle_offsets: int) -> Tuple[Sequence[int], Sequence[int]]:
    """Index split of periodic channels into trunk vs. scale-aux groups
    (reference: models/networks.py:184-190)."""
    scale_dim = (n_scales - 1) * 4 * n_offsets * n_angle_offsets
    base = 2 * n_offsets * n_angle_offsets
    scale_inds = list(range(base, base + scale_dim // 2)) + \
        list(range(total_periodic - scale_dim // 2, total_periodic))
    period_inds = [i for i in range(total_periodic) if i not in scale_inds]
    return period_inds, scale_inds


class NPPNetLight(nn.Module):
    """Search-mode model (reference: models/networks.py:176-263).

    __call__(x_pos, x_periodic): x_pos is the Fourier encoding of raw coords;
    x_periodic the (un-re-encoded) periodic warp.
    """

    input_ch_periodic_all: int
    n_scales: int = 1
    n_offsets: int = 5
    n_angle_offsets: int = 1
    depth: int = 4
    width: int = 256
    output_ch: int = 3
    skips: Tuple[int, ...] = (4,)
    activation: str = 'snake'

    @nn.compact
    def __call__(self, x_pos, x_periodic):
        act = get_activation(self.activation)
        period_inds, scale_inds = light_channel_split(
            self.input_ch_periodic_all, self.n_scales, self.n_offsets,
            self.n_angle_offsets)
        inp = x_periodic[..., jnp.asarray(period_inds, jnp.int32)]

        h = inp
        for i in range(self.depth):
            h = act(TorchLinear(self.width, name=f'periodic_{i}')(h))
            if i in self.skips:
                h = jnp.concatenate([inp, h], axis=-1)
        feature1 = TorchLinear(self.width, name='feature1')(h)

        if self.n_scales > 1:
            aux = x_periodic[..., jnp.asarray(scale_inds, jnp.int32)]
            h = act(TorchLinear(self.width, name='scale_0')(
                jnp.concatenate([feature1, aux], axis=-1)))
            feature2 = TorchLinear(self.width, name='feature2')(h)
            h = jnp.concatenate([feature1, feature2, x_pos], axis=-1)
        else:
            h = jnp.concatenate([feature1, x_pos], axis=-1)

        h = act(TorchLinear(self.width // 2, name='pos_0')(h))
        return TorchLinear(self.output_ch, name='rgb')(h)


def render_activation(raw: jnp.ndarray, normalize_type: int) -> jnp.ndarray:
    """Map raw MLP output to RGB (reference: models/helpers.py:55-60)."""
    if normalize_type == 1:
        return jax.nn.sigmoid(raw)
    if normalize_type == 2:
        return jnp.tanh(raw)
    raise ValueError('Wrong normalize type')
