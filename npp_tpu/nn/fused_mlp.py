"""NPP-Net with Pallas-fused embedding consumers.

Numerically identical to NPPNet(embed(coords)) (reference:
models/networks.py:8-95 semantics) but takes raw (N, 2) coordinates: the
three consumers of the positional embedding — trunk layer 0, the skip concat
at layer 5, and the aux branch — each run through the fused
embedding+matmul kernel (ops/fused_embed.py), so the (N, 1386) embedding
never lands in HBM.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fused_embed import EmbedGeom, fused_embed_matmul
from .activations import get_activation


def _torch_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class NPPNetFused(nn.Module):
    """Top-K fit model, fused-embedding variant.

    __call__(coords, geom_top1, geom_aux): geoms are EmbedGeoms for proposal 0
    and proposals 1..K-1; channel widths are top1_dim / aux_dim (post-Fourier).
    """

    top1_dim: int
    aux_dim: int
    res: Tuple[int, int]
    freq_scales: Tuple[float, ...]
    freq_offsets: Tuple[float, ...]
    angle_offsets: Tuple[float, ...]
    depth: int = 8
    width: int = 512
    output_ch: int = 3
    skips: Tuple[int, ...] = (4,)
    activation: str = 'snake'
    interpret: bool = False

    def _lin(self, name: str, din: int, dout: int):
        bound = 1.0 / jnp.sqrt(jnp.float32(din))
        k = self.param(f'{name}_kernel', _torch_init(bound), (din, dout))
        b = self.param(f'{name}_bias', _torch_init(bound), (dout,))
        return k, b

    def _fused(self, coords, geom, k, b):
        return fused_embed_matmul(
            coords, geom, k, b, res=self.res, freq_scales=self.freq_scales,
            freq_offsets=self.freq_offsets, angle_offsets=self.angle_offsets,
            interpret=self.interpret)

    @nn.compact
    def __call__(self, coords, geom_top1: EmbedGeom, geom_aux: EmbedGeom):
        act = get_activation(self.activation)
        w = self.width

        k0, b0 = self._lin('periodic_0', self.top1_dim, w)
        h = act(self._fused(coords, geom_top1, k0, b0))
        for i in range(1, self.depth):
            if i - 1 in self.skips:
                # layer i consumes concat([emb_top1, h]) (reference:
                # networks.py:63-71: concat after the skip layer's activation)
                k, b = self._lin(f'periodic_{i}', self.top1_dim + w, w)
                h = act(self._fused(coords, geom_top1, k[:self.top1_dim],
                                    jnp.zeros_like(b)) +
                        h @ k[self.top1_dim:] + b)
            else:
                k, b = self._lin(f'periodic_{i}', w, w)
                h = act(h @ k + b)

        kf1, bf1 = self._lin('feature1', w, w)
        feature1 = h @ kf1 + bf1

        ks, bs = self._lin('scale_0', w + self.aux_dim, w)
        h = act(feature1 @ ks[:w] +
                self._fused(coords, geom_aux, ks[w:], jnp.zeros_like(bs)) + bs)
        kf2, bf2 = self._lin('feature2', w, w)
        feature2 = h @ kf2 + bf2

        kp, bp = self._lin('pos_0', 2 * w, w // 2)
        h = act(jnp.concatenate([feature1, feature2], -1) @ kp + bp)
        kr, br = self._lin('rgb', w // 2, self.output_ch)
        return h @ kr + br


def transplant_from_nppnet(nppnet_params) -> dict:
    """Map an NPPNet param tree onto NPPNetFused's flat naming (exact
    numerical equivalence; used by tests and checkpoint migration)."""
    out = {}
    for name, sub in nppnet_params.items():
        out[f'{name}_kernel'] = sub['kernel']
        out[f'{name}_bias'] = sub['bias']
    return out
