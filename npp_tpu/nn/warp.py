"""Learnable smooth warp field: coordinates -> coordinates + delta.

TPU-repo addition (no reference equivalent; default OFF). Real photographs of
periodic surfaces carry perspective/lens distortion, so a single global
(angle, period) lattice cannot phase-track the pattern across the image —
inside large holes the INR's texture drifts out of phase with the ground
truth (the round-1 failure mode on the bundled example
20150914133158-7a2216fc-me, a metal plate photographed at an angle). The
reference's answer is the MLP absorbing near-periodicity locally
(paper §1 "near-periodic"), which works where pixel supervision exists but
cannot extrapolate phase drift into unsupervised regions.

A small coordinate MLP W(y, x) -> (dy, dx), applied BEFORE the periodic
warp, models that drift as a smooth low-frequency deformation field that
extrapolates into holes. Zero-initialised output layer -> starts as the
identity; tanh-bounded by max_px so it cannot collapse the lattice.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class WarpField(nn.Module):
    """(N, 2) normalised coords in [-1, 1] -> (N, 2) pixel-space delta."""

    width: int = 32
    depth: int = 2
    max_px: float = 12.0

    @nn.compact
    def __call__(self, norm_coords: jnp.ndarray) -> jnp.ndarray:
        h = norm_coords
        for i in range(self.depth):
            h = nn.Dense(self.width, name=f'dense{i}')(h)
            h = jnp.sin(h)  # smooth, low-frequency by default init scale
        d = nn.Dense(2, name='out', kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h)
        return self.max_px * jnp.tanh(d)


def make_warp(cfg):
    """WarpField from config, or None when disabled."""
    if not getattr(cfg, 'warp_field', False):
        return None
    return WarpField(width=cfg.warp_width, depth=cfg.warp_depth,
                     max_px=cfg.warp_max_px)


def warp_coords(warp: WarpField, warp_params, coords: jnp.ndarray,
                res) -> jnp.ndarray:
    """coords + W(normalised coords); res = (H, W) of the canvas."""
    from .embedder import normalize_coords
    delta = warp.apply({'params': warp_params},
                       normalize_coords(coords, res))
    return coords + delta
