"""Pallas TPU kernel: fused periodicity embedding + dense layer.

The fit step's dominant tensor is the (N, 1386) positional embedding
(8k-60k rows per step). The reference materialises it for the whole image up
front (reference: NPP_completion/train.py:89-105, gigabytes); plain XLA here
materialises it per batch in HBM and reads it back for every consumer (trunk
layer 0, the skip concat at layer 4, the aux branch). This kernel computes
the embedding tile-by-tile in VMEM from the (N, 2) coordinates and feeds the
MXU directly:

    out = fourier(periodic_warp(coords)) @ W + b

so the embedding never exists in HBM. The trig recompute is cheap VPU work
(~40 flops/channel) against the saved HBM round-trips. The custom VJP
recomputes the embedding the same way for dW (an (emb^T @ g) kernel with a
revisited accumulator block), and db = sum(g); coords carry no gradient
(integer pixel positions).

Numerical parity: embed_fn == TaskEmbedder.embed exactly (same channel
order), so NPPNetFused(coords) == NPPNet(embed(coords)) — tested both in
interpret mode and on hardware.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.embedder import periodic_warp


class EmbedGeom(NamedTuple):
    """Array-valued embedding geometry for a set of proposals."""

    angles: jnp.ndarray   # (K, 2) degrees
    periods: jnp.ndarray  # (K, 2) pixels
    bands: jnp.ndarray    # (F,) Fourier bands

    @classmethod
    def from_embedder(cls, e, lo: int = 0, hi: int | None = None):
        return cls(angles=e.angles[lo:hi], periods=e.periods[lo:hi],
                   bands=e.freq_bands)


def embed_fn(coords: jnp.ndarray, geom: EmbedGeom, res: Tuple[int, int],
             freq_scales, freq_offsets, angle_offsets) -> jnp.ndarray:
    """Pure-jnp embedding identical to TaskEmbedder.embed (proposal-major
    blocks of fourier(periodic_warp(...))), built exclusively from rank-2
    concatenations so Mosaic can lower it inside a Pallas kernel (the
    vectorised vmap/stack/moveaxis form trips `infer-vector-layout:
    unsupported shape cast`)."""
    n_bands = geom.bands.shape[0]
    k = geom.angles.shape[0]
    blocks = []
    for kk in range(k):  # static proposal count (<= p_topk)
        p = periodic_warp(coords, geom.angles[kk], geom.periods[kk],
                          freq_scales, freq_offsets, angle_offsets, res,
                          include_input=True)
        parts = [p]
        for i in range(n_bands):  # reference order: [x, sin(f_i x), cos(f_i x)]
            xf = p * geom.bands[i]
            parts.append(jnp.sin(xf))
            parts.append(jnp.cos(xf))
        blocks.append(jnp.concatenate(parts, axis=-1))
    return jnp.concatenate(blocks, axis=-1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(static, coords, angles, periods, bands, w, b):
    return _fused_fwd_impl(static, coords, angles, periods, bands, w, b)


def _fused_fwd_impl(static, coords, angles, periods, bands, w, b):
    (res, fs, fo, ao, tile_n, _bwd_partials, interpret) = static
    n, _ = coords.shape
    d_emb, f = w.shape
    n_pad = _round_up(max(n, tile_n), tile_n)
    coords_p = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    geom = EmbedGeom(angles, periods, bands)

    def kernel(c_ref, a_ref, p_ref, fb_ref, w_ref, b_ref, o_ref):
        emb = embed_fn(c_ref[:], EmbedGeom(a_ref[:], p_ref[:], fb_ref[:]),
                       res, fs, fo, ao)
        o_ref[:] = jnp.dot(emb, w_ref[:],
                           preferred_element_type=jnp.float32) + b_ref[:]

    out = pl.pallas_call(
        kernel,
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(angles.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(periods.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bands.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_emb, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(coords_p, angles, periods, bands, w, b)
    return out[:n]


def _fused_fwd(static, coords, angles, periods, bands, w, b):
    out = _fused_fwd_impl(static, coords, angles, periods, bands, w, b)
    return out, (coords, angles, periods, bands, w)


def _fused_bwd(static, resids, g):
    (res, fs, fo, ao, tile_n, bwd_partials, interpret) = static
    coords, angles, periods, bands, w = resids
    n = coords.shape[0]
    d_emb, f = w.shape
    n_pad = _round_up(max(n, tile_n), tile_n)
    coords_p = jnp.pad(coords, ((0, n_pad - n), (0, 0)))
    g_p = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    n_tiles = n_pad // tile_n

    in_specs = [
        pl.BlockSpec((tile_n, 2), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(angles.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(periods.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bands.shape, lambda i: (0,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, f), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]

    if bwd_partials:
        # parallel-partials dW: every grid step writes its own (d_emb, f)
        # block (no cross-step accumulator serialisation); XLA tree-sums
        # the G partials afterwards. HBM cost: G x d_emb x f x 4B.
        def kernel(c_ref, a_ref, p_ref, fb_ref, g_ref, dw_ref):
            emb = embed_fn(c_ref[:], EmbedGeom(a_ref[:], p_ref[:], fb_ref[:]),
                           res, fs, fo, ao)
            dw_ref[0] = jax.lax.dot_general(
                emb, g_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        partials = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, d_emb, f), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, d_emb, f), jnp.float32),
            interpret=interpret,
        )(coords_p, angles, periods, bands, g_p)
        dw = jnp.sum(partials, axis=0)
    else:
        # sequential revisited accumulator (one dW block, serialised grid)
        def kernel(c_ref, a_ref, p_ref, fb_ref, g_ref, dw_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                dw_ref[:] = jnp.zeros_like(dw_ref)

            emb = embed_fn(c_ref[:], EmbedGeom(a_ref[:], p_ref[:], fb_ref[:]),
                           res, fs, fo, ao)
            dw_ref[:] += jax.lax.dot_general(
                emb, g_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        dw = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((d_emb, f), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d_emb, f), jnp.float32),
            interpret=interpret,
        )(coords_p, angles, periods, bands, g_p)
    db = jnp.sum(g, axis=0)
    zeros = lambda x: jnp.zeros_like(x)
    return (zeros(coords), zeros(angles), zeros(periods), zeros(bands), dw, db)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_embed_matmul(coords: jnp.ndarray, geom: EmbedGeom, w: jnp.ndarray,
                       b: jnp.ndarray, *, res: Tuple[int, int],
                       freq_scales, freq_offsets, angle_offsets,
                       tile_n: int = 512, bwd_partials: bool = True,
                       interpret: bool = False) -> jnp.ndarray:
    """fourier(periodic_warp(coords)) @ w + b without materialising the
    embedding in HBM. w: (embed_dim_of_geom, F). bwd_partials selects the
    parallel-partials dW kernel (G partial blocks + XLA tree-sum) over the
    sequential revisited-accumulator variant."""
    static = (tuple(res), tuple(freq_scales), tuple(freq_offsets),
              tuple(angle_offsets), int(tile_n), bool(bwd_partials),
              bool(interpret))
    return _fused(static, coords, geom.angles, geom.periods, geom.bands,
                  w, b)
