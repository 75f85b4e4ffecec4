"""Positional encoders: Fourier (NeRF-style) and periodicity-aware warps.

TPU-first reimplementation of the reference encoders
(reference: models/embedder.py:6-148). The reference materialises the full
(H*W, 1386) embedding tensor on GPU up front (reference:
NPP_completion/train.py:89-105, ~GBs for a mid-size image); here the encoders
are pure jnp functions that are applied on the fly inside the jitted fit step
to only the coordinates in the current batch, letting XLA fuse
`coords -> warp -> sin/cos -> first matmul` and keeping only (N, 2)
coordinates in HBM.

Channel-order parity with the reference is preserved exactly:
 - fourier_encode: [x, sin(f1 x), cos(f1 x), sin(f2 x), ...] with each block
   spanning all input channels (reference: embedder.py:41-44,56).
 - periodic_warp: [norm_x?, orient-0 fns..., norm_y?, orient-1 fns...] with
   fns ordered scale -> offset -> angle_offset -> (sin, cos)
   (reference: embedder.py:110-146).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Proposal(NamedTuple):
    """One detected periodicity: two lattice directions.

    angles are degrees, periods are pixels (reference: the
    `selected_angles` / `selected_periods` pairs written to config.odgt,
    NPP_proposal/search.py:228-239).
    """

    angles: jnp.ndarray   # (2,)
    periods: jnp.ndarray  # (2,)


def gaussian_freq_bands(key: jax.Array, num_freqs: int, scale: float = 10.0) -> jnp.ndarray:
    """Gaussian-sampled Fourier bands, N(0,1)*10 (reference: embedder.py:25-26).

    The reference draws these from the globally-seeded torch RNG; here they are
    a pure function of an explicit key. Distribution-level parity only.
    """
    return jax.random.normal(key, (num_freqs,)) * scale


def log_freq_bands(num_freqs: int, max_freq_log2: float) -> jnp.ndarray:
    """2^linspace bands (reference: embedder.py:23-24, sampling='log')."""
    return 2.0 ** jnp.linspace(0.0, max_freq_log2, num_freqs)


def linear_freq_bands(num_freqs: int, max_freq_log2: float) -> jnp.ndarray:
    """Linear bands (reference: embedder.py:38-39, default branch)."""
    return jnp.linspace(2.0 ** 0.0, 2.0 ** max_freq_log2, num_freqs)


def fourier_encode(x: jnp.ndarray, freq_bands: jnp.ndarray,
                   include_input: bool = True) -> jnp.ndarray:
    """Apply sin/cos at each band to every channel of `x`.

    x: (..., C) -> (..., C * (include_input + 2*len(freq_bands))), ordered
    [x, sin(f1 x), cos(f1 x), sin(f2 x), cos(f2 x), ...]
    (reference: embedder.py:41-44,56).
    """
    parts = [x] if include_input else []
    # (..., C, 1) * (F,) -> (..., C, F); interleave sin/cos per band to match
    # the reference's [sin(f), cos(f)] per-frequency ordering.
    xf = x[..., None] * freq_bands  # (..., C, F)
    sc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # (..., C, F, 2)
    # reference layout: for f in bands: for fn in (sin, cos): fn(x * f) over all C
    # => axis order (F, 2, C) flattened.
    sc = jnp.moveaxis(sc, -3, -1)  # (..., F, 2, C)
    parts.append(sc.reshape(*x.shape[:-1], -1))
    return jnp.concatenate(parts, axis=-1)


def normalize_coords(coords_yx: jnp.ndarray, res: Tuple[int, int]) -> jnp.ndarray:
    """Map pixel (y, x) coords to [-1, 1] (reference: embedder.py:52-55,112-113)."""
    h, w = res
    y = (coords_yx[..., 0] / h - 0.5) * 2.0
    x = (coords_yx[..., 1] / w - 0.5) * 2.0
    return jnp.stack([y, x], axis=-1)


def periodic_warp(coords_yx: jnp.ndarray,
                  angles_deg: jnp.ndarray,
                  periods: jnp.ndarray,
                  freq_scales: Sequence[float],
                  freq_offsets: Sequence[float],
                  angle_offsets: Sequence[float],
                  res: Tuple[int, int],
                  include_input: bool = True) -> jnp.ndarray:
    """Periodicity-aware input warping, Eq. 1 of the NPP-Net paper.

    For each (scale s, offset o, orientation idx, angle offset a, fn in
    {sin, cos}) emits fn(2*pi * ((y cos(th) + x sin(th)) mod f) / f) with
    f = (period[idx] + o) * s, th = deg2rad(angle[idx] + a)
    (reference: embedder.py:117-133). Channel order matches the reference:
    all orientation-0 channels (preceded by normalised x when include_input),
    then all orientation-1 channels (preceded by normalised y).
    """
    h, w = res
    y = coords_yx[..., 0:1]
    x = coords_yx[..., 1:2]

    def orient_channels(idx: int) -> jnp.ndarray:
        chans = []
        for s in freq_scales:
            for o in freq_offsets:
                for a in angle_offsets:
                    f = (periods[idx] + o) * s
                    th = jnp.deg2rad(angles_deg[idx] + a)
                    proj = y * jnp.cos(th) + x * jnp.sin(th)
                    phase = (jnp.mod(proj, f) / f) * (2.0 * np.pi)
                    chans.append(jnp.sin(phase))
                    chans.append(jnp.cos(phase))
        return jnp.concatenate(chans, axis=-1)

    parts = []
    if include_input:
        parts.append((x / w - 0.5) * 2.0)
    parts.append(orient_channels(0))
    if include_input:
        parts.append((y / h - 0.5) * 2.0)
    parts.append(orient_channels(1))
    return jnp.concatenate(parts, axis=-1)


class TaskEmbedder(NamedTuple):
    """Closure bundle for the per-task (non-search) encoder.

    embed(coords_yx (N,2)) -> (N, p_topk * periodic_dim * nerf_dim_factor),
    matching the reference's periodic-then-Fourier re-encoding and top-K
    concatenation (reference: NPP_completion/train.py:93-105).
    """

    freq_bands: jnp.ndarray
    angles: jnp.ndarray    # (K, 2)
    periods: jnp.ndarray   # (K, 2)
    res: Tuple[int, int]
    freq_scales: Tuple[float, ...]
    freq_offsets: Tuple[float, ...]
    angle_offsets: Tuple[float, ...]
    out_dim: int
    top1_dim: int

    def embed(self, coords_yx: jnp.ndarray) -> jnp.ndarray:
        def one(angles, periods):
            p = periodic_warp(coords_yx, angles, periods, self.freq_scales,
                              self.freq_offsets, self.angle_offsets, self.res,
                              include_input=True)
            if self.freq_bands is None:
                # i_embed == -1: identity Fourier stage
                # (reference: embedder.py:60-63)
                return p
            return fourier_encode(p, self.freq_bands, include_input=True)
        # vmap over the K proposals, then lay out as (N, K*D) with proposal-major
        # blocks, identical to the reference's torch.cat over the K embeddings.
        per = jax.vmap(one)(self.angles, self.periods)  # (K, N, D)
        return jnp.moveaxis(per, 0, -2).reshape(*coords_yx.shape[:-1], -1)


def make_task_embedder(cfg, proposals_angles, proposals_periods,
                       res: Tuple[int, int], key: jax.Array) -> TaskEmbedder:
    """Build the fit-mode encoder for top-K proposals.

    cfg: a FitConfig; key seeds the Gaussian Fourier bands (the reference
    draws them from the global torch RNG at model-creation time,
    reference: embedder.py:26, models/helpers.py:87).
    """
    bands = None if cfg.i_embed == -1 else gaussian_freq_bands(key, cfg.multires)
    angles = jnp.asarray(proposals_angles, jnp.float32).reshape(-1, 2)[: cfg.p_topk]
    periods = jnp.asarray(proposals_periods, jnp.float32).reshape(-1, 2)[: cfg.p_topk]
    from ..config import nerf_embed_dim, periodic_embed_dim
    pdim = periodic_embed_dim(cfg, include_input=True)
    ndim = 1 if cfg.i_embed == -1 else nerf_embed_dim(cfg, 1, include_input=True)
    return TaskEmbedder(
        freq_bands=bands, angles=angles, periods=periods, res=res,
        freq_scales=tuple(cfg.freq_scales), freq_offsets=tuple(cfg.freq_offsets),
        angle_offsets=tuple(cfg.angle_offsets),
        out_dim=int(angles.shape[0]) * pdim * ndim, top1_dim=pdim * ndim)


class TableEmbedder(NamedTuple):
    """Gather-based stand-in for TaskEmbedder built from a precomputed
    (H*W, D) table (cfg.embed_table; see make_embedding_table).

    Every coordinate the fit step embeds is an INTEGER canvas pixel
    (pool_train / sampler fake_coords are int32, the renderer walks the
    meshgrid) and IN-BOUNDS (models/sampler.py::_valid_centroids keeps
    patch centers >= half from every border, so patch grids never leave
    the canvas — jnp.take's clamping can therefore never silently diverge
    from the trig chain), so `table[y*W + x]` evaluates the identical
    function — the
    trig chain runs once per canvas position instead of once per sampled
    row per step. Meant to be constructed INSIDE a jitted block (the table
    then lives only for that call and is never baked into an executable as
    a giant constant). Not valid with the warp field: warped coordinates
    are non-integer (trainer/make_fit_block gates on that)."""

    table: jnp.ndarray     # (H*W, D)
    res: Tuple[int, int]
    out_dim: int
    top1_dim: int

    def embed(self, coords_yx: jnp.ndarray) -> jnp.ndarray:
        w = self.res[1]
        iy = coords_yx[..., 0].astype(jnp.int32)
        ix = coords_yx[..., 1].astype(jnp.int32)
        return jnp.take(self.table, iy * w + ix, axis=0)


def make_embedding_table(base: TaskEmbedder, dtype=jnp.float32,
                         chunk: int = 1 << 15,
                         grid_hw: Optional[Tuple[int, int]] = None
                         ) -> TableEmbedder:
    """Evaluate `base.embed` over the whole canvas (chunked lax.map keeps
    the peak at one chunk's intermediates) and wrap it as a TableEmbedder.
    Traceable: call inside jit so the table is a loop-invariant operand of
    the surrounding program, not a closure constant.

    grid_hw: static table GRID dims; defaults to base.res. The batched
    runner passes the shared bucket canvas here while base.res stays each
    image's TIGHT normalisation dims (possibly a traced (2,) array inside
    a vmap) — the table's index space is the bucket, its VALUES keep the
    per-image normalisation (the canvas-leak rule, parallel/runner.py)."""
    h, w = grid_hw if grid_hw is not None else base.res
    coords = jnp.stack(jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                    indexing='ij'), -1).reshape(-1, 2)
    n = coords.shape[0]
    pad = (-n) % chunk
    coords = jnp.pad(coords, ((0, pad), (0, 0))).astype(jnp.float32)
    table = jax.lax.map(lambda c: base.embed(c).astype(dtype),
                        coords.reshape(-1, chunk, 2))
    # table.shape[-1] (concrete) rather than base.out_dim: when the
    # embedder is a jit ARGUMENT (batched runner), int leaves are tracers
    return TableEmbedder(table=table.reshape(-1, table.shape[-1])[:n],
                         res=(int(h), int(w)), out_dim=base.out_dim,
                         top1_dim=base.top1_dim)


class SearchEmbedder(NamedTuple):
    """Search-mode encoder pair (reference: NPP_proposal/search.py:105-109):
    embed_pos  (N,2) -> (N, 2*(1+2F)) Fourier of normalised raw coords;
    embed_peri (N,2) -> (N, P) periodic warp without raw coords."""

    freq_bands: jnp.ndarray
    angles: jnp.ndarray   # (2,)
    periods: jnp.ndarray  # (2,)
    res: Tuple[int, int]
    freq_scales: Tuple[float, ...]
    freq_offsets: Tuple[float, ...]
    angle_offsets: Tuple[float, ...]
    pos_dim: int
    periodic_dim: int

    def embed_pos(self, coords_yx: jnp.ndarray) -> jnp.ndarray:
        return fourier_encode(normalize_coords(coords_yx, self.res),
                              self.freq_bands, include_input=True)

    def embed_periodic(self, coords_yx: jnp.ndarray) -> jnp.ndarray:
        return periodic_warp(coords_yx, self.angles, self.periods,
                             self.freq_scales, self.freq_offsets,
                             self.angle_offsets, self.res, include_input=False)


def make_search_embedder(cfg, angles, periods, res: Tuple[int, int],
                         key: jax.Array) -> SearchEmbedder:
    bands = gaussian_freq_bands(key, cfg.multires)
    from ..config import nerf_embed_dim, periodic_embed_dim
    return SearchEmbedder(
        freq_bands=bands,
        angles=jnp.asarray(angles, jnp.float32).reshape(2),
        periods=jnp.asarray(periods, jnp.float32).reshape(2),
        res=res, freq_scales=tuple(cfg.freq_scales),
        freq_offsets=tuple(cfg.freq_offsets),
        angle_offsets=tuple(cfg.angle_offsets),
        pos_dim=nerf_embed_dim(cfg, 2, include_input=True),
        periodic_dim=periodic_embed_dim(cfg, include_input=False))
