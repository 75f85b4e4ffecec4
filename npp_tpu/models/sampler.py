"""Periodicity-guided patch sampling as pure functions over rng keys.

TPU-first redesign of the reference's GridPatchSampler
(reference: models/sampler.py:8-354). The reference filters candidates with
data-dependent boolean indexing on GPU + Python loops; here every step is
static-shaped and jit-safe:

 - candidate real-patch centroids = fake centroid + i*d1 + j*d2 over the
   [-10, 10)^2 lattice (reference: sampler.py:89-99,146-167);
 - patch validity (unknown-area ratio) is evaluated with a summed-area table
   of the mask in O(1) per candidate instead of gathering full patches
   (reference gathers 400 SxS patches per fake patch, sampler.py:171-186);
 - ragged drops become masked weights: invalid candidates get distance=inf,
   weights renormalise over the survivors, and a fake patch with no valid
   candidate zeroes its contribution (the reference shrinks top-k globally
   and skips the whole iteration when any patch has none,
   sampler.py:199-217 / NPP_completion/train.py:159-161 — masking keeps the
   compiled shape fixed and wastes no step).

Deviations (documented, trajectory-level parity):
 - fake-centroid sampling uses with-replacement randint over the pool
   (reference: np.random.choice(replace=False) over thousands of pixels;
   collision probability for <=4 draws is negligible);
 - per-patch top-k never shrinks below k: invalid slots carry zero weight
   instead of truncating every patch's list.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.glimpse import extract_patches, patch_grid, summed_area_table, window_sum

MAX_SHIFT_IDX = 10   # lattice search extent (reference: sampler.py:89)
SELF_DISTANCE = 1e4  # distance assigned to the (0,0) lattice offset
                     # (reference: sampler.py:197)

# patch_source encoding (reference strings 'val'/'train'/'same',
# sampler.py:324-344)
SOURCE_VAL, SOURCE_TRAIN, SOURCE_SAME = 0, 1, 2


class SamplerConsts(NamedTuple):
    """Per-(image, patch-size) device constants."""

    img: jnp.ndarray          # (H, W, 3) source image for patches
    mask: jnp.ndarray         # (H, W) known-region mask in [0,1]
    known_sat: jnp.ndarray    # (H+1, W+1) SAT of (mask >= 0.5)
    pool_train: jnp.ndarray   # (Nt, 2) int32, padded
    pool_train_n: jnp.ndarray # () int32 valid count
    pool_val: jnp.ndarray     # (Nv, 2) int32, padded
    pool_val_n: jnp.ndarray   # () int32
    shift1: jnp.ndarray       # (2,) float (dy, dx) top-1 lattice vector
    shift2: jnp.ndarray       # (2,)
    real_pool: jnp.ndarray    # (Nr, 2) int32 unfold-grid centroids (no_reg)
    real_pool_n: jnp.ndarray  # () int32


class PatchBatch(NamedTuple):
    """One step's sampled patches; all shapes static."""

    fake_coords: jnp.ndarray   # (P, S, S, 2) int32 pixel coords of pred patches
    fake_rgb: jnp.ndarray      # (P, S, S, 3) input-image rgb at fake patches
    fake_mask: jnp.ndarray     # (P, S, S, 1)
    real_rgb: jnp.ndarray      # (P, K, S, S, 3)
    real_mask: jnp.ndarray     # (P, K, S, S, 1)
    weight: jnp.ndarray        # (P, K) 1/d weights, rows sum to 1 when valid
    valid: jnp.ndarray         # (P, K) bool — candidate slot usable
    source: jnp.ndarray        # () int32 in {SOURCE_VAL, SOURCE_TRAIN, SOURCE_SAME}


def _valid_centroids(pool: np.ndarray, h: int, w: int, half: int) -> np.ndarray:
    """Keep centroids whose patch stays in bounds (reference:
    sampler.py:111-121)."""
    ok = ((pool[:, 0] > half) & (pool[:, 0] < h - (half + 1)) &
          (pool[:, 1] > half) & (pool[:, 1] < w - (half + 1)))
    return pool[ok]


def _pad_pool(pool: np.ndarray, h: int, w: int) -> Tuple[np.ndarray, int]:
    from ..utils.pools import pad_pool_pow2
    # degenerate pools fall back to the image centre so shapes stay valid
    return pad_pool_pow2(pool, fallback_row=(h // 2, w // 2), fill='first')


def build_sampler_consts(img: np.ndarray, mask: np.ndarray,
                         pool_train: np.ndarray, pool_val: np.ndarray,
                         selected_shifts, patch_size: int) -> SamplerConsts:
    """Host-side precompute. `selected_shifts` is the odgt top-K list; only
    top-1 is used for sampling (reference: sampler.py:31-35), with (x, y)
    components flipped to (y, x)."""
    h, w = img.shape[:2]
    half = patch_size // 2
    mask2d = np.asarray(mask, np.float32).reshape(h, w)

    pt, nt = _pad_pool(_valid_centroids(np.asarray(pool_train), h, w, half), h, w)
    pv, nv = _pad_pool(_valid_centroids(np.asarray(pool_val), h, w, half), h, w)

    s = np.asarray(selected_shifts, np.float32)
    s = s.reshape(-1, 2, 2)[0]  # top-1 proposal: two (x, y) vectors
    shift1 = np.array([s[0][1], s[0][0]], np.float32)
    shift2 = np.array([s[1][1], s[1][0]], np.float32)

    # unfold-grid real-patch pool for the no_reg strategy
    # (reference: sampler.py:66-86: stride S//10, zero invalid ratio)
    stride = max(1, patch_size // 10)
    ys = np.arange(0, h - patch_size + 1, stride)
    xs = np.arange(0, w - patch_size + 1, stride)
    cents = np.stack(np.meshgrid(ys + half, xs + half, indexing='ij'), -1).reshape(-1, 2)
    inv = np.cumsum(np.cumsum(mask2d < 0.5, 0), 1)
    inv = np.pad(inv, ((1, 0), (1, 0)))
    y0, x0 = cents[:, 0] - half, cents[:, 1] - half
    y1, x1 = y0 + patch_size, x0 + patch_size
    n_unknown = inv[y1, x1] - inv[y0, x1] - inv[y1, x0] + inv[y0, x0]
    cents = cents[n_unknown <= 0]
    rp, nr = _pad_pool(cents, h, w)

    return SamplerConsts(
        img=jnp.asarray(img, jnp.float32).reshape(h, w, -1)[..., :3],
        mask=jnp.asarray(mask2d),
        known_sat=summed_area_table(jnp.asarray(mask2d >= 0.5, jnp.float32)),
        pool_train=jnp.asarray(pt), pool_train_n=jnp.asarray(max(nt, 1)),
        pool_val=jnp.asarray(pv), pool_val_n=jnp.asarray(max(nv, 1)),
        shift1=jnp.asarray(shift1), shift2=jnp.asarray(shift2),
        real_pool=jnp.asarray(rp), real_pool_n=jnp.asarray(max(nr, 1)))


def _sample_fake(rng, consts: SamplerConsts, pool, pool_n, patch_num: int,
                 patch_size: int):
    idx = jax.random.randint(rng, (patch_num,), 0, pool_n)
    cents = pool[idx]                                   # (P, 2) int32
    coords = patch_grid(cents, patch_size)              # (P, S, S, 2)
    rgb = extract_patches(consts.img, cents, patch_size)
    msk = extract_patches(consts.mask[..., None], cents, patch_size)
    return cents, coords, rgb, msk


def _real_from_lattice(consts: SamplerConsts, fake_cents: jnp.ndarray,
                       patch_num: int, patch_size: int, topk: int,
                       invalid_ratio: float):
    """Periodicity-guided real-patch selection (reference:
    sampler.py:144-221), fully vectorised."""
    h, w = consts.img.shape[:2]
    r = jnp.arange(-MAX_SHIFT_IDX, MAX_SHIFT_IDX)
    ii, jj = jnp.meshgrid(r, r, indexing='ij')
    ii = ii.reshape(-1).astype(jnp.float32)             # (400,)
    jj = jj.reshape(-1).astype(jnp.float32)
    offsets = ii[:, None] * consts.shift1 + jj[:, None] * consts.shift2
    cand = fake_cents[:, None, :].astype(jnp.float32) + offsets  # (P, 400, 2)
    cand = cand.astype(jnp.int32)

    in_bounds = ((cand[..., 0] > 0) & (cand[..., 0] < h - 1) &
                 (cand[..., 1] > 0) & (cand[..., 1] < w - 1))
    # reference semantics: the patch is gathered with zero padding, and
    # zero-padded mask pixels count as unknown (sampler.py:171-186); so the
    # unknown count is patch area minus KNOWN pixels inside the image
    n_known = window_sum(consts.known_sat, cand, patch_size)
    n_unknown = patch_size * patch_size - n_known
    ratio_ok = n_unknown <= patch_size * patch_size * invalid_ratio

    dist = jnp.abs(ii) + jnp.abs(jj)                    # (400,)
    dist = jnp.where(dist == 0, SELF_DISTANCE, dist)
    dist = jnp.broadcast_to(dist, cand.shape[:2])
    dist = jnp.where(in_bounds & ratio_ok, dist, jnp.inf)

    neg_top, top_idx = jax.lax.top_k(-dist, topk)       # (P, K)
    top_dist = -neg_top
    valid = jnp.isfinite(top_dist)
    sel = jnp.take_along_axis(cand, top_idx[..., None], axis=1)  # (P, K, 2)

    inv_d = jnp.where(valid, 1.0 / top_dist, 0.0)
    norm = jnp.sum(inv_d, axis=1, keepdims=True)
    weight = jnp.where(norm > 0, inv_d / jnp.maximum(norm, 1e-12), 0.0)

    rgb = extract_patches(consts.img, sel, patch_size)
    msk = extract_patches(consts.mask[..., None], sel, patch_size)
    return rgb, msk, weight, valid


def sample_patches(rng, consts: SamplerConsts, patch_num: int, patch_size: int,
                   topk: int, invalid_ratio: float,
                   no_reg_sampling: bool = False) -> PatchBatch:
    """One step's patch batch (reference: sampler.py:297-354).

    Branch probabilities: val 0.5 / train 0.3 / same 0.2
    (reference: sampler.py:324-344).
    """
    k_branch, k_fake, k_real = jax.random.split(rng, 3)
    u = jax.random.uniform(k_branch)
    source = jnp.where(u < 0.5, SOURCE_VAL,
                       jnp.where(u < 0.8, SOURCE_TRAIN, SOURCE_SAME))

    def from_pool(pool, pool_n):
        cents, coords, rgb, msk = _sample_fake(
            k_fake, consts, pool, pool_n, patch_num, patch_size)
        if no_reg_sampling:
            idx = jax.random.randint(k_real, (patch_num, topk), 0,
                                     consts.real_pool_n)
            sel = consts.real_pool[idx]
            r_rgb = extract_patches(consts.img, sel, patch_size)
            r_msk = extract_patches(consts.mask[..., None], sel, patch_size)
            weight = jnp.full((patch_num, topk), 1.0 / topk)
            valid = jnp.ones((patch_num, topk), bool)
        else:
            r_rgb, r_msk, weight, valid = _real_from_lattice(
                consts, cents, patch_num, patch_size, topk, invalid_ratio)
        return PatchBatch(coords, rgb, msk, r_rgb, r_msk, weight, valid,
                          jnp.int32(0))

    def branch_val():
        return from_pool(consts.pool_val, consts.pool_val_n)

    def branch_train():
        return from_pool(consts.pool_train, consts.pool_train_n)

    def branch_same():
        cents, coords, rgb, msk = _sample_fake(
            k_fake, consts, consts.pool_train, consts.pool_train_n,
            patch_num, patch_size)
        # real = fake at the same location, k=1 effective
        r_rgb = jnp.broadcast_to(rgb[:, None], (patch_num, topk) + rgb.shape[1:])
        r_msk = jnp.broadcast_to(msk[:, None], (patch_num, topk) + msk.shape[1:])
        valid = jnp.arange(topk)[None, :] < 1
        valid = jnp.broadcast_to(valid, (patch_num, topk))
        weight = valid.astype(jnp.float32)
        return PatchBatch(coords, rgb, msk, r_rgb, r_msk, weight, valid,
                          jnp.int32(0))

    out = jax.lax.switch(source, [branch_val, branch_train, branch_same])
    return out._replace(source=source)
