"""Displacement-vector periodicity search.

TPU-first redesign of the reference's brute-force shift scorer
(reference: NPP_proposal/feature_searching.py:77-338). The reference gathers
the whole feature map once per candidate shift and reduces a masked SSD
(compute_loss, :208-264) — O(S * C * H * W) with S up to tens of thousands of
shifts. Here the identity

    L(d) = sum_p M(p) M(p+d) * sum_c (A_c(p) - A_c(p+d))^2
         = corr(B, M)(d) + corr(M, B)(d) - 2 * sum_c corr(A_c M, A_c M)(d),
    with B = (sum_c A_c^2) * M  and  corr(f, g)(d) = sum_p f(p) g(p+d)

turns the whole search domain into ONE set of 2-D FFTs: C+2 forward
transforms and a single inverse transform of the combined spectrum
(2 Re(conj(F_B) F_M) - 2 sum_c |F(A_c M)|^2). The edge-searching variant's
correlation score (-A_d * A summed, :251-253) is the single |F(A M)|^2 term.
Results are bit-identical (up to fp) to the brute force at every displacement,
~1000x less work, and map onto the TPU's large-FFT path instead of a
scatter/gather loop.

The loss grid is computed ONCE for the full displacement domain; each
hyperparameter range group (reference: feature_search :77-115) is then a
masked argmin over its annulus of the same grid.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .features import act2edge, im2act


def _displacement_loss_grid(activation: jnp.ndarray, mask: jnp.ndarray,
                            edge_searching: bool = True) -> jnp.ndarray:
    """Loss at every displacement (dy in [0, H), dx in (-W, W)).

    activation: (C, H, W) feature stack WITHOUT the trailing mask channel
    (compute_loss diffs activation[:-1]; reference :253-255).
    mask: (H, W).
    Returns (H, 2W) grid; grid[dy, dx + W] == compute_loss for (dx, dy).
    """
    c, h, w = activation.shape
    fh, fw = 2 * h, 2 * w
    am = activation * mask[None]
    f_am = jnp.fft.rfft2(am, s=(fh, fw))                  # (C, fh, fw//2+1)
    auto = jnp.sum(jnp.real(f_am) ** 2 + jnp.imag(f_am) ** 2, axis=0)

    if edge_searching:
        # L(d) = -sum_c corr(A_c M?, ...): reference multiplies the already
        # mask-weighted activation by both masks again (:253,:262):
        # -sum A(p) A(p+d) M(p) M(p+d) = -corr(AM, AM)(d)
        spec = -auto
    else:
        b = jnp.sum(activation ** 2, axis=0) * mask       # (H, W)
        f_b = jnp.fft.rfft2(b, s=(fh, fw))
        f_m = jnp.fft.rfft2(mask, s=(fh, fw))
        cross = 2.0 * jnp.real(jnp.conj(f_b) * f_m)
        spec = cross - 2.0 * auto

    corr = jnp.fft.irfft2(spec, s=(fh, fw))               # (fh, fw)
    # circular corr at the doubled size is exact for |dy| < H, |dx| < W, and
    # the aliased column dx = +/-W is exactly 0 (no mask overlap either way).
    pos = corr[:h, :w]                                    # dx in [0, W)
    neg = corr[:h, w:]                                    # dx in [-W, 0)
    return jnp.concatenate([neg, pos], axis=1)            # (H, 2W); col = dx + W


# public jitted entry (kept for direct callers/tests)
displacement_loss_grid = partial(jax.jit, static_argnames=('edge_searching',))(
    _displacement_loss_grid)

# per-(shape, flag) program registry so the FFT scorer — the only device
# program in detection — can ride the AOT executable cache across sessions
_GRID_PROGRAMS: dict = {}


def _grid_program(edge_searching: bool, aot_dir, act_shape, mask_shape):
    key = (bool(edge_searching), aot_dir, tuple(act_shape), tuple(mask_shape))
    fn = _GRID_PROGRAMS.get(key)
    if fn is None:
        fn = jax.jit(partial(_displacement_loss_grid,
                             edge_searching=bool(edge_searching)))
        if aot_dir:
            from ..utils import aot
            c, h, w = act_shape
            fn = aot.aot_cached(
                fn, f'det-grid-{c}x{h}x{w}-e{int(edge_searching)}', aot_dir)
        _GRID_PROGRAMS[key] = fn
    return fn


def generate_possible_shifts(act_shape: Tuple[int, int],
                             range_x: Tuple[int, int],
                             range_y: Tuple[int, int]) -> np.ndarray:
    """Candidate (dx, dy) annulus for one range group
    (reference: feature_searching.py:267-277)."""
    h, w = act_shape
    # NB: the reference's lower bound is -w // r (floor of the NEGATIVE,
    # i.e. -ceil(w/r)), one wider than -(w // r) when r does not divide w
    dxs, dys = np.meshgrid(np.arange(-w // range_x[0], w // range_x[0]),
                           np.arange(0, h // range_y[0]), indexing='ij')
    shifts = np.stack([dxs.ravel(), dys.ravel()], 1)
    keep = (np.abs(shifts[:, 0]) > w // range_x[1]) | \
        (shifts[:, 1] > h // range_y[1])
    return shifts[keep]


def find_second_shift_by_angle(sorted_shifts: np.ndarray,
                               minimum_angle: float = 20.0) -> Optional[int]:
    """reference: feature_searching.py:281-306."""
    thetas = np.arctan2(sorted_shifts[:, 1], sorted_shifts[:, 0]) * 180 / math.pi
    diff = np.abs(thetas - thetas[0])
    sel = np.nonzero((diff > minimum_angle) & (diff < 180 - minimum_angle))[0]
    return int(sel[0]) if len(sel) else None


def shifts2angle(shift_xy: np.ndarray) -> float:
    """reference: feature_searching.py:309-314."""
    return float(180.0 - np.arctan2(shift_xy[1], shift_xy[0]) * 180.0 / math.pi)


def shifts2period(this_shift: np.ndarray, another_shift: np.ndarray) -> float:
    """Lattice row spacing |d| * sin(angle between vectors)
    (reference: feature_searching.py:317-339)."""
    period = float(np.hypot(this_shift[0], this_shift[1]))
    v1 = this_shift / (np.linalg.norm(this_shift) + 1e-12)
    v2 = another_shift / (np.linalg.norm(another_shift) + 1e-12)
    phi = np.arccos(np.clip(np.dot(v1, v2), -1.0, 1.0))
    return period * float(np.sin(phi))


def generate_periodicity(losses: np.ndarray, shifts: np.ndarray):
    """Best displacement pair -> (angles, periods, shifts)
    (reference: feature_searching.py:118-155)."""
    order = np.argsort(losses, kind='stable')
    sorted_shifts = shifts[order].astype(np.float64)
    second = find_second_shift_by_angle(sorted_shifts)
    if second is None:
        return None, None, None
    pair = [sorted_shifts[0], sorted_shifts[second]]
    # NOTE (reference :143-144): each direction's angle comes from the OTHER
    # displacement vector.
    angles = [shifts2angle(pair[1]), shifts2angle(pair[0])]
    periods = [shifts2period(pair[0], pair[1]), shifts2period(pair[1], pair[0])]
    return angles, periods, pair


def feature_search(activation: np.ndarray, mask: np.ndarray,
                   repeat_range: Tuple[int, int, int] = (3, 6, 1),
                   edge_searching: bool = True, aot_dir: Optional[str] = None):
    """Loop over hyperparameter range groups on ONE precomputed loss grid
    (reference: feature_searching.py:77-115)."""
    c, h, w = activation.shape
    fn = _grid_program(edge_searching, aot_dir, (c - 1, h, w), (h, w))
    import sys
    import time as _time
    t0 = _time.time()
    grid = np.asarray(fn(
        jnp.asarray(activation[:-1], jnp.float32),
        jnp.asarray(mask, jnp.float32)))
    if _time.time() - t0 > 2.0:
        print(f'[search] FFT grid program {_time.time() - t0:.1f}s '
              f'(compile/dispatch; steady-state is ms)',
              file=sys.stderr, flush=True)

    all_angles, all_periods, all_shifts = [], [], []
    start, end, step = repeat_range
    for i in range(start, end, step):
        rng_x = rng_y = (i, i + step)
        shifts = generate_possible_shifts((h, w), rng_x, rng_y)
        if len(shifts) == 0:
            continue
        losses = grid[shifts[:, 1], shifts[:, 0] + w]
        angles, periods, pair = generate_periodicity(losses, shifts)
        if angles is None:
            continue
        all_angles.append(angles)
        all_periods.append(periods)
        all_shifts.append(pair)
    return all_angles, all_periods, all_shifts


def search_periodicity_by_feat(img_u8: np.ndarray, mask: np.ndarray,
                               repeat_range=(2, 32, 5), edge_searching=True,
                               gray_only=True, aot_dir=None):
    """Full detection: features -> (edges) -> search -> scale back x4
    (reference: feature_searching.py:158-204)."""
    activation, m = im2act(img_u8, mask, gray_only=gray_only)
    if edge_searching:
        edge = act2edge(activation[:-1], m)
        activation = activation * edge[[0]]

    angles, periods, shifts = feature_search(
        activation, m, repeat_range=repeat_range, edge_searching=edge_searching,
        aot_dir=aot_dir)

    ratio = float(np.round(img_u8.shape[0] / activation.shape[1]))
    periods = [[p * ratio for p in ps] for ps in periods]
    shifts = [[s * ratio for s in pair] for pair in shifts]
    return angles, periods, shifts


def lattice_to_proposal(d1_xy, d2_xy):
    """Encode two lattice displacement vectors as the (angles, periods) pair
    convention consumed by the embedders.

    The convention is subtle (reference: feature_searching.py:140-155): each
    direction's ANGLE comes from the OTHER displacement vector, and its
    PERIOD is this vector's length projected across the lattice
    (|d| * sin(angle between)). Use this helper instead of hand-pairing.
    """
    d1 = np.asarray(d1_xy, np.float64)
    d2 = np.asarray(d2_xy, np.float64)
    angles = [shifts2angle(d2), shifts2angle(d1)]
    periods = [shifts2period(d1, d2), shifts2period(d2, d1)]
    return angles, periods
