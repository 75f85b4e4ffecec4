"""Displacement-search correctness: the FFT loss grid must equal the
reference's brute-force masked-SSD/correlation scorer
(reference: NPP_proposal/feature_searching.py:208-264) at every displacement,
and the lattice math must satisfy its geometric identities."""
import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.proposal import search_engine as se


def brute_force_loss(act, mask, shifts, edge_searching):
    """Direct transcription of compute_loss semantics: pad, gather, reduce."""
    c, h, w = act.shape
    pad_y, pad_x = h, w
    act_pad = np.zeros((c, h + pad_y, w + 2 * pad_x))
    mask_pad = np.zeros((h + pad_y, w + 2 * pad_x))
    act_pad[:, :h, pad_x:pad_x + w] = act
    mask_pad[:h, pad_x:pad_x + w] = mask
    ys, xs = np.meshgrid(np.arange(h), np.arange(pad_x, pad_x + w), indexing='ij')
    out = np.zeros(len(shifts))
    for i, (dx, dy) in enumerate(shifts):
        a_s = act_pad[:, ys + dy, xs + dx]
        m_s = mask_pad[ys + dy, xs + dx]
        if edge_searching:
            pd = -a_s * act
        else:
            pd = (a_s - act) ** 2
        out[i] = np.sum(pd * mask[None] * m_s[None])
    return out


@pytest.mark.parametrize('edge', [True, False])
def test_fft_grid_matches_brute_force(edge):
    rng = np.random.RandomState(0)
    c, h, w = 3, 24, 30
    act = rng.rand(c, h, w)
    mask = (rng.rand(h, w) > 0.3).astype(np.float64)
    act = act * mask[None]

    grid = np.asarray(se.displacement_loss_grid(
        jnp.asarray(act, jnp.float32), jnp.asarray(mask, jnp.float32),
        edge_searching=edge))

    shifts = se.generate_possible_shifts((h, w), (2, 4), (2, 4))
    assert len(shifts) > 10
    expected = brute_force_loss(act, mask, shifts, edge)
    got = grid[shifts[:, 1], shifts[:, 0] + w]
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-3)


def test_full_displacement_domain_vs_brute_force():
    """Every displacement in the widest annulus (range start=1), including
    maximal negative dx."""
    rng = np.random.RandomState(1)
    h, w = 16, 14
    act = rng.rand(1, h, w)
    mask = np.ones((h, w))
    grid = np.asarray(se.displacement_loss_grid(
        jnp.asarray(act, jnp.float32), jnp.asarray(mask, jnp.float32),
        edge_searching=False))
    shifts = se.generate_possible_shifts((h, w), (1, 2), (1, 2))
    expected = brute_force_loss(act, mask, shifts, False)
    got = grid[shifts[:, 1], shifts[:, 0] + w]
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-3)


def test_generate_possible_shifts_matches_reference_semantics():
    shifts = se.generate_possible_shifts((40, 60), (3, 4), (3, 4))
    # all within the outer range box, outside the inner box
    assert np.all(shifts[:, 0] >= -(60 // 3)) and np.all(shifts[:, 0] < 60 // 3)
    assert np.all(shifts[:, 1] >= 0) and np.all(shifts[:, 1] < 40 // 3)
    inner = (np.abs(shifts[:, 0]) <= 60 // 4) & (shifts[:, 1] <= 40 // 4)
    assert not np.any(inner)


def test_lattice_math_identities():
    """shifts2period on an orthogonal lattice returns the pure lengths."""
    d1 = np.array([20.0, 0.0])    # (dx, dy)
    d2 = np.array([0.0, 30.0])
    assert se.shifts2period(d1, d2) == pytest.approx(20.0)
    assert se.shifts2period(d2, d1) == pytest.approx(30.0)
    # 45-degree lattice: period shrinks by sin(45)
    d3 = np.array([20.0, 20.0])
    assert se.shifts2period(d1, d3) == pytest.approx(20.0 * np.sin(np.pi / 4))
    # angle convention: 180 - atan2(dy, dx)
    assert se.shifts2angle(np.array([1.0, 0.0])) == pytest.approx(180.0)
    assert se.shifts2angle(np.array([0.0, 1.0])) == pytest.approx(90.0)


def test_second_shift_angle_filter():
    shifts = np.array([[10.0, 0.0], [11.0, 1.0], [0.0, 10.0], [9.0, 0.5]])
    idx = se.find_second_shift_by_angle(shifts)
    assert idx == 2  # first with >20 degrees separation


def test_synthetic_lattice_detection():
    """End-to-end on a clean synthetic lattice: detected displacement must be
    a lattice vector (multiple of the true period)."""
    h, w = 96, 96
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
    act = (np.sin(2 * np.pi * yy / 12.0) + np.cos(2 * np.pi * xx / 16.0))[None]
    mask = np.ones((h, w))
    angles, periods, shifts = se.feature_search(
        np.concatenate([act, mask[None]]), mask, repeat_range=(4, 6, 1),
        edge_searching=False)
    assert len(shifts) >= 1
    for pair in shifts:
        for s in pair:
            dx, dy = s
            # each displacement should sit on the lattice (16 in x, 12 in y)
            assert abs(dx / 16.0 - round(dx / 16.0)) < 0.2 or abs(dx) < 1e-6
            assert abs(dy / 12.0 - round(dy / 12.0)) < 0.2 or abs(dy) < 1e-6


def test_lattice_to_proposal_convention():
    """The helper must produce (angle, period) pairs whose periodic warp is
    constant along each lattice vector (the invariant the embedding needs)."""
    import jax.numpy as jnp
    from npp_tpu.nn.embedder import periodic_warp

    d1 = np.array([16.0, 0.0])   # (dx, dy)
    d2 = np.array([0.0, 12.0])
    angles, periods = se.lattice_to_proposal(d1, d2)
    a = jnp.asarray(angles)
    p = jnp.asarray(periods)
    coords = jnp.asarray(np.random.RandomState(0).uniform(0, 50, (16, 2)),
                         jnp.float32)
    base = periodic_warp(coords, a, p, (1,), (0,), (0,), (100, 100),
                         include_input=False)
    for d in (d1, d2):
        shifted = coords + jnp.asarray([d[1], d[0]])  # (y, x) order
        w2 = periodic_warp(shifted, a, p, (1,), (0,), (0,), (100, 100),
                           include_input=False)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(base),
                                   atol=1e-3)


def test_canny_dense_small_image_no_crash():
    """This OpenCV build's SIMD Canny corrupts the heap (glibc abort) on
    small dense-edge inputs — deterministic on this 64x80 quarter-res
    near-periodic activation (captured from scripts/eval_remapping.py's
    synthetic). canny_edges pins the scalar dispatch around cv2.Canny
    (bit-identical on every bundled example, measured); run in a
    subprocess so a regression aborts the child, not the suite."""
    import os
    import subprocess
    import sys as _sys

    fix = os.path.join(os.path.dirname(__file__), 'fixtures',
                       'canny_dense_64x80.npy')
    code = (
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from npp_tpu.proposal.features import canny_edges\n"
        f"a = np.load({fix!r})\n"
        "m = np.ones(a.shape[1:], np.float64)\n"
        "sums = [float(canny_edges(a[c], m).sum()) for c in range(a.shape[0])]\n"
        "assert sums[0] > 0, sums\n"
        "print('ok')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='')
    r = subprocess.run([_sys.executable, '-c', code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)
    assert 'ok' in r.stdout
