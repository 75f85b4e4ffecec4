"""Native alpha-expansion correctness: exact vs brute-force enumeration on
small random graphs, Potts behaviour on a grid."""
import itertools

import numpy as np
import pytest

from npp_tpu.segmentation.graphcut import cut_general_graph, labeling_energy


def brute_force(edges, w, unary, pw):
    n, k = unary.shape
    best, best_e = None, np.inf
    for labels in itertools.product(range(k), repeat=n):
        e = sum(unary[v, labels[v]] for v in range(n))
        e += sum(w[i] * pw[labels[u], labels[v]] for i, (u, v) in enumerate(edges))
        if e < best_e:
            best_e, best = e, labels
    return np.array(best), best_e


@pytest.mark.parametrize('seed', range(6))
def test_matches_brute_force_on_random_graphs(seed):
    rng = np.random.RandomState(seed)
    n, k = 8, 3
    edges = np.array([(i, j) for i in range(n) for j in range(i + 1, n)
                      if rng.rand() < 0.4], np.int32)
    if len(edges) == 0:
        edges = np.array([[0, 1]], np.int32)
    w = rng.rand(len(edges)) * 2
    unary = rng.rand(n, k) * 3
    pw = np.full((k, k), 1.0) - np.eye(k)  # Potts (a metric)
    pw *= rng.uniform(0.5, 2.0)

    labels = cut_general_graph(edges, w, unary, pw)
    got_e = labeling_energy(edges, w, unary, pw, labels)
    _, want_e = brute_force(edges, w, unary, pw)
    # alpha-expansion on Potts is within a known factor of optimal, and on
    # these tiny graphs it almost always hits the optimum; assert closeness
    assert got_e <= want_e * 1.001 + 1e-9


def test_potts_grid_denoising():
    """Classic check: noisy unaries on a grid, strong Potts -> smooth result."""
    rng = np.random.RandomState(0)
    side = 8
    n = side * side
    gt = np.zeros((side, side), int)
    gt[:, side // 2:] = 1
    unary = np.zeros((n, 2))
    for i in range(side):
        for j in range(side):
            v = i * side + j
            noisy = gt[i, j] if rng.rand() > 0.2 else 1 - gt[i, j]
            unary[v, 1 - noisy] = 1.0
    edges = []
    for i in range(side):
        for j in range(side):
            v = i * side + j
            if j + 1 < side:
                edges.append((v, v + 1))
            if i + 1 < side:
                edges.append((v, v + side))
    edges = np.array(edges, np.int32)
    w = np.ones(len(edges))
    pw = (np.ones((2, 2)) - np.eye(2)) * 0.8
    labels = cut_general_graph(edges, w, unary, pw)
    acc = (labels.reshape(side, side) == gt).mean()
    noisy_acc = 1.0 - unary[np.arange(n), gt.reshape(-1)].mean()
    assert acc > noisy_acc  # smoothing must beat the raw noisy unaries
    # and the returned labelling must beat the ground-truth labelling's energy
    got_e = labeling_energy(edges, w, unary, pw, labels)
    gt_e = labeling_energy(edges, w, unary, pw, gt.reshape(-1).astype(np.int32))
    assert got_e <= gt_e + 1e-9


def test_zero_regularisation_is_argmin():
    rng = np.random.RandomState(1)
    unary = rng.rand(20, 3)
    edges = np.array([[i, i + 1] for i in range(19)], np.int32)
    labels = cut_general_graph(edges, np.ones(19), unary, np.zeros((3, 3)))
    np.testing.assert_array_equal(labels, unary.argmin(1))
