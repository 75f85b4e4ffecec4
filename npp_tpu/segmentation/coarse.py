"""Coarse unsupervised segmentation: SLIC + color stats + GMM + graph cut
(the exercised path of the vendored imsegm library; reference:
NPP_segmentation/imsegm/pipelines.py:114-250, graph_cuts.py:73-163,523-759).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from sklearn import mixture, preprocessing

from .features import (segment_adjacency_edges, superpixel_centers,
                       superpixel_color_stats)
from .graphcut import cut_general_graph
from .slic import slic_segment

MIN_UNARY_PROB = 0.01       # reference: graph_cuts.py:36
MAX_PAIRWISE_COST = 1e5     # reference: graph_cuts.py:38
MIN_MAX_EDGE_WEIGHT = 1e3   # reference: graph_cuts.py:40


def compute_superpixels_features(image: np.ndarray, sp_size: int,
                                 sp_regul: float,
                                 mask: Optional[np.ndarray]
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """reference: pipelines.py:253-278."""
    slic = slic_segment(image, sp_size=sp_size, relative_compact=sp_regul,
                        mask=mask)
    feats = superpixel_color_stats(image, slic,
                                   flags=('mean', 'median', 'meanGrad'))
    return slic, np.nan_to_num(feats)


def estim_class_model(features: np.ndarray, nb_classes: int,
                      max_iter: int = 99, seed: int = 0):
    """Scaler + full-covariance GMM (reference: graph_cuts.py:73-163 with
    model_type='GMM', use_scaler=True, pca_coef=None)."""
    from sklearn.pipeline import Pipeline
    nb_inits = max(1, int(np.sqrt(max_iter)))
    model = Pipeline([
        ('std_scaler', preprocessing.StandardScaler()),
        ('gmm', mixture.GaussianMixture(n_components=nb_classes,
                                        covariance_type='full',
                                        n_init=nb_inits, max_iter=max_iter,
                                        random_state=seed)),
    ])
    model.fit(features)
    return model


def compute_unary_cost(proba: np.ndarray,
                       min_prob: float = MIN_UNARY_PROB) -> np.ndarray:
    """reference: graph_cuts.py:523-540."""
    p = np.clip(proba, min_prob, 1.0 - min_prob)
    return np.abs(-np.log(p)).astype(np.float64)


def compute_pairwise_cost(gc_regul: float, nb_classes: int) -> np.ndarray:
    """Uniform Potts matrix (reference: graph_cuts.py:485-555)."""
    pw = gc_regul * (np.ones((nb_classes, nb_classes)) - np.eye(nb_classes))
    return np.minimum(pw, MAX_PAIRWISE_COST).astype(np.float64)


def compute_edge_weights(slic: np.ndarray, features: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """gc_edge_type='features' path (reference: graph_cuts.py:574-660):
    w = exp(-d_euclid(scaled feats) / (2 std(d)^2)) / relative spatial dist,
    clipped to [1e-3, 1e3]. Edges/labels are 0-based after dropping the
    masked-out label 0."""
    edges = segment_adjacency_edges(slic).astype(np.int32) - 1
    edges = edges[np.sum(edges < 0, axis=1) == 0]

    fnorm = preprocessing.StandardScaler().fit_transform(features)
    d = np.linalg.norm(fnorm[edges[:, 0]] - fnorm[edges[:, 1]], axis=1)
    weights = np.exp(-(d / (2 * np.std(d) ** 2)))

    centres = superpixel_centers(slic)[1:]
    sp = np.linalg.norm(centres[edges[:, 0]] - centres[edges[:, 1]], axis=1)
    sp = sp / np.mean(sp)
    weights = weights / sp

    return edges, np.clip(weights, 1.0 / MIN_MAX_EDGE_WEIGHT,
                          MIN_MAX_EDGE_WEIGHT)


def coarse_segment(image: np.ndarray, mask: Optional[np.ndarray],
                   nb_classes: int = 3, sp_size: int = 20,
                   sp_regul: float = 0.1, gc_regul: float = 2.0,
                   seed: int = 0) -> np.ndarray:
    """Full unsupervised pipeline as the segmentation loader drives it
    (reference: loaders/loaders.py:163-179). Returns per-pixel class labels
    in [0, nb_classes); the caller shifts +1 and masks."""
    slic, feats = compute_superpixels_features(image, sp_size, sp_regul, mask)
    feats_valid = feats[1:]
    model = estim_class_model(feats_valid, nb_classes, seed=seed)
    proba = model.predict_proba(feats_valid)

    edges, edge_weights = compute_edge_weights(slic, feats_valid)
    unary = compute_unary_cost(proba)
    pairwise = compute_pairwise_cost(gc_regul, proba.shape[1])
    if gc_regul <= 0 or len(edges) == 0:
        labels = np.argmin(unary, axis=-1).astype(np.int32)
    else:
        labels = cut_general_graph(edges, edge_weights, unary, pairwise)
    return labels[slic - 1]
