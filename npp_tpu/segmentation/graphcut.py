"""ctypes binding for the native alpha-expansion solver.

API-compatible with pyGCO's cut_general_graph as the reference calls it
(reference: NPP_segmentation/imsegm/graph_cuts.py:736-748).
"""
from __future__ import annotations

import ctypes
import functools

import numpy as np


@functools.lru_cache(maxsize=1)
def _lib():
    from ..native.build import build_library
    lib = ctypes.CDLL(build_library('graphcut'))
    lib.alpha_expansion.restype = ctypes.c_int
    lib.alpha_expansion.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.graphcut_energy.restype = ctypes.c_double
    lib.graphcut_energy.argtypes = lib.alpha_expansion.argtypes[:7] + [
        ctypes.POINTER(ctypes.c_int32)]
    return lib


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def cut_general_graph(edges: np.ndarray, edge_weights: np.ndarray,
                      unary_cost: np.ndarray, pairwise_cost: np.ndarray,
                      algorithm: str = 'expansion', n_iter: int = -1
                      ) -> np.ndarray:
    """Minimise sum unary[v, l_v] + sum_e w_e * pairwise[l_u, l_v].

    Drop-in for pyGCO's cut_general_graph on the path the reference uses.
    """
    if algorithm != 'expansion':
        raise ValueError(f'only alpha-expansion is implemented, got {algorithm!r}')
    edges = np.ascontiguousarray(edges, np.int32)
    w = np.ascontiguousarray(edge_weights, np.float64)
    unary = np.ascontiguousarray(unary_cost, np.float64)
    pw = np.ascontiguousarray(pairwise_cost, np.float64)
    n_nodes, n_labels = unary.shape
    n_edges = len(edges)
    labels = np.zeros(n_nodes, np.int32)
    _lib().alpha_expansion(
        n_nodes, n_edges, n_labels, _ptr(edges, ctypes.c_int32),
        _ptr(w, ctypes.c_double), _ptr(unary, ctypes.c_double),
        _ptr(pw, ctypes.c_double), int(n_iter), _ptr(labels, ctypes.c_int32))
    return labels


def labeling_energy(edges, edge_weights, unary_cost, pairwise_cost, labels
                    ) -> float:
    edges = np.ascontiguousarray(edges, np.int32)
    w = np.ascontiguousarray(edge_weights, np.float64)
    unary = np.ascontiguousarray(unary_cost, np.float64)
    pw = np.ascontiguousarray(pairwise_cost, np.float64)
    labels = np.ascontiguousarray(labels, np.int32)
    n_nodes, n_labels = unary.shape
    return _lib().graphcut_energy(
        n_nodes, len(edges), n_labels, _ptr(edges, ctypes.c_int32),
        _ptr(w, ctypes.c_double), _ptr(unary, ctypes.c_double),
        _ptr(pw, ctypes.c_double), _ptr(labels, ctypes.c_int32))
