"""Representation-similarity metrics: CCA / PWCCA / linear CKA /
Procrustes (the "Grounding Representation Similarity" metric set used by
the reference, reduction_methods_analysis/feature_sim_metrics.py).

Inputs are (neurons x examples) matrices with neurons < examples.
"""

from __future__ import annotations

import numpy as np


def _whitener(M: np.ndarray) -> np.ndarray:
    """Symmetric inverse square root of M M^T via eigh (PSD-safe)."""
    evals, evecs = np.linalg.eigh(M @ M.T)
    evals = np.maximum(evals, 0.0)
    inv_sqrt = np.where(evals > 0, 1.0 / np.sqrt(np.where(evals > 0,
                                                          evals, 1.0)), 0.0)
    return evecs @ np.diag(inv_sqrt) @ evecs.T


def cca_decomp(A: np.ndarray, B: np.ndarray):
    """Returns (u, rho, vh, transformed_a, transformed_b)."""
    assert A.shape[0] < A.shape[1]
    assert B.shape[0] < B.shape[1]
    wa = _whitener(A)
    wb = _whitener(B)
    temp = wa @ (A @ B.T) @ wb
    try:
        u, s, vh = np.linalg.svd(temp)
    except np.linalg.LinAlgError:
        u, s, vh = np.linalg.svd(temp * 100)
        s = s / 100
    transformed_a = (u.T @ wa @ A).T
    transformed_b = (vh @ wb @ B).T
    return u, s, vh, transformed_a, transformed_b


def mean_sq_cca_corr(rho: np.ndarray) -> float:
    return float(np.sum(rho * rho) / len(rho))


def mean_cca_corr(rho: np.ndarray) -> float:
    return float(np.sum(rho) / len(rho))


def pwcca_dist(A: np.ndarray, rho: np.ndarray,
               transformed_a: np.ndarray) -> float:
    """Projection-weighted CCA distance."""
    in_prod = transformed_a.T @ A.T
    weights = np.sum(np.abs(in_prod), axis=1)
    weights = weights / np.sum(weights)
    dim = min(len(weights), len(rho))
    return float(1 - np.dot(weights[:dim], rho[:dim]))


def lin_cka_dist(A: np.ndarray, B: np.ndarray) -> float:
    """1 - linear CKA similarity."""
    sim = np.linalg.norm(B @ A.T, ord="fro") ** 2
    norm = np.linalg.norm(A @ A.T, ord="fro") * \
        np.linalg.norm(B @ B.T, ord="fro")
    return float(1 - sim / norm)


def procrustes(A: np.ndarray, B: np.ndarray) -> float:
    """Squared orthogonal Procrustes distance."""
    a_sq = np.sum(A ** 2)
    b_sq = np.sum(B ** 2)
    nuc = np.linalg.norm(A @ B.T, ord="nuc")
    return float(a_sq + b_sq - 2 * nuc)


def preprocess(mat: np.ndarray) -> np.ndarray:
    """Row mean-centering + global Frobenius normalization (reference
    compare_cls_features_models.py:148-154)."""
    mat = mat - mat.mean(axis=1, keepdims=True)
    return mat / np.linalg.norm(mat)
