"""Saliency-style heatmap comparison metrics: KL / JS / PCC / SIM / SCC /
EMD (the MIT saliency-benchmark metric set the reference ports,
reduction_methods_analysis/heatmap_metrics.py).

EMD uses pyemd when installed, otherwise an exact LP solution via
scipy.optimize.linprog (HiGHS); identical optimum, no external dep.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import spearmanr

try:
    from pyemd import emd_with_flow  # optional

    _HAVE_PYEMD = True
except ImportError:
    _HAVE_PYEMD = False


def KL(map1, map2):
    map1 = map1 / np.sum(map1)
    map2 = map2 / np.sum(map2)
    return float(np.sum(map2 * np.log2(map2 / map1)))


def JS(map1, map2):
    map1 = (map1 / np.sum(map1)).reshape(-1)
    map2 = (map2 / np.sum(map2)).reshape(-1)
    avg = 0.5 * (map1 + map2)
    return float(0.5 * KL(map1, avg) + 0.5 * KL(map2, avg))


def PCC(map1, map2):
    """Pearson correlation (MATLAB corr2 semantics)."""
    m1 = (map1 - np.mean(map1)) / np.std(map1, ddof=1)
    m2 = (map2 - np.mean(map2)) / np.std(map2, ddof=1)
    m1 = m1 - np.mean(m1)
    m2 = m2 - np.mean(m2)
    return float(np.sum(m1 * m2) /
                 np.sqrt(np.sum(m1 * m1) * np.sum(m2 * m2)))


def SIM(map1, map2):
    """Histogram intersection after min-max + sum normalization."""
    m1 = (map1 - np.min(map1)) / (np.max(map1) - np.min(map1))
    m1 = m1 / np.sum(m1)
    m2 = (map2 - np.min(map2)) / (np.max(map2) - np.min(map2))
    m2 = m2 / np.sum(m2)
    return float(np.sum(np.minimum(m1, m2)))


def SCC(map1, map2):
    m1 = (map1 / np.sum(map1)).reshape(-1)
    m2 = (map2 / np.sum(map2)).reshape(-1)
    return float(spearmanr(m1, m2).correlation)


def create_emd_dist(R: int, C: int) -> np.ndarray:
    """Euclidean ground distance between grid cells, column-major cell
    ordering (matches reference heatmap_metrics.py:80-91)."""
    cc, rr = np.meshgrid(np.arange(1, C + 1), np.arange(1, R + 1),
                         indexing="ij")
    pts = np.stack([rr.reshape(-1), cc.reshape(-1)], axis=1).astype(float)
    diff = pts[:, None, :] - pts[None, :, :]
    return np.sqrt((diff ** 2).sum(-1))


def _emd_linprog(p: np.ndarray, q: np.ndarray, dist: np.ndarray) -> float:
    """Exact EMD as a transportation LP (HiGHS)."""
    from scipy.optimize import linprog
    from scipy.sparse import lil_matrix

    n = len(p)
    # variables f_ij >= 0; min sum d_ij f_ij
    # sum_j f_ij = p_i ; sum_i f_ij = q_j
    A = lil_matrix((2 * n, n * n))
    for i in range(n):
        A[i, i * n:(i + 1) * n] = 1.0
    for j in range(n):
        A[n + j, j::n] = 1.0
    bvec = np.concatenate([p, q])
    res = linprog(dist.reshape(-1), A_eq=A.tocsr(), b_eq=bvec,
                  bounds=(0, None), method="highs")
    if not res.success:
        raise RuntimeError(f"EMD LP failed: {res.message}")
    return float(res.fun)


def EMD(map1, map2, dist=None):
    R, C = map1.shape
    if dist is None:
        dist = create_emd_dist(R, C)
    p = (map1 / np.sum(map1)).reshape(-1)
    q = (map2 / np.sum(map2)).reshape(-1)
    if _HAVE_PYEMD:
        score, _ = emd_with_flow(p, q, dist, extra_mass_penalty=0.0)
        return float(score)
    return _emd_linprog(p, q, dist)
