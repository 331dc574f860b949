"""PCA projection of high-dim features to RGB for visualization.

(reference: mindmap/image_processing/pca.py) Fit a 3-component PCA basis on
(N, C) features and map to [0, 1] RGB; the returned projection can be reused
so colors are stable across frames.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np


class PcaProjection(NamedTuple):
    mean: np.ndarray  # (C,)
    components: np.ndarray  # (C, 3)
    lo: np.ndarray  # (3,) per-channel min used for normalization
    hi: np.ndarray  # (3,)


def fit_pca(features: np.ndarray, num_components: int = 3) -> PcaProjection:
    """Fit a PCA basis on (N, C) features via SVD."""
    features = np.asarray(features, dtype=np.float64)
    mean = features.mean(axis=0)
    centered = features - mean
    # Economy SVD; right singular vectors = principal axes.
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    components = vt[:num_components].T  # (C, k)
    projected = centered @ components
    lo = projected.min(axis=0)
    hi = projected.max(axis=0)
    return PcaProjection(mean, components, lo, hi)


def apply_pca(
    features: np.ndarray, projection: PcaProjection
) -> np.ndarray:
    """(N, C) or (H, W, C) features -> same leading shape + 3 RGB in [0, 1]."""
    shape = features.shape
    flat = np.asarray(features, dtype=np.float64).reshape(-1, shape[-1])
    projected = (flat - projection.mean) @ projection.components
    denom = np.where(projection.hi - projection.lo > 1e-12,
                     projection.hi - projection.lo, 1.0)
    rgb = np.clip((projected - projection.lo) / denom, 0.0, 1.0)
    return rgb.reshape(shape[:-1] + (3,)).astype(np.float32)


def apply_pca_return_projection(
    features: np.ndarray, projection: Optional[PcaProjection] = None
) -> Tuple[np.ndarray, PcaProjection]:
    """Fit (if needed) and apply; returns (rgb, projection)."""
    flat = np.asarray(features).reshape(-1, features.shape[-1])
    if projection is None:
        projection = fit_pca(flat)
    return apply_pca(features, projection), projection
