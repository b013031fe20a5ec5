"""Convex-hull outlier removal (GauSSmart idea #1).

Behavior parity with reference filter/hull_removal.py:10-47: per-point
minimum distance to the hull facets, z-score filter keeping z >= -theta
(theta=1.96). Array-in/array-out (no open3d point-cloud objects).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import ConvexHull


def hull_distances(points: np.ndarray, hull: ConvexHull) -> np.ndarray:
    eq = hull.equations
    dots = points @ eq[:, :3].T + eq[:, 3]
    norms = np.linalg.norm(eq[:, :3], axis=1)
    return np.min(np.abs(dots) / norms, axis=1)


def hull_removal(points: np.ndarray, theta: float = 1.96
                 ) -> Tuple[np.ndarray, ConvexHull]:
    """Returns (keep_mask, hull). Points whose hull-distance z-score is
    below -theta (i.e. unusually close to the hull = outliers) are dropped."""
    hull = ConvexHull(points)
    d = hull_distances(points, hull)
    z = (d - d.mean()) / max(d.std(), 1e-12)
    return z >= -theta, hull


def filter_point_cloud(points: np.ndarray,
                       colors: Optional[np.ndarray] = None,
                       normals: Optional[np.ndarray] = None,
                       theta: float = 1.96):
    keep, _ = hull_removal(points, theta)
    return (points[keep],
            colors[keep] if colors is not None else None,
            normals[keep] if normals is not None else None,
            keep)
