"""Feature-map visualisation helpers.

Capability-equivalent of the viz half of
/root/reference/src/visualization_utils.py: min-max scaling (:40-46),
PCA colourisation of dense feature maps (:49-69), and image size
matching (:16-25).  Interactive display (``imshow_contours``,
``visualize_features``) requires skimage.io which is absent from this
image; the data-producing pieces live here and the display step degrades
to returning arrays.
"""

from __future__ import annotations

import numpy as np

__all__ = ["min_max_scale", "pca_colorize", "match_images_sizes"]


def min_max_scale(data: np.ndarray) -> np.ndarray:
    """[min, max] → [0, 1]; constant input passes through (:40-46)."""
    lo, hi = data.min(), data.max()
    rng = hi - lo
    if rng != 0:
        data = (data - lo) / rng
    return data


def pca_colorize(
    features: np.ndarray, output_shape: tuple[int, int],
    remove_bg: bool = False,
) -> np.ndarray:
    """(N, D) features → (H, W, 3) PCA-RGB map (:49-69).

    With fewer samples than components the reference emits an all-ones
    map; background removal thresholds the first component at its
    midpoint (Otsu in the reference — skimage is absent here, and the
    midpoint matches on bimodal maps).
    """
    n, _d = features.shape
    if n >= 3:
        centered = features - features.mean(axis=0, keepdims=True)
        _u, _s, vt = np.linalg.svd(centered, full_matrices=False)
        rgb = centered @ vt[:3].T
    else:
        rgb = np.ones((n, 3))
    rgb = min_max_scale(rgb)
    rgb = rgb.reshape(tuple(output_shape) + (3,))
    if remove_bg:
        thresh = (rgb[:, :, 0].min() + rgb[:, :, 0].max()) / 2.0
        keep = (rgb[:, :, 0] > thresh).astype(rgb.dtype)
        rgb = min_max_scale(rgb * keep[:, :, None])
    return rgb


def match_images_sizes(img: np.ndarray, label_img: np.ndarray) -> np.ndarray:
    """Nearest-resize *img* to *label_img*'s spatial shape (:16-25)."""
    from ..data.datasets import nearest_resize

    if img.shape[:2] != label_img.shape[:2]:
        img = nearest_resize(img, label_img.shape[:2])
    return img
