"""Feature-map visualisation helpers.

Capability-equivalent of the viz half of
/root/reference/src/visualization_utils.py: min-max scaling (:40-46),
PCA colourisation of dense feature maps (:49-69), image size matching
(:16-25), and the slice/contour viewers (:28-37, 72-90) — rendered to
image files via matplotlib (Agg) instead of interactive skimage.io
windows.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = [
    "min_max_scale",
    "otsu_threshold",
    "pca_colorize",
    "match_images_sizes",
    "save_contour_slices",
    "visualize_features",
]


def otsu_threshold(values: np.ndarray, nbins: int = 256) -> float:
    """Otsu's between-class-variance-maximising threshold (pure numpy).

    Replaces skimage.filters.threshold_otsu used by the reference's
    background removal (visualization_utils.py:62)."""
    values = np.asarray(values, np.float64).ravel()
    hist, edges = np.histogram(values, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2.0
    weight1 = np.cumsum(hist)
    weight2 = weight1[-1] - weight1
    csum = np.cumsum(hist * centers)
    mean1 = csum / np.maximum(weight1, 1)
    mean2 = (csum[-1] - csum) / np.maximum(weight2, 1)
    variance = weight1[:-1] * weight2[:-1] * (mean1[:-1] - mean2[:-1]) ** 2
    return float(centers[:-1][np.argmax(variance)])


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
    map; background removal Otsu-thresholds the first component
    (visualization_utils.py:61-67 semantics).
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
        thresh = otsu_threshold(rgb[:, :, 0])
        keep = (rgb[:, :, 0] > thresh).astype(rgb.dtype)
        rgb = min_max_scale(rgb * keep[:, :, None])
    return rgb


def match_images_sizes(img: np.ndarray, label_img: np.ndarray) -> np.ndarray:
    """Nearest-resize *img* to *label_img*'s spatial shape (:16-25)."""
    from ..data.datasets import nearest_resize

    if img.shape[:2] != label_img.shape[:2]:
        img = nearest_resize(img, label_img.shape[:2])
    return img


def _mask_outline(mask: np.ndarray) -> np.ndarray:
    """Boolean outline of a 2D mask (boundary pixels)."""
    m = mask.astype(bool)
    interior = np.zeros_like(m)
    interior[1:-1, 1:-1] = (
        m[1:-1, 1:-1] & m[:-2, 1:-1] & m[2:, 1:-1] & m[1:-1, :-2]
        & m[1:-1, 2:]
    )
    return m & ~interior


def save_contour_slices(
    volume: np.ndarray,            # (H, W, S) grayscale or (H, W, S, 3)
    mask: np.ndarray | None,       # (H, W, S) labels/bool or None
    out_path,
    max_slices: int = 16,
    contour_color=(1.0, 0.2, 0.2),
) -> str:
    """Slice montage with mask boundaries → PNG.

    File-saving equivalent of the reference's interactive
    ``imshow_contours`` (visualization_utils.py:28-37).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    s = volume.shape[2]
    idx = np.linspace(0, s - 1, min(s, max_slices)).astype(int)
    ncols = int(np.ceil(np.sqrt(len(idx))))
    nrows = int(np.ceil(len(idx) / ncols))
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(3 * ncols, 3 * nrows), squeeze=False
    )
    for ax in axes.ravel():
        ax.axis("off")
    for ax, k in zip(axes.ravel(), idx):
        img = volume[:, :, k]
        if img.ndim == 2:
            rgb = np.repeat(
                min_max_scale(img.astype(np.float64))[..., None], 3, -1)
        else:
            rgb = min_max_scale(img.astype(np.float64))
        if mask is not None:
            m = match_images_sizes(
                mask[:, :, k].astype(np.float32), rgb) > 0
            rgb = rgb.copy()
            rgb[_mask_outline(m)] = contour_color
        ax.imshow(rgb)
        ax.set_title(f"slice {k}", fontsize=8)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return str(out_path)


def visualize_features(
    img: np.ndarray | None,        # (H, W) slice or None
    features: np.ndarray,          # (h, w, D) dense feature map
    mask: np.ndarray,              # (H, W) nodule mask
    out_path,
) -> str:
    """PCA-colourised feature map + image with mask contours → PNG.

    File-saving equivalent of reference ``visualize_features``
    (visualization_utils.py:72-90): full-frame and ROI-cropped views of
    the PCA colourisation (and the raw slice when given).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..ops.roi import extract_roi

    h, w, d = features.shape
    pca_rgb = pca_colorize(features.reshape(h * w, d), (h, w))
    panels = [("features (PCA)", pca_rgb, mask)]
    if img is not None:
        panels.append(("image", img, mask))
    pca_crop = extract_roi(pca_rgb, mask)
    mask_crop = extract_roi(mask, mask)
    panels.append(("features ROI", pca_crop, mask_crop))
    if img is not None:
        panels.append(("image ROI", extract_roi(img, mask), mask_crop))

    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    axes = np.atleast_1d(axes)
    for ax, (title, pane, m) in zip(axes, panels):
        pane = np.asarray(pane, np.float64)
        if pane.ndim == 2:
            pane = np.repeat(min_max_scale(pane)[..., None], 3, -1)
        else:
            pane = min_max_scale(pane)
        mm = match_images_sizes(
            np.asarray(m, np.float32), pane) > 0
        pane = pane.copy()
        pane[_mask_outline(mm)] = (1.0, 0.2, 0.2)
        ax.imshow(pane)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return str(out_path)
