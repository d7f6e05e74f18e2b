"""Nodule ROI geometry: bounding boxes and crops.

Capability-equivalent of the reference's ROI ops
(/root/reference/src/visualization_utils.py:93-125) and the 2×-extent
square crop used before extraction
(/root/reference/src/tfds_dense_descriptor.py:257-267).

Two flavours are provided:

* **host** (numpy, dynamic shapes) — used at extraction graph-build time,
  where crop sizes are data-dependent and cheap on host;
* **device** (jnp, static shapes)  — mask bbox via weighted min/max
  reductions plus ``lax.dynamic_slice`` crops at a static bucket size,
  for fully-jitted pipelines.

The reference's ``extract_coords`` applies its margin asymmetrically
(ymin-m, ymax-m, xmin+m, xmax+m — a *shift*, not a pad;
visualization_utils.py:101-112).  Extraction output alignment depends on
it, so ``extract_coords(..., symmetric=False)`` reproduces that exact
arithmetic (the default), and ``symmetric=True`` gives the intended
padded box.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

__all__ = [
    "extract_coords",
    "crop_image",
    "extract_roi",
    "square_crop_box",
    "mask_bbox_device",
    "dynamic_crop",
]


# --------------------------------------------------------------------------
# Host-side (numpy, dynamic shapes)
# --------------------------------------------------------------------------

def extract_coords(mask: np.ndarray, margin: int, symmetric: bool = False):
    """Bounding box (xmin, ymin, xmax, ymax) of a boolean mask.

    Parity with reference extract_coords (visualization_utils.py:101-112),
    including the shift-style margin and the ``max(extent, margin)``
    floor; ``symmetric=True`` pads both sides instead.
    """
    ys, xs = np.where(mask)
    if symmetric:
        ymin, ymax = ys.min() - margin, ys.max() + margin
        xmin, xmax = xs.min() - margin, xs.max() + margin
    else:
        ymin, ymax = ys.min() - margin, ys.max() - margin
        xmin, xmax = xs.min() + margin, xs.max() + margin
    h = max(ymax - ymin, margin)
    w = max(xmax - xmin, margin)
    return int(xmin), int(ymin), int(xmin + w), int(ymin + h)


def crop_image(img: np.ndarray, xmin: int, ymin: int, xmax: int, ymax: int):
    """Clamped [ymin:ymax, xmin:xmax] crop (visualization_utils.py:93-98)."""
    h, w = img.shape[:2]
    ymin, ymax = (max(0, min(v, h)) for v in (ymin, ymax))
    xmin, xmax = (max(0, min(v, w)) for v in (xmin, xmax))
    return img[ymin:ymax, xmin:xmax]


def scaled_roi_box(
    img_shape: tuple[int, int], mask: np.ndarray, margin: int = 1
):
    """The box arithmetic of :func:`extract_roi`, without the crop.

    Returns clamped (xmin, ymin, xmax, ymax) into an image of
    ``img_shape`` — lets callers perform the crop elsewhere (e.g. as a
    device-side ``dynamic_slice``) with identical geometry.
    """
    xmin, ymin, xmax, ymax = extract_coords(mask, margin)
    if tuple(img_shape[:2]) != mask.shape[:2]:
        hs = img_shape[0] / mask.shape[0]
        ws = img_shape[1] / mask.shape[1]
        xmin, ymin, xmax, ymax = (
            int(v) for v in (xmin * ws, ymin * hs, xmax * ws, ymax * hs)
        )
        h = max(ymax - ymin, margin)
        w = max(xmax - xmin, margin)
        xmax = xmin + w
        ymax = ymin + h
    h, w = img_shape[:2]
    ymin, ymax = (max(0, min(v, h)) for v in (ymin, ymax))
    xmin, xmax = (max(0, min(v, w)) for v in (xmin, xmax))
    return xmin, ymin, xmax, ymax


def extract_roi(img: np.ndarray, mask: np.ndarray, margin: int = 1):
    """Crop *img* to the bbox of *mask*, rescaling coords when the image is
    a feature map at a different resolution.

    Parity with reference extract_roi (visualization_utils.py:115-125):
    when shapes differ, box coords are scaled by the feature-map/image
    ratio and re-floored to the margin.  The box arithmetic lives in
    :func:`scaled_roi_box` so the device-side crop in engine/extract.py
    shares identical geometry.
    """
    return crop_image(img, *scaled_roi_box(img.shape, mask, margin))


def square_crop_box(mask_union: np.ndarray, margin: int = 2):
    """Square box at 2× the nodule extent, centered on the nodule.

    Parity with the pre-extraction crop in reference generate_features
    (tfds_dense_descriptor.py:257-267): bbox with margin, then a square of
    side ``2 * max_extent`` (i.e. half-size = max extent) around the bbox
    center.  Returns (xmin, ymin, xmax, ymax), which may exceed the image
    bounds — pair with :func:`crop_image`.
    """
    xmin, ymin, xmax, ymax = extract_coords(mask_union, margin)
    crop_size = max(xmax - xmin, ymax - ymin) * 2
    xmid = int(xmin + (xmax - xmin) / 2)
    ymid = int(ymin + (ymax - ymin) / 2)
    return (
        xmid - crop_size,
        ymid - crop_size,
        xmid + crop_size,
        ymid + crop_size,
    )


# --------------------------------------------------------------------------
# Device-side (jnp, static output shapes)
# --------------------------------------------------------------------------

def mask_bbox_device(mask: jnp.ndarray):
    """(ymin, xmin, ymax, xmax) of a boolean (H, W) mask, on device.

    Min/max over coordinate grids masked with ±inf sentinels — pure
    reductions, no host sync.  Empty masks yield a degenerate box at 0.
    """
    h, w = mask.shape
    ys = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(h + w)
    valid = mask.astype(bool)
    ymin = jnp.min(jnp.where(valid, ys, big))
    xmin = jnp.min(jnp.where(valid, xs, big))
    ymax = jnp.max(jnp.where(valid, ys, -1))
    xmax = jnp.max(jnp.where(valid, xs, -1))
    empty = ~jnp.any(valid)
    zero = jnp.int32(0)
    return (
        jnp.where(empty, zero, ymin),
        jnp.where(empty, zero, xmin),
        jnp.where(empty, zero, ymax),
        jnp.where(empty, zero, xmax),
    )


def dynamic_crop(img: jnp.ndarray, ymin, xmin, out_h: int, out_w: int):
    """Static-shape crop starting at (ymin, xmin), clamped to bounds.

    ``lax.dynamic_slice`` with a static (out_h, out_w) window — the
    XLA-friendly form of the reference's dynamic crop: callers pick a
    bucketed window size and mask out-of-roi pixels downstream.
    """
    start = (
        jnp.clip(ymin, 0, img.shape[0] - out_h),
        jnp.clip(xmin, 0, img.shape[1] - out_w),
    ) + (0,) * (img.ndim - 2)
    sizes = (out_h, out_w) + img.shape[2:]
    return lax.dynamic_slice(img, start, sizes)
