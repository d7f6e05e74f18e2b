"""Fused affine sampling: flip → rotate → crop → resize in one gather.

The reference extraction pipeline applies, per augmentation, on host:
``flip_image`` → ``scipy.ndimage.rotate`` → ``crop_image`` (square box at
2× nodule extent) → per-slice ``skimage.resize`` to the ViT input size
(/root/reference/src/tfds_dense_descriptor.py:463-467, 242-284, 30-48) —
then ships each slice to the device separately.

All four steps compose into a single affine map from output pixels to
input-volume coordinates, so here they run as ONE bilinear gather on
device, with static output shape (jit-stable across patients) and traced
scalar parameters (angle, flip flags, crop box).  Composition (inverse
maps, output → input):

1. resize⁻¹: half-pixel centers, ``y_c = ymin + (i+½)·ch/out − ½``
   (skimage/jax.image convention), clamped to the crop interior so edge
   handling matches resizing the materialised crop,
2. rotate⁻¹ about the volume center, scipy-direction
   (90° sends the top row to the left column), edge-clamped
   ('nearest' mode); interpolation is bilinear — the reference uses a
   cubic spline, which only affects the stochastic augmentation copies
   (angle 0 is exact),
3. flip⁻¹ (flips are involutions; the reference flips *before*
   rotating, so the inverse applies after rotate⁻¹).

The same map with threshold re-binarisation transforms masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_flip_rotate_crop_resize", "transform_mask"]


def _source_coords(
    out_h: int,
    out_w: int,
    box,          # (ymin, xmin, crop_h, crop_w) traced scalars
    angle_deg,    # traced float scalar
    flip_h,       # traced bool scalar
    flip_v,       # traced bool scalar
    height,       # traced int scalar: valid volume height
    width,
):
    ymin, xmin, crop_h, crop_w = (jnp.asarray(v, jnp.float32) for v in box)
    h = jnp.asarray(height, jnp.float32)
    w = jnp.asarray(width, jnp.float32)

    i = jnp.arange(out_h, dtype=jnp.float32)
    j = jnp.arange(out_w, dtype=jnp.float32)
    # resize⁻¹ with half-pixel centers, clamped inside the crop
    yc = ymin + jnp.clip((i + 0.5) * crop_h / out_h - 0.5, 0.0, crop_h - 1.0)
    xc = xmin + jnp.clip((j + 0.5) * crop_w / out_w - 0.5, 0.0, crop_w - 1.0)
    yy = jnp.broadcast_to(yc[:, None], (out_h, out_w))
    xx = jnp.broadcast_to(xc[None, :], (out_h, out_w))

    # rotate⁻¹ about the center of the VALID area
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1.0) / 2.0, (w - 1.0) / 2.0
    yr = yy - cy
    xr = xx - cx
    ys = cos_t * yr + sin_t * xr + cy
    xs = -sin_t * yr + cos_t * xr + cx

    # flip⁻¹ (reference flips before rotating)
    ys = jnp.where(flip_v, h - 1.0 - ys, ys)
    xs = jnp.where(flip_h, w - 1.0 - xs, xs)

    # edge clamp ('nearest' boundary mode) against the valid extent
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    return ys, xs


def _gather_bilinear(plane: jax.Array, ys, xs, hmax, wmax):
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, hmax)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, wmax)
    y1 = jnp.clip(y0 + 1, 0, hmax)
    x1 = jnp.clip(x0 + 1, 0, wmax)
    wy = ys - y0.astype(jnp.float32)
    wx = xs - x0.astype(jnp.float32)
    if plane.ndim == 3:  # trailing channel axis
        wy = wy[..., None]
        wx = wx[..., None]
    v00 = plane[y0, x0]
    v01 = plane[y0, x1]
    v10 = plane[y1, x0]
    v11 = plane[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


@functools.partial(jax.jit, static_argnames=("out_size", "out_dtype"))
def fused_flip_rotate_crop_resize(
    volume: jax.Array,      # (H, W, S) or (H, W, S, C), normalized [0,1]
    box,                    # (ymin, xmin, crop_h, crop_w)
    angle_deg,
    flip_h,
    flip_v,
    valid_hw,               # (height, width) of the real (unpadded) volume
    out_size: int,
    out_dtype=jnp.float32,
) -> jax.Array:
    """→ (S, out_size, out_size[, C]) resampled slices, clipped to [0, 1].

    ``out_dtype=bf16`` halves the (S, out², C) output bandwidth — the
    gather computes f32 internally and rounds once at the end, the same
    rounding the downstream ViT's bf16 cast would apply, so descriptors
    are unchanged."""
    ys, xs = _source_coords(
        out_size, out_size, box, angle_deg, flip_h, flip_v,
        valid_hw[0], valid_hw[1],
    )
    hmax = volume.shape[0] - 1
    wmax = volume.shape[1] - 1
    vol = jnp.moveaxis(volume.astype(jnp.float32), 2, 0)  # (S, H, W[, C])
    out = jax.vmap(lambda p: _gather_bilinear(p, ys, xs, hmax, wmax))(vol)
    return jnp.clip(out, 0.0, 1.0).astype(out_dtype)


@jax.jit
def transform_mask(
    mask: jax.Array,        # (H, W, S) bool/float
    angle_deg,
    flip_h,
    flip_v,
    valid_hw,
) -> jax.Array:
    """Flip+rotate a mask volume in place (identity crop/resize),
    re-binarised with > 0 — mirroring the reference's mask handling
    (tfds_dense_descriptor.py:348-349)."""
    h, w = mask.shape[0], mask.shape[1]
    ys, xs = _source_coords(
        h, w, (0, 0, h, w), angle_deg, flip_h, flip_v,
        valid_hw[0], valid_hw[1],
    )
    m = jnp.moveaxis(mask.astype(jnp.float32), 2, 0)
    out = jax.vmap(
        lambda plane: _gather_bilinear(plane, ys, xs, h - 1, w - 1)
    )(m)
    return jnp.moveaxis(out, 0, 2) > 0
