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

__all__ = [
    "fused_flip_rotate_crop_resize",
    "resample_all_augmentations",
    "transform_mask",
]


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


def _gather_bilinear_planes(planes: jax.Array, ys, xs, hmax, wmax,
                            width: int):
    """Bilinear-sample every plane at once: ``planes`` is (P, H·W)
    flattened slice planes, ``ys``/``xs`` the (out_h, out_w) source
    fields → (P, out_h, out_w).

    The takes index the FLATTENED spatial axis so the gathered minor
    dimension is out² (lane-tile friendly).  The per-plane 2D-indexed
    formulation lowered to gathers whose results carried the slice count
    in the minor dim — padded 4→128 lanes on TPU, a 32× HBM expansion
    that OOM'd the compile once the augmentation axis was batched in
    (round-4 measurement: 4 × 6 GB transients for an unpadded 192 MB
    of corners at A=12, out=1024).
    """
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, hmax)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, wmax)
    y1 = jnp.clip(y0 + 1, 0, hmax)
    x1 = jnp.clip(x0 + 1, 0, wmax)
    wy = (ys - y0.astype(jnp.float32)).reshape(-1)      # (out²,)
    wx = (xs - x0.astype(jnp.float32)).reshape(-1)
    v00 = planes[:, (y0 * width + x0).reshape(-1)]      # (P, out²)
    v01 = planes[:, (y0 * width + x1).reshape(-1)]
    v10 = planes[:, (y1 * width + x0).reshape(-1)]
    v11 = planes[:, (y1 * width + x1).reshape(-1)]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape((planes.shape[0],) + ys.shape)


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
    h, w = volume.shape[0], volume.shape[1]
    vol = volume.astype(jnp.float32)
    if vol.ndim == 4:
        s, c = vol.shape[2], vol.shape[3]
        planes = vol.reshape(h * w, s * c).T            # (S·C, H·W)
        out = _gather_bilinear_planes(planes, ys, xs, h - 1, w - 1, w)
        out = out.reshape(s, c, out_size, out_size).transpose(0, 2, 3, 1)
    else:
        s = vol.shape[2]
        planes = vol.reshape(h * w, s).T                # (S, H·W)
        out = _gather_bilinear_planes(planes, ys, xs, h - 1, w - 1, w)
    return jnp.clip(out, 0.0, 1.0).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_size", "out_dtype", "slice_batch")
)
def resample_all_augmentations(
    volume: jax.Array,      # (H, W, S) or (H, W, S, C)
    boxes: jax.Array,       # (A, 4) int32: (ymin, xmin, crop_h, crop_w)
    angles: jax.Array,      # (A,) float
    flips_h: jax.Array,     # (A,) bool
    flips_v: jax.Array,     # (A,) bool
    valid_hw,
    out_size: int,
    out_dtype=jnp.float32,
    slice_batch: int | None = None,
) -> jax.Array:
    """Every augmentation's fused flip→rotate→crop→resize in ONE program.

    The per-augmentation eager loop costs one device program dispatch per
    augmentation per op through the remote-backend tunnel — the measured
    dominant share of the extraction sweep's wall time (bench.py e2e,
    round-4 attribution).  Batching the whole sweep into one vmapped
    program collapses that to a single dispatch whose executable is
    reused across every volume of the same (padded) shape.

    Returns ``(A*S, out, out, 3)`` slices (grayscale broadcast to RGB),
    or — with ``slice_batch`` — ``(ceil(A*S/slice_batch), slice_batch,
    out, out, 3)`` where the trailing partial chunk is padded by
    repeating the last slice (the same padding the per-augmentation
    stream applied at flush time; callers drop the pad after the ViT
    forward).
    """
    def one(box, angle, fh, fv):
        return fused_flip_rotate_crop_resize(
            volume, box, angle, fh, fv, valid_hw,
            out_size=out_size, out_dtype=out_dtype,
        )

    out = jax.vmap(one)(boxes, angles, flips_h, flips_v)  # (A,S,o,o[,C])
    if out.ndim == 4:                       # grayscale → RGB
        out = jnp.repeat(out[..., None], 3, axis=-1)
    out = out.reshape((-1,) + out.shape[2:])        # (A*S, o, o, 3)
    if slice_batch is not None:
        n = out.shape[0]
        nchunks = -(-n // slice_batch)
        pad = nchunks * slice_batch - n
        if pad:
            out = jnp.concatenate(
                [out, jnp.repeat(out[-1:], pad, axis=0)], axis=0)
        out = out.reshape((nchunks, slice_batch) + out.shape[1:])
    return out


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
    planes = mask.astype(jnp.float32).reshape(h * w, -1).T   # (S, H·W)
    out = _gather_bilinear_planes(planes, ys, xs, h - 1, w - 1, w)
    return jnp.moveaxis(out, 0, 2) > 0
