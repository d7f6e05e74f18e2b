"""Fused on-device CT/PET preprocessing kernels.

TPU-native replacements for the reference's per-slice host loops:

* HU intensity windowing           — ref apply_window_ct
  (/root/reference/src/tfds_dense_descriptor.py:287-303, 204-239)
* HU→RGB tissue transfer function  — ref hu_to_rgb_vectorized
  (/root/reference/src/visualization_utils.py:128-186)
* PET normalisation                — ref img/img.max()
  (tfds_dense_descriptor.py:447)
* slice resize to the ViT input    — ref prepare_image
  (tfds_dense_descriptor.py:30-48)
* flips and in-plane rotation      — ref flip_image / rotate_image
  (tfds_dense_descriptor.py:306-350)

Everything is pure jnp (static shapes, no data-dependent control flow) so
the whole pipeline fuses into the jitted extraction step instead of doing
one host→device round trip per slice per augmentation like the reference.
Elementwise chains fuse into the surrounding matmuls by XLA; the rotation
resample is a gather the compiler tiles onto the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "windowing_ct",
    "apply_window_ct",
    "hu_to_rgb",
    "normalize_pet",
    "resize_slices",
    "prepare_vit_input",
    "flip_volume",
    "rotate_volume",
]


def windowing_ct(width: float, level: float) -> tuple[float, float]:
    """HU window (width, level) → (lower, upper) bounds.

    Parity with reference windowing_ct (tfds_dense_descriptor.py:204-239).
    Typical values: lungs W1500/L-600, mediastinum W350/L50; the reference
    extraction uses W800/L40 for MedSAM CT inputs (:443).
    """
    return level - width / 2.0, level + width / 2.0


def apply_window_ct(ct: jax.Array, width: float, level: float) -> jax.Array:
    """Clip-normalise a CT volume to [0, 1] using an HU window.

    Parity with reference apply_window_ct (tfds_dense_descriptor.py:287-303).
    """
    lower, upper = windowing_ct(width, level)
    ct = (ct - lower) / (upper - lower)
    return jnp.clip(ct, 0.0, 1.0)


# --- HU → RGB tissue transfer function -----------------------------------
# Band anchors (HU, color) of the piecewise-linear transfer in the
# reference (visualization_utils.py:128-186).  NOTE: the reference's band
# 40..80 HU interpolates with the 80..400 denominators (its :175 uses
# min=80,max=400 for the 40..80 mask), producing a slight extrapolation
# below the soft-tissue color; we reproduce that behaviour exactly so RGB
# inputs to DINOv2-style backbones match the reference bit-for-bit after
# the integer truncation.

_AIR = (0.0, 0.0, 0.0)
_LUNG = (194.0, 105.0, 82.0)
_FAT = (194.0, 166.0, 115.0)
_SOFT_LO = (102.0, 0.0, 0.0)
_SOFT_HI = (153.0, 0.0, 0.0)
_BONE = (255.0, 255.0, 255.0)


def _lerp(c0, c1, hu, lo, hi):
    r = (hu - lo) / (hi - lo)
    c0 = jnp.asarray(c0, jnp.float32)
    c1 = jnp.asarray(c1, jnp.float32)
    return c0 * (1.0 - r[..., None]) + c1 * r[..., None]


def hu_to_rgb(hu: jax.Array) -> jax.Array:
    """Piecewise-linear HU→RGB tissue colouring, uint8 output.

    Parity with reference hu_to_rgb_vectorized
    (visualization_utils.py:128-186) including its float→int truncation
    semantics.  Bands: air ≤-1000 < air→lung < -600 ≤ lung ≤ -400 <
    lung→fat < -100 ≤ fat ≤ -60 < fat→soft < 40 ≤ soft ≤ 80 < soft→bone
    < 400 ≤ bone.
    """
    hu = jnp.asarray(hu, jnp.float32)
    rgb = jnp.zeros(hu.shape + (3,), jnp.float32)

    def band(rgb, mask, value):
        return jnp.where(mask[..., None], value, rgb)

    rgb = band(rgb, hu <= -1000, jnp.asarray(_AIR, jnp.float32))
    rgb = band(rgb, (hu > -1000) & (hu < -600), _lerp(_AIR, _LUNG, hu, -1000, -600))
    rgb = band(rgb, (hu >= -600) & (hu <= -400), jnp.asarray(_LUNG, jnp.float32))
    rgb = band(rgb, (hu > -400) & (hu < -100), _lerp(_LUNG, _FAT, hu, -400, -100))
    rgb = band(rgb, (hu >= -100) & (hu <= -60), jnp.asarray(_FAT, jnp.float32))
    rgb = band(rgb, (hu > -60) & (hu < 40), _lerp(_FAT, _SOFT_LO, hu, -60, 40))
    # Reference quirk: the 40..80 band interpolates with the 80..400 range.
    rgb = band(rgb, (hu >= 40) & (hu <= 80), _lerp(_SOFT_LO, _SOFT_HI, hu, 80, 400))
    rgb = band(rgb, (hu > 80) & (hu < 400), _lerp(_SOFT_HI, _BONE, hu, 80, 400))
    rgb = band(rgb, hu >= 400, jnp.asarray(_BONE, jnp.float32))

    # Reference assigns floats into an int array (truncation toward zero)
    # then casts to uint8.
    return jnp.trunc(rgb).astype(jnp.uint8)


def normalize_pet(pet: jax.Array, eps: float = 0.0) -> jax.Array:
    """PET → [0,1] by global max (ref tfds_dense_descriptor.py:447)."""
    return pet / (jnp.max(pet) + eps)


def resize_slices(
    vol: jax.Array, out_hw: tuple[int, int], method: str = "linear"
) -> jax.Array:
    """Resize a (S, H, W, C) or (S, H, W) stack of slices in-plane.

    Half-pixel-center linear resampling — same convention as the
    reference's skimage resize in prepare_image
    (tfds_dense_descriptor.py:40-44), but batched over all slices on
    device instead of per-slice on host.
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    s, _, _, c = vol.shape
    out = jax.image.resize(vol, (s, out_hw[0], out_hw[1], c), method=method)
    return out[..., 0] if squeeze else out


def prepare_vit_input(
    vol: jax.Array, image_size: int, dtype=jnp.float32
) -> jax.Array:
    """Slices → batched ViT input (S, image_size, image_size, 3).

    Capability-equivalent of reference prepare_image
    (tfds_dense_descriptor.py:30-48): grayscale slices are broadcast to
    RGB and resized to the backbone input (1024² MedSAM, 518/896²
    DINOv2).  Unlike the reference this keeps NHWC layout (TPU conv
    native) and processes the whole slice batch in one fused program.

    Accepts (S, H, W) grayscale or (S, H, W, 3) RGB.
    """
    if vol.ndim == 3:
        vol = jnp.repeat(vol[..., None], 3, axis=-1)
    vol = resize_slices(vol.astype(jnp.float32), (image_size, image_size))
    return vol.astype(dtype)


def flip_volume(
    image: jax.Array, mask: jax.Array, flip_type: str | None
) -> tuple[jax.Array, jax.Array]:
    """Flip (H, W, S[, C]) image+mask horizontally or vertically.

    Parity with reference flip_image (tfds_dense_descriptor.py:306-325):
    'horizontal' reverses axis 1 (W), 'vertical' reverses axis 0 (H).
    """
    if flip_type == "horizontal":
        return image[:, ::-1, ...], mask[:, ::-1, ...]
    if flip_type == "vertical":
        return image[::-1, ...], mask[::-1, ...]
    return image, mask


@functools.partial(jax.jit, static_argnames=("order",))
def _rotate_plane(vol: jax.Array, angle_deg: jax.Array, order: int = 1) -> jax.Array:
    """Rotate (H, W, ...) around the XY-plane center, edge-clamped resample.

    Device-side equivalent of the reference's scipy.ndimage.rotate with
    reshape=False, mode='nearest' (tfds_dense_descriptor.py:328-350).  The
    reference uses cubic-spline interpolation on host; on device we use
    bilinear (order=1) or nearest (order=0) gathers — the numerical
    difference only affects the *augmented* (stochastic) training copies,
    never the deterministic parity path (angle 0 returns the input
    unchanged upstream).
    """
    h, w = vol.shape[:2]
    theta = jnp.deg2rad(angle_deg)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    # scipy.ndimage.rotate centers at (size-1)/2.
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    # Inverse map: output (y, x) samples input at rotation by -angle
    # (matches scipy.ndimage.rotate's direction: 90° sends the top row to
    # the left column).
    src_y = cos_t * yy + sin_t * xx + cy
    src_x = -sin_t * yy + cos_t * xx + cx

    if order == 0:
        iy = jnp.clip(jnp.round(src_y).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, w - 1)
        return vol[iy, ix]

    y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(src_y - y0, 0.0, 1.0)
    wx = jnp.clip(src_x - x0, 0.0, 1.0)
    extra = (1,) * (vol.ndim - 2)
    wy = wy.reshape(wy.shape + extra)
    wx = wx.reshape(wx.shape + extra)
    v00 = vol[y0, x0]
    v01 = vol[y0, x1]
    v10 = vol[y1, x0]
    v11 = vol[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def rotate_volume(
    image: jax.Array,
    mask: jax.Array,
    angle_deg: float,
    order: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Rotate (H, W, S[, C]) image+mask in the XY plane on device.

    Mirrors reference rotate_image (tfds_dense_descriptor.py:328-350):
    angle 0 is the identity, the image is clipped back to [0, 1], and the
    mask is re-binarised with > 0.
    """
    if angle_deg == 0:
        return image, mask
    angle = jnp.float32(angle_deg)
    image_rot = jnp.clip(_rotate_plane(image.astype(jnp.float32), angle, order=order), 0.0, 1.0)
    mask_rot = _rotate_plane(mask.astype(jnp.float32), angle, order=order) > 0
    return image_rot, mask_rot
