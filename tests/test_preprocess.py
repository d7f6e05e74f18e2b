"""Preprocessing kernel parity tests.

Expected values are hand-derived from the documented reference behaviour
(HU windowing: tfds_dense_descriptor.py:204-303; HU→RGB bands:
visualization_utils.py:128-186; flips/rotation: tfds_dense_descriptor.py
:306-350) — not computed by running reference code.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from vit_deep_radiomics_tpu.ops import preprocess as pp


class TestWindowing:
    def test_bounds(self):
        lo, hi = pp.windowing_ct(800, 40)
        assert (lo, hi) == (-360.0, 440.0)

    def test_apply_window_values(self):
        ct = jnp.array([-1000.0, -360.0, 40.0, 440.0, 2000.0])
        out = np.asarray(pp.apply_window_ct(ct, 800, 40))
        np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-7)

    def test_lung_window(self):
        # lungs W1500 L-600 -> bounds (-1350, 150)
        out = float(pp.apply_window_ct(jnp.array(-600.0), 1500, -600))
        assert out == pytest.approx(0.5)


class TestHuToRgb:
    def test_band_anchors(self):
        hu = jnp.array([-1200.0, -1000.0, -500.0, -80.0, 1000.0])
        rgb = np.asarray(pp.hu_to_rgb(hu))
        np.testing.assert_array_equal(rgb[0], [0, 0, 0])        # air
        np.testing.assert_array_equal(rgb[1], [0, 0, 0])        # air boundary
        np.testing.assert_array_equal(rgb[2], [194, 105, 82])   # lung plateau
        np.testing.assert_array_equal(rgb[3], [194, 166, 115])  # fat plateau
        np.testing.assert_array_equal(rgb[4], [255, 255, 255])  # bone

    def test_air_lung_interpolation_midpoint(self):
        # HU=-800 is halfway between -1000 (air, black) and -600 (lung):
        # 0.5 * (194, 105, 82) truncated -> (97, 52, 41)
        rgb = np.asarray(pp.hu_to_rgb(jnp.array(-800.0)))
        np.testing.assert_array_equal(rgb, [97, 52, 41])

    def test_soft_tissue_band_uses_reference_quirk_range(self):
        # Band 40..80 interpolates soft_lo->soft_hi with the (80, 400)
        # denominators (reference quirk): at HU=80 ratio=0 -> soft_lo.
        rgb80 = np.asarray(pp.hu_to_rgb(jnp.array(80.0)))
        np.testing.assert_array_equal(rgb80, [102, 0, 0])
        # At HU=40, ratio=(40-80)/320=-0.125 -> r = 102*(1.125)+153*(-0.125)
        # = 114.75 - 19.125 = 95.625 -> trunc 95.
        rgb40 = np.asarray(pp.hu_to_rgb(jnp.array(40.0)))
        np.testing.assert_array_equal(rgb40, [95, 0, 0])

    def test_soft_bone_interpolation(self):
        # HU=240 halfway 80..400: 0.5*(153,0,0)+0.5*(255,255,255)
        # = (204, 127.5, 127.5) -> trunc (204, 127, 127)
        rgb = np.asarray(pp.hu_to_rgb(jnp.array(240.0)))
        np.testing.assert_array_equal(rgb, [204, 127, 127])

    def test_shape_and_dtype(self):
        hu = jnp.zeros((4, 5, 3))
        rgb = pp.hu_to_rgb(hu)
        assert rgb.shape == (4, 5, 3, 3)
        assert rgb.dtype == jnp.uint8


class TestFlips:
    def test_horizontal_reverses_width(self, rng):
        img = jnp.asarray(rng.normal(size=(4, 6, 3)))
        mask = img > 0
        fi, fm = pp.flip_volume(img, mask, "horizontal")
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(img)[:, ::-1])
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(mask)[:, ::-1])

    def test_vertical_reverses_height(self, rng):
        img = jnp.asarray(rng.normal(size=(4, 6, 3)))
        fi, _ = pp.flip_volume(img, img > 0, "vertical")
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(img)[::-1])

    def test_none_identity(self, rng):
        img = jnp.asarray(rng.normal(size=(4, 6)))
        fi, _ = pp.flip_volume(img, img > 0, None)
        np.testing.assert_array_equal(np.asarray(fi), np.asarray(img))


class TestRotate:
    def test_angle_zero_identity(self, rng):
        img = jnp.asarray(rng.uniform(size=(8, 8, 2)))
        out, _ = pp.rotate_volume(img, img > 0.5, 0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_rotate_90_matches_scipy_linear(self, rng):
        img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        mask = (img > 0.5).astype(np.float32)
        out, _ = pp.rotate_volume(jnp.asarray(img), jnp.asarray(mask), 90)
        ref = np.clip(
            ndi.rotate(img, 90, axes=(0, 1), reshape=False, order=1, mode="nearest"),
            0,
            1,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_rotate_45_close_to_scipy_linear(self, rng):
        img = rng.uniform(size=(32, 32)).astype(np.float32)
        out, _ = pp.rotate_volume(jnp.asarray(img), jnp.asarray(img > 0.5), 45)
        ref = np.clip(
            ndi.rotate(img, 45, axes=(0, 1), reshape=False, order=1, mode="nearest"),
            0,
            1,
        )
        # interior agrees; borders differ in edge-extension policy
        np.testing.assert_allclose(
            np.asarray(out)[4:-4, 4:-4], ref[4:-4, 4:-4], atol=1e-4
        )

    def test_mask_rebinarised(self, rng):
        mask = np.zeros((16, 16), np.float32)
        mask[6:10, 6:10] = 1
        _, mrot = pp.rotate_volume(jnp.asarray(mask), jnp.asarray(mask), 45)
        assert mrot.dtype == jnp.bool_
        assert bool(jnp.any(mrot))


class TestResize:
    def test_prepare_vit_input_shapes(self, rng):
        vol = jnp.asarray(rng.uniform(size=(3, 40, 40)))
        out = pp.prepare_vit_input(vol, 64)
        assert out.shape == (3, 64, 64, 3)
        # grayscale broadcast: channels identical
        np.testing.assert_array_equal(
            np.asarray(out[..., 0]), np.asarray(out[..., 1])
        )

    def test_resize_preserves_constant(self):
        vol = jnp.full((2, 10, 10), 0.7)
        out = pp.resize_slices(vol, (33, 17))
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)

    def test_pet_normalisation(self):
        pet = jnp.array([0.0, 2.0, 4.0])
        np.testing.assert_allclose(
            np.asarray(pp.normalize_pet(pet)), [0, 0.5, 1.0]
        )
