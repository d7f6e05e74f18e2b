"""Native token-packer parity, ingestion semantics, and runtime utils."""

import numpy as np
import pytest

from vit_deep_radiomics_tpu.data import ingest
from vit_deep_radiomics_tpu.data.datasets import nearest_resize
from vit_deep_radiomics_tpu.ops.posenc import positional_encoding_3d
from vit_deep_radiomics_tpu.utils import debugging, native, profiling


def _numpy_pack(feats, masks, res, noise, d):
    """The documented token-pack semantics (datasets._get_features
    numpy path)."""
    s, h, w, _ = feats.shape
    hm, wm = masks.shape[1:3]
    fmasks = np.stack([nearest_resize(m, (h, w)) for m in masks])
    ii, jj, kk = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(s), indexing="ij"
    )
    x = (jj / w) * wm * res[0]
    y = (ii / h) * hm * res[1]
    z = kk * res[2]
    sel = np.transpose(fmasks, (1, 2, 0)).reshape(-1) > 0
    x = (x - x.mean() + noise[0]).reshape(-1)[sel]
    y = (y - y.mean() + noise[1]).reshape(-1)[sel]
    z = (z - z.mean() + noise[2]).reshape(-1)[sel]
    pe = np.asarray(positional_encoding_3d(x, y, z, d))
    return np.transpose(feats, (1, 2, 0, 3)).reshape(-1, d)[sel] + pe / 4


class TestNativePacker:
    @pytest.fixture(autouse=True)
    def _require_native(self):
        if not native.available():
            pytest.skip("native library unavailable (no toolchain)")

    @pytest.mark.parametrize("seed", [0, 1])
    def test_pack_tokens_matches_numpy(self, seed):
        rng = np.random.default_rng(seed)
        s, h, w, d, hm, wm = 3, 10, 12, 96, 20, 24
        feats = rng.normal(size=(s, h, w, d)).astype(np.float32)
        masks = (rng.uniform(size=(s, hm, wm)) > 0.6).astype(np.float32)
        res = np.asarray([0.8, 0.9, 1.1])
        noise = rng.normal(size=3)
        got = native.pack_tokens(feats, masks, res, noise)
        want = _numpy_pack(feats, masks, res, noise, d)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_empty_mask_gives_zero_tokens(self):
        feats = np.zeros((2, 4, 4, 12), np.float32)
        masks = np.zeros((2, 8, 8), np.float32)
        out = native.pack_tokens(feats, masks, np.ones(3), np.zeros(3))
        assert out.shape[0] == 0

    def test_mask_features_matches_numpy(self, rng):
        s, h, w, d, hm, wm = 2, 6, 6, 8, 12, 12
        feats = rng.normal(size=(s, h, w, d)).astype(np.float32)
        masks = (rng.uniform(size=(s, hm, wm)) > 0.5).astype(np.float32)
        got = native.mask_features(feats, masks)
        fmasks = np.stack([nearest_resize(m, (h, w)) for m in masks])
        np.testing.assert_allclose(got, feats * fmasks[..., None], atol=0)


class TestIngest:
    def _fake_samples(self, n_slices=3, pet=False, bad_res=False):
        rng = np.random.default_rng(0)
        samples = []
        for _ in range(n_slices):
            s = {
                "img_exam": rng.normal(size=(8, 8)).astype(np.float32),
                "mask_exam": (rng.uniform(size=(8, 8)) > 0.7),
                "egfr_label": np.int64(1),
                "exam_metadata": {
                    "space_directions": np.asarray(
                        [0.0 if bad_res else 0.7, -0.7, 1.2])
                },
            }
            if pet:
                liver = np.zeros((4, 4), np.float32)
                liver[1:3, 1:3] = 2.0
                s["pet_liver"] = liver
            samples.append(s)
        return samples

    def test_stacks_and_labels(self):
        img, mask, labels, res = ingest.samples_to_voxels(
            self._fake_samples())
        assert img.shape == (8, 8, 3) and mask.shape == (8, 8, 3)
        assert (labels == 1).all()
        np.testing.assert_allclose(res, [0.7, 0.7, 1.2])

    def test_pet_liver_normalisation(self):
        samples = self._fake_samples(pet=True)
        img, *_ = ingest.samples_to_voxels(samples, pet=True)
        raw = np.dstack([s["img_exam"] for s in samples])
        np.testing.assert_allclose(img, raw / (2.0 + 1e-10), rtol=1e-6)

    def test_null_resolution_guard(self, capsys):
        _, _, _, res = ingest.samples_to_voxels(
            self._fake_samples(bad_res=True))
        assert (res == res.max()).all() and res.max() > 0
        assert "null voxel resolution" in capsys.readouterr().out

    def test_tfds_gate(self):
        if not ingest.HAS_TFDS:
            with pytest.raises(ImportError, match="isotropic"):
                ingest.load_tfds_pair("stanford_dataset", "/tmp")


class TestRuntimeUtils:
    def test_throughput_counter(self):
        tp = profiling.Throughput(n_chips=2)
        with tp.lap(n_images=8):
            pass
        assert tp.total_images == 8
        assert tp.images_per_sec_per_chip <= tp.images_per_sec
        assert "img/s" in tp.report()

    def test_check_finite(self):
        debugging.check_finite("ok", np.ones(3))
        with pytest.raises(FloatingPointError, match="non-finite"):
            debugging.check_finite("bad", np.asarray([1.0, np.nan]))

    def test_nan_check_mode_restores(self):
        import jax

        prev = jax.config.jax_debug_nans
        with debugging.nan_check_mode(True):
            assert jax.config.jax_debug_nans is True
        assert jax.config.jax_debug_nans == prev
