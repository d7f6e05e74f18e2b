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

    def test_memory_summary_gib(self, monkeypatch):
        """GiB summary keys/units shared by bench.py and serve run."""
        monkeypatch.setattr(
            profiling, "device_memory_stats",
            lambda device=None: {"peak_bytes_in_use": 3 * 2**30,
                                 "bytes_limit": 16 * 2**30,
                                 "bytes_in_use": 1})
        assert profiling.memory_summary_gib() == {
            "hbm_peak_gib": 3.0, "hbm_limit_gib": 16.0}
        monkeypatch.setattr(profiling, "device_memory_stats",
                            lambda device=None: {})
        assert profiling.memory_summary_gib() == {}

    def test_device_sync_contract(self):
        """Pin the D2H-materialization contract (VERDICT r4 item 8).

        ``block_until_ready`` returns early through the tunneled TPU
        backend, so every timing/validation site goes through ONE
        helper whose contract is: walk any pytree, ignore non-array
        leaves, and force a device→host transfer per array leaf —
        scalar pull by default, full ``np.asarray`` materialization in
        ``pull="full"`` mode (the serving warm/validation path)."""
        import jax.numpy as jnp

        tree = {"a": jnp.arange(6.0).reshape(2, 3),
                "b": [jnp.ones((4,), jnp.bfloat16), "meta", None],
                "c": 3}
        # both modes must walk the tree without touching non-arrays
        profiling.device_sync(tree)
        profiling.device_sync(tree, pull="full")
        profiling.device_sync(jnp.zeros(()))          # bare leaf
        profiling.device_sync(None)                   # empty tree
        # the variadic wrapper keeps its original call shape
        profiling.sync(jnp.ones(2), np.ones(3), "skip-me")
        # full mode materializes: values must be host-readable after
        out = jnp.arange(4.0) * 2
        profiling.device_sync(out, pull="full")
        assert np.asarray(out).tolist() == [0.0, 2.0, 4.0, 6.0]

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


class TestNativeLzf:
    """native/lzf_codec.cpp: h5py-lzf-filter-compatible parallel codec
    for the feature-store writer (the h5py filter runs single-threaded
    under its global lock — the sweep's writer-thread bottleneck)."""

    pytestmark = pytest.mark.skipif(
        not native.lzf_available(), reason="native toolchain unavailable")

    def _cases(self):
        rng = np.random.default_rng(3)
        return [
            np.zeros((10, 10), np.float32),                       # trivial
            (np.sin(np.linspace(0, 30, 24 * 24 * 16))
             .reshape(24, 24, 16).astype(np.float32) * 100).round(1),
            rng.random((24, 24)) > 0.5,                           # bool mask
            rng.normal(size=(16, 16, 32)).astype(np.float32),     # noise
            rng.integers(0, 4, 5000).astype(np.uint8),
        ]

    def test_roundtrip_own_decoder(self):
        comp = native.lzf_compress_batch(self._cases())
        for arr, c in zip(self._cases(), comp):
            raw = np.ascontiguousarray(arr).tobytes()
            if c is None:  # incompressible: caller stores raw
                continue
            assert len(c) < len(raw)
            assert native.lzf_decompress(c, len(raw)) == raw

    def test_h5py_reads_our_streams_and_vice_versa(self, tmp_path):
        """Bit-compatibility both ways with h5py's bundled lzf filter —
        the property the write_direct_chunk fast path relies on."""
        import h5py

        cases = self._cases()
        comp = native.lzf_compress_batch(cases)
        p = tmp_path / "x.hdf5"
        with h5py.File(p, "w") as h5:
            for i, (arr, c) in enumerate(zip(cases, comp)):
                ds = h5.create_dataset(
                    f"mine/{i}", shape=arr.shape, dtype=arr.dtype,
                    compression="lzf", chunks=arr.shape)
                off = (0,) * arr.ndim
                if c is None:
                    ds.id.write_direct_chunk(
                        off, np.ascontiguousarray(arr).tobytes(),
                        filter_mask=1)
                else:
                    ds.id.write_direct_chunk(off, c, filter_mask=0)
                h5.create_dataset(
                    f"theirs/{i}", data=arr, compression="lzf",
                    chunks=arr.shape)
        with h5py.File(p, "r") as h5:
            for i, arr in enumerate(cases):
                got = h5[f"mine/{i}"][...]
                assert got.dtype == arr.dtype
                np.testing.assert_array_equal(got, arr)
                fm, chunk = h5[f"theirs/{i}"].id.read_direct_chunk(
                    (0,) * arr.ndim)
                raw = np.ascontiguousarray(arr).tobytes()
                if fm == 0:  # h5py stored it compressed
                    assert native.lzf_decompress(chunk, len(raw)) == raw

    def test_save_features_native_matches_fallback(self, tmp_path,
                                                   monkeypatch):
        """save_features writes identical logical content through the
        native write_direct_chunk path and the h5py-filter fallback."""
        from vit_deep_radiomics_tpu.data.feature_store import (
            read_patient_features,
            save_features,
        )
        from vit_deep_radiomics_tpu.utils import native as nat

        rng = np.random.default_rng(5)
        feats = [rng.normal(size=(8, 8, 16)).astype(np.float32)
                 for _ in range(4)]
        masks = [rng.random((8, 8)) > 0.5 for _ in range(4)]
        save_features(tmp_path / "native.hdf5", feats, masks, "p0")
        monkeypatch.setattr(nat, "lzf_compress_batch", lambda bufs: None)
        save_features(tmp_path / "fallback.hdf5", feats, masks, "p0")
        fa, ma = read_patient_features(tmp_path / "native.hdf5", "p0")
        fb, mb = read_patient_features(tmp_path / "fallback.hdf5", "p0")
        for a, b, orig in zip(fa, fb, feats):
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(a, orig)
        for a, b, orig in zip(ma, mb, masks):
            assert a.dtype == orig.dtype == b.dtype
            np.testing.assert_array_equal(a, orig)
            np.testing.assert_array_equal(b, orig)

    def test_corrupt_stream_raises(self):
        with pytest.raises(ValueError, match="corrupt"):
            native.lzf_decompress(b"\x1f" + b"ab", 100)
