"""Fused sampling parity + end-to-end extraction pipeline tests."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.data import feature_store, splits, synthetic
from vit_deep_radiomics_tpu.engine.extract import (
    DenseExtractor,
    ExtractionConfig,
    extract_isotropic_dataset,
)
from vit_deep_radiomics_tpu.ops import roi
from vit_deep_radiomics_tpu.ops.sampling import (
    fused_flip_rotate_crop_resize,
    transform_mask,
)


class TestFusedSampling:
    def test_identity_crop_resize_matches_jax_resize(self, rng):
        """angle 0, no flips: the fused gather must equal materialising
        the crop and resizing it (the reference's deterministic path)."""
        vol = rng.uniform(size=(40, 48, 3)).astype(np.float32)
        box = (jnp.int32(5), jnp.int32(8), jnp.int32(20), jnp.int32(20))
        out = fused_flip_rotate_crop_resize(
            jnp.asarray(vol), box, jnp.float32(0), jnp.bool_(False),
            jnp.bool_(False), (jnp.int32(40), jnp.int32(48)), 64,
        )
        crop = vol[5:25, 8:28, :]
        ref = jax.image.resize(
            jnp.asarray(np.moveaxis(crop, 2, 0)), (3, 64, 64), "linear"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.clip(np.asarray(ref), 0, 1), atol=1e-5
        )

    def test_flip_horizontal_matches_manual(self, rng):
        vol = rng.uniform(size=(16, 16, 2)).astype(np.float32)
        box = (jnp.int32(0), jnp.int32(0), jnp.int32(16), jnp.int32(16))
        out = fused_flip_rotate_crop_resize(
            jnp.asarray(vol), box, jnp.float32(0), jnp.bool_(True),
            jnp.bool_(False), (jnp.int32(16), jnp.int32(16)), 16,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.moveaxis(vol[:, ::-1], 2, 0), atol=1e-6
        )

    def test_rotation_90_matches_scipy_interior(self, rng):
        vol = rng.uniform(size=(32, 32, 1)).astype(np.float32)
        box = (jnp.int32(0), jnp.int32(0), jnp.int32(32), jnp.int32(32))
        out = fused_flip_rotate_crop_resize(
            jnp.asarray(vol), box, jnp.float32(90), jnp.bool_(False),
            jnp.bool_(False), (jnp.int32(32), jnp.int32(32)), 32,
        )
        ref = ndi.rotate(vol[:, :, 0], 90, reshape=False, order=1,
                         mode="nearest")
        np.testing.assert_allclose(np.asarray(out[0]), np.clip(ref, 0, 1),
                                   atol=1e-5)

    def test_padded_volume_gives_same_result(self, rng):
        """Padding H/W (the compile-bucket trick) must not change output."""
        vol = rng.uniform(size=(30, 26, 2)).astype(np.float32)
        box = (jnp.int32(2), jnp.int32(3), jnp.int32(20), jnp.int32(18))
        args = (jnp.float32(45), jnp.bool_(True), jnp.bool_(False),
                (jnp.int32(30), jnp.int32(26)), 48)
        base = fused_flip_rotate_crop_resize(jnp.asarray(vol), box, *args)
        padded = np.zeros((32, 32, 2), np.float32)
        padded[:30, :26] = vol
        out = fused_flip_rotate_crop_resize(jnp.asarray(padded), box, *args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-6)

    def test_bf16_output_is_rounded_f32(self, rng):
        """out_dtype=bf16 must equal the f32 result rounded once at the
        end (the same rounding the ViT's bf16 input cast would apply)."""
        vol = rng.uniform(size=(30, 26, 2)).astype(np.float32)
        box = (jnp.int32(2), jnp.int32(3), jnp.int32(20), jnp.int32(18))
        args = (jnp.float32(45), jnp.bool_(True), jnp.bool_(False),
                (jnp.int32(30), jnp.int32(26)), 48)
        f32 = fused_flip_rotate_crop_resize(jnp.asarray(vol), box, *args)
        bf16 = fused_flip_rotate_crop_resize(
            jnp.asarray(vol), box, *args, out_dtype=jnp.bfloat16)
        assert bf16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(bf16), np.asarray(f32.astype(jnp.bfloat16)))

    def test_transform_mask_90(self):
        mask = np.zeros((16, 16, 1), np.float32)
        mask[2:5, 7:9, 0] = 1
        out = np.asarray(transform_mask(
            jnp.asarray(mask), jnp.float32(90), jnp.bool_(False),
            jnp.bool_(False), (jnp.int32(16), jnp.int32(16)),
        ))
        ref = ndi.rotate(mask[:, :, 0], 90, reshape=False, order=1,
                         mode="nearest") > 0
        np.testing.assert_array_equal(out[:, :, 0], ref)


@pytest.fixture(scope="module")
def small_extractor():
    cfg = ExtractionConfig(
        model_name="medsam", image_size=64, slice_batch=4,
        precision="parity", use_flash=False, volume_bucket=32,
        flips=(None, "horizontal"), angles=(0, 90),
    )
    # shrink the backbone for test speed
    import dataclasses

    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

    small = dataclasses.replace(
        SAM_VIT_B, image_size=64, width=96, depth=2, num_heads=3,
        window_size=2, global_indexes=(1,), neck_channels=32,
    )
    return DenseExtractor(cfg, backbone_cfg=small)


class TestExtractVolume:
    def test_feature_and_mask_shapes(self, small_extractor):
        rng = np.random.default_rng(0)
        vol, mask, _ = synthetic.synthetic_volume(rng, 64, 64, 3)
        feats, masks, (sl, an, fl) = small_extractor.extract_volume(
            vol, mask, "ct"
        )
        n_augs = 2 * 2  # (None, horizontal) x (0, 90)
        assert len(feats) == len(masks) == 3 * n_augs
        assert sl == list(range(3)) * n_augs
        for f, m in zip(feats, masks):
            assert f.ndim == 3 and f.shape[2] == 32   # neck channels
            assert m.ndim == 2
            assert f.shape[0] > 0 and f.shape[1] > 0

    def test_angle0_matches_unfused_reference_flow(self, small_extractor):
        """Deterministic parity: identity augmentation must equal the
        step-by-step flow (normalize → crop → resize → ViT → ROI)."""
        rng = np.random.default_rng(1)
        vol, mask, _ = synthetic.synthetic_volume(rng, 64, 64, 2)
        cfg = small_extractor.config

        feats, _, (sl, an, fl) = small_extractor.extract_volume(
            vol, mask, "ct"
        )
        idx = [i for i, (a, f) in enumerate(zip(an, fl))
               if a == 0 and f is None]

        # independent unfused flow
        from vit_deep_radiomics_tpu.ops import preprocess as pp

        norm = np.asarray(pp.apply_window_ct(jnp.asarray(vol), 800, 40))
        union = mask.sum(-1) > 0
        xmin, ymin, xmax, ymax = roi.square_crop_box(union, margin=2)
        crop = roi.crop_image(norm, xmin, ymin, xmax, ymax)
        union_crop = roi.crop_image(union, xmin, ymin, xmax, ymax)
        with jax.default_matmul_precision("highest"):
            for j, i in enumerate(idx):
                sl_img = jax.image.resize(
                    jnp.asarray(crop[:, :, j]), (64, 64), "linear"
                )
                sl_img = jnp.clip(sl_img, 0, 1)
                rgb = jnp.repeat(sl_img[None, :, :, None], 3, axis=-1)
                ref_fmap = np.asarray(
                    small_extractor._apply(small_extractor.params, rgb)
                )[0]
                ref_crop = roi.extract_roi(ref_fmap, union_crop)
                np.testing.assert_allclose(
                    feats[i], ref_crop, atol=5e-4, rtol=1e-3
                )

    def test_empty_mask_raises(self, small_extractor):
        vol = np.zeros((64, 64, 2), np.float32)
        with pytest.raises(ValueError, match="empty"):
            small_extractor.extract_volume(vol, np.zeros_like(vol), "ct")

    def test_aug_group_matches_single_program(self, small_extractor):
        """Bounded augmentation grouping (the large-volume HBM guard)
        must reproduce the single-group sweep exactly — same features,
        masks, and metadata order."""
        import dataclasses

        from vit_deep_radiomics_tpu.engine.extract import DenseExtractor

        rng = np.random.default_rng(7)
        vol, mask, _ = synthetic.synthetic_volume(rng, 64, 64, 3)
        ref = small_extractor.extract_volume(vol, mask, "ct")
        grouped_ex = DenseExtractor(
            dataclasses.replace(small_extractor.config, aug_group=1),
            params=small_extractor.params,
            backbone_cfg=small_extractor.backbone_cfg,
        )
        got = grouped_ex.extract_volume(vol, mask, "ct")
        assert got[2] == ref[2]
        assert len(got[0]) == len(ref[0])
        for f, rf, m, rm in zip(got[0], ref[0], got[1], ref[1]):
            np.testing.assert_allclose(f, rf, atol=1e-6)
            np.testing.assert_array_equal(m, rm)


class TestEndToEndExtraction:
    def test_dataset_sweep_contract(self, small_extractor, tmp_path):
        cohort = synthetic.synthetic_cohort(
            n_patients=4, seed=3, dataset="stanford",
            height=64, width=64, ct_slices=3, pet_slices=2,
        )
        h5 = tmp_path / "iso.hdf5"
        csv = tmp_path / "iso.csv"
        synthetic.write_isotropic_hdf5(cohort, h5, csv)

        feat_dir = tmp_path / "features"
        written = extract_isotropic_dataset(
            h5, csv, feat_dir, small_extractor,
            modalities=("pet", "ct"), datasets=("stanford",),
        )
        assert len(written) == 8  # 4 patients x 2 modalities

        # HDF5 store contract
        for modality, n_slices in (("ct", 3), ("pet", 2)):
            store = feat_dir / f"features_masks_{modality}.hdf5"
            pids = feature_store.patient_ids_in_store(store)
            assert sorted(pids) == sorted(cohort.keys())
            feats, masks = feature_store.read_patient_features(
                store, pids[0]
            )
            assert len(feats) == n_slices * 4  # 4 augmentations

        # parquet schema contract
        import pandas as pd

        df = pd.read_parquet(written[0])
        expected_cols = {
            "feature_id", "slice", "angle", "flip", "patient_id", "label",
            "dataset", "modality", "augmentation", "spatial_res",
        }
        assert expected_cols <= set(df.columns)
        assert (~df[(df["flip"] == "None") & (df["angle"] == 0)]
                ["augmentation"]).all()

        # resume: second run writes nothing
        assert extract_isotropic_dataset(
            h5, csv, feat_dir, small_extractor,
            modalities=("pet", "ct"), datasets=("stanford",),
        ) == []

        # merge + split on top of extraction outputs
        merged = feature_store.merge_metadata(
            feat_dir, datasets=("stanford_dataset",)
        )
        assert (feat_dir / "petct.parquet").exists()
        folds = splits.build_kfold_patients(merged, n_splits=2)
        assert set(folds) == {"ct", "pet"}
        for ds in folds["ct"].values():
            for fold in ds.values():
                assert set(fold) == {"train", "test"}


class TestSharedBuckets:
    """Sweep-shared crop buckets (VERDICT r4 item 4): outputs identical
    to per-volume auto buckets, and the mask pre-pass bound really is
    an upper bound on every volume's realized crop sizes."""

    def _extractor(self, **over):
        import dataclasses as dc

        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

        cfg = ExtractionConfig(
            model_name="medsam", image_size=64, slice_batch=4,
            precision="parity", use_flash=False, volume_bucket=32,
            flips=(None, "horizontal"), angles=(0, 45), **over,
        )
        small = dc.replace(
            SAM_VIT_B, image_size=64, width=96, depth=2, num_heads=3,
            window_size=2, global_indexes=(1,), neck_channels=32,
        )
        return DenseExtractor(cfg, backbone_cfg=small)

    def test_sweep_outputs_identical_and_bounded(self, tmp_path):
        from vit_deep_radiomics_tpu.engine.extract import (
            sweep_crop_buckets,
        )

        cohort = synthetic.synthetic_cohort(
            n_patients=3, seed=7, dataset="stanford",
            height=64, width=64, ct_slices=3, pet_slices=2,
        )
        h5 = tmp_path / "iso.hdf5"
        csv = tmp_path / "iso.csv"
        synthetic.write_isotropic_hdf5(cohort, h5, csv)

        outs = {}
        for name, shared in (("auto", False), ("shared", True)):
            ex = self._extractor(shared_buckets=shared)
            feat_dir = tmp_path / f"features_{name}"
            extract_isotropic_dataset(
                h5, csv, feat_dir, ex,
                modalities=("pet", "ct"), datasets=("stanford",),
                use_queue=False,
            )
            if shared:
                # the pre-pass must have pinned sweep-wide floors
                assert ex.config.mask_crop_bucket is not None
                assert ex.config.mask_crop_bucket % 16 == 0
                assert ex.config.feat_crop_bucket is not None
            per = {}
            for modality in ("ct", "pet"):
                store = feat_dir / f"features_masks_{modality}.hdf5"
                for pid in feature_store.patient_ids_in_store(store):
                    per[(pid, modality)] = feature_store.\
                        read_patient_features(store, pid)
            outs[name] = per

        assert outs["auto"].keys() == outs["shared"].keys()
        for key in outs["auto"]:
            fa, ma = outs["auto"][key]
            fs, ms = outs["shared"][key]
            assert len(fa) == len(fs)
            for a, b in zip(fa, fs):
                np.testing.assert_array_equal(a, b)
            for a, b in zip(ma, ms):
                np.testing.assert_array_equal(a, b)

        # the bound is a true upper bound on the REALIZED buckets: run
        # each volume through dispatch with per-volume auto buckets and
        # compare the program shapes against the floors — including a
        # border nodule whose one-sided clamp shrinks the crop side and
        # doubles the feature-grid rescale factor
        rng2 = np.random.default_rng(11)
        border_vol = rng2.normal(
            -700, 100, size=(64, 64, 3)).astype(np.float32)
        border_mask = np.zeros((64, 64, 3), bool)
        border_mask[0:9, 55:64, :] = True     # corner nodule
        border_vol[border_mask] = 35.0
        volumes = [(v, m, mod) for pid, entry in cohort.items()
                   for mod in ("ct", "pet")
                   for v, m in [entry[mod][:2]]]
        volumes.append((border_vol, border_mask, "ct"))

        unions = [(m.shape[0], m.shape[1], m.any(axis=2))
                  for _v, m, _mod in volumes]
        mb, fb = sweep_crop_buckets(unions, (0, 45), grid=4)
        ex = self._extractor(shared_buckets=False)
        for vol, mask, modality in volumes:
            state = ex.dispatch_volume(vol, mask, modality)
            a, mbh, mbw, _s = state["m_crops_dev"].shape
            assert max(mbh, mbw) <= mb, (mbh, mbw, mb)
            fb_real = state["crops_dev"][0].shape[1]
            assert fb_real <= max(fb, 4), (fb_real, fb)  # grid clamp
            ex.collect_volume(state)


class TestShardedExtraction:
    def test_mesh_forward_matches_single_device(self, small_extractor):
        """shard_map'd extractor over the 8-virtual-device mesh must
        reproduce the single-device extraction exactly (params
        replicated, slice batch split over the data axis)."""
        from vit_deep_radiomics_tpu.core.mesh import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")

        rng = np.random.default_rng(5)
        vol, mask, _ = synthetic.synthetic_volume(rng, 64, 64, 4)
        ref_feats, ref_masks, ref_meta = small_extractor.extract_volume(
            vol, mask, "ct"
        )

        sharded = DenseExtractor(
            small_extractor.config, params=small_extractor.params,
            mesh=make_mesh(), backbone_cfg=small_extractor.backbone_cfg)
        assert sharded.config.slice_batch % 8 == 0

        feats, masks, meta = sharded.extract_volume(vol, mask, "ct")
        assert meta == ref_meta
        assert len(feats) == len(ref_feats)
        for f, rf in zip(feats, ref_feats):
            np.testing.assert_allclose(f, rf, atol=1e-5)
        for m, rm in zip(masks, ref_masks):
            np.testing.assert_array_equal(m, rm)

    def test_full_sweep_over_mesh_matches_single_device(
        self, small_extractor, tmp_path
    ):
        """The FULL extraction sweep (work queue + read prefetch +
        deferred writers, extract_isotropic_dataset) under an 8-device
        mesh must write byte-identical HDF5/parquet artifacts to the
        single-device sweep (VERDICT r1 #7)."""
        from vit_deep_radiomics_tpu.core.mesh import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs the 8-virtual-device CPU mesh")

        cohort = synthetic.synthetic_cohort(
            n_patients=3, seed=9, dataset="stanford",
            height=64, width=64, ct_slices=3, pet_slices=2,
        )
        h5 = tmp_path / "iso.hdf5"
        csv = tmp_path / "iso.csv"
        synthetic.write_isotropic_hdf5(cohort, h5, csv)

        sharded = DenseExtractor(
            small_extractor.config, params=small_extractor.params,
            mesh=make_mesh(), backbone_cfg=small_extractor.backbone_cfg)

        single_dir = tmp_path / "single"
        mesh_dir = tmp_path / "mesh"
        kw = dict(modalities=("pet", "ct"), datasets=("stanford",))
        w_single = extract_isotropic_dataset(
            h5, csv, single_dir, small_extractor, **kw)
        w_mesh = extract_isotropic_dataset(
            h5, csv, mesh_dir, sharded, **kw)
        assert len(w_single) == len(w_mesh) == 6

        import pandas as pd

        for p_single in w_single:
            p_mesh = p_single.replace(str(single_dir), str(mesh_dir))
            pd.testing.assert_frame_equal(
                pd.read_parquet(p_single), pd.read_parquet(p_mesh))
        for modality in ("ct", "pet"):
            store_s = single_dir / f"features_masks_{modality}.hdf5"
            store_m = mesh_dir / f"features_masks_{modality}.hdf5"
            for pid in feature_store.patient_ids_in_store(store_s):
                fs, ms = feature_store.read_patient_features(store_s, pid)
                fm, mm = feature_store.read_patient_features(store_m, pid)
                assert len(fs) == len(fm)
                for a, b in zip(fs, fm):
                    # features: same math, but XLA may fuse the sharded
                    # forward differently — tolerance matches the
                    # single-volume sharded-forward test above
                    np.testing.assert_allclose(a, b, atol=1e-5)
                for a, b in zip(ms, mm):
                    np.testing.assert_array_equal(a, b)


class TestDispatchAheadFailures:
    def test_empty_mask_failure_attributed_to_own_patient(
        self, small_extractor, tmp_path
    ):
        """With dispatch-ahead pipelining, a patient whose dispatch
        raises (empty mask) must be recorded against ITS key while
        neighbours still succeed."""
        import h5py

        from vit_deep_radiomics_tpu.engine.extract import (
            extract_isotropic_dataset,
        )
        from vit_deep_radiomics_tpu.engine.workqueue import WorkQueue

        cohort = synthetic.synthetic_cohort(
            n_patients=3, seed=11, dataset="stanford",
            height=64, width=64, ct_slices=3, pet_slices=2,
        )
        h5 = tmp_path / "iso.hdf5"
        csv = tmp_path / "iso.csv"
        synthetic.write_isotropic_hdf5(cohort, h5, csv)
        # zero out the MIDDLE patient's ct mask so its dispatch raises
        bad = "stanford_001"
        with h5py.File(h5, "r+") as f:
            grp = f[f"{bad}_ct/mask_exam"]
            for k in grp:
                data = grp[k][()]
                del grp[k]
                grp.create_dataset(k, data=np.zeros_like(data))

        feat_dir = tmp_path / "features"
        written = extract_isotropic_dataset(
            h5, csv, feat_dir, small_extractor,
            modalities=("pet", "ct"), datasets=("stanford",),
            progress=lambda *_: None,
        )
        # 3 patients x 2 modalities - 1 failed ct
        assert len(written) == 5
        q = WorkQueue(feat_dir / "extract_queue.json")
        assert list(q.failed) == [f"stanford/{bad}/ct"]
        assert "empty nodule mask" in q.failed[f"stanford/{bad}/ct"]["error"]
        assert f"stanford/{bad}/pet" in q.done
        assert not (feat_dir / "stanford_dataset"
                    / f"{bad}_ct.parquet").exists()

    def test_exhausted_failures_not_dispatched_on_resume(
        self, small_extractor, tmp_path, monkeypatch
    ):
        """Keys the queue will skip (failed, retries exhausted) must stay
        out of the dispatch-ahead order — otherwise their device
        extraction runs for nothing and its HBM state is never popped."""
        from vit_deep_radiomics_tpu.engine import extract as ex_mod
        from vit_deep_radiomics_tpu.engine.extract import (
            extract_isotropic_dataset,
        )
        from vit_deep_radiomics_tpu.engine.workqueue import WorkQueue

        cohort = synthetic.synthetic_cohort(
            n_patients=3, seed=12, dataset="stanford",
            height=64, width=64, ct_slices=3, pet_slices=2,
        )
        h5 = tmp_path / "iso.hdf5"
        csv = tmp_path / "iso.csv"
        synthetic.write_isotropic_hdf5(cohort, h5, csv)
        feat_dir = tmp_path / "features"
        feat_dir.mkdir()
        # pre-seed the queue: the middle patient's ct failed with
        # retries exhausted on a previous run
        bad_key = "stanford/stanford_001/ct"
        q = WorkQueue(feat_dir / "extract_queue.json")
        q.state["failed"][bad_key] = {"error": "boom", "retries": 99}
        q.state["retries"][bad_key] = 99
        q._save()

        read_keys = []
        orig_read = ex_mod.read_isotropic_hdf5

        def spying_read(path, pid, modality):
            read_keys.append(f"{pid}/{modality}")
            return orig_read(path, pid, modality)

        monkeypatch.setattr(ex_mod, "read_isotropic_hdf5", spying_read)
        written = extract_isotropic_dataset(
            h5, csv, feat_dir, small_extractor,
            modalities=("pet", "ct"), datasets=("stanford",),
            progress=lambda *_: None,
        )
        # 3 patients x 2 modalities - the skipped exhausted failure
        assert len(written) == 5
        # the exhausted key's volume was never read or dispatched
        assert "stanford_001/ct" not in read_keys
        q2 = WorkQueue(feat_dir / "extract_queue.json")
        assert bad_key in q2.failed and bad_key not in q2.done


class TestPipelineExtraction:
    def test_pipelined_matches_unmeshed(self, small_extractor, devices):
        """Extraction with the ViT pipelined over a (4 data x 2 model)
        mesh must reproduce the single-device extractor exactly."""
        import dataclasses

        from vit_deep_radiomics_tpu.core.mesh import make_mesh
        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

        # depth 4, globals (1, 3): the [w, g] stage pattern repeats at
        # 2 stages (the module-scope fixture's depth 2 cannot split)
        small = dataclasses.replace(
            SAM_VIT_B, image_size=64, width=96, depth=4, num_heads=3,
            window_size=2, global_indexes=(1, 3), neck_channels=32,
        )
        cfg = ExtractionConfig(
            model_name="medsam", image_size=64, slice_batch=4,
            precision="parity", use_flash=False, volume_bucket=32,
            flips=(None,), angles=(0, 90), pipeline=True,
        )
        mesh = make_mesh(devices[:8], model_parallel=2)
        ex = DenseExtractor(cfg, mesh=mesh, backbone_cfg=small)
        assert ex.config.slice_batch == 8  # rounded to stages x data

        rng = np.random.default_rng(2)
        vol, mask, _ = synthetic.synthetic_volume(rng, 64, 64, 3)
        feats, masks, meta = ex.extract_volume(vol, mask, "ct")

        base = DenseExtractor(
            dataclasses.replace(cfg, pipeline=False, slice_batch=4),
            params=ex.params, backbone_cfg=small)
        bfeats, bmasks, bmeta = base.extract_volume(vol, mask, "ct")

        assert meta == bmeta and len(feats) == len(bfeats)
        for f, bf, m, bm in zip(feats, bfeats, masks, bmasks):
            np.testing.assert_allclose(f, bf, atol=2e-5)
            np.testing.assert_array_equal(m, bm)

    def test_pipeline_rejects_patch_embed_only(self, devices):
        from vit_deep_radiomics_tpu.core.mesh import make_mesh

        cfg = ExtractionConfig(
            model_name="dinov2_vits14", dinov2_mode="patch_embed",
            image_size=28, pipeline=True,
        )
        mesh = make_mesh(devices[:8], model_parallel=2)
        with pytest.raises(ValueError, match="patch_embed"):
            DenseExtractor(cfg, mesh=mesh)
