"""Multi-host launch runtime (core/distributed.py) + sharded sweep parts.

The launch-env detection and work partitioning are pure host logic,
testable without multiple processes; the multi-process extraction
contract is simulated by running the sweep once per simulated process
with an explicit ``process_grid`` and folding the part stores — outputs
must match the single-process sweep exactly.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.core import distributed as dist
from vit_deep_radiomics_tpu.data import feature_store, synthetic


class TestDetectLaunchEnv:
    def test_vdr_triplet(self):
        env = dist.detect_launch_env({
            "VDR_COORDINATOR": "host0:9999",
            "VDR_NUM_PROCESSES": "4",
            "VDR_PROCESS_ID": "2",
        })
        assert env == dist.LaunchEnv("host0:9999", 4, 2, "vdr")

    def test_vdr_precedes_slurm(self):
        env = dist.detect_launch_env({
            "VDR_COORDINATOR": "host0:9999",
            "VDR_NUM_PROCESSES": "2",
            "VDR_PROCESS_ID": "0",
            "SLURM_PROCID": "1",
            "SLURM_NTASKS": "8",
            "SLURM_NODELIST": "n1",
        })
        assert env.source == "vdr"

    def test_slurm(self):
        env = dist.detect_launch_env({
            "SLURM_PROCID": "3",
            "SLURM_NTASKS": "8",
            "SLURM_STEP_NODELIST": "gpu[07-09,12],gpu20",
        })
        assert env == dist.LaunchEnv("gpu07:8476", 8, 3, "slurm")

    def test_slurm_ipaddr_wins(self):
        env = dist.detect_launch_env({
            "SLURM_PROCID": "0",
            "SLURM_NTASKS": "2",
            "SLURM_LAUNCH_NODE_IPADDR": "10.0.0.5",
            "SLURM_NODELIST": "n[1-2]",
            "VDR_PORT": "1234",
        })
        assert env.coordinator == "10.0.0.5:1234"

    def test_slurm_single_task_is_none(self):
        assert dist.detect_launch_env({
            "SLURM_PROCID": "0", "SLURM_NTASKS": "1",
            "SLURM_NODELIST": "n1",
        }) is None

    def test_ompi(self):
        env = dist.detect_launch_env({
            "OMPI_COMM_WORLD_SIZE": "2",
            "OMPI_COMM_WORLD_RANK": "1",
            "VDR_COORDINATOR_HOST": "mpihost",
        })
        assert env == dist.LaunchEnv("mpihost:8476", 2, 1, "ompi")

    def test_ompi_without_host_is_none(self):
        assert dist.detect_launch_env({
            "OMPI_COMM_WORLD_SIZE": "2", "OMPI_COMM_WORLD_RANK": "0",
        }) is None

    def test_ompi_without_rank_raises_clearly(self):
        # leaked OMPI_COMM_WORLD_SIZE + VDR_COORDINATOR_HOST without a
        # rank must be a descriptive error, not a raw KeyError
        with pytest.raises(RuntimeError, match="OMPI_COMM_WORLD_RANK"):
            dist.detect_launch_env({
                "OMPI_COMM_WORLD_SIZE": "2",
                "VDR_COORDINATOR_HOST": "mpihost",
            })

    def test_plain_env_is_none(self):
        assert dist.detect_launch_env({}) is None

    def test_bad_process_id_rejected(self):
        with pytest.raises(ValueError, match="outside"):
            dist.LaunchEnv("h:1", 2, 2, "vdr")

    @pytest.mark.parametrize("nodelist,want", [
        ("node01", "node01"),
        ("a[1-3],b", "a1"),
        ("gpu[07-09,12]", "gpu07"),
        ("c2,c3", "c2"),
    ])
    def test_first_slurm_host(self, nodelist, want):
        assert dist._first_slurm_host(nodelist) == want


class TestShardForProcess:
    def test_disjoint_cover(self):
        items = list(range(11))
        shards = [dist.shard_for_process(items, p, 3) for p in range(3)]
        assert sorted(sum(shards, [])) == items
        assert shards[0] == [0, 3, 6, 9]  # round-robin, not blocks

    def test_single_process_identity(self):
        assert dist.shard_for_process([1, 2], 0, 1) == [1, 2]

    def test_bad_pid(self):
        with pytest.raises(ValueError):
            dist.shard_for_process([1], 3, 2)

    def test_live_grid_single_host(self):
        # in-process (single JAX process) the live grid is (0, 1)
        assert dist.shard_for_process(["a", "b"]) == ["a", "b"]


class TestPrimaryGating:
    def test_primary_only_runs_on_process0(self):
        calls = []

        @dist.primary_only
        def publish(x):
            calls.append(x)
            return x

        assert publish(7) == 7  # single host: process 0
        assert calls == [7]
        assert dist.is_primary()

    def test_initialize_single_host_noop(self):
        assert dist.initialize_from_env() is None


@pytest.fixture(scope="module")
def tiny_extractor():
    from vit_deep_radiomics_tpu.engine.extract import (
        DenseExtractor,
        ExtractionConfig,
    )
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

    cfg = ExtractionConfig(
        model_name="medsam", image_size=64, slice_batch=4,
        precision="parity", use_flash=False, volume_bucket=32,
        flips=(None,), angles=(0,),
    )
    small = dataclasses.replace(
        SAM_VIT_B, image_size=64, width=96, depth=2, num_heads=3,
        window_size=2, global_indexes=(1,), neck_channels=32,
    )
    return DenseExtractor(cfg, backbone_cfg=small)


class TestMultiProcessSweep:
    def test_sharded_parts_match_single_process(self, tiny_extractor,
                                                tmp_path):
        from vit_deep_radiomics_tpu.engine.extract import (
            extract_isotropic_dataset,
        )

        cohort = synthetic.synthetic_cohort(
            n_patients=3, seed=5, dataset="stanford",
            height=64, width=64, ct_slices=2, pet_slices=2,
        )
        h5 = tmp_path / "iso.hdf5"
        csv = tmp_path / "iso.csv"
        synthetic.write_isotropic_hdf5(cohort, h5, csv)

        # single-process baseline
        solo_dir = tmp_path / "solo"
        extract_isotropic_dataset(
            h5, csv, solo_dir, tiny_extractor,
            modalities=("pet", "ct"), datasets=("stanford",),
        )

        # two simulated processes, then the primary's merge
        multi_dir = tmp_path / "multi"
        written = []
        for pid in range(2):
            written += extract_isotropic_dataset(
                h5, csv, multi_dir, tiny_extractor,
                modalities=("pet", "ct"), datasets=("stanford",),
                process_grid=(pid, 2),
            )
        assert len(written) == 6  # 3 patients x 2 modalities, disjoint
        parts = sorted(p.name for p in multi_dir.glob("*.part*.hdf5"))
        assert parts  # sharded mode wrote part stores
        merged = feature_store.merge_part_stores(multi_dir)
        assert len(merged) == 2 and not list(multi_dir.glob("*.part*.hdf5"))

        # merged stores and parquets match the single-process sweep
        for modality in ("pet", "ct"):
            solo_store = solo_dir / f"features_masks_{modality}.hdf5"
            multi_store = multi_dir / f"features_masks_{modality}.hdf5"
            pids = feature_store.patient_ids_in_store(solo_store)
            assert sorted(
                feature_store.patient_ids_in_store(multi_store)) == sorted(
                pids)
            for patient in pids:
                fs, ms = feature_store.read_patient_features(
                    solo_store, patient)
                fm, mm = feature_store.read_patient_features(
                    multi_store, patient)
                for a, b in zip(fs, fm):
                    np.testing.assert_array_equal(a, b)
                for a, b in zip(ms, mm):
                    np.testing.assert_array_equal(a, b)

        import pandas as pd

        for pq in sorted((solo_dir / "stanford_dataset").glob("*.parquet")):
            a = pd.read_parquet(pq)
            b = pd.read_parquet(multi_dir / "stanford_dataset" / pq.name)
            pd.testing.assert_frame_equal(a, b)


class TestPutGlobal:
    def test_matches_device_put_on_mesh(self):
        from vit_deep_radiomics_tpu.core.mesh import (
            data_sharding,
            make_mesh,
            mesh_spans_processes,
            put_global,
            replicated,
        )

        mesh = make_mesh()
        assert not mesh_spans_processes(mesh)  # single process here
        x = np.arange(64, dtype=np.float32).reshape(16, 4)
        a = put_global(x, data_sharding(mesh, 2))
        b = jax.device_put(x, data_sharding(mesh, 2))
        assert a.sharding == b.sharding
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        r = put_global(x, replicated(mesh))
        np.testing.assert_array_equal(np.asarray(r), x)

    def test_ragged_axis_falls_back_to_replicated(self):
        from vit_deep_radiomics_tpu.core.mesh import (
            data_sharding,
            make_mesh,
            put_global,
        )

        mesh = make_mesh()
        x = np.arange(12, dtype=np.float32).reshape(3, 4)  # 3 % 8 != 0
        a = put_global(x, data_sharding(mesh, 2))
        assert a.sharding.is_fully_replicated
        np.testing.assert_array_equal(np.asarray(a), x)


class TestVdrPartialTriplet:
    def test_partial_vdr_env_raises_clearly(self):
        # VDR_COORDINATOR lingering without the other two must be a
        # clear error at detection time, not a KeyError at CLI startup
        with pytest.raises(RuntimeError, match="VDR_NUM_PROCESSES"):
            dist.detect_launch_env({"VDR_COORDINATOR": "host0:9999"})
        with pytest.raises(RuntimeError, match="VDR_PROCESS_ID"):
            dist.detect_launch_env({
                "VDR_COORDINATOR": "host0:9999",
                "VDR_NUM_PROCESSES": "2",
            })


class TestWritesHere:
    def test_sharded_sweep_processes_write_their_own_artifacts(
            self, monkeypatch):
        """Primary-gating applies ONLY to meshes spanning processes: in
        the sharded experiment sweep every process trains DIFFERENT grid
        entries and must publish its own artifacts."""
        from types import SimpleNamespace

        from vit_deep_radiomics_tpu.engine.train import _writes_here

        monkeypatch.setattr(jax, "process_index", lambda: 1)
        # process-local mesh (sharded sweep / solo): always writes
        assert _writes_here(SimpleNamespace(_multiproc=False))
        # multi-host DP mesh: identical results, primary publishes
        assert not _writes_here(SimpleNamespace(_multiproc=True))


def _tfds_streams(n_patients=3):
    rng = np.random.default_rng(11)

    def make_stream(modality, label, n_slices=2):
        samples = []
        for _ in range(n_slices):
            if modality == "ct":
                img = rng.normal(-500, 300, size=(48, 48)).astype(
                    np.float32)
            else:
                img = np.abs(rng.normal(0.6, 0.3, size=(48, 48))).astype(
                    np.float32)
            mask = np.zeros((48, 48), bool)
            mask[16:32, 16:32] = True
            s = {
                "img_exam": img,
                "mask_exam": mask,
                "egfr_label": np.int64(label),
                "exam_metadata": {
                    "space_directions": np.asarray([0.7, 0.7, 1.2])},
            }
            if modality == "pet":
                liver = np.zeros((4, 4), np.float32)
                liver[1:3, 1:3] = 2.0
                s["pet_liver"] = liver
            samples.append(s)
        return samples

    labels = {f"p{i}": i % 2 for i in range(n_patients)}
    ds_pet = {p: make_stream("pet", l) for p, l in labels.items()}
    ds_ct = {p: make_stream("ct", l) for p, l in labels.items()}

    def loader(dataset_name, data_dir):
        return ds_pet, ds_ct, sorted(labels)

    return loader


class TestMultiProcessTfdsSweep:
    def test_tfds_parts_match_single_process(self, tiny_extractor,
                                             tmp_path):
        """The tfds sweep shards its work list and writes .part stores
        per process (HDF5 has no multi-writer mode) — merged outputs
        match the single-process sweep exactly."""
        from vit_deep_radiomics_tpu.engine.extract import (
            extract_tfds_dataset,
        )

        loader = _tfds_streams()
        solo_dir = tmp_path / "solo"
        solo = extract_tfds_dataset(
            solo_dir, tiny_extractor, datasets=("stanford_dataset",),
            loader=loader,
        )

        multi_dir = tmp_path / "multi"
        written = []
        for pid in range(2):
            written += extract_tfds_dataset(
                multi_dir, tiny_extractor, datasets=("stanford_dataset",),
                loader=loader, process_grid=(pid, 2),
            )
        assert len(written) == len(solo) == 6
        assert sorted(p.name for p in multi_dir.glob("*.part*.hdf5"))
        merged = feature_store.merge_part_stores(multi_dir)
        assert len(merged) == 2 and not list(multi_dir.glob("*.part*.hdf5"))

        for modality in ("pet", "ct"):
            solo_store = solo_dir / f"features_masks_{modality}.hdf5"
            multi_store = multi_dir / f"features_masks_{modality}.hdf5"
            pids = feature_store.patient_ids_in_store(solo_store)
            assert sorted(
                feature_store.patient_ids_in_store(multi_store)
            ) == sorted(pids)
            for patient in pids:
                fs, ms = feature_store.read_patient_features(
                    solo_store, patient)
                fm, mm = feature_store.read_patient_features(
                    multi_store, patient)
                for a, b in zip(fs, fm):
                    np.testing.assert_array_equal(a, b)
                for a, b in zip(ms, mm):
                    np.testing.assert_array_equal(a, b)

        import pandas as pd

        for pq in sorted((solo_dir / "stanford_dataset").glob("*.parquet")):
            a = pd.read_parquet(pq)
            b = pd.read_parquet(multi_dir / "stanford_dataset" / pq.name)
            pd.testing.assert_frame_equal(a, b)

    def test_malformed_spec_stays_loud(self):
        # only the ragged-divisibility case may fall back to replication;
        # a wrong-rank spec is a programming error and must raise
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vit_deep_radiomics_tpu.core.mesh import make_mesh, put_global

        mesh = make_mesh()
        x = np.arange(64, dtype=np.float32).reshape(16, 4)
        with pytest.raises(ValueError, match="rank"):
            put_global(x, NamedSharding(mesh, P("data", None, "model")))
