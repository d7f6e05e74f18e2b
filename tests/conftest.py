"""Test configuration: force an 8-virtual-device CPU platform.

Multi-device sharding code paths (shard_map / pjit over a Mesh) are
exercised without TPU hardware by splitting the host platform into 8
virtual devices — the standard TPU-less way to test collective code.
Must run before jax initialises its backends, hence module-level in
conftest.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism for parity tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

# NOTE: this image's sitecustomize force-registers the tunneled TPU
# ("axon") platform and overrides the JAX_PLATFORMS env var, so the env
# var alone does NOT select CPU.  jax.config.update after import does.
jax.config.update("jax_platforms", "cpu")

# Share compiled executables across test processes (the same on-disk
# cache the engine entry points use — see core.mesh).
from vit_deep_radiomics_tpu.core.mesh import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache(str(REPO_ROOT / ".pytest_xla_cache"))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected >=8 virtual devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def extracted(tmp_path_factory):
    """Synthetic cohort → extraction outputs + merged metadata + folds.
    Shared by the trainer test modules (test_train.py, test_foldpar.py)."""
    import dataclasses

    from vit_deep_radiomics_tpu.data import feature_store, splits, synthetic
    from vit_deep_radiomics_tpu.engine.extract import (
        DenseExtractor,
        ExtractionConfig,
        extract_isotropic_dataset,
    )
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

    tmp = tmp_path_factory.mktemp("e2e")
    cohort = synthetic.synthetic_cohort(
        n_patients=4, seed=7, dataset="stanford",
        height=64, width=64, ct_slices=4, pet_slices=2,
    )
    h5 = tmp / "iso.hdf5"
    csv = tmp / "iso.csv"
    synthetic.write_isotropic_hdf5(cohort, h5, csv)

    small = dataclasses.replace(
        SAM_VIT_B, image_size=64, width=96, depth=1, num_heads=3,
        window_size=2, global_indexes=(0,), neck_channels=16,
    )
    ex = DenseExtractor(
        ExtractionConfig(
            model_name="medsam", image_size=64, slice_batch=4,
            precision="parity", use_flash=False, volume_bucket=32,
            flips=(None,), angles=(0, 90),
        ),
        backbone_cfg=small,
    )

    feat_dir = tmp / "features"
    extract_isotropic_dataset(
        h5, csv, feat_dir, ex, modalities=("pet", "ct"),
        datasets=("stanford",),
    )
    df = feature_store.merge_metadata(feat_dir, datasets=("stanford_dataset",))
    folds = splits.build_kfold_patients(df, n_splits=2)
    return {
        "dir": tmp,
        "df": df,
        "folds": folds,
        "hdf5_ct": feat_dir / "features_masks_ct.hdf5",
        "hdf5_pet": feat_dir / "features_masks_pet.hdf5",
    }
