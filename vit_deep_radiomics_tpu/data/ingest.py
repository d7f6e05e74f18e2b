"""Volume ingestion: tfds patient datasets + PET liver normalisation.

Capability-equivalent of the reference's ingestion half
(/root/reference/src/tfds_dense_descriptor.py:168-201, 402-416):

* :func:`samples_to_voxels` stacks per-slice samples into (H, W, S)
  volumes, normalises PET by the mean nonzero liver uptake (+1e-10),
  reads the EGFR label and absolute spatial resolution with the
  null-resolution guard,
* :func:`load_tfds_pair` loads the PET + CT/torax3d tfds datasets and
  intersects patient ids — gated on ``tensorflow_datasets`` being
  importable (it is not baked into this image; the isotropic-HDF5 path
  in data/synthetic.py::read_isotropic_hdf5 is the live path, as it is
  in the reference).

``samples_to_voxels`` accepts any iterable of mappings whose values
expose ``.numpy()`` or are already arrays, so it works with tf tensors
and plain dict test fixtures alike.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import numpy as np

__all__ = ["samples_to_voxels", "load_tfds_pair", "HAS_TFDS"]

try:  # pragma: no cover - absent from this image
    import tensorflow_datasets as tfds  # noqa: F401

    HAS_TFDS = True
except ImportError:
    HAS_TFDS = False


def _as_numpy(x):
    return x.numpy() if hasattr(x, "numpy") else np.asarray(x)


def samples_to_voxels(
    samples: Iterable[Mapping], pet: bool = False
):
    """Stack per-slice samples → (img, mask, labels, spatial_res).

    Parity with reference ``tfds2voxels`` (tfds_dense_descriptor.py:168-201):
    PET slices divide by the mean nonzero ``pet_liver`` value (+1e-10);
    ``spatial_res`` is |space_directions| with non-positive entries
    replaced by the max (with a warning).
    """
    imgs, masks, labels = [], [], []
    sample = None
    for sample in samples:
        liver_mean = 1.0
        if pet:
            liver = _as_numpy(sample["pet_liver"])
            nz = liver[liver != 0]
            liver_mean = (nz.mean() if nz.size else 0.0) + 1e-10
        imgs.append(_as_numpy(sample["img_exam"]) / liver_mean)
        masks.append(_as_numpy(sample["mask_exam"]))
        labels.append(int(_as_numpy(sample["egfr_label"])))
    if sample is None:
        raise ValueError("no slices in sample stream")
    img = np.dstack(imgs)
    mask = np.dstack(masks)
    spatial_res = np.abs(
        _as_numpy(sample["exam_metadata"]["space_directions"])
    ).astype(np.float64)
    if spatial_res.min() <= 0:
        spatial_res = np.repeat(spatial_res.max(), spatial_res.shape)
        print("Warning: null voxel resolution; using max spacing")
    return img, mask, np.asarray(labels), spatial_res


def load_tfds_pair(dataset_name: str, data_dir: str):
    """(ds_pet, ds_ct, patient_ids): PET + CT/torax3d pair with the
    patient-id intersection (tfds_dense_descriptor.py:405-416).

    Requires tensorflow_datasets; raises ImportError with guidance when
    absent.
    """
    if not HAS_TFDS:
        raise ImportError(
            "tensorflow_datasets is not installed in this image; use the "
            "isotropic-HDF5 path (data/synthetic.py::read_isotropic_hdf5 / "
            "cli/extract.py) instead"
        )
    ct_name = "ct" if dataset_name == "stanford_dataset" else "torax3d"
    ds_pet, _ = tfds.load(f"{dataset_name}/pet", data_dir=data_dir,
                          with_info=True)
    ds_ct, _ = tfds.load(f"{dataset_name}/{ct_name}", data_dir=data_dir,
                         with_info=True)
    patient_ids = sorted(set(ds_ct.keys()) & set(ds_pet.keys()))
    return ds_pet, ds_ct, patient_ids
