"""vit_deep_radiomics_tpu — TPU-native deep-radiomics framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
``larosi/vit-deep-radiomics`` pipeline (PET/CT lung-nodule EGFR-mutation
classification from frozen-ViT dense descriptors), designed TPU-first:

* frozen-ViT dense-descriptor extraction (SAM/MedSAM ViT-B/16 encoder with
  windowed attention + decomposed relative positions + neck convs; DINOv2
  ViT-{S,B,L,G}/14 patch-embed and full dense modes) as jitted Flax modules
  with Pallas flash attention on the hot path,
* fused on-device CT/PET preprocessing (HU windowing, HU→RGB transfer,
  resize, flip/rotation) replacing the reference's per-slice host loops,
* downstream nodule classifiers (token transformer with CLS, bimodal
  cross-attention transformer, 3D conv+SE) trained under patient-stratified
  k-fold CV with focal / cross-modal-focal losses,
* data-parallel training and extraction over a ``jax.sharding.Mesh``
  (psum gradient reduction over ICI) — first-class, unlike the
  single-GPU reference,
* the same artifact contracts: HDF5 feature stores, parquet metadata,
  k-fold YAML, per-epoch metric JSONs, summary CSVs, HTML figures.

Layer map (mirrors SURVEY.md §7):

========  ====================================================
core/     mesh & precision runtime, PRNG plumbing
utils/    config tree (YAML merge), IO helpers, logging
ops/      Pallas + XLA kernels: attention, preprocessing, ROI,
          3D positional encoding, sort-based ROC-AUC
models/   Flax ViT backbones + downstream classifiers + losses
parallel/ mesh axes, shard_map/pjit helpers
data/     feature store, dataset windows/bucketing, splits,
          synthetic fixtures
engine/   extract / train / evaluate / checkpoint drivers
analysis/ k-fold aggregation, reports, point clouds, UMAP,
          late fusion, CloudCompare exports
cli/      command-line entry points
========  ====================================================
"""

__version__ = "0.1.0"
