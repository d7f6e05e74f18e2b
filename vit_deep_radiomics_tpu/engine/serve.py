"""Serving export: AOT-serialized descriptor models (StableHLO).

The reference has no deployment story at all — its encoder lives behind
a Python process importing torch + segment_anything
(/root/reference/src/tfds_dense_descriptor.py:87-107).  Here the
flagship dense-descriptor forward exports to a self-contained
**StableHLO artifact** via ``jax.export``: weights are baked in as
constants, the serialized bytes carry the full compiled-IR program, and
any later process (a serving binary, a different JAX version within the
compatibility window, another host) deserializes and calls it without
the model-building Python — the TPU-native analogue of TorchScript /
SavedModel export.

Artifact layout (``<stem>.vdr``): a single file holding a JSON header
(model config, batch, image size, dtype, framework version) and the
``jax.export`` payload.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import struct
from pathlib import Path

import numpy as np

__all__ = [
    "export_dense_model", "export_classifier", "export_pipeline",
    "load_exported", "ExportedModel",
]

_MAGIC = b"VDRX0001"


def export_dense_model(
    params: dict,
    backbone_cfg,
    out_path,
    *,
    batch: int = 4,
    policy: str = "fast",
    use_flash: bool | None = None,
    patch_embed_only: bool = False,
    platforms: tuple[str, ...] | None = None,
) -> str:
    """Serialize ``ViTDense(backbone_cfg).apply(params, ·)`` to disk.

    The exported function takes one ``(batch, H, W, 3)`` float32 image
    array and returns the dense feature map; *params* are captured as
    constants so the artifact is self-contained.  ``batch`` is static —
    export one artifact per serving batch size (the flash kernels pick
    static grids from it).
    """
    import jax
    from jax import export as jexport

    from ..core.precision import get_policy
    from ..models.vit import ViTDense

    if get_policy(policy).quantized and patch_embed_only:
        # a patch-embed-only graph is one conv — none of the matmuls the
        # int8 policy quantizes exist, so the artifact would record
        # "int8" while running pure float (same mislabeling class
        # export_classifier rejects)
        raise ValueError(
            "int8 applies to the backbone's projection/MLP matmuls; a "
            "patch-embed-only export has none — use 'fast' or 'parity', "
            "or export the full dense model")
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    pol = get_policy(policy)
    model = ViTDense(
        backbone_cfg, policy=pol, use_flash=use_flash,
        patch_embed_only=patch_embed_only)
    size = backbone_cfg.image_size
    params = _bake_params(params, pol)

    def forward(images):
        return model.apply(params, images)

    spec = jax.ShapeDtypeStruct((batch, size, size, 3), np.float32)
    # platforms=("cpu","tpu") lowers for BOTH targets (export once on a
    # CPU host, deploy on TPU); note the Pallas flash kernels lower for
    # TPU only — use use_flash=False for a cross-platform dense artifact
    exported = jexport.export(jax.jit(forward), platforms=platforms)(spec)
    payload = exported.serialize()

    # kernel env knobs are read at TRACE time and baked into the lowered
    # graph — record any that were set so the DENSE artifact (the only
    # export containing the flash/fused kernels) self-describes which
    # kernel variants it holds; classifier exports are pure XLA and
    # deliberately do not record them
    knobs = {k: os.environ[k] for k in _FLASH_ENV_KNOBS if k in os.environ}

    return _write_artifact(out_path, {
        **({"kernel_env": knobs} if knobs else {}),
        "kind": "dense",
        "model": backbone_cfg.name,
        "config": dataclasses.asdict(backbone_cfg),
        "batch": batch,
        "image_size": size,
        "policy": policy,
        "use_flash": use_flash,
        "patch_embed_only": patch_embed_only,
        "platforms": list(exported.platforms),
        "out_shape": [batch, backbone_cfg.grid, backbone_cfg.grid,
                      backbone_cfg.width if patch_embed_only
                      else (backbone_cfg.neck_channels
                            or backbone_cfg.width)],
    }, payload)


def export_classifier(
    variables: dict,
    cfg: dict,
    arch: str,
    modality: str,
    out_path,
    *,
    batch: int | str = 8,
    max_tokens: int = 512,
    conv_shape: tuple[int, int, int] = (13, 12, 12),
    policy: str = "fast",
    num_classes: int = 2,
    modality_a: str = "pet",
    modality_b: str = "ct",
    platforms: tuple[str, ...] | None = None,
) -> str:
    """Serialize a trained downstream classifier to a ``.vdr`` artifact.

    ``platforms=("cpu", "tpu")`` lowers for both targets in one
    artifact — export on any host, deploy anywhere (the classifiers are
    pure XLA, so every platform lowering is available everywhere).

    ``batch="poly"`` exports with a SYMBOLIC batch dimension
    (``jax.export`` shape polymorphism): one artifact serves any batch
    size with no padding — the runtime specializes per shape on first
    call.  Token/volume axes stay static (the masks carry raggedness).

    Completes the deployment story for the models the reference actually
    trains (models_archs.py:38-216): the per-patient diagnosis head is
    the part a production system deploys, and the reference can only run
    it inside a torch Python process with the model-building code on the
    path.  Inputs are static-shape with explicit validity masks (the
    serving analogue of the trainer's padded token buckets):

    * transformer (unimodal): ``(tokens (B,T,D) f32, mask (B,T) bool)``
      → ``(logits, cls_embedding)``
    * bimodal petct/petchest: ``(ct_tokens, pet_tokens, ct_mask,
      pet_mask)`` → ``(logits_joint, petct_cls, logits_ct, logits_pet)``
    * conv: ``(volume (B,S,H,W,D) f32, valid (B,S,H,W) bool)``
      → ``(logits, embedding)``

    ``variables`` accepts either the flax variables dict or a fold
    checkpoint's ``state["params"]`` (they are the same structure).
    """
    import jax
    from jax import export as jexport

    from ..core.precision import get_policy
    from ..models.classifiers import build_classifier

    if "params" not in variables:
        variables = {"params": variables}
    if get_policy(policy).quantized:
        # the classifiers do not implement quantized matmuls (they are
        # tiny and dispatch-bound); exporting would record "int8" while
        # actually running bf16 — refuse instead of mislabeling
        raise ValueError(
            "int8 applies to the dense backbone only; export classifiers "
            "with 'fast' or 'parity'")
    model = build_classifier(
        cfg, arch, modality, modality_a, modality_b,
        num_classes=num_classes, policy=get_policy(policy),
    )
    feature_dim = cfg["models"][arch]["feature_dim"]

    poly = batch == "poly"
    if poly:
        (bdim,) = jexport.symbolic_shape("b")
        bs = None  # JSON spec: batch dim unconstrained
    else:
        bdim = bs = int(batch)

    f32, b8 = np.float32, np.bool_
    if arch == "conv":
        s, h, w = conv_shape
        in_spec = {
            "volume": ((bs, s, h, w, feature_dim), "float32"),
            "valid_mask": ((bs, s, h, w), "bool"),
        }

        def forward(volume, valid_mask):
            return model.apply(variables, volume, valid_mask,
                               deterministic=True)

        specs = [jax.ShapeDtypeStruct((bdim, s, h, w, feature_dim), f32),
                 jax.ShapeDtypeStruct((bdim, s, h, w), b8)]
        out_names = ["logits", "embedding"]
    elif modality in ("petct", "petchest"):
        in_spec = {
            "ct_tokens": ((bs, max_tokens, feature_dim), "float32"),
            "pet_tokens": ((bs, max_tokens, feature_dim), "float32"),
            "ct_mask": ((bs, max_tokens), "bool"),
            "pet_mask": ((bs, max_tokens), "bool"),
        }

        def forward(ct_tokens, pet_tokens, ct_mask, pet_mask):
            return model.apply(
                variables, ct_tokens=ct_tokens, pet_tokens=pet_tokens,
                ct_mask=ct_mask, pet_mask=pet_mask, deterministic=True)

        specs = [
            jax.ShapeDtypeStruct((bdim, max_tokens, feature_dim), f32),
            jax.ShapeDtypeStruct((bdim, max_tokens, feature_dim), f32),
            jax.ShapeDtypeStruct((bdim, max_tokens), b8),
            jax.ShapeDtypeStruct((bdim, max_tokens), b8),
        ]
        out_names = ["logits", "petct_cls", "logits_ct", "logits_pet"]
    else:
        in_spec = {
            "tokens": ((bs, max_tokens, feature_dim), "float32"),
            "mask": ((bs, max_tokens), "bool"),
        }

        def forward(tokens, mask):
            return model.apply(variables, tokens, mask,
                               deterministic=True)

        specs = [
            jax.ShapeDtypeStruct((bdim, max_tokens, feature_dim), f32),
            jax.ShapeDtypeStruct((bdim, max_tokens), b8),
        ]
        out_names = ["logits", "cls_embedding"]

    exported = jexport.export(
        jax.jit(forward), platforms=platforms)(*specs)
    return _write_artifact(out_path, {
        "kind": "classifier",
        "arch": arch,
        "modality": modality,
        "batch": "poly" if poly else int(batch),
        "feature_dim": feature_dim,
        "num_classes": num_classes,
        "max_tokens": (None if arch == "conv" else max_tokens),
        "conv_shape": (list(conv_shape) if arch == "conv" else None),
        "policy": policy,
        "in_spec": {k: [list(s), d] for k, (s, d) in in_spec.items()},
        "out_names": out_names,
        "platforms": list(exported.platforms),
    }, exported.serialize())


def export_pipeline(
    backbone_params: dict,
    backbone_cfg,
    clf_variables: dict,
    clf_cfg: dict,
    arch: str,
    modality: str,
    out_path,
    *,
    slices: int = 13,
    max_tokens: int = 512,
    batch: int = 1,
    policy: str = "fast",
    use_flash: bool | None = None,
    num_classes: int = 2,
    platforms: tuple[str, ...] | None = None,
    input_mode: str = "rgb",
    native_size: int | None = None,
    ct_window: tuple[float, float] = (800.0, 40.0),
    pet_slices: int = 2,
    pet_native_size: int | None = None,
) -> str:
    """One fused artifact: images → dense descriptors → masked tokens →
    classifier logits.

    The reference runs this as two separate Python stages with a feature
    store in between — per-slice encoder forwards
    (/root/reference/src/tfds_dense_descriptor.py:110-139) write HDF5,
    then a second process re-reads it, builds masked positional-encoded
    tokens and runs the classifier
    (/root/reference/src/train_models.py:143-182 →
    models_archs.py:127-147).  Here the whole diagnosis path is ONE
    compiled graph in ONE ``.vdr``: no feature-store round trip, no
    host-side token packing, one device dispatch per patient batch.

    Exported signature (all static shapes; ``g`` = descriptor grid):

    ``(images (B, S, size, size, 3) f32, grid_mask (B, S, g, g) bool,
    spatial_res (B, 3) f32) → (logits (B, num_classes), cls (B, D))``

    * ``grid_mask`` is the nodule mask ON THE FEATURE GRID (the serving
      convention: one flag per descriptor cell; ``spatial_res`` is mm
      per feature-grid step, so coordinates are ``index · res`` exactly
      like the trainer's square-crop case where ``h_orig == h_new``).
    * Token building reproduces the trainer semantics in-graph
      (data/datasets.py::_get_features, train_models.py:143-182): flatten
      in (h, w, slice) order, full-grid coordinate mean-centering (the
      reference quirk — mean over ALL voxels, not masked ones), masked
      voxels' descriptors + ``positional_encoding_3d/4``.  The dynamic
      masked-token count becomes a static ``max_tokens`` budget via a
      stable argsort (masked-first, original order kept); the validity
      mask carries raggedness into the classifier's padded attention.
    * ``slices`` should match the trainer's window (13 for CT — see
      ``find_divisor``); pad short volumes with all-false mask rows.
    * ``input_mode="raw_hu"`` moves ALL preprocessing in-graph: the
      artifact takes native-resolution scanner output — ``images
      (B, S, native, native) int16`` raw HU for CT/chest (float32
      activity for PET) — and performs the HU window / HU→RGB transfer /
      PET max-normalisation (ops/preprocess.py, parity with
      /root/reference/src/tfds_dense_descriptor.py:287-303, 441-447)
      plus the resize to the backbone input ON DEVICE.  The wire payload
      per CT volume drops from ``S·size²·3·4`` fp32 bytes to
      ``S·native²·2`` — 24× less H2D for 512→1024 SAM — which is the
      binding cost of remote serving (see
      artifacts/pipeline_serve_r3.json: p50 was upload-bound).

    Supports all three classifier families the reference trains: the
    unimodal transformer, the conv volume net, and — for
    ``modality="petct"``/``"petchest"`` — the bimodal cross-attention
    classifier (models_archs.py:38-124), which exports with TWO image
    stacks:

    ``(ct_images (B, S_ct, …), pet_images (B, S_pet, …),
    ct_grid_mask (B, S_ct, g, g), pet_grid_mask (B, S_pet, g, g),
    ct_res (B, 3), pet_res (B, 3)) → (logits, petct_cls, logits_ct,
    logits_pet)``

    Both stacks run the same frozen backbone (exactly the reference's
    extraction: one encoder, per-modality normalization —
    tfds_dense_descriptor.py:441-447); ``pet_slices`` defaults to the
    trainer's PET window of 2 (``find_divisor``).  In ``raw_hu`` mode
    the CT stack is int16 HU at ``native_size`` and the PET stack
    float32 activity at ``pet_native_size`` (defaults to
    ``native_size``); each gets its own in-graph normalization chain.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..core.precision import get_policy
    from ..models.classifiers import build_classifier
    from ..models.vit import ViTDense
    from ..ops.posenc import positional_encoding_3d

    bimodal = modality in ("petct", "petchest")
    if bimodal and arch != "transformer":
        raise ValueError(
            "bimodal pipeline export requires arch='transformer' (the "
            "reference's conv net is unimodal — models_archs.py:150)")
    if input_mode not in ("rgb", "raw_hu"):
        raise ValueError(f"input_mode must be 'rgb' or 'raw_hu', "
                         f"got {input_mode!r}")
    if "params" not in clf_variables:
        clf_variables = {"params": clf_variables}
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    pol = get_policy(policy)
    vit = ViTDense(backbone_cfg, policy=pol, use_flash=use_flash)
    clf = build_classifier(
        clf_cfg, arch, modality, num_classes=num_classes, policy=pol)
    backbone_params = _bake_params(backbone_params, pol)
    clf_variables = _bake_params(clf_variables, pol)
    feature_dim = clf_cfg["models"][arch]["feature_dim"]
    if backbone_cfg.feature_dim != feature_dim:
        raise ValueError(
            f"backbone emits {backbone_cfg.feature_dim}-d descriptors "
            f"but the classifier expects feature_dim={feature_dim}")
    size = backbone_cfg.image_size
    g = backbone_cfg.grid
    s = int(slices)

    def tokens_one(feats, mask, res, *, n_slices=None):
        """(S,g,g,D), (S,g,g) bool, (3,) → static-budget masked tokens.

        Mirrors data/datasets.py::_get_features (h_orig == h_new case).
        """
        ns_ = s if n_slices is None else n_slices
        ii, jj, kk = jnp.meshgrid(
            jnp.arange(g), jnp.arange(g), jnp.arange(ns_), indexing="ij")
        x = jj.astype(jnp.float32) * res[0]
        y = ii.astype(jnp.float32) * res[1]
        z = kk.astype(jnp.float32) * res[2]
        x = (x - x.mean()).reshape(-1)
        y = (y - y.mean()).reshape(-1)
        z = (z - z.mean()).reshape(-1)
        mflat = mask.transpose(1, 2, 0).reshape(-1)          # (g·g·S,)
        fflat = feats.transpose(1, 2, 0, 3).reshape(-1, feature_dim)
        # stable sort: masked voxels first, original (h, w, s) order
        # preserved — the trainer's boolean-select order under a static
        # token budget
        idx = jnp.argsort(jnp.logical_not(mflat), stable=True)
        idx = idx[:max_tokens]
        valid = jnp.take(mflat, idx)
        tok = jnp.take(fflat, idx, axis=0)
        pe = positional_encoding_3d(
            jnp.take(x, idx), jnp.take(y, idx), jnp.take(z, idx),
            feature_dim)
        return (tok + pe / 4.0) * valid[:, None], valid

    def conv_volume_one(feats, mask):
        return feats * mask[..., None].astype(feats.dtype)

    raw = input_mode == "raw_hu"
    ns = int(native_size or 512)
    pns = int(pet_native_size or ns)
    mod_b = "chest" if modality == "petchest" else "ct"
    raw_dtype = (np.float32 if modality == "pet" else np.int16)

    def preprocess_one(vol, *, mod):
        """(S, native, native) raw scanner volume → (S, size, size, 3).

        Exactly DenseExtractor._normalize (engine/extract.py) +
        prepare_vit_input, fused into the serving graph: medsam CT →
        HU window; dinov2 CT → HU→RGB / 255; PET → per-volume /max
        (ref tfds_dense_descriptor.py:441-447)."""
        from ..ops import preprocess as pp

        if mod in ("ct", "chest"):
            if backbone_cfg.name == "medsam":
                x = pp.apply_window_ct(
                    vol.astype(jnp.float32), *ct_window)
            else:
                x = pp.hu_to_rgb(vol).astype(jnp.float32) / 255.0
        else:
            x = pp.normalize_pet(vol.astype(jnp.float32))
        return pp.prepare_vit_input(x, size)

    def feats_of(images, n_slices):
        f = vit.apply(
            backbone_params, images.reshape((-1, size, size, 3)))
        return f.astype(jnp.float32).reshape(
            (batch, n_slices, g, g, feature_dim))

    def forward(images, grid_mask, spatial_res):
        if raw:
            images = jax.vmap(
                functools.partial(preprocess_one, mod=modality))(images)
        feats = feats_of(images, s)
        if arch == "conv":
            vol = jax.vmap(conv_volume_one)(feats, grid_mask)
            return clf.apply(clf_variables, vol, grid_mask,
                             deterministic=True)
        tokens, valid = jax.vmap(tokens_one)(
            feats, grid_mask, spatial_res)
        return clf.apply(clf_variables, tokens, valid,
                         deterministic=True)

    ps = int(pet_slices)

    def forward_bimodal(ct_images, pet_images, ct_grid_mask,
                        pet_grid_mask, ct_res, pet_res):
        if raw:
            ct_images = jax.vmap(
                functools.partial(preprocess_one, mod=mod_b))(ct_images)
            pet_images = jax.vmap(
                functools.partial(preprocess_one, mod="pet"))(pet_images)
        ct_tok, ct_valid = jax.vmap(tokens_one)(
            feats_of(ct_images, s), ct_grid_mask, ct_res)
        pet_tok, pet_valid = jax.vmap(
            functools.partial(tokens_one, n_slices=ps))(
            feats_of(pet_images, ps), pet_grid_mask, pet_res)
        return clf.apply(
            clf_variables, ct_tokens=ct_tok, pet_tokens=pet_tok,
            ct_mask=ct_valid, pet_mask=pet_valid, deterministic=True)

    def img_spec(n_slices, native, dtype):
        return (
            jax.ShapeDtypeStruct((batch, n_slices, native, native), dtype)
            if raw else
            jax.ShapeDtypeStruct(
                (batch, n_slices, size, size, 3), np.float32))

    def img_spec_json(n_slices, native, dtype):
        return ([[batch, n_slices, native, native], np.dtype(dtype).name]
                if raw else
                [[batch, n_slices, size, size, 3], "float32"])

    res_spec = jax.ShapeDtypeStruct((batch, 3), np.float32)
    if bimodal:
        fwd = forward_bimodal
        specs = [
            img_spec(s, ns, np.int16),
            img_spec(ps, pns, np.float32),
            jax.ShapeDtypeStruct((batch, s, g, g), np.bool_),
            jax.ShapeDtypeStruct((batch, ps, g, g), np.bool_),
            res_spec, res_spec,
        ]
    else:
        fwd = forward
        specs = [
            img_spec(s, ns, raw_dtype),
            jax.ShapeDtypeStruct((batch, s, g, g), np.bool_),
            res_spec,
        ]
    exported = jexport.export(jax.jit(fwd), platforms=platforms)(*specs)
    knobs = {k: os.environ[k] for k in _FLASH_ENV_KNOBS if k in os.environ}
    if bimodal:
        in_spec = {
            "ct_images": img_spec_json(s, ns, np.int16),
            "pet_images": img_spec_json(ps, pns, np.float32),
            "ct_grid_mask": [[batch, s, g, g], "bool"],
            "pet_grid_mask": [[batch, ps, g, g], "bool"],
            "ct_res": [[batch, 3], "float32"],
            "pet_res": [[batch, 3], "float32"],
        }
        out_names = ["logits", "petct_cls", "logits_ct", "logits_pet"]
    else:
        in_spec = {
            "images": img_spec_json(s, ns, raw_dtype),
            "grid_mask": [[batch, s, g, g], "bool"],
            "spatial_res": [[batch, 3], "float32"],
        }
        out_names = (["logits", "embedding"] if arch == "conv"
                     else ["logits", "cls_embedding"])
    return _write_artifact(out_path, {
        **({"kernel_env": knobs} if knobs else {}),
        "kind": "pipeline",
        "model": backbone_cfg.name,
        "config": dataclasses.asdict(backbone_cfg),
        "arch": arch,
        "modality": modality,
        "batch": batch,
        "slices": s,
        **({"pet_slices": ps} if bimodal else {}),
        "image_size": size,
        "grid": g,
        "max_tokens": (None if arch == "conv" else max_tokens),
        "feature_dim": feature_dim,
        "num_classes": num_classes,
        "policy": policy,
        "use_flash": use_flash,
        "input_mode": input_mode,
        **({"native_size": ns, "ct_window": list(ct_window),
            **({"pet_native_size": pns} if bimodal else {})}
           if raw else {}),
        "in_spec": in_spec,
        "out_names": out_names,
        "platforms": list(exported.platforms),
    }, exported.serialize())


_FLASH_ENV_KNOBS = (
    "VDR_FLASH_SCHEDULE", "VDR_FLASH_NOMAX", "VDR_FLASH_BLOCK_Q",
    "VDR_FLASH_BLOCK_K", "VDR_FLASH_VMEM_LIMIT", "VDR_WINDOW_BATCH",
    "VDR_FUSED_MLP", "VDR_MLP_BLOCK_N", "VDR_MLP_CHUNK",
)


def _bake_params(params, pol):
    """Cast baked-in weights to the policy compute dtype for bf16-path
    exports: every use site casts to the compute dtype at trace time
    anyway (models/vit.py::_policy_dot), so fp32 constants only double
    the artifact and — decisive on this stack — the compile request (a
    SAM-B fp32-constants pipeline module is ~365 MB, which the remote
    compile helper rejects with HTTP 413).  Parity (fp32) exports keep
    fp32 weights."""
    from ..core.precision import cast_params

    import jax.numpy as jnp

    if pol.compute_dtype == jnp.bfloat16 and not pol.quantized:
        return cast_params(params, jnp.bfloat16)
    return params


def _write_artifact(out_path, header: dict, payload: bytes) -> str:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    head = json.dumps(header).encode()
    with open(out_path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<I", len(head)))
        fh.write(head)
        fh.write(payload)
    return str(out_path)


def _exec_cache_path(payload_sha: str):
    """Cache file for this artifact's COMPILED executable, or None.

    Keyed on (artifact payload hash, jax version, platform, device kind,
    device count) — any of these invalidates the binary.  Root dir from
    ``VDR_EXEC_CACHE`` (default ``~/.cache/vdr_tpu/exec``; ``off``
    disables)."""
    import hashlib

    root = os.environ.get(
        "VDR_EXEC_CACHE", os.path.expanduser("~/.cache/vdr_tpu/exec"))
    if root.lower() == "off":
        return None
    import jax

    dev = jax.devices()[0]
    key = hashlib.sha256("|".join([
        payload_sha, jax.__version__, dev.platform,
        getattr(dev, "device_kind", "?"), str(jax.device_count()),
    ]).encode()).hexdigest()[:32]
    return Path(root) / f"{key}.vdrexec"


@dataclasses.dataclass
class ExportedModel:
    """A deserialized serving artifact.

    Dense artifacts: ``model(images) → features``.  Classifier
    artifacts: positional inputs per ``meta['in_spec']`` order (tokens/
    masks or volume/valid_mask) → tuple per ``meta['out_names']``.

    ``warm()`` AOT-compiles the program up front and caches the
    serialized EXECUTABLE on disk — the first ``serve run`` of a dense/
    pipeline artifact otherwise pays a 2-3-minute on-chip compile on
    every process (measured, artifacts/pipeline_serve_*_r3.json); a
    cache hit loads in seconds.  Without ``warm()`` the first call
    compiles lazily, exactly as before.
    """

    meta: dict
    _exported: object
    payload_sha: str = ""
    cache_status: str = "cold"        # cold | hit | miss-saved | miss | poly
    _loaded: object = None
    #: phase split of the last warm() (read/unpickle vs executable
    #: deserialize vs first-execution program+weights upload) — the
    #: warmstart artifact's attribution fields (VERDICT r4 item 6)
    warm_stats: dict = dataclasses.field(default_factory=dict)

    @staticmethod
    def _materialize(fn, specs):
        """Run *fn* on zeros and pull every output to host.

        Full-pull :func:`utils.profiling.device_sync` — the measured
        evidence for why ``block_until_ready`` cannot be trusted here
        lives in that helper's docstring.
        """
        from ..utils.profiling import device_sync

        zeros = [np.zeros(s.shape, s.dtype) for s in specs]
        device_sync(fn(*zeros), pull="full")

    def _input_specs(self):
        """Static ShapeDtypeStructs for AOT compilation (None = shape-
        polymorphic artifact; those specialize per call shape)."""
        import jax

        if self.meta.get("kind", "dense") == "dense":
            b = int(self.meta["batch"])
            s = int(self.meta["image_size"])
            return [jax.ShapeDtypeStruct((b, s, s, 3), np.float32)]
        if self.meta.get("batch") == "poly":
            return None
        specs = []
        for _name, (shape, dtype) in self.meta["in_spec"].items():
            specs.append(jax.ShapeDtypeStruct(
                tuple(int(x) for x in shape),
                np.bool_ if dtype == "bool" else np.dtype(dtype)))
        return specs

    def warm(self) -> "ExportedModel":
        """Compile now, via the on-disk executable cache when possible."""
        if self._loaded is not None:
            return self
        import jax

        specs = self._input_specs()
        if specs is None:
            self.cache_status = "poly"
            return self
        path = _exec_cache_path(self.payload_sha) if self.payload_sha \
            else None
        import time as _time

        if path is not None and path.exists():
            try:
                import pickle

                from jax.experimental import serialize_executable as se

                t0 = _time.perf_counter()
                blob, in_tree, out_tree = pickle.loads(path.read_bytes())
                t1 = _time.perf_counter()
                # the exported program is single-device; without an
                # explicit device list the loader binds ALL addressable
                # devices (breaks on multi-device hosts)
                loaded = se.deserialize_and_load(
                    blob, in_tree, out_tree,
                    execution_devices=jax.devices()[:1])
                t2 = _time.perf_counter()
                # validation call: deserialization can "succeed" and
                # still hand back a broken binary (observed on the CPU
                # backend: runtime 'Buffer Definition Event not found');
                # one zero-input execution proves it and doubles as the
                # warmup a server wants anyway.  On the tunneled backend
                # THIS phase uploads the program + baked weights, so its
                # time against exec_bytes bounds the link share of the
                # warm cost (VERDICT r4 item 6).
                self._materialize(loaded, specs)
                t3 = _time.perf_counter()
                self._loaded = loaded
                self.cache_status = "hit"
                self.warm_stats = {
                    "warm_read_unpickle_s": round(t1 - t0, 2),
                    "warm_deserialize_s": round(t2 - t1, 2),
                    "warm_first_exec_s": round(t3 - t2, 2),
                    "exec_bytes": len(blob),
                    "warm_upload_mbps": round(
                        len(blob) / 2**20 / max(t3 - t2, 1e-9), 1),
                }
                return self
            except Exception:  # noqa: BLE001 — stale/incompatible: recompile
                pass
        t0 = _time.perf_counter()
        compiled = jax.jit(self._exported.call).lower(*specs).compile()
        t1 = _time.perf_counter()
        # warm the compiled path too: on the tunneled backend the first
        # EXECUTION uploads the program + baked weights to the device
        # (~40 s for a SAM-B pipeline) — absorb it here so first-request
        # latency is steady-state
        self._materialize(compiled, specs)
        t2 = _time.perf_counter()
        self._loaded = compiled
        self.cache_status = "miss"
        self.warm_stats = {
            "warm_compile_s": round(t1 - t0, 2),
            "warm_first_exec_s": round(t2 - t1, 2),
        }
        if path is not None:
            try:
                import pickle

                from jax.experimental import serialize_executable as se

                blob, in_tree, out_tree = se.serialize(compiled)
                path.parent.mkdir(parents=True, exist_ok=True)
                tmp = path.with_suffix(".tmp%d" % os.getpid())
                tmp.write_bytes(pickle.dumps((blob, in_tree, out_tree)))
                tmp.replace(path)                  # atomic vs readers
                self.cache_status = "miss-saved"
            except Exception:  # noqa: BLE001 — cache is best-effort
                pass
        return self

    def __call__(self, *inputs):
        if self._loaded is not None:
            return self._loaded(*inputs)
        return self._exported.call(*inputs)


def load_exported(path) -> ExportedModel:
    """Load a ``.vdr`` artifact; no model-building code runs."""
    import hashlib

    from jax import export as jexport

    with open(path, "rb") as fh:
        magic = fh.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a VDR export (magic {magic!r})")
        (hlen,) = struct.unpack("<I", fh.read(4))
        meta = json.loads(fh.read(hlen).decode())
        payload = fh.read()
    return ExportedModel(
        meta=meta,
        _exported=jexport.deserialize(payload),
        payload_sha=hashlib.sha256(payload).hexdigest(),
    )
