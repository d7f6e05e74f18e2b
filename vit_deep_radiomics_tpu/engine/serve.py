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
import json
import struct
from pathlib import Path

import numpy as np

__all__ = ["export_dense_model", "load_exported", "ExportedModel"]

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

    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    model = ViTDense(
        backbone_cfg, policy=get_policy(policy), use_flash=use_flash,
        patch_embed_only=patch_embed_only)
    size = backbone_cfg.image_size

    def forward(images):
        return model.apply(params, images)

    spec = jax.ShapeDtypeStruct((batch, size, size, 3), np.float32)
    exported = jexport.export(jax.jit(forward))(spec)
    payload = exported.serialize()

    header = json.dumps({
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
    }).encode()

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<I", len(header)))
        fh.write(header)
        fh.write(payload)
    return str(out_path)


@dataclasses.dataclass
class ExportedModel:
    """A deserialized serving artifact: ``model(images) → features``."""

    meta: dict
    _exported: object

    def __call__(self, images):
        return self._exported.call(images)


def load_exported(path) -> ExportedModel:
    """Load a ``.vdr`` artifact; no model-building code runs."""
    from jax import export as jexport

    with open(path, "rb") as fh:
        magic = fh.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a VDR export (magic {magic!r})")
        (hlen,) = struct.unpack("<I", fh.read(4))
        meta = json.loads(fh.read(hlen).decode())
        payload = fh.read()
    return ExportedModel(meta=meta, _exported=jexport.deserialize(payload))
