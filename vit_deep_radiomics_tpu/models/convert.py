"""Weight converters: torch ``.pth`` checkpoints → Flax param pytrees.

The reference loads frozen backbone weights via external registries
(``sam_model_registry['vit_b'](model_path)`` at
/root/reference/src/tfds_dense_descriptor.py:104; ``torch.hub`` DINOv2 at
:87).  Here raw ``state_dict`` tensors are mapped directly onto the
:class:`~.vit.ViTDense` parameter tree, so MedSAM/DINOv2 checkpoints work
without segment_anything/torch.hub — both the original SAM naming
(``image_encoder.blocks.N...``, what ``medsam_vit_b.pth`` contains) and
the HuggingFace ``transformers`` naming (``vision_encoder.layers.N...``,
used for golden-parity tests) are supported.

Layout notes (torch → ours):
* patch-embed conv (out, in, kh, kw) → (kh·kw·in, out) matmul kernel,
* linear weights (out, in) → (in, out),
* SAM neck convs: 1×1 → (in, out) matmul; 3×3 → HWIO,
* DINOv2 separate q/k/v projections → fused (c, 3c) qkv kernel.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from .vit import ViTDenseConfig

__all__ = [
    "load_torch_state_dict",
    "sam_params_from_torch",
    "dinov2_params_from_torch",
    "transformer_classifier_params_from_torch",
    "conv_classifier_params_from_torch",
    "classifier_params_to_torch",
]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a ``.pth`` checkpoint into numpy arrays (CPU, no grad)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().numpy() for k, v in state.items()}


def _strip_prefix(state: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Normalise SAM checkpoints: drop the encoder prefix, keep encoder keys."""
    for prefix in ("image_encoder.", "vision_encoder."):
        if any(k.startswith(prefix) for k in state):
            return {
                k[len(prefix):]: v for k, v in state.items()
                if k.startswith(prefix)
            }
    return dict(state)


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _patch_kernel(w: np.ndarray) -> np.ndarray:
    # (out, in, kh, kw) -> (kh, kw, in, out) -> (kh*kw*in, out)
    out_c = w.shape[0]
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0)).reshape(-1, out_c)


def sam_params_from_torch(
    state: Mapping[str, np.ndarray], cfg: ViTDenseConfig
) -> dict:
    """SAM/MedSAM image-encoder state dict → ViTDense params."""
    s = _strip_prefix(state)

    def pick(*names):
        for n in names:
            if n in s:
                return s[n]
        raise KeyError(f"none of {names} in checkpoint")

    params: dict = {
        "patch_embed": {
            "kernel": _patch_kernel(
                pick("patch_embed.proj.weight",
                     "patch_embed.projection.weight")
            ),
            "bias": pick("patch_embed.proj.bias",
                         "patch_embed.projection.bias"),
        },
        "pos_embed": pick("pos_embed"),
    }

    for i in range(cfg.depth):
        for base in (f"blocks.{i}", f"layers.{i}"):
            if f"{base}.attn.qkv.weight" in s:
                break
        ln1w = pick(f"{base}.norm1.weight", f"{base}.layer_norm1.weight")
        ln1b = pick(f"{base}.norm1.bias", f"{base}.layer_norm1.bias")
        ln2w = pick(f"{base}.norm2.weight", f"{base}.layer_norm2.weight")
        ln2b = pick(f"{base}.norm2.bias", f"{base}.layer_norm2.bias")
        block = {
            "norm1": {"scale": ln1w, "bias": ln1b},
            "norm2": {"scale": ln2w, "bias": ln2b},
            "attn": {
                "qkv_kernel": _linear(s[f"{base}.attn.qkv.weight"]),
                "qkv_bias": s[f"{base}.attn.qkv.bias"],
                "proj_kernel": _linear(s[f"{base}.attn.proj.weight"]),
                "proj_bias": s[f"{base}.attn.proj.bias"],
            },
            "mlp": {
                "w1": _linear(s[f"{base}.mlp.lin1.weight"]),
                "b1": s[f"{base}.mlp.lin1.bias"],
                "w2": _linear(s[f"{base}.mlp.lin2.weight"]),
                "b2": s[f"{base}.mlp.lin2.bias"],
            },
        }
        if cfg.use_rel_pos:
            block["attn"]["rel_pos_h"] = s[f"{base}.attn.rel_pos_h"]
            block["attn"]["rel_pos_w"] = s[f"{base}.attn.rel_pos_w"]
        params[f"block_{i}"] = block

    if cfg.neck_channels:
        conv1 = pick("neck.0.weight", "neck.conv1.weight")
        conv2 = pick("neck.2.weight", "neck.conv2.weight")
        params["neck"] = {
            "conv1_kernel": np.ascontiguousarray(
                conv1.reshape(conv1.shape[0], conv1.shape[1]).T
            ),
            "conv2_kernel": np.ascontiguousarray(conv2.transpose(2, 3, 1, 0)),
            "ln1": {
                "scale": pick("neck.1.weight", "neck.layer_norm1.weight"),
                "bias": pick("neck.1.bias", "neck.layer_norm1.bias"),
            },
            "ln2": {
                "scale": pick("neck.3.weight", "neck.layer_norm2.weight"),
                "bias": pick("neck.3.bias", "neck.layer_norm2.bias"),
            },
        }
    return params


def dinov2_params_from_torch(
    state: Mapping[str, np.ndarray], cfg: ViTDenseConfig
) -> dict:
    """DINOv2 state dict → ViTDense params.

    Accepts torch.hub naming (``blocks.N.attn.qkv...``) and transformers
    naming (``encoder.layer.N.attention.attention.query...``).
    """
    s = dict(state)
    hf = any(k.startswith("encoder.layer.") for k in s)

    if hf:
        patch_w = s["embeddings.patch_embeddings.projection.weight"]
        patch_b = s["embeddings.patch_embeddings.projection.bias"]
        cls_token = s["embeddings.cls_token"]
        pos = s["embeddings.position_embeddings"]
    else:
        patch_w = s["patch_embed.proj.weight"]
        patch_b = s["patch_embed.proj.bias"]
        cls_token = s["cls_token"]
        pos = s["pos_embed"]

    params: dict = {
        "patch_embed": {"kernel": _patch_kernel(patch_w), "bias": patch_b},
        "cls_token": cls_token.reshape(1, 1, -1),
        "pos_embed": pos,
    }

    for i in range(cfg.depth):
        if hf:
            base = f"encoder.layer.{i}"
            qw = _linear(s[f"{base}.attention.attention.query.weight"])
            kw = _linear(s[f"{base}.attention.attention.key.weight"])
            vw = _linear(s[f"{base}.attention.attention.value.weight"])
            qkv_kernel = np.concatenate([qw, kw, vw], axis=1)
            qkv_bias = np.concatenate([
                s[f"{base}.attention.attention.query.bias"],
                s[f"{base}.attention.attention.key.bias"],
                s[f"{base}.attention.attention.value.bias"],
            ])
            proj_w = _linear(s[f"{base}.attention.output.dense.weight"])
            proj_b = s[f"{base}.attention.output.dense.bias"]
            mlp1_w, mlp1_b = s[f"{base}.mlp.fc1.weight"], s[f"{base}.mlp.fc1.bias"]
            mlp2_w, mlp2_b = s[f"{base}.mlp.fc2.weight"], s[f"{base}.mlp.fc2.bias"]
            ls1 = s[f"{base}.layer_scale1.lambda1"]
            ls2 = s[f"{base}.layer_scale2.lambda1"]
            n1w, n1b = s[f"{base}.norm1.weight"], s[f"{base}.norm1.bias"]
            n2w, n2b = s[f"{base}.norm2.weight"], s[f"{base}.norm2.bias"]
        else:
            base = f"blocks.{i}"
            qkv_kernel = _linear(s[f"{base}.attn.qkv.weight"])
            qkv_bias = s[f"{base}.attn.qkv.bias"]
            proj_w = _linear(s[f"{base}.attn.proj.weight"])
            proj_b = s[f"{base}.attn.proj.bias"]
            mlp1_w, mlp1_b = s[f"{base}.mlp.fc1.weight"], s[f"{base}.mlp.fc1.bias"]
            mlp2_w, mlp2_b = s[f"{base}.mlp.fc2.weight"], s[f"{base}.mlp.fc2.bias"]
            ls1 = s[f"{base}.ls1.gamma"]
            ls2 = s[f"{base}.ls2.gamma"]
            n1w, n1b = s[f"{base}.norm1.weight"], s[f"{base}.norm1.bias"]
            n2w, n2b = s[f"{base}.norm2.weight"], s[f"{base}.norm2.bias"]

        params[f"block_{i}"] = {
            "norm1": {"scale": n1w, "bias": n1b},
            "norm2": {"scale": n2w, "bias": n2b},
            "attn": {
                "qkv_kernel": qkv_kernel,
                "qkv_bias": qkv_bias,
                "proj_kernel": proj_w,
                "proj_bias": proj_b,
            },
            "mlp": {
                "w1": _linear(mlp1_w), "b1": mlp1_b,
                "w2": _linear(mlp2_w), "b2": mlp2_b,
            },
            "ls1": ls1,
            "ls2": ls2,
        }

    if hf:
        params["norm"] = {
            "scale": s["layernorm.weight"], "bias": s["layernorm.bias"],
        }
    else:
        params["norm"] = {"scale": s["norm.weight"], "bias": s["norm.bias"]}
    return params


def _torch_encoder_layer(sd: Mapping[str, np.ndarray], base: str) -> dict:
    """One torch ``nn.TransformerEncoderLayer`` → PostNormEncoderLayer params."""
    return {
        "self_attn": {
            "in_kernel": _linear(sd[f"{base}.self_attn.in_proj_weight"]),
            "in_bias": sd[f"{base}.self_attn.in_proj_bias"],
            "out_kernel": _linear(sd[f"{base}.self_attn.out_proj.weight"]),
            "out_bias": sd[f"{base}.self_attn.out_proj.bias"],
        },
        "linear1": {"kernel": _linear(sd[f"{base}.linear1.weight"]),
                    "bias": sd[f"{base}.linear1.bias"]},
        "linear2": {"kernel": _linear(sd[f"{base}.linear2.weight"]),
                    "bias": sd[f"{base}.linear2.bias"]},
        "norm1": {"scale": sd[f"{base}.norm1.weight"],
                  "bias": sd[f"{base}.norm1.bias"]},
        "norm2": {"scale": sd[f"{base}.norm2.weight"],
                  "bias": sd[f"{base}.norm2.bias"]},
    }


def _mlp_head(sd: Mapping[str, np.ndarray], base: str) -> dict:
    return {
        "dense1": {"kernel": _linear(sd[f"{base}.dense1.weight"]),
                   "bias": sd[f"{base}.dense1.bias"]},
        "dense2": {"kernel": _linear(sd[f"{base}.dense2.weight"]),
                   "bias": sd[f"{base}.dense2.bias"]},
    }


def _count_encoder_layers(sd: Mapping[str, np.ndarray], prefix: str) -> int:
    """Number of ``{prefix}.layers.N.*`` layers present in a state dict."""
    n = 0
    while any(k.startswith(f"{prefix}.layers.{n}.") for k in sd):
        n += 1
    return n


def transformer_classifier_params_from_torch(
    state: Mapping[str, np.ndarray], num_layers: int | None = None,
    bimodal: bool = False,
) -> dict:
    """Reference classifier ``.pth`` state dict → our classifier params.

    Unimodal (reference ``TransformerNoduleClassifier``, models_archs.py
    :127-147: ``cls_token``, ``norm``, ``transformer_encoder.layers.N``,
    ``classifier``) and bimodal (``TransformerNoduleBimodalClassifier``,
    :38-124, per-modality encoders + cross-attention + three heads)
    naming are both supported, so classifiers trained by the reference
    load directly for evaluation/embedding extraction here.

    ``num_layers=None`` infers each encoder's depth from the checkpoint
    keys — in bimodal mode per modality, since the config schema allows
    asymmetric CT/PET depths (cfg_model[modality]['num_layers']).  An
    explicit ``num_layers`` is validated against the checkpoint.
    """
    sd = dict(state)

    def depth(prefix):
        found = _count_encoder_layers(sd, prefix)
        if found == 0:
            if num_layers is None:
                raise KeyError(
                    f"no '{prefix}.layers.N' keys in the checkpoint")
            return num_layers
        if num_layers is not None and num_layers != found:
            raise ValueError(
                f"num_layers={num_layers} but checkpoint has {found} "
                f"'{prefix}.layers.N' layers")
        return found

    if not bimodal:
        return {
            "cls_token": sd["cls_token"],
            "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
            "encoder": {
                f"layer_{i}": _torch_encoder_layer(
                    sd, f"transformer_encoder.layers.{i}")
                for i in range(depth("transformer_encoder"))
            },
            "head": _mlp_head(sd, "classifier"),
        }

    def encoder(prefix, n):
        return {
            f"layer_{i}": _torch_encoder_layer(sd, f"{prefix}.layers.{i}")
            for i in range(n)
        }

    def cross_attn(prefix):
        return {
            "in_kernel": _linear(
                sd[f"{prefix}.multihead_attn.in_proj_weight"]),
            "in_bias": sd[f"{prefix}.multihead_attn.in_proj_bias"],
            "out_kernel": _linear(
                sd[f"{prefix}.multihead_attn.out_proj.weight"]),
            "out_bias": sd[f"{prefix}.multihead_attn.out_proj.bias"],
        }

    return {
        "cls_token_ct": sd["cls_token_ct"],
        "cls_token_pet": sd["cls_token_pet"],
        "norm_ct": {"scale": sd["norm_ct.weight"],
                    "bias": sd["norm_ct.bias"]},
        "norm_pet": {"scale": sd["norm_pet.weight"],
                     "bias": sd["norm_pet.bias"]},
        "encoder_ct": encoder(
            "transformer_encoder_ct", depth("transformer_encoder_ct")),
        "encoder_pet": encoder(
            "transformer_encoder_pet", depth("transformer_encoder_pet")),
        "cross_attention_ct": cross_attn("cross_attention_ct"),
        "cross_attention_pet": cross_attn("cross_attention_pet"),
        "classifier_ct": _mlp_head(sd, "classifier_ct"),
        "classifier_pet": _mlp_head(sd, "classifier_pet"),
        "projection_petct": _mlp_head(sd, "projection_petct"),
        "classifier_petct": _mlp_head(sd, "classifier_petct"),
    }


def conv_classifier_params_from_torch(
    state: Mapping[str, np.ndarray],
) -> dict:
    """Reference conv classifier ``.pth`` state dict → our params.

    Naming contract of ``NoduleClassifier`` (models_archs.py:150-171):
    ``conv1/conv2`` (Conv3d, weight (out, in, kD, kH, kW)), ``se1/se2``
    with bias-free ``fc.0``/``fc.2`` Linears (SELayer, :203-216),
    ``fc1`` and the ``classifier`` MLP head.  Our layout is channels-
    last, so conv kernels transpose to (kD, kH, kW, in, out).
    """
    sd = dict(state)

    def conv(base):
        return {
            "kernel": np.ascontiguousarray(
                sd[f"{base}.weight"].transpose(2, 3, 4, 1, 0)),
            "bias": sd[f"{base}.bias"],
        }

    def se(base):
        return {
            "fc1": {"kernel": _linear(sd[f"{base}.fc.0.weight"])},
            "fc2": {"kernel": _linear(sd[f"{base}.fc.2.weight"])},
        }

    return {
        "conv1": conv("conv1"),
        "se1": se("se1"),
        "conv2": conv("conv2"),
        "se2": se("se2"),
        "fc1": {"kernel": _linear(sd["fc1.weight"]), "bias": sd["fc1.bias"]},
        "head": _mlp_head(sd, "classifier"),
    }


def _inv_linear(kernel: np.ndarray) -> np.ndarray:
    """Flax Dense kernel (in, out) → torch Linear weight (out, in)."""
    return np.ascontiguousarray(np.asarray(kernel).T)


def _torch_mlp_head(params: Mapping, base: str, out: dict) -> None:
    out[f"{base}.dense1.weight"] = _inv_linear(params["dense1"]["kernel"])
    out[f"{base}.dense1.bias"] = np.asarray(params["dense1"]["bias"])
    out[f"{base}.dense2.weight"] = _inv_linear(params["dense2"]["kernel"])
    out[f"{base}.dense2.bias"] = np.asarray(params["dense2"]["bias"])


def _torch_attn(params: Mapping, base: str, out: dict) -> None:
    out[f"{base}.in_proj_weight"] = _inv_linear(params["in_kernel"])
    out[f"{base}.in_proj_bias"] = np.asarray(params["in_bias"])
    out[f"{base}.out_proj.weight"] = _inv_linear(params["out_kernel"])
    out[f"{base}.out_proj.bias"] = np.asarray(params["out_bias"])


def _torch_encoder(params: Mapping, prefix: str, out: dict) -> None:
    for name, layer in params.items():
        i = name.split("_")[1]
        base = f"{prefix}.layers.{i}"
        _torch_attn(layer["self_attn"], f"{base}.self_attn", out)
        out[f"{base}.linear1.weight"] = _inv_linear(
            layer["linear1"]["kernel"])
        out[f"{base}.linear1.bias"] = np.asarray(layer["linear1"]["bias"])
        out[f"{base}.linear2.weight"] = _inv_linear(
            layer["linear2"]["kernel"])
        out[f"{base}.linear2.bias"] = np.asarray(layer["linear2"]["bias"])
        out[f"{base}.norm1.weight"] = np.asarray(layer["norm1"]["scale"])
        out[f"{base}.norm1.bias"] = np.asarray(layer["norm1"]["bias"])
        out[f"{base}.norm2.weight"] = np.asarray(layer["norm2"]["scale"])
        out[f"{base}.norm2.bias"] = np.asarray(layer["norm2"]["bias"])


def classifier_params_to_torch(params: Mapping) -> dict[str, np.ndarray]:
    """Our classifier params → a reference-named ``state_dict`` (numpy).

    The exact inverse of the ``*_from_torch`` converters, for all three
    model families — ``torch.save({k: torch.tensor(v) ...})`` of the
    result produces a ``model_epoch_NNNN.pth`` the reference's
    ``load_checkpoint`` (models_archs.py:22-35) consumes directly, so
    classifiers trained on TPU here drop into the reference's
    evaluation/UMAP tooling unchanged.  The family is inferred from the
    param-tree keys (unimodal transformer / bimodal / conv).
    """
    p = dict(params.get("params", params))
    out: dict[str, np.ndarray] = {}
    if "conv1" in p:  # conv family
        for base in ("conv1", "conv2"):
            out[f"{base}.weight"] = np.ascontiguousarray(
                np.asarray(p[base]["kernel"]).transpose(4, 3, 0, 1, 2))
            out[f"{base}.bias"] = np.asarray(p[base]["bias"])
        for base in ("se1", "se2"):
            out[f"{base}.fc.0.weight"] = _inv_linear(p[base]["fc1"]["kernel"])
            out[f"{base}.fc.2.weight"] = _inv_linear(p[base]["fc2"]["kernel"])
        out["fc1.weight"] = _inv_linear(p["fc1"]["kernel"])
        out["fc1.bias"] = np.asarray(p["fc1"]["bias"])
        _torch_mlp_head(p["head"], "classifier", out)
        return out
    if "cls_token_ct" in p:  # bimodal family
        out["cls_token_ct"] = np.asarray(p["cls_token_ct"])
        out["cls_token_pet"] = np.asarray(p["cls_token_pet"])
        for mod in ("ct", "pet"):
            out[f"norm_{mod}.weight"] = np.asarray(p[f"norm_{mod}"]["scale"])
            out[f"norm_{mod}.bias"] = np.asarray(p[f"norm_{mod}"]["bias"])
            _torch_encoder(p[f"encoder_{mod}"],
                           f"transformer_encoder_{mod}", out)
            _torch_attn(p[f"cross_attention_{mod}"],
                        f"cross_attention_{mod}.multihead_attn", out)
            _torch_mlp_head(p[f"classifier_{mod}"], f"classifier_{mod}", out)
        _torch_mlp_head(p["projection_petct"], "projection_petct", out)
        _torch_mlp_head(p["classifier_petct"], "classifier_petct", out)
        return out
    # unimodal transformer
    out["cls_token"] = np.asarray(p["cls_token"])
    out["norm.weight"] = np.asarray(p["norm"]["scale"])
    out["norm.bias"] = np.asarray(p["norm"]["bias"])
    _torch_encoder(p["encoder"], "transformer_encoder", out)
    _torch_mlp_head(p["head"], "classifier", out)
    return out
