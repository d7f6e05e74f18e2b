"""Downstream nodule classifiers over precomputed dense descriptors.

Capability-equivalents of the reference model zoo
(/root/reference/src/models_archs.py):

* :class:`TransformerNoduleClassifier` — learned CLS token prepended to
  the masked-voxel token sequence, input LayerNorm, post-norm transformer
  encoder (GELU, matching torch ``nn.TransformerEncoderLayer`` semantics,
  models_archs.py:127-147), MLP head on the CLS; returns
  ``(logits, cls_embedding)``.
* :class:`TransformerNoduleBimodalClassifier` — per-modality encoders +
  CLS tokens, bidirectional CT↔PET cross-attention, per-modality heads
  and a joint projection head (models_archs.py:38-124); returns
  ``(logits_petct, petct_cls, logits_ct, logits_pet)``.
* :class:`ConvNoduleClassifier` — 3D conv + squeeze-excite stack with
  global average pooling (models_archs.py:150-171, 203-216); returns
  ``(logits, embedding)``.

TPU-first differences from the reference:

* **batched, padded sequences with key-padding masks** everywhere — the
  reference is locked to batch_size=1 (its own TODO at
  train_models.py:579); here every sequence op takes ``token_mask`` and
  attention ignores pads, so token buckets batch efficiently,
* channels-last (NDHWC) 3D convs — TPU-native layout,
* the reference's unimodal fallback returns the *raw* CLS parameter
  without encoding (models_archs.py:88, 97 — a latent defect per
  SURVEY.md §"quirks"); here the available modality is actually encoded,
* dropout is explicit via the ``deterministic`` flag and an ``rngs``
  dict, never ambient global state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import FAST, Policy
from ..ops.attention import attention_reference

__all__ = [
    "TransformerNoduleClassifier",
    "TransformerNoduleBimodalClassifier",
    "ConvNoduleClassifier",
]


def _mask_bias(token_mask: jax.Array | None, dtype=jnp.float32):
    """(B, S) boolean mask → additive (B, 1, 1, S) attention bias."""
    if token_mask is None:
        return None
    return jnp.where(token_mask[:, None, None, :], 0.0, -1e30).astype(dtype)


class MultiHeadAttention(nn.Module):
    """Torch-``nn.MultiheadAttention``-compatible MHA (fused in-proj).

    ``seq_mesh`` switches SELF-attention to sequence-parallel ring
    attention (parallel/ring_attention.py): tokens shard over the mesh's
    data axis, K/V shards rotate over ICI, and no device ever holds the
    full score matrix — the whole-volume (no-chunking) mode the
    reference bounds away by construction (SURVEY.md §5 long-context).
    """

    dim: int
    num_heads: int
    policy: Policy
    seq_mesh: object = None            # jax.sharding.Mesh | None

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None):
        d, nh = self.dim, self.num_heads
        hd = d // nh
        dt = self.policy.compute_dtype
        in_w = self.param("in_kernel", nn.initializers.xavier_uniform(),
                          (d, 3 * d), self.policy.param_dtype)
        in_b = self.param("in_bias", nn.initializers.zeros, (3 * d,),
                          self.policy.param_dtype)
        out_w = self.param("out_kernel", nn.initializers.xavier_uniform(),
                           (d, d), self.policy.param_dtype)
        out_b = self.param("out_bias", nn.initializers.zeros, (d,),
                           self.policy.param_dtype)

        def proj(x, w, b):
            return (
                jnp.dot(x.astype(dt), w.astype(dt),
                        preferred_element_type=jnp.float32)
                + b.astype(jnp.float32)
            ).astype(dt)

        q = proj(query, in_w[:, :d], in_b[:d])
        k = proj(key, in_w[:, d:2 * d], in_b[d:2 * d])
        v = proj(value, in_w[:, 2 * d:], in_b[2 * d:])

        def split(x):
            b, s, _ = x.shape
            return x.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

        if self.seq_mesh is not None and query is key is value:
            from ..parallel.ring_attention import ring_attention

            o = ring_attention(
                split(q), split(k), split(v), self.seq_mesh,
                token_mask=key_padding_mask,
            )
        elif self.seq_mesh is not None:
            # cross-attention with sequence-sharded K/V and replicated
            # (few-row, e.g. CLS-only) queries — the whole-volume
            # bimodal path (parallel/ring_attention.py)
            from ..parallel.ring_attention import (
                cross_attention_kv_sharded,
            )

            o = cross_attention_kv_sharded(
                split(q), split(k), split(v), self.seq_mesh,
                token_mask=key_padding_mask,
            )
        else:
            bias = _mask_bias(key_padding_mask)
            o = attention_reference(
                split(q), split(k), split(v), bias=bias)
        b, s = query.shape[:2]
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return proj(o, out_w, out_b)


class _MLPHead(nn.Module):
    """dense → GELU → dropout → dense → dropout (models_archs.py:186-200)."""

    hidden: int
    out: int
    policy: Policy
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dt = self.policy.compute_dtype
        x = nn.Dense(self.hidden, dtype=dt,
                     param_dtype=self.policy.param_dtype, name="dense1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=dt,
                     param_dtype=self.policy.param_dtype, name="dense2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class PostNormEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch default semantics):
    ``x = norm1(x + attn(x)); x = norm2(x + mlp(x))`` with GELU."""

    dim: int
    num_heads: int
    ffn_dim: int
    policy: Policy
    dropout_rate: float = 0.1
    seq_mesh: object = None

    @nn.compact
    def __call__(self, x, token_mask=None, deterministic: bool = True):
        dt = self.policy.compute_dtype
        attn = MultiHeadAttention(
            self.dim, self.num_heads, self.policy,
            seq_mesh=self.seq_mesh, name="self_attn"
        )(x, x, x, key_padding_mask=token_mask)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dt, param_dtype=self.policy.param_dtype,
                         epsilon=1e-5, name="norm1")(x + attn)
        y = nn.Dense(self.ffn_dim, dtype=dt,
                     param_dtype=self.policy.param_dtype, name="linear1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(self.dim, dtype=dt,
                     param_dtype=self.policy.param_dtype, name="linear2")(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dt, param_dtype=self.policy.param_dtype,
                         epsilon=1e-5, name="norm2")(x + y)
        return x


class _Encoder(nn.Module):
    dim: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    policy: Policy
    dropout_rate: float
    seq_mesh: object = None

    @nn.compact
    def __call__(self, x, token_mask=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x = PostNormEncoderLayer(
                self.dim, self.num_heads, self.ffn_dim, self.policy,
                dropout_rate=self.dropout_rate, seq_mesh=self.seq_mesh,
                name=f"layer_{i}",
            )(x, token_mask=token_mask, deterministic=deterministic)
        return x


def _prepend_cls(tokens, token_mask, cls_param):
    b = tokens.shape[0]
    cls = jnp.broadcast_to(cls_param.astype(tokens.dtype),
                           (b, 1, tokens.shape[-1]))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    if token_mask is not None:
        ones = jnp.ones((b, 1), bool)
        token_mask = jnp.concatenate([ones, token_mask], axis=1)
    return tokens, token_mask


class TransformerNoduleClassifier(nn.Module):
    """CLS-token transformer over masked-voxel descriptor tokens.

    Ref: models_archs.py:127-147 (input LayerNorm applied after the CLS
    concat, post-norm encoder, MLP head on the CLS).
    """

    input_dim: int
    ffn_dim: int
    num_heads: int
    num_classes: int
    num_layers: int
    policy: Policy = FAST
    dropout_rate: float = 0.1
    seq_mesh: object = None            # whole-volume sequence parallelism

    @nn.compact
    def __call__(self, tokens, token_mask=None, deterministic: bool = True):
        p = self.policy
        tokens = p.cast_input(tokens)
        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.input_dim), p.param_dtype)
        x, token_mask = _prepend_cls(tokens, token_mask, cls)
        orig_len = x.shape[1]
        if self.seq_mesh is not None:
            # ring attention shards the token axis: pad to a multiple of
            # the ring size with masked tokens, sliced off after
            from ..core.mesh import DATA_AXIS

            ring = self.seq_mesh.shape[DATA_AXIS]
            pad = (-orig_len) % ring
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                if token_mask is None:
                    token_mask = jnp.ones(x.shape[:2], bool).at[
                        :, orig_len:].set(False)
                else:
                    token_mask = jnp.pad(token_mask, ((0, 0), (0, pad)))
        x = nn.LayerNorm(dtype=p.compute_dtype, param_dtype=p.param_dtype,
                         epsilon=1e-5, name="norm")(x)
        x = _Encoder(self.input_dim, self.num_heads, self.ffn_dim,
                     self.num_layers, p, self.dropout_rate,
                     seq_mesh=self.seq_mesh,
                     name="encoder")(x, token_mask, deterministic)
        cls_out = x[:, 0]
        # reference MLPLayer fixes its own dropout at 0.1
        # (models_archs.py:186) — here the classifier's rate propagates so
        # dropout_rate=0.0 really disables all stochasticity (the default
        # 0.1 matches the reference)
        logits = _MLPHead(self.input_dim * 2, self.num_classes, p,
                          dropout_rate=min(self.dropout_rate, 0.1),
                          name="head")(cls_out, deterministic)
        return p.cast_output(logits), p.cast_output(cls_out)


class TransformerNoduleBimodalClassifier(nn.Module):
    """Bimodal PET/CT cross-attention classifier.

    Ref: models_archs.py:38-124.  Per-modality CLS + LayerNorm + encoder
    (dropout 0.5 there), bidirectional cross-attention between the full
    encoded sequences, CLS-position readout, per-modality MLP heads,
    concat→projection→joint head.  Unimodal calls encode the available
    modality and reuse its logits for all three outputs (the reference
    instead returned the raw CLS parameter — fixed here, see module
    docstring).
    """

    input_dim: int
    ffn_dim_ct: int
    ffn_dim_pet: int
    num_heads_ct: int
    num_heads_pet: int
    num_layers_ct: int
    num_layers_pet: int
    num_classes: int
    policy: Policy = FAST
    dropout_rate: float = 0.5
    # whole-volume sequence parallelism: each modality's encoder runs
    # ring attention over the mesh's data axis; the bidirectional
    # cross-attention runs CLS-query-only against the other modality's
    # sequence-sharded K/V (exact — only position 0 of the cross output
    # is ever read, models_archs.py:100-104 semantics)
    seq_mesh: object = None

    def _ring_pad(self, x, mask):
        """Pad the token axis to a ring-size multiple (masked pads)."""
        from ..core.mesh import DATA_AXIS

        ring = self.seq_mesh.shape[DATA_AXIS]
        pad = (-x.shape[1]) % ring
        if not pad:
            if mask is None:
                mask = jnp.ones(x.shape[:2], bool)
            return x, mask
        orig = x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        if mask is None:
            mask = jnp.ones(x.shape[:2], bool).at[:, orig:].set(False)
        else:
            mask = jnp.pad(mask, ((0, 0), (0, pad)))
        return x, mask

    @nn.compact
    def __call__(
        self,
        ct_tokens=None,
        pet_tokens=None,
        ct_mask=None,
        pet_mask=None,
        deterministic: bool = True,
    ):
        if ct_tokens is None and pet_tokens is None:
            raise ValueError("at least one modality must be provided")
        p = self.policy
        d = self.input_dim

        cls_ct = self.param("cls_token_ct", nn.initializers.normal(1.0),
                            (1, 1, d), p.param_dtype)
        cls_pet = self.param("cls_token_pet", nn.initializers.normal(1.0),
                             (1, 1, d), p.param_dtype)

        # reference MLPLayer fixes its own dropout at 0.1
        # (models_archs.py:186); min() keeps that at the 0.5-encoder
        # default while letting dropout_rate=0.0 disable everything
        head_rate = min(self.dropout_rate, 0.1)
        head_ct = _MLPHead(d * 2, self.num_classes, p,
                           dropout_rate=head_rate, name="classifier_ct")
        head_pet = _MLPHead(d * 2, self.num_classes, p,
                            dropout_rate=head_rate, name="classifier_pet")

        x_ct = x_pet = None
        if ct_tokens is not None:
            x, m = _prepend_cls(p.cast_input(ct_tokens), ct_mask, cls_ct)
            if self.seq_mesh is not None:
                x, m = self._ring_pad(x, m)
            x = nn.LayerNorm(dtype=p.compute_dtype, param_dtype=p.param_dtype,
                             epsilon=1e-5, name="norm_ct")(x)
            x_ct = _Encoder(d, self.num_heads_ct, self.ffn_dim_ct,
                            self.num_layers_ct, p, self.dropout_rate,
                            seq_mesh=self.seq_mesh,
                            name="encoder_ct")(x, m, deterministic)
            ct_mask_full = m
        if pet_tokens is not None:
            x, m = _prepend_cls(p.cast_input(pet_tokens), pet_mask, cls_pet)
            if self.seq_mesh is not None:
                x, m = self._ring_pad(x, m)
            x = nn.LayerNorm(dtype=p.compute_dtype, param_dtype=p.param_dtype,
                             epsilon=1e-5, name="norm_pet")(x)
            x_pet = _Encoder(d, self.num_heads_pet, self.ffn_dim_pet,
                             self.num_layers_pet, p, self.dropout_rate,
                             seq_mesh=self.seq_mesh,
                             name="encoder_pet")(x, m, deterministic)
            pet_mask_full = m

        if x_ct is not None and x_pet is not None:
            # bidirectional cross-attention; CLS read-out from position 0
            # (ref models_archs.py:100-104; note num_heads_ct for both,
            # matching :72-73).  Under seq_mesh only the CLS row queries
            # (identical math — position 0 is the only output consumed;
            # K/V stay sequence-sharded, parallel/ring_attention.py::
            # cross_attention_kv_sharded)
            q_ct = x_ct[:, :1] if self.seq_mesh is not None else x_ct
            q_pet = x_pet[:, :1] if self.seq_mesh is not None else x_pet
            x_ct_attn = MultiHeadAttention(
                d, self.num_heads_ct, p, seq_mesh=self.seq_mesh,
                name="cross_attention_ct"
            )(q_ct, x_pet, x_pet, key_padding_mask=pet_mask_full)
            x_pet_attn = MultiHeadAttention(
                d, self.num_heads_ct, p, seq_mesh=self.seq_mesh,
                name="cross_attention_pet"
            )(q_pet, x_ct, x_ct, key_padding_mask=ct_mask_full)
            ct_cls = x_ct_attn[:, 0]
            pet_cls = x_pet_attn[:, 0]

            logits_ct = head_ct(ct_cls, deterministic)
            logits_pet = head_pet(pet_cls, deterministic)

            joint = jnp.concatenate([ct_cls, pet_cls], axis=-1)
            joint = _MLPHead(d, d, p, dropout_rate=head_rate,
                             name="projection_petct")(
                joint, deterministic
            )
            logits_joint = _MLPHead(d * 2, self.num_classes, p,
                                    dropout_rate=head_rate,
                                    name="classifier_petct")(
                joint, deterministic
            )
            petct_cls = joint
        elif x_ct is not None:
            ct_cls = x_ct[:, 0]
            logits_ct = head_ct(ct_cls, deterministic)
            logits_pet = logits_ct
            logits_joint = logits_ct
            petct_cls = ct_cls
        else:
            pet_cls = x_pet[:, 0]
            logits_pet = head_pet(pet_cls, deterministic)
            logits_ct = logits_pet
            logits_joint = logits_pet
            petct_cls = pet_cls

        cast = self.policy.cast_output
        return (cast(logits_joint), cast(petct_cls),
                cast(logits_ct), cast(logits_pet))


class _SELayer(nn.Module):
    """3D squeeze-excite, reduction 16, bias-free (models_archs.py:203-216)."""

    channels: int
    policy: Policy
    reduction: int = 16

    @nn.compact
    def __call__(self, x, valid_mask=None):  # (B, S, H, W, C)
        dt = self.policy.compute_dtype
        y = _masked_gap(x, valid_mask).astype(dt)
        y = nn.Dense(max(1, self.channels // self.reduction), use_bias=False,
                     dtype=dt, param_dtype=self.policy.param_dtype,
                     name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=dt,
                     param_dtype=self.policy.param_dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, None, :]


def _masked_gap(x, valid_mask):
    """Global average pool over (S, H, W), ignoring padded voxels.

    ``valid_mask`` is (B, S, H, W) (or None = all valid); padding-aware
    pooling keeps batched conv volumes equivalent to the reference's
    per-item adaptive_avg_pool3d (models_archs.py:167, 206).
    """
    xf = x.astype(jnp.float32)
    if valid_mask is None:
        return jnp.mean(xf, axis=(1, 2, 3))
    m = valid_mask.astype(jnp.float32)[..., None]
    total = jnp.sum(xf * m, axis=(1, 2, 3))
    count = jnp.maximum(jnp.sum(m, axis=(1, 2, 3)), 1.0)
    return total / count


class ConvNoduleClassifier(nn.Module):
    """3D conv + SE classifier over masked feature volumes.

    Ref: models_archs.py:150-171.  Input here is channels-last
    (B, S, H, W, feat_dim) — the transpose-to-channels-first dance of the
    reference (train_models.py:159) is unnecessary on TPU — and an
    optional ``valid_mask`` (B, S, H, W) makes padded batches pool
    correctly (note the 3×3×3 convs still see one voxel of pad bleed at
    the boundary, which the mask cannot remove).
    """

    input_dim: int
    num_classes: int
    div: int = 2
    policy: Policy = FAST

    @nn.compact
    def __call__(self, x, valid_mask=None, deterministic: bool = True):
        p = self.policy
        dt = p.compute_dtype
        x = p.cast_input(x)
        c1 = self.input_dim // self.div
        c2 = self.input_dim // (self.div * self.div)
        x = nn.Conv(c1, (3, 3, 3), padding=1, dtype=dt,
                    param_dtype=p.param_dtype, name="conv1")(x)
        x = jax.nn.relu(x)
        x = _SELayer(c1, p, name="se1")(x, valid_mask)
        x = nn.Conv(c2, (3, 3, 3), padding=1, dtype=dt,
                    param_dtype=p.param_dtype, name="conv2")(x)
        x = jax.nn.relu(x)
        x = _SELayer(c2, p, name="se2")(x, valid_mask)
        x = _masked_gap(x, valid_mask).astype(dt)
        x = nn.Dense(self.input_dim, dtype=dt, param_dtype=p.param_dtype,
                     name="fc1")(x)
        embedding = jax.nn.relu(x)
        logits = _MLPHead(self.input_dim * 2, self.num_classes, p,
                          name="head")(embedding, deterministic)
        return p.cast_output(logits), p.cast_output(embedding)


def build_classifier(
    cfg: dict, arch: str, modality: str,
    modality_a: str = "pet", modality_b: str = "ct",
    num_classes: int = 2, policy: Policy = FAST,
    seq_mesh=None,
):
    """Instantiate a classifier from the merged config tree.

    Mirrors reference ``build_model`` (train_models.py:455-486): bimodal
    for petct/petchest, conv or unimodal transformer otherwise.
    ``seq_mesh`` (transformer archs) turns on whole-volume sequence
    parallelism: ring attention in the encoders and, for the bimodal
    family, CLS-query cross-attention over sequence-sharded K/V.
    """
    cfg_model = cfg["models"][arch]
    feature_dim = cfg_model["feature_dim"]
    if modality in ("petct", "petchest"):
        mb, ma = cfg_model[modality_b], cfg_model[modality_a]
        return TransformerNoduleBimodalClassifier(
            input_dim=feature_dim,
            ffn_dim_ct=int(mb["mlp_ratio"] * feature_dim),
            ffn_dim_pet=int(ma["mlp_ratio"] * feature_dim),
            num_heads_ct=mb["num_heads"],
            num_heads_pet=ma["num_heads"],
            num_layers_ct=mb["num_layers"],
            num_layers_pet=ma["num_layers"],
            num_classes=num_classes,
            policy=policy,
            seq_mesh=seq_mesh,
        )
    if arch == "conv":
        return ConvNoduleClassifier(
            input_dim=feature_dim,
            num_classes=num_classes,
            div=cfg_model[modality]["div"],
            policy=policy,
        )
    m = cfg_model[modality]
    return TransformerNoduleClassifier(
        input_dim=feature_dim,
        ffn_dim=int(m["mlp_ratio"] * feature_dim),
        num_heads=m["num_heads"],
        num_classes=num_classes,
        num_layers=m["num_layers"],
        policy=policy,
        seq_mesh=seq_mesh,
    )
