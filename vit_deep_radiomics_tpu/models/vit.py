"""Dense-descriptor ViT backbones: SAM/MedSAM ViT-B/16 and DINOv2 ViT-*/14.

The reference extracts frozen-ViT dense descriptors through external
libraries (``sam_model_registry['vit_b']`` at
/root/reference/src/tfds_dense_descriptor.py:104 → ``model.image_encoder``
at :123, and torch.hub DINOv2 at :87 → ``model.patch_embed`` at :128).
Here the backbones are first-class Flax modules designed for TPU:

* NHWC layout throughout (TPU-native conv layout); the patch embedding is
  a pure reshape+matmul so it lands on the MXU without a conv lowering,
* attention runs the fused-QKV Pallas kernels (ops/attention.py): the
  kernel reads per-head q/k/v straight out of the QKV projection output
  via BlockSpec index maps and writes projection-ready tokens — no
  slice/transpose/pad relayouts at the XLA level.  Windowed layers run
  UNPADDED 196-token windows (one window per grid step, single-pass
  softmax); global layers run 4096-token online-softmax flash with the
  full decomposed relative-position row bias riding the QK contraction's
  idle lanes.  Both take the bias PAIR-MERGED, (B, H/pair, S, pair·K) —
  the natural output of a block-diagonal-table einsum — so no
  narrow-minor-dim relayout is ever materialised,
* precision is governed by :class:`~..core.precision.Policy`: ``parity``
  (fp32, HIGHEST matmul precision) reproduces the reference encoder
  bit-for-bit given converted weights; ``fast`` (bf16) is the production
  path,
* everything is shape-static and jit/pjit friendly; batch dim shards over
  the ``data`` mesh axis.

Architecture specs follow the published SAM image encoder (ViT-B/16,
1024² input, window 14, global attention at layers {2,5,8,11}, decomposed
rel-pos, 256-channel conv neck) and DINOv2 (ViT-{S,B,L,G}/14, CLS token,
LayerScale).  Weight converters from ``.pth`` checkpoints live in
:mod:`vit_deep_radiomics_tpu.models.convert`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.precision import FAST, Policy
from ..ops.attention import (
    attention_reference,
    flash_attention,
    flash_attention_fused_qkv,
)
from ..ops.mlp_fused import fused_ln_mlp_residual
from ..ops.quant import int8_dot, int8_dot_prequant, quantize_rows


def _policy_dot(x, kernel, bias, *, quant: bool, dtype, x_q=None):
    """Policy-dispatched ``x @ kernel + bias`` (fp32 accumulator).

    ``quant`` routes through the dynamic-int8 matmuls (ops/quant.py) on
    the frozen inference path; otherwise a float matmul in the policy's
    compute dtype.  Bias is added in fp32 on both paths and the caller
    casts the result down.  ``x_q`` optionally carries a pre-quantized
    ``(int8, scale)`` pair from :func:`quantize_rows` so one activation
    quantization can feed several matmuls (the split q/kv projections).
    """
    if quant:
        out = (int8_dot(x, kernel) if x_q is None
               else int8_dot_prequant(x_q, kernel))
    else:
        out = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                      preferred_element_type=jnp.float32)
    return out + bias.astype(jnp.float32)

__all__ = ["ViTDenseConfig", "ViTDense", "SAM_VIT_B", "DINOV2_CONFIGS"]


@dataclasses.dataclass(frozen=True)
class ViTDenseConfig:
    """Static architecture config for a dense-descriptor ViT."""

    name: str
    image_size: int
    patch_size: int
    width: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0               # 0 = all-global attention
    global_indexes: Sequence[int] = ()
    use_rel_pos: bool = False          # SAM decomposed relative positions
    neck_channels: int = 0             # SAM conv neck output dim (0 = none)
    use_cls_token: bool = False        # DINOv2
    layerscale_init: float = 0.0       # DINOv2 LayerScale (0 = disabled)
    ln_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads

    @property
    def feature_dim(self) -> int:
        """Channel count of the dense descriptor this backbone emits."""
        return self.neck_channels or self.width


# MedSAM image encoder: SAM ViT-B/16 @1024 with 256-ch neck
# (capability target of tfds_dense_descriptor.py:93-107, 123).
SAM_VIT_B = ViTDenseConfig(
    name="sam_vit_b",
    image_size=1024,
    patch_size=16,
    width=768,
    depth=12,
    num_heads=12,
    mlp_ratio=4.0,
    window_size=14,
    global_indexes=(2, 5, 8, 11),
    use_rel_pos=True,
    neck_channels=256,
)

# DINOv2 family (tfds_dense_descriptor.py:80-86); default image size 518
# (37×37 patches), the reference resizes to 896 for its patch-embed-only
# dense mode (:44).
def _dinov2(name, width, depth, heads, image_size=518):
    return ViTDenseConfig(
        name=name,
        image_size=image_size,
        patch_size=14,
        width=width,
        depth=depth,
        num_heads=heads,
        use_cls_token=True,
        layerscale_init=1e-5,
    )


DINOV2_CONFIGS = {
    "dinov2_vits14": _dinov2("dinov2_vits14", 384, 12, 6),
    "dinov2_vitb14": _dinov2("dinov2_vitb14", 768, 12, 12),
    "dinov2_vitl14": _dinov2("dinov2_vitl14", 1024, 24, 16),
    "dinov2_vitg14": _dinov2("dinov2_vitg14", 1536, 40, 24),
}


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------


class PatchEmbed(nn.Module):
    """Patch embedding as reshape + matmul (MXU-direct, no conv lowering).

    Equivalent to a stride-p pxp conv; weight layout (p*p*in, width) with
    (kh, kw, cin) flattening order — see convert.py for the torch mapping.
    """

    cfg: ViTDenseConfig
    policy: Policy

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # (B, H, W, 3)
        p = self.cfg.patch_size
        b, hh, ww, cin = x.shape
        hp, wp = hh // p, ww // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p * p * cin, self.cfg.width),
            self.policy.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.cfg.width,),
            self.policy.param_dtype,
        )
        x = x.reshape(b, hp, p, wp, p, cin).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hp, wp, p * p * cin)
        x = jnp.dot(
            x.astype(self.policy.compute_dtype),
            kernel.astype(self.policy.compute_dtype),
            preferred_element_type=jnp.float32,
        ) + bias.astype(jnp.float32)
        return x.astype(self.policy.compute_dtype)  # (B, hp, wp, width)


def _pick_block_k(sq_pad: int, cap: int) -> int:
    """Largest kv-tile length ≤ *cap* that divides *sq_pad* and is a
    lane multiple (128).

    Not just powers of two: ViT-L@518 pads to 1536 tokens, where the
    best legal tile is 1536 itself (single kv step — measured 2× vs
    square 512 blocks); a pow2-only search regressed it to 512
    (round-2 ADVICE fix fallout, re-fixed here).
    """
    for div in range(1, sq_pad // 128 + 1):
        if sq_pad % div == 0:
            bk = sq_pad // div
            if bk <= cap and bk % 128 == 0:
                return bk
    return 128


def _q_blocking(s: int) -> tuple[int, int]:
    """(padded len, block) trading padding against grid-step count.

    Attention work grows with padded², but every (q, kv) grid step also
    pays a fixed dispatch/DMA overhead, so tiny blocks with minimal
    padding lose to bigger blocks with a little padding (measured:
    ViT-L@518's 1370 tokens run ~2× faster at (1536, 512) than at the
    minimal-padding (1408, 128)).
    Score = padded² · (1 + per-step overhead · steps).

    e.g. 196 → (256, 256); 1370 → (1536, 512); 4096 → (4096, 512).
    """
    best = None
    for blk in (1024, 512, 256, 128):
        padded = -(-s // blk) * blk
        steps = (padded // blk) ** 2
        score = padded * padded * (1 + 0.05 * steps)
        if best is None or score < best[0]:
            best = (score, padded, blk)
    return best[1], best[2]


def _rel_pos_table(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """Gather the (q_size, k_size, D) table from a (2·max-1, D) parameter.

    Equal q/k sizes only (all our uses); entry [qi, ki] = rel_pos[qi - ki
    + k_size - 1] per the SAM decomposed rel-pos spec.
    """
    qi = jnp.arange(q_size)[:, None]
    ki = jnp.arange(k_size)[None, :]
    return rel_pos[qi - ki + k_size - 1]  # (q, k, D)


class WindowedAttention(nn.Module):
    """Multi-head attention over a (B, H, W, C) token grid.

    The default TPU path is the fused-QKV Pallas kernel (see
    ``_fused_variant``): q/k/v stay inside the QKV-projection output and
    the kernel emits projection-ready tokens, so the XLA graph around it
    is nothing but the three matmuls and two small bias einsums.  Grids
    the fused kernels cannot tile (odd head layouts, oversized rel-pos
    grids) fall back to the padded ``flash_attention`` path;
    ``use_flash=False`` falls back to the XLA oracle (used on CPU and in
    parity tests).
    """

    cfg: ViTDenseConfig
    policy: Policy
    use_flash: bool = True
    window_group: int = 1   # independent windows batched per kernel block
    trainable: bool = False  # route through the custom-VJP flash kernels
    # Debug probe: route through the XLA oracle and sow the max |scaled
    # logit| per layer ("intermediates"/"max_abs_logit") — turns the
    # nomax-softmax safety precondition (|logit| < 127/log2e ≈ 88 nats,
    # _fused_global_kernel docstring) into a measured number.  Used by
    # the ViT parity tests and `bench.py nomax`.
    collect_logit_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        b, h, w, c = x.shape
        nh, hd = cfg.num_heads, cfg.head_dim
        dtype = self.policy.compute_dtype

        qkv_kernel = self.param(
            "qkv_kernel", nn.initializers.lecun_normal(), (c, 3 * c),
            self.policy.param_dtype,
        )
        qkv_bias = self.param(
            "qkv_bias", nn.initializers.zeros, (3 * c,),
            self.policy.param_dtype,
        )
        proj_kernel = self.param(
            "proj_kernel", nn.initializers.lecun_normal(), (c, c),
            self.policy.param_dtype,
        )
        proj_bias = self.param(
            "proj_bias", nn.initializers.zeros, (c,), self.policy.param_dtype
        )

        tokens = x.reshape(b, h * w, c).astype(dtype)
        # dynamic-int8 projections (ops/quant.py) on the frozen inference
        # path only: round() has no useful gradient, so trainable blocks
        # keep the policy's float matmuls
        quant = self.policy.quantized and not self.trainable
        fused_variant = self._fused_variant(h, w)
        # Trainable layers on the bf16 fast path take the fused layout
        # end to end: WINDOW layers run the fused window kernel forward
        # (max softmax) + the single-pass window backward
        # (ops/attention_grad.py::window_attention_trainable); GLOBAL
        # and NOBIAS layers run the pair-grouped trainable twin of the
        # inference kernel (global_attention_trainable: bias folded into
        # the QK contraction's idle lanes, skew issue order, fp32 score
        # recompute in the backward).  The generic (b, nh, s, hd) path
        # costs per-head relayouts + fp32 per-head bias einsums —
        # measured ~20× the inference window cost — and its 12-head
        # static loop no longer compiles at SAM-global block sizes on
        # the current backend (79 MB register spill).  Parity-precision
        # (fp32) training keeps the generic two-kernel path for the
        # fp32 cross-arm trajectory-equality tests.
        fused_trainable = (
            self.trainable
            and fused_variant in ("window", "global", "nobias")
            and self.policy.compute_dtype == jnp.bfloat16
        )
        use_fused = (
            self.use_flash and not self.collect_logit_stats
            and (
                fused_variant is not None if not self.trainable
                else fused_trainable
            )
        )
        if use_fused:
            # split projection: q and kv as SEPARATE matmuls (same total
            # FLOPs) so the bias einsum reads the q section with uniform
            # strides — a packed (b, hw, 3c) output forces XLA to
            # materialise a 25 MB slice copy of the q section per layer
            tok_q = quantize_rows(tokens) if quant else None
            q_arr = _policy_dot(tokens, qkv_kernel[:, : c], qkv_bias[: c],
                                quant=quant, dtype=dtype, x_q=tok_q)
            kv_arr = _policy_dot(tokens, qkv_kernel[:, c:], qkv_bias[c:],
                                 quant=quant, dtype=dtype, x_q=tok_q)
            qkv = (q_arr.astype(dtype), kv_arr.astype(dtype))
        else:
            qkv = _policy_dot(tokens, qkv_kernel, qkv_bias,
                              quant=quant, dtype=dtype)
            qkv = qkv.astype(dtype)                   # (b, hw, 3c)

        if cfg.use_rel_pos:
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * h - 1, hd),
                self.policy.param_dtype,
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * w - 1, hd),
                self.policy.param_dtype,
            )
        else:
            rel_h = rel_w = None

        # Flash is the default for every grid size: the XLA batched
        # fallback runs windowed (196-token) grids ~15% faster but costs
        # a pathological 300-400s XLA/AOT compile at SAM scale on this
        # stack — measured, not worth it.  use_flash=False remains the
        # parity-oracle path for tests.
        if use_fused:
            # fused-QKV path: the Pallas kernel reads per-head q/k/v
            # straight out of `qkv` via index maps and emits proj-ready
            # (b, hw, c) — no slice/transpose/pad relayouts at all
            out = self._fused_qkv(qkv, h, w, rel_h, rel_w)
            out = _policy_dot(out, proj_kernel, proj_bias,
                              quant=quant, dtype=dtype)
            return out.astype(dtype).reshape(b, h, w, c)

        qkv5 = qkv.reshape(b, h * w, 3, nh, hd)
        q, k, v = (
            qkv5[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
        )  # each (b, nh, hw, hd)

        if cfg.use_rel_pos:
            # bias_h[b,n,(qy,qx),ky] = q · Rh[qy, ky] — from the UNSCALED q
            # (the softmax scale applies to the QK scores only, per the
            # SAM decomposed-rel-pos spec).  Computed in the policy's
            # compute dtype (bf16 fast path) with fp32 accumulation.
            rh = _rel_pos_table(rel_h.astype(dtype), h, h)  # (h, h, hd)
            rw = _rel_pos_table(rel_w.astype(dtype), w, w)
            qg = q.reshape(b, nh, h, w, hd).astype(dtype)
            bias_h = jnp.einsum("bnyxd,ykd->bnyxk", qg, rh,
                                preferred_element_type=jnp.float32)
            bias_w = jnp.einsum("bnyxd,xkd->bnyxk", qg, rw,
                                preferred_element_type=jnp.float32)
            bias_h = bias_h.reshape(b, nh, h * w, h)
            bias_w = bias_w.reshape(b, nh, h * w, w)
        else:
            bias_h = bias_w = None

        if self.trainable and self.use_flash and not self.collect_logit_stats:
            # fine-tuning path: the custom-VJP flash kernels — windowed
            # layers are just small per-window "global" attentions here
            # (the partition puts windows on the batch axis, so
            # Kh·Kw == S per entry)
            out = self._trainable_flash(q, k, v, bias_h, bias_w)
        elif self.use_flash and not self.collect_logit_stats:
            out = self._flash(q, k, v, bias_h, bias_w, h, w)
        else:
            if bias_h is not None:
                # materialised per-window bias is small; keep it in the
                # compute dtype to halve the transient on the fast path
                dense = (
                    bias_h[..., :, None] + bias_w[..., None, :]
                ).reshape(b, nh, h * w, h * w).astype(dtype)
            else:
                dense = None
            if self.collect_logit_stats:
                # fp32 max |scaled logit| INCLUDING the rel-pos bias —
                # the exact quantity the nomax exp2 overflow bound
                # constrains (ops/attention.py::_fused_global_kernel)
                s = jnp.einsum(
                    "bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ) * (hd ** -0.5)
                if dense is not None:
                    s = s + dense.astype(jnp.float32)
                self.sow("intermediates", "max_abs_logit",
                         jnp.max(jnp.abs(s)))
            out = attention_reference(q, k, v, bias=dense)

        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = _policy_dot(out, proj_kernel, proj_bias,
                          quant=quant, dtype=dtype)
        return out.astype(dtype).reshape(b, h, w, c)

    def _fused_variant(self, h: int, w: int) -> str | None:
        """Which fused-QKV kernel mode fits this token grid, if any.

        * ``window`` — rel-pos grids of ≤1024 tokens (SAM's 14×14 windowed
          layers): groups of ``window_group`` windows run block-diagonally
          and UNPADDED in one kernel block.
        * ``global`` — rel-pos grids whose token count divides into
          tile-friendly blocks (SAM's 64×64 global layers).
        * ``nobias`` — plain global attention (DINOv2), padded via kv_len.
        """
        from ..ops.attention import _head_group

        if _head_group(self.cfg.num_heads, self.cfg.head_dim) is None:
            return None
        s = h * w
        if self.cfg.use_rel_pos:
            if s <= 1024:
                return "window"
            if any(s % blk == 0 and blk % w == 0
                   for blk in (1024, 512, 256, 128)):
                return "global"
            return None
        return "nobias"

    def _fused_qkv(self, qkv, h, w, rel_h, rel_w):
        """Run the fused-QKV Pallas kernel; returns (b, h·w, c) tokens.
        ``qkv`` is the split-projection pair (q (b,s,c), kv (b,s,2c))."""
        cfg = self.cfg
        nh, hd = cfg.num_heads, cfg.head_dim
        b, s, _ = qkv[0].shape
        dtype = qkv[0].dtype
        interpret = jax.default_backend() != "tpu"
        variant = self._fused_variant(h, w)

        if variant in ("window", "global"):
            from ..ops.attention import _head_group

            pair = _head_group(nh, hd)
            hp = nh // pair
            rh = _rel_pos_table(rel_h.astype(dtype), h, h)  # (h, h, hd)
            rw = _rel_pos_table(rel_w.astype(dtype), w, w)

            # Pair-merged bias einsum: a block-diagonal table pairs the
            # 128/hd heads of a lane group along the K axis, so the
            # einsum emits a (…, pair·K)-minor array — full(er) lane rows
            # end to end.  byxpK is the einsum's NATURAL output order, so
            # the only relayout left is the head-pair-major transpose,
            # which moves MAJOR dims with the minor dim intact — unlike
            # the old per-head-K-minor transposes, which relaid narrow
            # (e.g. 14-lane) tiles at ~9× memory bloat (measured ~2 ms of
            # the 45 ms forward as pure data formatting).
            def pair_diag(t, k):
                # eye-broadcast instead of zeros + per-pair update-slices:
                # one fused multiply, no dynamic-update-slice passes
                eye = jnp.eye(pair, dtype=dtype)
                t2 = eye[None, :, None, :, None] * t[:, None, :, None, :]
                return t2.reshape(t.shape[0], pair * k, pair * hd)

            qg2 = qkv[0].reshape(b, h, w, hp, pair * hd)
            bias_h = jnp.einsum("byxpD,yKD->byxpK", qg2, pair_diag(rh, h))
            bias_w = jnp.einsum("byxpD,xKD->byxpK", qg2, pair_diag(rw, w))
            bias_h = bias_h.reshape(b, s, hp, pair * h)
            bias_w = bias_w.reshape(b, s, hp, pair * w)

        if variant == "window":
            # `group` windows per kernel step by folding window-batch
            # rows into the token axis (free reshapes).  That squares the
            # block, so cross-window score waste (x4 at group 2) beats
            # the dispatch it saves — measured slower; default stays 1.
            # `window_batch` instead batches windows on the LEADING block
            # dim: the kernel statically loops per window (zero waste),
            # amortising per-grid-step dispatch + one-hot builds.
            group = self.window_group if not self.trainable else 1
            while group > 1 and b % group:
                group //= 2
            if group > 1:
                qkv = tuple(
                    a.reshape(b // group, group * s, a.shape[-1])
                    for a in qkv
                )
                bias_h = bias_h.reshape(b // group, group * s, hp, pair * h)
                bias_w = bias_w.reshape(b // group, group * s, hp, pair * w)
            gsz = int(os.environ.get("VDR_WINDOW_BATCH", "8")) \
                if group == 1 else 1
            if gsz < 1:
                raise ValueError(
                    f"VDR_WINDOW_BATCH must be >= 1, got {gsz}")
            while gsz > 1 and (b // group) % gsz:
                gsz //= 2
            if self.trainable:
                from ..ops.attention_grad import window_attention_trainable

                out = window_attention_trainable(
                    qkv[0], qkv[1],
                    bias_h=bias_h.transpose(0, 2, 1, 3),
                    bias_w=bias_w.transpose(0, 2, 1, 3),
                    num_heads=nh,
                    window_tokens=s,
                    window_batch=gsz,
                    interpret=interpret,
                )
                return out
            out = flash_attention_fused_qkv(
                qkv,
                bias_h=bias_h.transpose(0, 2, 1, 3),
                bias_w=bias_w.transpose(0, 2, 1, 3),
                num_heads=nh,
                window_tokens=s,
                window_batch=gsz,
                block_q=group * s,
                block_k=group * s,
                interpret=interpret,
            )
            return out.reshape(b, s, nh * hd)

        if variant == "global":
            if self.trainable:
                from ..ops.attention_grad import global_attention_trainable

                # 1024² tiles: the backward's fp32 score/p/dp/ds
                # transients (4 × 4 MB per head slot, 2 slots in flight
                # under skew) fit the 64 MB scoped VMEM; bigger kv tiles
                # spill (VDR_FGT_BLOCK_Q/K are the one-shot A/B knobs).
                # B≥16 auto-degrades to 512² — the backend refused the
                # 1024² program at that batch (VERDICT r4 item 5); the
                # finetune bench's batch curve records which tier ran.
                blk_default = 1024 if b < 16 else 512
                return global_attention_trainable(
                    qkv[0], qkv[1],
                    bias_h=bias_h.transpose(0, 2, 1, 3),
                    bias_w=bias_w.transpose(0, 2, 1, 3),
                    num_heads=nh,
                    block_q=int(os.environ.get(
                        "VDR_FGT_BLOCK_Q", str(blk_default))),
                    block_k=int(os.environ.get(
                        "VDR_FGT_BLOCK_K", str(blk_default))),
                    interpret=interpret,
                    # trace-time knob: drop the forward's max machinery
                    # (backward only needs the lse residual, which nomax
                    # still emits) — A/B'd by `bench.py finetune`
                    nomax=os.environ.get("VDR_FGT_NOMAX", "0") == "1",
                )
            bk_cap = int(os.environ.get("VDR_FLASH_BLOCK_K", "2048"))
            block_k = next(
                (blk for blk in (bk_cap, 2048, 1024, 512, 256, 128)
                 if blk <= bk_cap and s % blk == 0 and blk % w == 0),
                None,
            )
            if block_k is None:
                raise ValueError(
                    f"VDR_FLASH_BLOCK_K={bk_cap} admits no kv block that "
                    f"divides s={s} and is a multiple of {w}; unset it or "
                    f"pick a valid multiple"
                )
            # (1024, 2048) blocks + skew schedule, under the raised
            # 64 MB kernel VMEM limit (pltpu.CompilerParams in
            # attention.py): measured 100-101 img/s vs 98.2 for the old
            # (512, 2048)+base — bigger q tiles amortise the kv DMA and
            # skew keeps an independent score matmul in flight under
            # every softmax chain.  twolevel@1024 (92.3) and bq2048
            # (96.1) measured worse; env knobs keep A/Bs one-shot.
            bq_cap = int(os.environ.get("VDR_FLASH_BLOCK_Q", "1024"))
            block_q = min(bq_cap, block_k) if s % min(bq_cap, block_k) == 0 \
                else block_k
            return flash_attention_fused_qkv(
                qkv,
                bias_h=bias_h.transpose(0, 2, 1, 3),
                bias_w=bias_w.transpose(0, 2, 1, 3),
                num_heads=nh,
                block_q=block_q,
                block_k=block_k,
                schedule=os.environ.get("VDR_FLASH_SCHEDULE", "skew"),
                interpret=interpret,
            )

        # nobias: pad the token axis to a tile-friendly block multiple and
        # mask the pads with kv_len (DINOv2's 1370 tokens → 1536)
        sq_pad, bq = _q_blocking(s)
        kv_len = None
        if sq_pad != s:
            qkv = tuple(
                jnp.pad(a, ((0, 0), (0, sq_pad - s), (0, 0))) for a in qkv
            )
            kv_len = jnp.full((b,), s, jnp.int32)
        if self.trainable:
            from ..ops.attention_grad import global_attention_trainable

            out = global_attention_trainable(
                qkv[0], qkv[1], kv_len=kv_len, num_heads=nh,
                block_q=min(bq, 512),
                block_k=_pick_block_k(sq_pad, 1024),
                interpret=interpret,
            )
            return out[:, :s]
        # kv tiles as wide as VMEM allows (the (block_q, block_k) fp32
        # score transient is the limit): fewer grid steps per q block —
        # measured 2x on ViT-L@518's 1536-padded tokens vs square 512
        # blocks.  Must divide sq_pad (1536/3072 pads) and be a lane
        # multiple; _pick_block_k searches ALL such divisors, not just
        # powers of two (1536 → 1536, not 512).
        block_k = _pick_block_k(sq_pad, 2048)
        out = flash_attention_fused_qkv(
            qkv, kv_len=kv_len, num_heads=nh,
            block_q=min(bq, 512), block_k=block_k, interpret=interpret,
        )
        return out[:, :s]

    def _trainable_flash(self, q, k, v, bias_h, bias_w):
        """Differentiable flash attention (ops/attention_grad.py)."""
        from ..ops.attention_grad import flash_attention_trainable

        b, nh, s, hd = q.shape
        interpret = jax.default_backend() != "tpu"
        if bias_h is not None:
            # key tiles stay whole key-grid rows; small (window) grids
            # take the single-tile path.  Large (global) grids: 512²
            # tiles — the current backend's register allocator spills
            # ~79 MB on the 12-head static loop at the former 1024/2048
            # defaults and refuses to compile (the bf16 fast path now
            # runs the pair-grouped global_attention_trainable instead;
            # this generic path serves fp32 parity training).
            # VDR_TRAIN_BLOCK_Q/K are the one-shot A/B knobs.
            bq = s if s <= 1024 else int(
                os.environ.get("VDR_TRAIN_BLOCK_Q", "512"))
            bk = s if s <= 1024 else int(
                os.environ.get("VDR_TRAIN_BLOCK_K", "512"))
            bq, bk = min(bq, s), min(bk, s)
            return flash_attention_trainable(
                q, k, v, bias_h=bias_h, bias_w=bias_w,
                block_q=bq, block_k=bk, interpret=interpret,
            )
        sq_pad, bq = _q_blocking(s)
        kv_len = None
        if sq_pad != s:
            pad = ((0, 0), (0, 0), (0, sq_pad - s), (0, 0))
            q = jnp.pad(q, pad)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
            kv_len = jnp.full((b,), s, jnp.int32)
        # block_k must divide sq_pad (1370 tokens pad to 1536, which a
        # raw min(1024, ·) cap does not divide); all ×128 divisors are
        # candidates (1536 → 768, not 512)
        block_k = _pick_block_k(sq_pad, 1024)
        out = flash_attention_trainable(
            q, k, v, kv_len=kv_len,
            block_q=min(bq, 512), block_k=block_k,
            interpret=interpret,
        )
        return out[:, :, :s]

    def _flash(self, q, k, v, bias_h, bias_w, h, w):
        """Pad token count / key grid to tiling-friendly sizes and run the
        Pallas kernel."""
        b, nh, s, hd = q.shape
        # Pallas compiles via Mosaic only on TPU; elsewhere (CPU tests)
        # run the same kernel in interpreter mode.
        interpret = jax.default_backend() != "tpu"

        def pad_to(x, size, axis):
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, size - x.shape[axis])
            return jnp.pad(x, pad) if size != x.shape[axis] else x

        def next_pow2(n):
            return 1 << (n - 1).bit_length()

        if bias_h is not None:
            # pad key grid: rows to a multiple of 8, cols to a power of two
            # so block_k can stay a tile-friendly multiple of the grid width
            hp = -(-h // 8) * 8
            wp = max(8, next_pow2(w))
            sq_pad, bq = _q_blocking(s)
            sk_pad = hp * wp
            qp = pad_to(q, sq_pad, 2)
            kp = pad_to(
                k.reshape(b, nh, h, w, hd), hp, 2
            )
            kp = pad_to(kp, wp, 3).reshape(b, nh, sk_pad, hd)
            vp = pad_to(
                v.reshape(b, nh, h, w, hd), hp, 2
            )
            vp = pad_to(vp, wp, 3).reshape(b, nh, sk_pad, hd)
            bh = pad_to(pad_to(bias_h, sq_pad, 2), hp, 3).astype(q.dtype)
            bw = pad_to(pad_to(bias_w, sq_pad, 2), wp, 3).astype(q.dtype)

            if (
                self.window_group > 1
                and sq_pad == sk_pad
                and sk_pad * self.window_group <= 1024
            ):
                # SMALL (windowed) grids are grid-step-overhead bound:
                # batch `window_group` independent windows into one
                # block-diagonal kernel block (window_tokens mode).
                out = self._flash_grouped(
                    qp, kp, vp, bh, bw, (h, w), sq_pad, interpret
                )
            else:
                out = flash_attention(
                    qp, kp, vp, bias_h=bh, bias_w=bw,
                    kv_grid=(h, w) if (hp, wp) != (h, w) else None,
                    block_q=bq,
                    block_k=min(1024, sk_pad),
                    interpret=interpret,
                )
            return out[:, :, :s].astype(q.dtype)

        sq_pad, bq = _q_blocking(s)
        qp = pad_to(q, sq_pad, 2)
        kv_len = None
        if sq_pad != s:
            kv_len = jnp.full((b,), s, jnp.int32)
            kp, vp = pad_to(k, sq_pad, 2), pad_to(v, sq_pad, 2)
        else:
            kp, vp = k, v
        out = flash_attention(
            qp, kp, vp, kv_len=kv_len,
            block_q=bq, block_k=bq,
            interpret=interpret,
        )
        return out[:, :, :s]

    def _flash_grouped(self, qp, kp, vp, bh, bw, grid_hw, win, interpret):
        """Batch `window_group` windows into one block-diagonal kernel
        block by grouping along the windows axis.  bias_h stays in its
        per-window (…, kh) layout: the kernel expands it window-locally
        and its block-diagonal kv_grid mask kills cross-window entries,
        so no host-side scatter is needed."""
        g = self.window_group
        b, nh, _, hd = qp.shape
        pad_b = (-b) % g

        def group(x):
            if pad_b:
                x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
            bb = x.shape[0] // g
            x = x.reshape(bb, g, nh, win, x.shape[-1])
            return x.transpose(0, 2, 1, 3, 4).reshape(bb, nh, g * win, -1)

        qg, kg, vg = group(qp), group(kp), group(vp)
        bhg = group(bh)          # (bb, nh, g*win, kh)
        bwg = group(bw)          # (bb, nh, g*win, kw)
        out = flash_attention(
            qg, kg, vg, bias_h=bhg, bias_w=bwg,
            kv_grid=grid_hw, window_tokens=win,
            block_q=g * win, block_k=g * win,
            interpret=interpret,
        )
        bb = qg.shape[0]
        out = out.reshape(bb, nh, g, win, hd).transpose(0, 2, 1, 3, 4)
        out = out.reshape(bb * g, nh, win, hd)
        return out[:b] if pad_b else out


class Mlp(nn.Module):
    cfg: ViTDenseConfig
    policy: Policy
    trainable: bool = False

    @nn.compact
    def __call__(self, x=None):
        c = self.cfg.width
        hidden = int(self.cfg.mlp_ratio * c)
        dtype = self.policy.compute_dtype
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (c, hidden),
            self.policy.param_dtype,
        )
        b1 = self.param("b1", nn.initializers.zeros, (hidden,),
                        self.policy.param_dtype)
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (hidden, c),
            self.policy.param_dtype,
        )
        b2 = self.param("b2", nn.initializers.zeros, (c,),
                        self.policy.param_dtype)
        if x is None:
            # param-only call: the fused LN→MLP→residual kernel path
            # (ops/mlp_fused.py) consumes the SAME param tree
            return w1, b1, w2, b2
        # dynamic-int8 matmuls on the frozen inference path only — like
        # the attention projections, trainable blocks keep float matmuls
        # (round() has no useful gradient)
        quant = self.policy.quantized and not self.trainable
        x = _policy_dot(x, w1, b1, quant=quant, dtype=dtype)
        # exact (erf) gelu in parity mode; tanh approximation on the bf16
        # fast path and straight off the dequantized int8 accumulator —
        # the difference is below bf16 resolution and the erf rational
        # approximation is a measurable VPU cost at SAM scale
        x = jax.nn.gelu(x, approximate=quant or dtype == jnp.bfloat16)
        x = _policy_dot(x, w2, b2, quant=quant, dtype=dtype)
        return x.astype(dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, fp32 statistics regardless of policy."""

    eps: float
    policy: Policy
    dim: int = 0   # required for the param-only call (x is None)

    @nn.compact
    def __call__(self, x=None):
        dim = self.dim if x is None else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,),
                           self.policy.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,),
                          self.policy.param_dtype)
        if x is None:
            return scale, bias
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def window_partition(x: jax.Array, window: int):
    """(B, H, W, C) → (B·nh·nw, window, window, C) with bottom/right pad."""
    b, h, w, c = x.shape
    ph = -(-h // window) * window
    pw = -(-w // window) * window
    x = jnp.pad(x, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))
    nh, nw = ph // window, pw // window
    x = x.reshape(b, nh, window, nw, window, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nh * nw, window, window, c), (h, w, ph, pw)


def window_unpartition(x: jax.Array, window: int, dims):
    h, w, ph, pw = dims
    nh, nw = ph // window, pw // window
    b = x.shape[0] // (nh * nw)
    c = x.shape[-1]
    x = x.reshape(b, nh, nw, window, window, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, ph, pw, c)[:, :h, :w]


class Block(nn.Module):
    cfg: ViTDenseConfig
    policy: Policy
    windowed: bool
    use_flash: bool
    trainable: bool = False
    fused_mlp: bool = True
    remat_mlp: bool = False   # selective remat: recompute only the MLP
    collect_logit_stats: bool = False  # see WindowedAttention

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        shortcut = x
        y = LayerNorm(cfg.ln_eps, self.policy, name="norm1")(x)
        if self.windowed:
            y, dims = window_partition(y, cfg.window_size)
        y = WindowedAttention(
            cfg, self.policy, use_flash=self.use_flash,
            trainable=self.trainable,
            collect_logit_stats=self.collect_logit_stats, name="attn"
        )(y)
        if self.windowed:
            y = window_unpartition(y, cfg.window_size, dims)
        if cfg.layerscale_init:
            g1 = self.param(
                "ls1",
                nn.initializers.constant(cfg.layerscale_init),
                (cfg.width,), self.policy.param_dtype,
            )
            y = y * g1.astype(y.dtype)
        x = shortcut + y

        shortcut = x
        norm2 = LayerNorm(cfg.ln_eps, self.policy, dim=cfg.width,
                          name="norm2")
        # selective remat (remat='mlp' on ViTDense): only the MLP's
        # (B, S, 4C) hidden activations are recomputed in the backward —
        # the dominant stored term at a fraction of block-remat's cost
        mlp_cls = nn.remat(Mlp) if self.remat_mlp else Mlp
        mlp = mlp_cls(cfg, self.policy, trainable=self.trainable,
                      name="mlp")
        g2 = None
        if cfg.layerscale_init:
            g2 = self.param(
                "ls2",
                nn.initializers.constant(cfg.layerscale_init),
                (cfg.width,), self.policy.param_dtype,
            )
        # Fused LN→MLP→residual Pallas kernel (ops/mlp_fused.py), OPT-IN
        # via VDR_FUSED_MLP=1.  Same param tree as the module path
        # (param-only calls below), so checkpoints are path-independent.
        # Default OFF since round 3: under the promoted nomax attention
        # the interleaved on-chip A/B reads the plain XLA modules 2.6%
        # FASTER than the kernel (112.5 vs 109.7 img/s @B4,
        # `bench.py mlpfuse`) — the round-2 +1 img/s kernel win inverted.
        # The trainable/parity/CPU paths always use the unfused modules.
        if (
            self.fused_mlp and not self.trainable and self.use_flash
            and self.policy.compute_dtype == jnp.bfloat16
            and not self.policy.quantized  # int8 path: quantized Mlp
            and os.environ.get("VDR_FUSED_MLP", "0") == "1"
        ):
            sc, bi = norm2(None)
            w1, b1, w2, b2 = mlp(None)
            return fused_ln_mlp_residual(
                x, sc, bi, w1, b1, w2, b2, g2,
                eps=cfg.ln_eps,
                block_n=int(os.environ.get("VDR_MLP_BLOCK_N", 512)),
                chunk=int(os.environ.get("VDR_MLP_CHUNK", 768)),
            )
        y = norm2(x)
        y = mlp(y)
        if g2 is not None:
            y = y * g2.astype(y.dtype)
        return shortcut + y


class SamNeck(nn.Module):
    """SAM neck: 1×1 conv → channel LayerNorm → 3×3 conv → channel LN.

    Operates NHWC; the 1×1 conv is a matmul, the 3×3 uses XLA conv (maps
    to the MXU via implicit im2col).
    """

    cfg: ViTDenseConfig
    policy: Policy

    @nn.compact
    def __call__(self, x):  # (B, hp, wp, width)
        cfg = self.cfg
        out_c = cfg.neck_channels
        dtype = self.policy.compute_dtype
        w1 = self.param(
            "conv1_kernel", nn.initializers.lecun_normal(),
            (cfg.width, out_c), self.policy.param_dtype,
        )
        x = jnp.dot(x.astype(dtype), w1.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        x = LayerNorm(cfg.ln_eps, self.policy, name="ln1")(x)
        w2 = self.param(
            "conv2_kernel", nn.initializers.lecun_normal(),
            (3, 3, out_c, out_c), self.policy.param_dtype,
        )
        # output in the compute dtype directly: the MXU accumulates fp32
        # internally either way, and a `preferred_element_type=fp32` here
        # breaks the conv's VJP under bf16 (fp32 cotangent vs bf16
        # operands in the transposed conv)
        x = jax.lax.conv_general_dilated(
            x.astype(dtype), w2.astype(dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = LayerNorm(cfg.ln_eps, self.policy, name="ln2")(x)
        return x


class ViTDense(nn.Module):
    """Dense-descriptor ViT.

    ``__call__(images)`` takes (B, H, W, 3) in [0, 1] and returns the
    dense feature map:

    * SAM config → (B, grid, grid, neck_channels), the capability-
      equivalent of reference ``model.image_encoder(img)`` output
      (tfds_dense_descriptor.py:123-126, transposed to HWC there),
    * DINOv2 config with ``patch_embed_only=True`` → patch tokens as a
      (B, grid, grid, width) map — what the reference's
      ``model.patch_embed(img)`` path produces (:128-133),
    * DINOv2 full mode → normalised patch tokens after the full
      transformer, same layout (the TPU-native "proper" dense mode).
    """

    cfg: ViTDenseConfig
    policy: Policy = FAST
    use_flash: bool = True
    trainable: bool = False
    # rematerialisation in the backward: False/'none' keeps everything,
    # True/'block' recomputes whole blocks (memory ∝ 1 block, ~25% step
    # cost), 'mlp' recomputes only the MLP hidden activations — the
    # dominant stored term — at one fc1 matmul + gelu per layer
    remat: bool | str = False
    patch_embed_only: bool = False
    collect_logit_stats: bool = False  # see WindowedAttention

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = self.policy.cast_input(images)
        x = PatchEmbed(cfg, self.policy, name="patch_embed")(x)
        b, hp, wp, c = x.shape

        if self.patch_embed_only:
            return self.policy.cast_output(x)

        if cfg.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, c),
                self.policy.param_dtype,
            )
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, cfg.grid * cfg.grid + 1, c),
                self.policy.param_dtype,
            )
            tokens = x.reshape(b, hp * wp, c)
            pos_patch, pos_cls = pos[:, 1:], pos[:, :1]
            if hp * wp != pos_patch.shape[1]:
                g = cfg.grid
                pos_patch = jax.image.resize(
                    pos_patch.reshape(1, g, g, c), (1, hp, wp, c), "bicubic"
                ).reshape(1, hp * wp, c)
            tokens = tokens + pos_patch.astype(tokens.dtype)
            cls_tok = (cls + pos_cls).astype(tokens.dtype)
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls_tok, (b, 1, c)), tokens], axis=1
            )
            # treat the token list as a (1, N) grid for the blocks
            x = tokens[:, :, None, :].transpose(0, 2, 1, 3)  # (b,1,N,c)
        else:
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, cfg.grid, cfg.grid, c),
                self.policy.param_dtype,
            )
            x = x + pos.astype(x.dtype)

        remat_mode = {False: "none", True: "block"}.get(
            self.remat, self.remat)
        if remat_mode not in ("none", "block", "mlp"):
            raise ValueError(
                f"remat must be False/'none', True/'block' or 'mlp', "
                f"got {self.remat!r}")
        block_cls = Block
        remat_mlp = False
        if self.trainable:
            if remat_mode == "block":
                # recompute each block's activations in the backward
                # instead of keeping them: memory ∝ depth drops to
                # ∝ 1 block — but re-runs the attention kernels too
                # (measured ~25% step cost, docs/ROADMAP.md round 3)
                block_cls = nn.remat(Block)
            elif remat_mode == "mlp":
                # SELECTIVE remat: only the MLP recomputes.  The
                # (B, S, 4C) hidden/gelu activations are the dominant
                # stored term (~200 MB/block at SAM-B @1024 B4 — ~2×
                # everything else combined) while their recompute is one
                # fc1 matmul + gelu (fc2's recomputed output is dead and
                # DCE'd); the flash-attention custom VJP already avoids
                # storing score matrices, so block-level remat mostly
                # re-buys memory that was never allocated
                remat_mlp = True
        for i in range(cfg.depth):
            windowed = (
                cfg.window_size > 0 and i not in tuple(cfg.global_indexes)
            )
            x = block_cls(
                cfg, self.policy,
                windowed=windowed,
                use_flash=self.use_flash,
                trainable=self.trainable,
                remat_mlp=remat_mlp,
                collect_logit_stats=self.collect_logit_stats,
                name=f"block_{i}",
            )(x)

        if cfg.use_cls_token:
            tokens = x[:, 0]  # (b, N, c)
            tokens = LayerNorm(cfg.ln_eps, self.policy, name="norm")(tokens)
            patch_tokens = tokens[:, 1:]
            x = patch_tokens.reshape(b, hp, wp, c)
        if cfg.neck_channels:
            x = SamNeck(cfg, self.policy, name="neck")(x)
        return self.policy.cast_output(x)


def probe_max_abs_logit(model: "ViTDense", params, images) -> float:
    """Measured max |scaled attention logit| over every layer/head.

    Re-runs *model* with the ``collect_logit_stats`` probe (XLA oracle
    attention path, fp32 score computation, rel-pos bias included) on
    the same param tree — the paths share parameters by construction —
    and reduces the sown per-layer maxima.  This is the measured margin
    for the nomax flash softmax's |logit| < 127/log2e ≈ 88 nat exp2
    overflow precondition (ops/attention.py::_fused_global_kernel):
    asserted in the ViT parity tests and reported next to the speedup by
    ``bench.py nomax``.
    """
    from ..core.precision import PARITY

    probe = ViTDense(
        model.cfg, policy=PARITY, use_flash=False,
        patch_embed_only=model.patch_embed_only,
        collect_logit_stats=True,
    )
    _, inter = probe.apply(params, images, mutable=["intermediates"])
    leaves = jax.tree_util.tree_leaves(inter["intermediates"])
    return float(jnp.max(jnp.stack([jnp.max(x) for x in leaves])))
