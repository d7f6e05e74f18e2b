"""Differentiable flash attention: forward + backward Pallas kernels.

The inference path (ops/attention.py) serves the frozen backbones, which
only need the forward.  Fine-tuning those backbones — a capability the
reference cannot offer at all (its encoders live behind external frozen
checkpoints, tfds_dense_descriptor.py:87/104) — needs the gradient, and
a naive ``jax.vjp`` through dense attention materialises the (Sq, Sk)
score matrix in HBM (800 MB per SAM-global layer at fp32).  Here the
standard flash-attention backward recomputes score tiles on the fly:

* :func:`flash_attention_trainable` — ``jax.custom_vjp`` wrapper.
  Forward runs an online-softmax kernel that also emits the per-row
  log-sum-exp; backward runs two kernels (dq + decomposed-bias grads
  over the kv loop; dk/dv over the q loop).  Supports the decomposed
  SAM relative-position bias — its gradient is two row/column-group
  reductions of the score gradient, computed with the same one-hot
  matmuls the forward uses to expand the bias.

Numerics: fp32 score/statistics throughout (this is a training path;
inputs may be bf16, matmuls accumulate fp32).  Scores are kept in log2
units in the kernels (exp2 softmax); the backward converts to
natural-units gradients by folding log2(e) into the recomputed
probabilities only, so emitted gradients match ``jax.grad`` of the XLA
reference within fp32 tolerance (see tests/test_attention_grad.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import (
    _NEG_INF,
    _LOG2E,
    _bias_expand_matrix,
    _bias_onehot_cols,
    _head_group,
    _mxu_passes,
    _pair_slot_expands,
    flash_attention_fused_qkv,
)

__all__ = [
    "flash_attention_trainable",
    "window_attention_trainable",
    "global_attention_trainable",
]


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_h_ref, bias_w_ref, kv_len_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, block_k: int, scale2: float, kh: int, kw: int,
    has_bias: bool, has_kv_len: bool, heads: int,
):
    """Forward with residual: grid (B, Sq/bq, Sk/bk), kv innermost.

    ALL heads ride one grid step (refs carry a leading H dim and the
    kernel statically loops over them) — at SAM-global scale the old
    per-(batch·head) grid was 12× more steps and measured
    dispatch-bound (tools/profile_ablation.py traincomponents)."""
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_mask = None
    if has_kv_len:
        kv_len = kv_len_ref[pl.program_id(0), 0]
        kidx = kv_idx * block_k + lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        kv_mask = kidx < kv_len

    for hh in range(heads):
        q = q_ref[0, hh]
        s = jnp.dot(q * scale2, k_ref[0, hh].T,
                    preferred_element_type=jnp.float32)

        if has_bias:
            rows = block_k // kw
            bias_h = bias_h_ref[0, hh]
            if rows != kh:
                row_ids = lax.broadcasted_iota(jnp.int32, (kh, rows), 0)
                col_ids = lax.broadcasted_iota(jnp.int32, (kh, rows), 1)
                sel = (row_ids == kv_idx * rows + col_ids).astype(
                    bias_h.dtype)
                bias_h = jnp.dot(
                    bias_h, sel, preferred_element_type=jnp.float32
                ).astype(bias_h.dtype)
            expand = _bias_expand_matrix(
                rows, kw, block_k, lambda cols: cols // kw, q.dtype
            )
            cat = jnp.concatenate(
                [bias_h, bias_w_ref[0, hh].astype(bias_h.dtype)], axis=1)
            cat = (cat.astype(jnp.float32) * _LOG2E).astype(q.dtype)
            s = s + jnp.dot(cat, expand, preferred_element_type=jnp.float32)

        if kv_mask is not None:
            s = jnp.where(kv_mask, s, _NEG_INF)

        m_prev = m_scratch[hh]
        l_prev = l_scratch[hh]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[hh] = m_new
        l_scratch[hh] = l_new
        acc_scratch[hh] = acc_scratch[hh] * alpha + jnp.dot(
            p.astype(v_ref.dtype), v_ref[0, hh],
            preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        for hh in range(heads):
            l = l_scratch[hh]
            safe_l = jnp.where(l > 0, l, 1.0)
            o_ref[0, hh] = (acc_scratch[hh] / safe_l).astype(o_ref.dtype)
            # log2-units log-sum-exp per q row, stored as a (1, block_q)
            # lane row per head (the (…, H, block_q) residual layout
            # keeps the block's trailing dims Pallas-legal); one tiny
            # transpose per (head, q block)
            lse_ref[0, 0, hh:hh + 1] = (m_scratch[hh] + jnp.log2(safe_l)).T


def _recompute_p_ds(
    q, kblk, dout, vblk, lse_row, dcol_row, *, scale2, bias_tile,
    kv_mask,
):
    """Shared tile math for both backward kernels.

    ``lse_row``/``dcol_row`` are (1, bq) lane rows (the residual storage
    layout); transposed once here to (bq, 1) columns.

    Returns (p_norm, ds_e): normalised probabilities and the
    natural-units score gradient  p ∘ (dO·Vᵀ − D)  for this tile.
    """
    s = jnp.dot(q * scale2, kblk.T, preferred_element_type=jnp.float32)
    if bias_tile is not None:
        s = s + bias_tile
    if kv_mask is not None:
        s = jnp.where(kv_mask, s, _NEG_INF)
    p = jnp.exp2(s - lse_row.T)                        # (bq, bk) fp32
    dp = jnp.dot(
        dout.astype(vblk.dtype), vblk.T, preferred_element_type=jnp.float32
    )
    ds = p * (dp - dcol_row.T)                         # natural units
    return p, ds


def _bias_tile(bias_h_ref, bias_w_ref, kv_idx, *, block_k, kh, kw, dtype,
               head=None):
    """(bq, block_k) fp32 bias tile in log2 units (matches the forward)."""
    rows = block_k // kw
    bias_h = bias_h_ref[0] if head is None else bias_h_ref[0, head]
    bias_w_row = bias_w_ref[0] if head is None else bias_w_ref[0, head]
    if rows != kh:
        row_ids = lax.broadcasted_iota(jnp.int32, (kh, rows), 0)
        col_ids = lax.broadcasted_iota(jnp.int32, (kh, rows), 1)
        sel = (row_ids == kv_idx * rows + col_ids).astype(bias_h.dtype)
        bias_h = jnp.dot(
            bias_h, sel, preferred_element_type=jnp.float32
        ).astype(bias_h.dtype)
    expand = _bias_expand_matrix(
        rows, kw, block_k, lambda cols: cols // kw, dtype
    )
    cat = jnp.concatenate(
        [bias_h, bias_w_row.astype(bias_h.dtype)], axis=1)
    cat = (cat.astype(jnp.float32) * _LOG2E).astype(dtype)
    tile = jnp.dot(cat, expand, preferred_element_type=jnp.float32)
    return (tile,)


def _bwd_dq_kernel(
    q_ref, k_ref, bias_h_ref, bias_w_ref, kv_len_ref,
    v_ref, do_ref, lse_ref, dcol_ref,
    dq_ref, dbh_ref, dbw_ref,
    dq_scratch, dbh_scratch, dbw_scratch,
    *, block_k: int, scale: float, kh: int, kw: int,
    has_bias: bool, has_kv_len: bool, heads: int,
):
    """dq (+ decomposed bias grads — they are q-row-indexed too).

    grid (B, Sq/bq, Sk/bk); kv innermost, accumulating in scratch; all
    heads statically looped per step (see _fwd_kernel).
    """
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)
        if has_bias:
            dbh_scratch[...] = jnp.zeros_like(dbh_scratch)
            dbw_scratch[...] = jnp.zeros_like(dbw_scratch)

    kv_mask = None
    if has_kv_len:
        kv_len = kv_len_ref[pl.program_id(0), 0]
        kidx = kv_idx * block_k + lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        kv_mask = kidx < kv_len

    for hh in range(heads):
        q = q_ref[0, hh]
        kblk = k_ref[0, hh]
        bias_tile = _bias_tile(
            bias_h_ref, bias_w_ref, kv_idx, head=hh,
            block_k=block_k, kh=kh, kw=kw, dtype=q.dtype,
        )[0] if has_bias else None

        p, ds = _recompute_p_ds(
            q, kblk, do_ref[0, hh], v_ref[0, hh],
            lse_ref[0, 0, hh:hh + 1], dcol_ref[0, 0, hh:hh + 1],
            scale2=scale * _LOG2E, bias_tile=bias_tile, kv_mask=kv_mask,
        )
        dq_scratch[hh] += jnp.dot(
            ds.astype(kblk.dtype), kblk, preferred_element_type=jnp.float32
        ) * scale

        if has_bias:
            # group-reduce ds over this tile's key-grid rows / columns:
            # _bias_onehot_cols builds the (block_k, rows + kw) one-hot
            # directly in (key, group) orientation —
            # ds @ E = [by-row|by-col]
            rows = block_k // kw
            onehot = _bias_onehot_cols(
                rows, kw, block_k, lambda cols: cols // kw, q.dtype)
            grouped = jnp.dot(
                ds.astype(q.dtype), onehot,
                preferred_element_type=jnp.float32,
            )                                          # (bq, rows + kw)
            dbw_scratch[hh] += grouped[:, rows:]
            if rows != kh:
                # scatter this tile's row sums into their global slots
                row_ids = lax.broadcasted_iota(jnp.int32, (rows, kh), 0)
                col_ids = lax.broadcasted_iota(jnp.int32, (rows, kh), 1)
                put = (col_ids == kv_idx * rows + row_ids).astype(q.dtype)
                dbh_scratch[hh] += jnp.dot(
                    grouped[:, :rows].astype(q.dtype), put,
                    preferred_element_type=jnp.float32,
                )
            else:
                dbh_scratch[hh] += grouped[:, :rows]

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        dq_ref[0] = dq_scratch[...].astype(dq_ref.dtype)
        if has_bias:
            dbh_ref[0] = dbh_scratch[...].astype(dbh_ref.dtype)
            dbw_ref[0] = dbw_scratch[...].astype(dbw_ref.dtype)


def _bwd_dkv_kernel(
    k_ref, v_ref, q_ref, bias_h_ref, bias_w_ref, kv_len_ref,
    do_ref, lse_ref, dcol_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, block_k: int, scale: float, kh: int, kw: int,
    has_bias: bool, has_kv_len: bool, heads: int,
):
    """dk/dv: grid (B, Sk/bk, Sq/bq); q innermost, accumulating; all
    heads statically looped per step (see _fwd_kernel)."""
    q_idx = pl.program_id(2)
    num_q = pl.num_programs(2)
    kv_idx = pl.program_id(1)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    kv_mask = None
    if has_kv_len:
        kv_len = kv_len_ref[pl.program_id(0), 0]
        kidx = kv_idx * block_k + lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1)
        kv_mask = kidx < kv_len

    for hh in range(heads):
        q = q_ref[0, hh]
        kblk = k_ref[0, hh]
        bias_tile = _bias_tile(
            bias_h_ref, bias_w_ref, kv_idx, head=hh,
            block_k=block_k, kh=kh, kw=kw, dtype=q.dtype,
        )[0] if has_bias else None

        p, ds = _recompute_p_ds(
            q, kblk, do_ref[0, hh], v_ref[0, hh],
            lse_ref[0, 0, hh:hh + 1], dcol_ref[0, 0, hh:hh + 1],
            scale2=scale * _LOG2E, bias_tile=bias_tile, kv_mask=kv_mask,
        )
        dk_scratch[hh] += jnp.dot(
            ds.T.astype(q.dtype), q, preferred_element_type=jnp.float32
        ) * scale
        dv_scratch[hh] += jnp.dot(
            p.T.astype(do_ref.dtype), do_ref[0, hh],
            preferred_element_type=jnp.float32,
        )

    @pl.when(q_idx == num_q - 1)
    def _store():
        dk_ref[0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[...].astype(dv_ref.dtype)


def _validate(q, k, v, bias_h, bias_w, block_q, block_k):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    if sq % block_q or sk % block_k:
        raise ValueError(
            f"seq lens ({sq}, {sk}) must divide blocks ({block_q}, {block_k})"
        )
    if (bias_h is None) != (bias_w is None):
        raise ValueError("bias_h and bias_w must be given together")
    if bias_h is not None:
        kh, kw = bias_h.shape[-1], bias_w.shape[-1]
        if kh * kw != sk:
            raise ValueError(f"Kh*Kw = {kh}*{kw} != Sk = {sk}")
        if block_k % kw:
            raise ValueError(
                f"block_k {block_k} must be a multiple of Kw {kw}")
        return kh, kw
    return 0, 0


def _fwd_impl(q, k, v, bias_h, bias_w, kv_len, *, scale, block_q, block_k,
              interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    kh, kw = _validate(q, k, v, bias_h, bias_w, block_q, block_k)
    has_bias = bias_h is not None
    has_kv_len = kv_len is not None

    # grid (B, Sq/bq, Sk/bk) — heads ride the block's leading dim and the
    # kernel loops them statically: at SAM-global scale the old
    # (B·H, …) grid was 12× more steps and measured dispatch-bound
    grid = (b, sq // block_q, sk // block_k)
    in_specs = [
        pl.BlockSpec((1, h, block_q, d), lambda i, j, t: (i, 0, j, 0)),
        pl.BlockSpec((1, h, block_k, d), lambda i, j, t: (i, 0, t, 0)),
        pl.BlockSpec((1, h, block_k, d), lambda i, j, t: (i, 0, t, 0)),
    ]
    args = [q, k, v]
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, h, block_q, kh), lambda i, j, t: (i, 0, j, 0)),
            pl.BlockSpec((1, h, block_q, kw), lambda i, j, t: (i, 0, j, 0)),
        ]
        args += [bias_h, bias_w]
    if has_kv_len:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(kv_len.astype(jnp.int32).reshape(b, 1))

    kernel = functools.partial(
        _fwd_kernel,
        block_k=block_k,
        scale2=scale * _LOG2E,
        kh=kh, kw=kw,
        has_bias=has_bias,
        has_kv_len=has_kv_len,
        heads=h,
    )

    def wrapped(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref = next(it), next(it), next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, kl_ref, *it)

    out, lse = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, h, block_q, d), lambda i, j, t: (i, 0, j, 0)),
            # (…, H, block_q) keeps the trailing block dims Pallas-legal
            pl.BlockSpec((1, 1, h, block_q), lambda i, j, t: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct(
                (b, sq // block_q, h, block_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, block_q, 1), jnp.float32),
            pltpu.VMEM((h, block_q, 1), jnp.float32),
            pltpu.VMEM((h, block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "VDR_FLASH_VMEM_LIMIT", str(64 * 1024 * 1024))),
        ),
        interpret=interpret,
    )(*args)
    return out, lse


def _bwd_impl(res, dout, *, scale, block_q, block_k, interpret):
    q, k, v, bias_h, bias_w, kv_len, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    kh, kw = _validate(q, k, v, bias_h, bias_w, block_q, block_k)
    has_bias = bias_h is not None
    has_kv_len = kv_len is not None
    # D[i] = Σ_d dO·O — tiny XLA reduce, shared by both kernels; stored
    # in the same (…, H, block_q) residual layout as lse
    dcol = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1,
    ).reshape(b, h, sq // block_q, block_q).transpose(0, 2, 1, 3)
    kv_len_f = (
        kv_len.astype(jnp.int32).reshape(b, 1) if has_kv_len else None
    )

    # ---- dq (+ bias grads) ----
    # grids carry ALL heads per step (see _fwd_kernel)
    grid = (b, sq // block_q, sk // block_k)
    in_specs = [
        pl.BlockSpec((1, h, block_q, d), lambda i, j, t: (i, 0, j, 0)),
        pl.BlockSpec((1, h, block_k, d), lambda i, j, t: (i, 0, t, 0)),
    ]
    args = [q, k]
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, h, block_q, kh), lambda i, j, t: (i, 0, j, 0)),
            pl.BlockSpec((1, h, block_q, kw), lambda i, j, t: (i, 0, j, 0)),
        ]
        args += [bias_h, bias_w]
    if has_kv_len:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(kv_len_f)
    in_specs += [
        pl.BlockSpec((1, h, block_k, d), lambda i, j, t: (i, 0, t, 0)),  # v
        pl.BlockSpec((1, h, block_q, d), lambda i, j, t: (i, 0, j, 0)),  # dO
        pl.BlockSpec((1, 1, h, block_q),
                     lambda i, j, t: (i, j, 0, 0)),                 # lse
        pl.BlockSpec((1, 1, h, block_q),
                     lambda i, j, t: (i, j, 0, 0)),                 # D
    ]
    args += [v, dout, lse, dcol]

    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        block_k=block_k, scale=scale, kh=kh, kw=kw,
        has_bias=has_bias, has_kv_len=has_kv_len, heads=h,
    )

    def wrapped_dq(*refs):
        it = iter(refs)
        q_ref, k_ref = next(it), next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        v_ref, do_ref, lse_ref, dcol_ref = (
            next(it), next(it), next(it), next(it))
        dq_ref = next(it)
        dbh_ref = next(it) if has_bias else None
        dbw_ref = next(it) if has_bias else None
        dq_s = next(it)
        dbh_s = next(it) if has_bias else None
        dbw_s = next(it) if has_bias else None
        dq_kernel(q_ref, k_ref, bh_ref, bw_ref, kl_ref, v_ref, do_ref,
                  lse_ref, dcol_ref, dq_ref, dbh_ref, dbw_ref,
                  dq_s, dbh_s, dbw_s)

    out_specs = [
        pl.BlockSpec((1, h, block_q, d), lambda i, j, t: (i, 0, j, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)]
    scratch = [pltpu.VMEM((h, block_q, d), jnp.float32)]
    if has_bias:
        out_specs += [
            pl.BlockSpec((1, h, block_q, kh), lambda i, j, t: (i, 0, j, 0)),
            pl.BlockSpec((1, h, block_q, kw), lambda i, j, t: (i, 0, j, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b, h, sq, kh), bias_h.dtype),
            jax.ShapeDtypeStruct((b, h, sq, kw), bias_w.dtype),
        ]
        scratch += [
            pltpu.VMEM((h, block_q, kh), jnp.float32),
            pltpu.VMEM((h, block_q, kw), jnp.float32),
        ]
    dq_outs = pl.pallas_call(
        wrapped_dq,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "VDR_FLASH_VMEM_LIMIT", str(64 * 1024 * 1024))),
        ),
        interpret=interpret,
    )(*args)
    if has_bias:
        dq, dbh, dbw = dq_outs
    else:
        (dq,) = dq_outs if isinstance(dq_outs, (tuple, list)) else (
            dq_outs,)
        dbh = dbw = None

    # ---- dk / dv ----
    grid2 = (b, sk // block_k, sq // block_q)
    in_specs2 = [
        pl.BlockSpec((1, h, block_k, d), lambda i, t, j: (i, 0, t, 0)),  # k
        pl.BlockSpec((1, h, block_k, d), lambda i, t, j: (i, 0, t, 0)),  # v
        pl.BlockSpec((1, h, block_q, d), lambda i, t, j: (i, 0, j, 0)),  # q
    ]
    args2 = [k, v, q]
    if has_bias:
        in_specs2 += [
            pl.BlockSpec((1, h, block_q, kh), lambda i, t, j: (i, 0, j, 0)),
            pl.BlockSpec((1, h, block_q, kw), lambda i, t, j: (i, 0, j, 0)),
        ]
        args2 += [bias_h, bias_w]
    if has_kv_len:
        in_specs2.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args2.append(kv_len_f)
    in_specs2 += [
        pl.BlockSpec((1, h, block_q, d), lambda i, t, j: (i, 0, j, 0)),  # dO
        pl.BlockSpec((1, 1, h, block_q),
                     lambda i, t, j: (i, j, 0, 0)),                 # lse
        pl.BlockSpec((1, 1, h, block_q),
                     lambda i, t, j: (i, j, 0, 0)),                 # D
    ]
    args2 += [dout, lse, dcol]

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        block_k=block_k, scale=scale, kh=kh, kw=kw,
        has_bias=has_bias, has_kv_len=has_kv_len, heads=h,
    )

    def wrapped_dkv(*refs):
        it = iter(refs)
        k_ref, v_ref, q_ref = next(it), next(it), next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        do_ref, lse_ref, dcol_ref = next(it), next(it), next(it)
        dk_ref, dv_ref = next(it), next(it)
        dkv_kernel(k_ref, v_ref, q_ref, bh_ref, bw_ref, kl_ref,
                   do_ref, lse_ref, dcol_ref, dk_ref, dv_ref, *it)

    dk, dv = pl.pallas_call(
        wrapped_dkv,
        grid=grid2,
        in_specs=in_specs2,
        out_specs=[
            pl.BlockSpec((1, h, block_k, d), lambda i, t, j: (i, 0, t, 0)),
            pl.BlockSpec((1, h, block_k, d), lambda i, t, j: (i, 0, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, block_k, d), jnp.float32),
            pltpu.VMEM((h, block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "VDR_FLASH_VMEM_LIMIT", str(64 * 1024 * 1024))),
        ),
        interpret=interpret,
    )(*args2)
    return dq, dk, dv, dbh, dbw


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"),
)
def flash_attention_trainable(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias_h: jax.Array | None = None,
    bias_w: jax.Array | None = None,
    kv_len: jax.Array | None = None,
    *,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable flash attention over (B, H, S, D).

    Same semantics as :func:`~.attention.flash_attention` in global mode
    (optional decomposed bias with per-head (B, H, Sq, K) layout,
    optional ``kv_len`` padding mask), plus a memory-efficient custom
    VJP: the backward recomputes score tiles instead of saving the
    (Sq, Sk) probability matrix, and emits gradients for q, k, v and the
    decomposed bias factors (``kv_len`` is non-differentiable).
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def _attn(q, k, v, bias_h, bias_w, kv_len):
        out, _ = _fwd_impl(
            q, k, v, bias_h, bias_w, kv_len,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )
        return out

    def _attn_fwd(q, k, v, bias_h, bias_w, kv_len):
        out, lse = _fwd_impl(
            q, k, v, bias_h, bias_w, kv_len,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )
        return out, (q, k, v, bias_h, bias_w, kv_len, out, lse)

    def _attn_bwd(res, dout):
        dq, dk, dv, dbh, dbw = _bwd_impl(
            res, dout,
            scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )
        return dq, dk, dv, dbh, dbw, None

    _attn.defvjp(_attn_fwd, _attn_bwd)
    return _attn(q, k, v, bias_h, bias_w, kv_len)


# ---------------------------------------------------------------------------
# Window mode: fused-layout differentiable attention.
#
# The generic kernels above take (B, H, S, D) per-head arrays — the SAM
# windowed layers then run B·nwin·H tiny grid steps per kernel and the
# caller pays per-head relayout transposes plus fp32 per-head bias
# einsums.  Measured on-chip (tools/profile_ablation.py traincomponents):
# the 8 windowed layers cost 92.3 ms of the 227.7 ms fwd+bwd step @B4 —
# ~20× their inference cost — almost entirely dispatch + layout glue.
#
# A window's whole attention fits in VMEM, so the trainable window path
# instead stays in the NATURAL fused layout end to end (zero transposes,
# pair-merged bf16 bias):
#   * forward — the inference fused window kernel itself
#     (ops/attention.py::_fused_window_kernel, max softmax: training
#     logits are unbounded so the nomax lever stays inference-only),
#   * backward — ONE single-pass kernel below: attention is
#     block-diagonal, so dq, dk, dv and both pair-merged bias gradients
#     come out of one pass with no cross-block accumulation, written
#     directly in the projection layouts (dq: (G, bq, C), dkv:
#     (G, bq, 2C), dbias: (G, H/pair, bq, pair·K)).
# ---------------------------------------------------------------------------


def _window_bwd_kernel(
    q_ref, kv_ref, bias_h_ref, bias_w_ref, do_ref, o_ref,
    dq_ref, dkv_ref, dbh_ref, dbw_ref,
    *, num_heads: int, head_dim: int, window_tokens: int,
    kh: int, kw: int, pair: int, scale: float,
):
    """Single-pass backward for block-diagonal window attention.

    grid (B/G, S/bq) with bq == window_tokens (one window per leading-dim
    row).  Per (window, head): recompute the softmax exactly (max path —
    matches the forward), then
        D  = Σ_d dO∘O          (per q row)
        dP = dO·Vᵀ
        dS = P∘(dP − D)        (natural units)
        dq = scale·dS·K        dk = scale·dSᵀ·q        dv = Pᵀ·dO
    and the decomposed-bias gradients are group reductions of dS — the
    TRANSPOSED pair-slot expand matmul of the forward, so they land in
    the same pair-merged layout the bias einsum produced (XLA autodiff
    outside carries them back onto the rel-pos tables).
    """
    gsz = q_ref.shape[0]
    c = num_heads * head_dim
    has_bias = bias_h_ref is not None
    row_of_col = lambda cols: cols // kw  # noqa: E731

    expands = None
    if has_bias:
        expands = _pair_slot_expands(
            pair, kh, kw, window_tokens, row_of_col, q_ref.dtype)

    for g in range(gsz):
        q_rows = q_ref[g]                   # (bq, C)
        kv_rows = kv_ref[g]                 # (bq, 2C)
        do_rows = do_ref[g]
        o_rows = o_ref[g]
        dq_outs, dk_outs, dv_outs = [], [], []
        dcat_pairs = [None] * (num_heads // pair)
        cat = None
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_rows[:, sl]
            kblk = kv_rows[:, sl]
            vblk = kv_rows[:, c + h * head_dim:c + (h + 1) * head_dim]
            do_h = do_rows[:, sl]
            o_h = o_rows[:, sl]

            s = jnp.dot(q * (scale * _LOG2E), kblk.T,
                        preferred_element_type=jnp.float32)
            if has_bias:
                if h % pair == 0:
                    cat = jnp.concatenate(
                        [bias_h_ref[g, h // pair],
                         bias_w_ref[g, h // pair]],
                        axis=-1,
                    )                              # (bq, pair·(kh+kw))
                    cat = (cat.astype(jnp.float32) * _LOG2E).astype(
                        q.dtype)
                s = s + jnp.dot(cat, expands[h % pair],
                                preferred_element_type=jnp.float32)
            # exact (max) softmax recompute in fp32 — training path
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            pn = p / jnp.sum(p, axis=-1, keepdims=True)   # (bq, bq) fp32

            do32 = do_h.astype(jnp.float32)
            dcol = jnp.sum(do32 * o_h.astype(jnp.float32),
                           axis=-1, keepdims=True)        # (bq, 1)
            dp = jnp.dot(do_h.astype(vblk.dtype), vblk.T,
                         preferred_element_type=jnp.float32)
            ds = pn * (dp - dcol)                          # natural units

            ds_c = ds.astype(q.dtype)
            pn_c = pn.astype(vblk.dtype)
            dq_outs.append(jnp.dot(
                ds_c, kblk, preferred_element_type=jnp.float32) * scale)
            dk_outs.append(jnp.dot(
                ds_c.T, q, preferred_element_type=jnp.float32) * scale)
            dv_outs.append(jnp.dot(
                pn_c.T, do_h.astype(vblk.dtype),
                preferred_element_type=jnp.float32))
            if has_bias:
                # transposed pair-slot expand: (bq, bq) @ (bq, width) —
                # slot rows for the OTHER head of the pair are zero, so
                # summing the pair's two contributions fills the merged
                # layout exactly
                dcat = jnp.dot(ds_c, expands[h % pair].T,
                               preferred_element_type=jnp.float32)
                hp_idx = h // pair
                dcat_pairs[hp_idx] = dcat if dcat_pairs[hp_idx] is None \
                    else dcat_pairs[hp_idx] + dcat

        dq_ref[g] = jnp.concatenate(dq_outs, axis=-1).astype(dq_ref.dtype)
        dkv_ref[g] = jnp.concatenate(
            dk_outs + dv_outs, axis=-1).astype(dkv_ref.dtype)
        if has_bias:
            dcat_all = jnp.stack(dcat_pairs)     # (hp, bq, pair·(kh+kw))
            dbh_ref[g] = dcat_all[..., :pair * kh].astype(dbh_ref.dtype)
            dbw_ref[g] = dcat_all[..., pair * kh:].astype(dbw_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "window_tokens", "window_batch", "scale", "interpret",
    ),
)
def window_attention_trainable(
    q_arr: jax.Array,
    kv_arr: jax.Array,
    bias_h: jax.Array | None = None,
    bias_w: jax.Array | None = None,
    *,
    num_heads: int,
    window_tokens: int,
    window_batch: int = 1,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable block-diagonal window attention, fused layout.

    Same input contract as :func:`~.attention.flash_attention_fused_qkv`
    in window mode with split projections: ``q_arr`` (B, S, H·D),
    ``kv_arr`` (B, S, 2·H·D), optional pair-merged decomposed bias
    ``(B, H/pair, S, pair·K)``.  Forward IS that kernel (max softmax —
    the nomax lever is inference-only); backward is the single-pass
    :func:`_window_bwd_kernel`, emitting gradients in the same layouts
    (XLA autodiff outside the custom VJP carries the pair-merged bias
    gradient back onto the rel-pos tables through the bias einsum).
    """
    b, s, c = q_arr.shape
    d = c // num_heads
    pair = _head_group(num_heads, d)
    if pair is None:
        raise ValueError(
            f"head layout H={num_heads}, D={d} does not tile into "
            "128-lane blocks")
    if s % window_tokens:
        raise ValueError(
            f"seq {s} must be a multiple of window_tokens {window_tokens}")
    if window_batch < 1 or b % window_batch:
        raise ValueError(f"window_batch {window_batch} must divide B={b}")
    scale_v = (d ** -0.5) if scale is None else scale
    has_bias = bias_h is not None
    if has_bias != (bias_w is not None):
        raise ValueError("bias_h and bias_w must be given together")
    kh = kw = 0
    hp = num_heads // pair
    if has_bias:
        kh, kw = bias_h.shape[-1] // pair, bias_w.shape[-1] // pair
        if kh * kw != window_tokens:
            raise ValueError(
                f"per-window bias grid {kh}x{kw} != window_tokens "
                f"{window_tokens}")

    def _fwd_call(q_arr, kv_arr, bias_h, bias_w):
        return flash_attention_fused_qkv(
            (q_arr, kv_arr), bias_h=bias_h, bias_w=bias_w,
            num_heads=num_heads, window_tokens=window_tokens,
            window_batch=window_batch, scale=scale_v,
            block_q=window_tokens, block_k=window_tokens,
            nomax=False, schedule="base", interpret=interpret,
        )

    @jax.custom_vjp
    def _attn(q_arr, kv_arr, bias_h, bias_w):
        return _fwd_call(q_arr, kv_arr, bias_h, bias_w)

    def _attn_fwd(q_arr, kv_arr, bias_h, bias_w):
        out = _fwd_call(q_arr, kv_arr, bias_h, bias_w)
        return out, (q_arr, kv_arr, bias_h, bias_w, out)

    def _attn_bwd(res, dout):
        q_arr, kv_arr, bias_h, bias_w, out = res
        gsz, bq = window_batch, window_tokens
        grid = (b // gsz, s // bq)
        in_specs = [
            pl.BlockSpec((gsz, bq, c), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((gsz, bq, 2 * c), lambda bi, j: (bi, j, 0)),
        ]
        args = [q_arr, kv_arr]
        if has_bias:
            in_specs += [
                pl.BlockSpec((gsz, hp, bq, pair * kh),
                             lambda bi, j: (bi, 0, j, 0)),
                pl.BlockSpec((gsz, hp, bq, pair * kw),
                             lambda bi, j: (bi, 0, j, 0)),
            ]
            args += [bias_h, bias_w]
        in_specs += [
            pl.BlockSpec((gsz, bq, c), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((gsz, bq, c), lambda bi, j: (bi, j, 0)),
        ]
        args += [dout, out]

        kernel = functools.partial(
            _window_bwd_kernel,
            num_heads=num_heads, head_dim=d, window_tokens=bq,
            kh=kh, kw=kw, pair=pair, scale=scale_v,
        )

        def wrapped(*refs):
            it = iter(refs)
            q_ref, kv_ref = next(it), next(it)
            bh_ref = next(it) if has_bias else None
            bw_ref = next(it) if has_bias else None
            do_ref, o_ref = next(it), next(it)
            dq_ref, dkv_ref = next(it), next(it)
            dbh_ref = next(it) if has_bias else None
            dbw_ref = next(it) if has_bias else None
            kernel(q_ref, kv_ref, bh_ref, bw_ref, do_ref, o_ref,
                   dq_ref, dkv_ref, dbh_ref, dbw_ref)

        out_specs = [
            pl.BlockSpec((gsz, bq, c), lambda bi, j: (bi, j, 0)),
            pl.BlockSpec((gsz, bq, 2 * c), lambda bi, j: (bi, j, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, s, c), q_arr.dtype),
            jax.ShapeDtypeStruct((b, s, 2 * c), kv_arr.dtype),
        ]
        if has_bias:
            out_specs += [
                pl.BlockSpec((gsz, hp, bq, pair * kh),
                             lambda bi, j: (bi, 0, j, 0)),
                pl.BlockSpec((gsz, hp, bq, pair * kw),
                             lambda bi, j: (bi, 0, j, 0)),
            ]
            out_shape += [
                jax.ShapeDtypeStruct(bias_h.shape, bias_h.dtype),
                jax.ShapeDtypeStruct(bias_w.shape, bias_w.dtype),
            ]
        outs = pl.pallas_call(
            wrapped,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=int(os.environ.get(
                    "VDR_FLASH_VMEM_LIMIT", str(64 * 1024 * 1024))),
            ),
            interpret=interpret,
        )(*args)
        if has_bias:
            return tuple(outs)
        dq, dkv = outs
        return dq, dkv, None, None

    _attn.defvjp(_attn_fwd, _attn_bwd)
    return _attn(q_arr, kv_arr, bias_h, bias_w)


# ---------------------------------------------------------------------------
# Global mode: fused-layout differentiable attention.
#
# The generic (B, H, S, D) kernels above statically loop ALL heads per
# grid step — at SAM-global scale (12 heads, 1024/2048 blocks) the
# current backend's register allocator spills ~79 MB and refuses to
# compile, and even where it compiles the caller pays per-head relayout
# transposes plus fp32 per-head bias einsums that the INFERENCE path
# eliminated rounds ago (pair-merged bias, fused-QKV layout — see
# ops/attention.py::_fused_global_kernel, 53.5% MFU).
#
# This section is the trainable twin of that inference kernel: same
# (B, S, C) fused layout, same pair-grouped grid
# (B, Sq/bq, H/pair, Sk/bk), same decomposed-bias fold into the QK
# contraction's idle lanes (d + kh = 128 at SAM scale → the bias rides
# the SAME MXU pass as QK), same skew issue order (head slot hh+1's
# score matmul is in flight under slot hh's VPU softmax chain) — plus:
#
# * forward emits the per-row log2-units log-sum-exp residual
#   (max-softmax: training logits are unbounded, the nomax lever stays
#   inference-only),
# * backward runs two kernels that recompute fp32 score tiles on the fly
#   (dq + pair-merged bias grads over the kv loop; dk/dv over the q
#   loop).  The bias gradient reuses the SAME one-hot key-grid matrix
#   the forward folds into the contraction: ``ds @ [onehot_rows |
#   onehot_cols]`` group-reduces the score gradient straight into
#   global key-grid rows — no per-tile scatter pass.
#
# Replaces the reference's torch autograd through external CUDA
# attention (/root/reference/src/tfds_dense_descriptor.py:110-139 runs
# inference-only; fine-tuning is beyond-reference capability).
# ---------------------------------------------------------------------------


def _fgt_validate(q_arr, kv_arr, bias_h, bias_w, num_heads):
    b, s, c = q_arr.shape
    if kv_arr.shape != (b, s, 2 * c):
        raise ValueError(f"kv shape {kv_arr.shape} != ({b}, {s}, {2 * c})")
    if c % num_heads:
        raise ValueError(f"C={c} not divisible by H={num_heads}")
    d = c // num_heads
    pair = _head_group(num_heads, d)
    if pair is None:
        raise ValueError(
            f"head layout H={num_heads}, D={d} does not tile into "
            "128-lane blocks")
    has_bias = bias_h is not None
    if has_bias != (bias_w is not None):
        raise ValueError("bias_h and bias_w must be given together")
    hp = num_heads // pair
    kh = kw = 0
    if has_bias:
        if bias_h.shape[-1] % pair or bias_w.shape[-1] % pair:
            raise ValueError(
                f"bias trailing dims ({bias_h.shape[-1]}, "
                f"{bias_w.shape[-1]}) must be pair-merged ({pair}·K)")
        kh, kw = bias_h.shape[-1] // pair, bias_w.shape[-1] // pair
        if kh * kw != s:
            raise ValueError(f"Kh*Kw = {kh}*{kw} != S = {s}")
        if bias_h.shape[:3] != (b, hp, s):
            raise ValueError(
                f"bias_h shape {bias_h.shape} != ({b}, {hp}, {s}, ·)")
    return b, s, c, d, pair, hp, kh, kw, has_bias


def _fgt_blocks(s, kw, has_bias, block_q, block_k):
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    if has_bias and block_k % kw:
        block_k = kw * max(1, block_k // kw) if block_k > kw else kw
        if s % block_k:
            block_k = kw
    if s % block_q or s % block_k:
        raise ValueError(
            f"seq len {s} must divide blocks ({block_q}, {block_k})")
    return block_q, block_k


def _fgt_score(rows_q, rows_k, bh_pair, bw_pair, hh, *, scale2, kh, kw,
               head_dim, fold, onehot, sel, expand, sub0, sub_k, kv_lo,
               kv_len, sdtype):
    """Log2-unit score tile for head slot ``hh``, keys
    [sub0, sub0+sub_k) of this kernel step's kv tile — shared by the
    trainable forward and both backward recomputes.  Mirrors the
    inference kernel's bias application (fold into contraction lanes
    when d+kh costs no extra MXU pass; expand matmul otherwise)."""
    d = head_dim
    sl = slice(hh * d, (hh + 1) * d)
    q = rows_q[:, sl]
    kblk = rows_k[sub0:sub0 + sub_k, sl]
    if fold:
        bias_h = bh_pair[:, hh * kh:(hh + 1) * kh]
        bias_h = (bias_h.astype(jnp.float32) * _LOG2E).astype(q.dtype)
        qa = jnp.concatenate([q * scale2, bias_h], axis=-1)
        ka = jnp.concatenate([kblk, onehot[sub0:sub0 + sub_k]], axis=-1)
        s = jnp.dot(qa, ka.T, preferred_element_type=jnp.float32)
        s = s.astype(sdtype)
        bias_w = bw_pair[:, hh * kw:(hh + 1) * kw]
        bias_w = (bias_w.astype(jnp.float32) * _LOG2E).astype(sdtype)
        s = s + pltpu.repeat(bias_w, sub_k // kw, axis=1)
    else:
        s = jnp.dot(q * scale2, kblk.T, preferred_element_type=jnp.float32)
        if bh_pair is not None:
            bias_h = bh_pair[:, hh * kh:(hh + 1) * kh]
            bias_w = bw_pair[:, hh * kw:(hh + 1) * kw]
            if sel is not None:
                bias_h = jnp.dot(
                    bias_h, sel, preferred_element_type=jnp.float32
                ).astype(bias_h.dtype)
            cat = jnp.concatenate(
                [bias_h, bias_w.astype(bias_h.dtype)], axis=1)
            cat = (cat.astype(jnp.float32) * _LOG2E).astype(q.dtype)
            s = s + jnp.dot(cat, expand, preferred_element_type=jnp.float32)
        s = s.astype(sdtype)
    if kv_len is not None:
        kidx = kv_lo + sub0 + lax.broadcasted_iota(
            jnp.int32, (1, sub_k), 1)
        s = jnp.where(kidx < kv_len, s, jnp.asarray(_NEG_INF, sdtype))
    return s


def _fgt_bias_prep(bh_ref, bw_ref, kv_idx, *, block_k, kh, kw, head_dim,
                   dtype, has_bias):
    """Per-grid-step bias machinery: (fold?, onehot, sel, expand,
    bh_pair, bw_pair)."""
    if not has_bias:
        return False, None, None, None, None, None
    fold = _mxu_passes(head_dim + kh) == _mxu_passes(head_dim)
    kv_rows = block_k // kw
    base = kv_idx * kv_rows
    onehot = sel = expand = None
    if fold:
        onehot = _bias_onehot_cols(
            kh, 0, block_k, lambda cols: base + cols // kw, dtype)
    else:
        if kv_rows != kh:
            row_ids = lax.broadcasted_iota(jnp.int32, (kh, kv_rows), 0)
            col_ids = lax.broadcasted_iota(jnp.int32, (kh, kv_rows), 1)
            sel = (row_ids == base + col_ids).astype(dtype)
        expand = _bias_expand_matrix(
            kv_rows, kw, block_k, lambda cols: cols // kw, dtype)
    return fold, onehot, sel, expand, bh_ref[0, 0], bw_ref[0, 0]


def _fgt_fwd_kernel(
    q_ref, k_ref, v_ref, bh_ref, bw_ref, kl_ref, o_ref, lse_ref,
    m_scratch, acc_scratch,
    *, block_k: int, scale2: float, kh: int, kw: int, pair: int,
    head_dim: int, has_bias: bool, has_kv_len: bool, schedule: str,
    nomax: bool = False,
):
    """Trainable forward: inference fused-global kernel + lse residual.

    grid (B, Sq/bq, H/pair, Sk/bk), kv innermost; the softmax
    denominator rides the PV matmul as a ones column.

    ``nomax=True`` drops the running-max machinery exactly like the
    inference nomax kernel (``p = exp2(s)`` directly, no rescale):
    softmax is shift-invariant and the backward only needs the
    log2-sum-exp residual, which becomes ``log2(Σ exp2 s)`` with no max
    term.  Training logits are unbounded in principle, but fine-tuning
    starts from a converged backbone whose measured |logit| sits ~5
    nats against the fp32 accumulator's ~120-log2-unit overflow bound
    (probe_max_abs_logit) — opt-in via the trace-time VDR_FGT_NOMAX env
    knob (read in models/vit.py; measured +0.7% on both interleaved
    A/B pairs, bench_ab_r5.jsonl)."""
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)
    d = head_dim

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    rows_q = q_ref[0]
    rows_k = k_ref[0]
    rows_v = v_ref[0]
    sdtype = rows_q.dtype if rows_q.dtype == jnp.bfloat16 else jnp.float32
    kv_len = kl_ref[pl.program_id(0), 0] if has_kv_len else None
    fold, onehot, sel, expand, bh_pair, bw_pair = _fgt_bias_prep(
        bh_ref, bw_ref, kv_idx, block_k=block_k, kh=kh, kw=kw,
        head_dim=d, dtype=rows_q.dtype, has_bias=has_bias)

    def score(hh):
        return _fgt_score(
            rows_q, rows_k, bh_pair, bw_pair, hh, scale2=scale2, kh=kh,
            kw=kw, head_dim=d, fold=fold, onehot=onehot, sel=sel,
            expand=expand, sub0=0, sub_k=block_k,
            kv_lo=kv_idx * block_k, kv_len=kv_len, sdtype=sdtype)

    def update(hh, s):
        vblk = rows_v[:, hh * d:(hh + 1) * d]
        vaug = jnp.concatenate(
            [vblk, jnp.ones((block_k, 1), rows_v.dtype)], axis=-1)
        if nomax:
            # unnormalised exponentials: no running max, no rescale —
            # 2 of the 3 VPU ops on every score element (same shape as
            # the inference nomax win, +5.7% there)
            p = jnp.exp2(s.astype(rows_q.dtype))
            acc_scratch[hh] = acc_scratch[hh] + jnp.dot(
                p.astype(vblk.dtype), vaug,
                preferred_element_type=jnp.float32)
            return
        m_prev = m_scratch[hh]
        m_new = jnp.maximum(
            m_prev, jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32))
        # quantise the running max through the score dtype (see the
        # inference kernel): the SAME value feeds p, alpha and the store
        m_new = m_new.astype(sdtype).astype(jnp.float32)
        p = jnp.exp2((s - m_new.astype(sdtype)).astype(rows_q.dtype))
        alpha = jnp.exp2(m_prev - m_new)
        m_scratch[hh] = m_new
        acc_scratch[hh] = acc_scratch[hh] * alpha + jnp.dot(
            p.astype(vblk.dtype), vaug, preferred_element_type=jnp.float32)

    if schedule == "base":
        for hh in range(pair):
            update(hh, score(hh))
    else:
        pending = None
        for hh in range(pair):
            s = score(hh)
            if pending is not None:
                update(*pending)
            pending = (hh, s)
        update(*pending)

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        outs = []
        for hh in range(pair):
            acc = acc_scratch[hh]
            l = acc[:, d:]
            safe_l = jnp.where(l > 0, l, 1.0)
            outs.append(acc[:, :d] / safe_l)
            if nomax:
                lse_ref[0, 0, 0, hh:hh + 1] = jnp.log2(safe_l).T
            else:
                lse_ref[0, 0, 0, hh:hh + 1] = (
                    m_scratch[hh] + jnp.log2(safe_l)).T
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fgt_dq_kernel(
    q_ref, k_ref, v_ref, bh_ref, bw_ref, kl_ref, do_ref, lse_ref, dcol_ref,
    dq_ref, dbh_ref, dbw_ref, dq_s, db_s,
    *, block_k: int, scale: float, kh: int, kw: int, pair: int,
    head_dim: int, has_bias: bool, has_kv_len: bool, schedule: str,
):
    """dq + pair-merged decomposed-bias grads; grid (B, Sq/bq, H/pair,
    Sk/bk), kv innermost, fp32 score recompute.

    The bias gradient is ``ds @ [onehot_rows | onehot_cols]`` with the
    one-hot selecting each key's GLOBAL grid row — the same matrix the
    forward fold uses — so row sums accumulate straight into their
    global slots across kv steps (no per-tile scatter matmul)."""
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)
    d = head_dim

    @pl.when(kv_idx == 0)
    def _init():
        dq_s[...] = jnp.zeros_like(dq_s)
        if has_bias:
            db_s[...] = jnp.zeros_like(db_s)

    rows_q = q_ref[0]
    rows_k = k_ref[0]
    rows_v = v_ref[0]
    rows_do = do_ref[0]
    cdtype = rows_q.dtype
    kv_len = kl_ref[pl.program_id(0), 0] if has_kv_len else None
    fold, onehot, sel, expand, bh_pair, bw_pair = _fgt_bias_prep(
        bh_ref, bw_ref, kv_idx, block_k=block_k, kh=kh, kw=kw,
        head_dim=d, dtype=cdtype, has_bias=has_bias)
    gonehot = None
    if has_bias:
        base = kv_idx * (block_k // kw)
        gonehot = _bias_onehot_cols(
            kh, kw, block_k, lambda cols: base + cols // kw, cdtype)

    def score_phase(hh):
        s = _fgt_score(
            rows_q, rows_k, bh_pair, bw_pair, hh,
            scale2=scale * _LOG2E, kh=kh, kw=kw, head_dim=d, fold=fold,
            onehot=onehot, sel=sel, expand=expand, sub0=0, sub_k=block_k,
            kv_lo=kv_idx * block_k, kv_len=kv_len, sdtype=jnp.float32)
        sl = slice(hh * d, (hh + 1) * d)
        dp = jnp.dot(rows_do[:, sl].astype(rows_v.dtype), rows_v[:, sl].T,
                     preferred_element_type=jnp.float32)
        return s, dp

    def grad_phase(hh, s, dp):
        lse_row = lse_ref[0, 0, 0, hh:hh + 1]        # (1, bq)
        dcol_row = dcol_ref[0, 0, 0, hh:hh + 1]
        p = jnp.exp2(s - lse_row.T)                  # (bq, bk) fp32
        ds = p * (dp - dcol_row.T)                   # natural units
        ds_c = ds.astype(cdtype)
        dq_s[hh] += jnp.dot(
            ds_c, rows_k[:, hh * d:(hh + 1) * d],
            preferred_element_type=jnp.float32) * scale
        if has_bias:
            db_s[hh] += jnp.dot(
                ds_c, gonehot, preferred_element_type=jnp.float32)

    if schedule == "base":
        for hh in range(pair):
            grad_phase(hh, *score_phase(hh))
    else:
        pending = None
        for hh in range(pair):
            s, dp = score_phase(hh)
            if pending is not None:
                grad_phase(*pending)
            pending = (hh, s, dp)
        grad_phase(*pending)

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        dq_ref[0] = jnp.concatenate(
            [dq_s[hh] for hh in range(pair)], axis=-1).astype(dq_ref.dtype)
        if has_bias:
            dbh_ref[0, 0] = jnp.concatenate(
                [db_s[hh][:, :kh] for hh in range(pair)], axis=-1
            ).astype(dbh_ref.dtype)
            dbw_ref[0, 0] = jnp.concatenate(
                [db_s[hh][:, kh:kh + kw] for hh in range(pair)], axis=-1
            ).astype(dbw_ref.dtype)


def _fgt_dkv_kernel(
    k_ref, v_ref, q_ref, bh_ref, bw_ref, kl_ref, do_ref, lse_ref, dcol_ref,
    dk_ref, dv_ref, dk_s, dv_s,
    *, block_q: int, block_k: int, scale: float, kh: int, kw: int,
    pair: int, head_dim: int, has_bias: bool, has_kv_len: bool,
    schedule: str,
):
    """dk/dv; grid (B, Sk/bk, H/pair, Sq/bq), q innermost, fp32 score
    recompute (this kernel's kv tile is fixed; q/do/lse/dcol stream)."""
    q_idx = pl.program_id(3)
    num_q = pl.num_programs(3)
    kv_idx = pl.program_id(1)
    d = head_dim

    @pl.when(q_idx == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    rows_q = q_ref[0]
    rows_k = k_ref[0]
    rows_v = v_ref[0]
    rows_do = do_ref[0]
    cdtype = rows_q.dtype
    kv_len = kl_ref[pl.program_id(0), 0] if has_kv_len else None
    fold, onehot, sel, expand, bh_pair, bw_pair = _fgt_bias_prep(
        bh_ref, bw_ref, kv_idx, block_k=block_k, kh=kh, kw=kw,
        head_dim=d, dtype=cdtype, has_bias=has_bias)

    def score_phase(hh):
        s = _fgt_score(
            rows_q, rows_k, bh_pair, bw_pair, hh,
            scale2=scale * _LOG2E, kh=kh, kw=kw, head_dim=d, fold=fold,
            onehot=onehot, sel=sel, expand=expand, sub0=0, sub_k=block_k,
            kv_lo=kv_idx * block_k, kv_len=kv_len, sdtype=jnp.float32)
        sl = slice(hh * d, (hh + 1) * d)
        dp = jnp.dot(rows_do[:, sl].astype(rows_v.dtype), rows_v[:, sl].T,
                     preferred_element_type=jnp.float32)
        return s, dp

    def grad_phase(hh, s, dp):
        sl = slice(hh * d, (hh + 1) * d)
        lse_row = lse_ref[0, 0, 0, hh:hh + 1]
        dcol_row = dcol_ref[0, 0, 0, hh:hh + 1]
        p = jnp.exp2(s - lse_row.T)
        ds = p * (dp - dcol_row.T)
        ds_c = ds.astype(cdtype)
        dk_s[hh] += jnp.dot(
            ds_c.T, rows_q[:, sl],
            preferred_element_type=jnp.float32) * scale
        dv_s[hh] += jnp.dot(
            p.astype(rows_do.dtype).T, rows_do[:, sl],
            preferred_element_type=jnp.float32)

    if schedule == "base":
        for hh in range(pair):
            grad_phase(hh, *score_phase(hh))
    else:
        pending = None
        for hh in range(pair):
            s, dp = score_phase(hh)
            if pending is not None:
                grad_phase(*pending)
            pending = (hh, s, dp)
        grad_phase(*pending)

    @pl.when(q_idx == num_q - 1)
    def _store():
        dk_ref[0] = jnp.concatenate(
            [dk_s[hh] for hh in range(pair)], axis=-1).astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate(
            [dv_s[hh] for hh in range(pair)], axis=-1).astype(dv_ref.dtype)


def _fgt_compiler_params(grid_semantics):
    return pltpu.CompilerParams(
        dimension_semantics=grid_semantics,
        vmem_limit_bytes=int(os.environ.get(
            "VDR_FLASH_VMEM_LIMIT", str(64 * 1024 * 1024))),
    )


def _fgt_fwd_impl(q_arr, kv_arr, bias_h, bias_w, kv_len, *, num_heads,
                  scale, block_q, block_k, schedule, interpret,
                  nomax=False):
    b, s, c, d, pair, hp, kh, kw, has_bias = _fgt_validate(
        q_arr, kv_arr, bias_h, bias_w, num_heads)
    block_q, block_k = _fgt_blocks(s, kw, has_bias, block_q, block_k)
    lane = pair * d
    has_kv_len = kv_len is not None
    grid = (b, s // block_q, hp, s // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, lane), lambda bi, j, hh, t: (bi, j, hh)),
        pl.BlockSpec((1, block_k, lane), lambda bi, j, hh, t: (bi, t, hh)),
        pl.BlockSpec((1, block_k, lane),
                     lambda bi, j, hh, t: (bi, t, hp + hh)),
    ]
    args = [q_arr, kv_arr, kv_arr]
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, 1, block_q, pair * kh),
                         lambda bi, j, hh, t: (bi, hh, j, 0)),
            pl.BlockSpec((1, 1, block_q, pair * kw),
                         lambda bi, j, hh, t: (bi, hh, j, 0)),
        ]
        args += [bias_h, bias_w]
    if has_kv_len:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(kv_len.astype(jnp.int32).reshape(b, 1))

    kernel = functools.partial(
        _fgt_fwd_kernel, block_k=block_k, scale2=scale * _LOG2E,
        kh=kh, kw=kw, pair=pair, head_dim=d, has_bias=has_bias,
        has_kv_len=has_kv_len, schedule=schedule, nomax=nomax)

    def wrapped(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref = next(it), next(it), next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, kl_ref, *it)

    out, lse = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, lane),
                         lambda bi, j, hh, t: (bi, j, hh)),
            pl.BlockSpec((1, 1, 1, pair, block_q),
                         lambda bi, j, hh, t: (bi, hh, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), q_arr.dtype),
            jax.ShapeDtypeStruct(
                (b, hp, s // block_q, pair, block_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((pair, block_q, 1), jnp.float32),
            pltpu.VMEM((pair, block_q, d + 1), jnp.float32),
        ],
        compiler_params=_fgt_compiler_params(
            ("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out, lse


def _fgt_bwd_impl(res, dout, *, num_heads, scale, block_q, block_k,
                  schedule, interpret):
    q_arr, kv_arr, bias_h, bias_w, kv_len, out, lse = res
    b, s, c, d, pair, hp, kh, kw, has_bias = _fgt_validate(
        q_arr, kv_arr, bias_h, bias_w, num_heads)
    block_q, block_k = _fgt_blocks(s, kw, has_bias, block_q, block_k)
    lane = pair * d
    has_kv_len = kv_len is not None
    nq = s // block_q
    # D[i] = Σ_d dO∘O per head, stored in the lse residual layout
    dcol = jnp.sum(
        (dout.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(b, s, hp, pair, d),
        axis=-1,
    ).reshape(b, nq, block_q, hp, pair).transpose(0, 3, 1, 4, 2)
    kv_len_f = (
        kv_len.astype(jnp.int32).reshape(b, 1) if has_kv_len else None)

    # ---- dq (+ pair-merged bias grads) ----
    grid = (b, nq, hp, s // block_k)
    in_specs = [
        pl.BlockSpec((1, block_q, lane), lambda bi, j, hh, t: (bi, j, hh)),
        pl.BlockSpec((1, block_k, lane), lambda bi, j, hh, t: (bi, t, hh)),
        pl.BlockSpec((1, block_k, lane),
                     lambda bi, j, hh, t: (bi, t, hp + hh)),
    ]
    args = [q_arr, kv_arr, kv_arr]
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, 1, block_q, pair * kh),
                         lambda bi, j, hh, t: (bi, hh, j, 0)),
            pl.BlockSpec((1, 1, block_q, pair * kw),
                         lambda bi, j, hh, t: (bi, hh, j, 0)),
        ]
        args += [bias_h, bias_w]
    if has_kv_len:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(kv_len_f)
    in_specs += [
        pl.BlockSpec((1, block_q, lane), lambda bi, j, hh, t: (bi, j, hh)),
        pl.BlockSpec((1, 1, 1, pair, block_q),
                     lambda bi, j, hh, t: (bi, hh, j, 0, 0)),
        pl.BlockSpec((1, 1, 1, pair, block_q),
                     lambda bi, j, hh, t: (bi, hh, j, 0, 0)),
    ]
    args += [dout, lse, dcol]

    dq_kernel = functools.partial(
        _fgt_dq_kernel, block_k=block_k, scale=scale, kh=kh, kw=kw,
        pair=pair, head_dim=d, has_bias=has_bias, has_kv_len=has_kv_len,
        schedule=schedule)

    def wrapped_dq(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref = next(it), next(it), next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        do_ref, lse_ref, dcol_ref = next(it), next(it), next(it)
        dq_ref = next(it)
        dbh_ref = next(it) if has_bias else None
        dbw_ref = next(it) if has_bias else None
        dq_s = next(it)
        db_s = next(it) if has_bias else None
        dq_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, kl_ref, do_ref,
                  lse_ref, dcol_ref, dq_ref, dbh_ref, dbw_ref, dq_s, db_s)

    out_specs = [
        pl.BlockSpec((1, block_q, lane), lambda bi, j, hh, t: (bi, j, hh))]
    out_shape = [jax.ShapeDtypeStruct((b, s, c), q_arr.dtype)]
    scratch = [pltpu.VMEM((pair, block_q, d), jnp.float32)]
    if has_bias:
        out_specs += [
            pl.BlockSpec((1, 1, block_q, pair * kh),
                         lambda bi, j, hh, t: (bi, hh, j, 0)),
            pl.BlockSpec((1, 1, block_q, pair * kw),
                         lambda bi, j, hh, t: (bi, hh, j, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(bias_h.shape, bias_h.dtype),
            jax.ShapeDtypeStruct(bias_w.shape, bias_w.dtype),
        ]
        scratch.append(pltpu.VMEM((pair, block_q, kh + kw), jnp.float32))
    dq_outs = pl.pallas_call(
        wrapped_dq,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_fgt_compiler_params(
            ("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    if has_bias:
        dq, dbh, dbw = dq_outs
    else:
        (dq,) = dq_outs if isinstance(dq_outs, (tuple, list)) else (dq_outs,)
        dbh = dbw = None

    # ---- dk / dv ----
    grid2 = (b, s // block_k, hp, nq)
    in_specs2 = [
        pl.BlockSpec((1, block_k, lane), lambda bi, t, hh, j: (bi, t, hh)),
        pl.BlockSpec((1, block_k, lane),
                     lambda bi, t, hh, j: (bi, t, hp + hh)),
        pl.BlockSpec((1, block_q, lane), lambda bi, t, hh, j: (bi, j, hh)),
    ]
    args2 = [kv_arr, kv_arr, q_arr]
    if has_bias:
        in_specs2 += [
            pl.BlockSpec((1, 1, block_q, pair * kh),
                         lambda bi, t, hh, j: (bi, hh, j, 0)),
            pl.BlockSpec((1, 1, block_q, pair * kw),
                         lambda bi, t, hh, j: (bi, hh, j, 0)),
        ]
        args2 += [bias_h, bias_w]
    if has_kv_len:
        in_specs2.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args2.append(kv_len_f)
    in_specs2 += [
        pl.BlockSpec((1, block_q, lane), lambda bi, t, hh, j: (bi, j, hh)),
        pl.BlockSpec((1, 1, 1, pair, block_q),
                     lambda bi, t, hh, j: (bi, hh, j, 0, 0)),
        pl.BlockSpec((1, 1, 1, pair, block_q),
                     lambda bi, t, hh, j: (bi, hh, j, 0, 0)),
    ]
    args2 += [dout, lse, dcol]

    dkv_kernel = functools.partial(
        _fgt_dkv_kernel, block_q=block_q, block_k=block_k, scale=scale,
        kh=kh, kw=kw, pair=pair, head_dim=d, has_bias=has_bias,
        has_kv_len=has_kv_len, schedule=schedule)

    def wrapped_dkv(*refs):
        it = iter(refs)
        k_ref, v_ref, q_ref = next(it), next(it), next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        do_ref, lse_ref, dcol_ref = next(it), next(it), next(it)
        dkv_kernel(k_ref, v_ref, q_ref, bh_ref, bw_ref, kl_ref,
                   do_ref, lse_ref, dcol_ref, *it)

    dk, dv = pl.pallas_call(
        wrapped_dkv,
        grid=grid2,
        in_specs=in_specs2,
        out_specs=[
            pl.BlockSpec((1, block_k, lane),
                         lambda bi, t, hh, j: (bi, t, hh)),
            pl.BlockSpec((1, block_k, lane),
                         lambda bi, t, hh, j: (bi, t, hh)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, c), kv_arr.dtype),
            jax.ShapeDtypeStruct((b, s, c), kv_arr.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((pair, block_k, d), jnp.float32),
            pltpu.VMEM((pair, block_k, d), jnp.float32),
        ],
        compiler_params=_fgt_compiler_params(
            ("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args2)
    dkv = jnp.concatenate([dk, dv], axis=-1)
    return dq, dkv, dbh, dbw


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "scale", "block_q", "block_k", "schedule", "interpret",
        "nomax",
    ),
)
def global_attention_trainable(
    q_arr: jax.Array,
    kv_arr: jax.Array,
    bias_h: jax.Array | None = None,
    bias_w: jax.Array | None = None,
    kv_len: jax.Array | None = None,
    *,
    num_heads: int,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    schedule: str | None = None,
    interpret: bool = False,
    nomax: bool = False,
) -> jax.Array:
    """Differentiable fused-layout global attention.

    Same input contract as :func:`~.attention.flash_attention_fused_qkv`
    in global mode with split projections: ``q_arr`` (B, S, C), ``kv_arr``
    (B, S, 2C), optional pair-merged decomposed bias ``(B, H/pair, S,
    pair·K)`` with Kh·Kw == S, optional ``kv_len`` padding mask — plus a
    memory-efficient custom VJP (score tiles recomputed in fp32; the
    pair-merged bias gradients come out of one one-hot group-reduce
    matmul per head slot).  Returns (B, S, H·D); gradients flow to
    q_arr, kv_arr and the bias factors (``kv_len`` non-differentiable).
    """
    b, s, c, d, pair, hp, kh, kw, has_bias = _fgt_validate(
        q_arr, kv_arr, bias_h, bias_w, num_heads)
    scale = (d ** -0.5) if scale is None else scale
    if schedule is None:
        schedule = os.environ.get("VDR_FGT_SCHEDULE", "skew")
    if schedule not in ("base", "skew"):
        raise ValueError(f"unknown schedule {schedule!r}")

    @jax.custom_vjp
    def _attn(q_arr, kv_arr, bias_h, bias_w, kv_len):
        out, _ = _fgt_fwd_impl(
            q_arr, kv_arr, bias_h, bias_w, kv_len, num_heads=num_heads,
            scale=scale, block_q=block_q, block_k=block_k,
            schedule=schedule, interpret=interpret, nomax=nomax)
        return out

    def _attn_fwd(q_arr, kv_arr, bias_h, bias_w, kv_len):
        out, lse = _fgt_fwd_impl(
            q_arr, kv_arr, bias_h, bias_w, kv_len, num_heads=num_heads,
            scale=scale, block_q=block_q, block_k=block_k,
            schedule=schedule, interpret=interpret, nomax=nomax)
        return out, (q_arr, kv_arr, bias_h, bias_w, kv_len, out, lse)

    def _attn_bwd(res, dout):
        dq, dkv, dbh, dbw = _fgt_bwd_impl(
            res, dout, num_heads=num_heads, scale=scale, block_q=block_q,
            block_k=block_k, schedule=schedule, interpret=interpret)
        return dq, dkv, dbh, dbw, None

    _attn.defvjp(_attn_fwd, _attn_bwd)
    return _attn(q_arr, kv_arr, bias_h, bias_w, kv_len)
