"""Attention kernels: XLA reference + Pallas flash attention.

The reference pipeline's FLOP hot spot is the frozen ViT image-encoder
forward (/root/reference/src/tfds_dense_descriptor.py:110-139, hidden
inside external ``segment_anything`` / DINOv2 CUDA kernels).  Here it is
first-class:

* :func:`attention_reference` — plain XLA einsum attention with optional
  additive bias and key-padding mask.  Differentiable; used by the small
  trainable downstream classifiers and as the parity oracle.
* :func:`flash_attention` — Pallas TPU kernel, online-softmax tiling so
  the (Sq, Sk) score matrix never hits HBM.  Supports

  - **decomposed relative-position bias** à la SAM: instead of a dense
    (Sq, Sk) bias it takes ``bias_h (…, Sq, Kh)`` and ``bias_w (…, Sq,
    Kw)`` with ``Sk = Kh·Kw`` and reconstructs bias tiles on the fly
    (block_k is kept a multiple of Kw so a key tile covers whole rows of
    the key grid),
  - **key-padding masks** via per-sequence ``kv_len`` so padded token
    buckets work under static shapes.

The frozen backbone only needs the forward here; the trainable
classifiers use the XLA path which XLA differentiates, and
:mod:`.attention_grad` provides ``flash_attention_trainable`` — a
memory-efficient custom-VJP flash attention (backward recomputes score
tiles; decomposed-bias gradients included) for fine-tuning backbones at
scales where a dense VJP would materialise the (Sq, Sk) score matrix.

Shapes follow (B, H, S, D) with head dim last; fp32 accumulation always
(``preferred_element_type``), inputs may be bf16.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "attention_reference",
    "flash_attention",
    "flash_attention_fused_qkv",
]

_NEG_INF = -1e30  # large-negative instead of -inf: keeps fully-masked rows finite
_LOG2E = 1.4426950408889634  # scores are kept in log2 units inside the kernel


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    kv_len: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Plain XLA attention. q,k,v: (B, H, Sq|Sk, D); bias broadcastable to
    (B, H, Sq, Sk); kv_len: (B,) valid key counts."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if kv_len is not None:
        kidx = jnp.arange(k.shape[2])
        mask = kidx[None, None, None, :] < kv_len[:, None, None, None]
        s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


# --------------------------------------------------------------------------
# Pallas flash attention
# --------------------------------------------------------------------------


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_h_ref, bias_w_ref, kv_len_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, block_k: int, kv_rows_per_block: int, scale: float,
    has_bias: bool, has_kv_len: bool,
    kv_grid: tuple[int, int, int] | None,
):
    """Canonical 3D-grid flash attention body.

    grid = (B·H, Sq/block_q, Sk/block_k): the kv dimension is the
    innermost, ``arbitrary`` (sequential) axis; m/l/acc live in VMEM
    scratch across kv steps, so Pallas double-buffers the K/V tile DMA
    against compute.  Initialise on the first kv step, write the output
    on the last.
    """
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # keep q/k/v in their native dtype for the MXU (bf16 in / fp32
    # accumulate — fp32-in matmuls run several times slower); all softmax
    # statistics stay fp32 via preferred_element_type
    q = q_ref[0]                                      # (bq, d)
    bq = q.shape[0]
    kblk = k_ref[0]                                   # (bk, d)
    vblk = v_ref[0]

    # `scale` already carries log2(e): scores live in log2 units so the
    # softmax uses raw exp2 (saves exp's internal multiply per element);
    # it folds into q — a (bq, d) multiply, not a (bq, bk) one
    s = jnp.dot(q * scale, kblk.T, preferred_element_type=jnp.float32)

    if has_bias:
        rows = kv_rows_per_block
        bias_w = bias_w_ref[0]                        # (bq, kw)
        bias_h = bias_h_ref[0]                        # (bq, kh)
        kw = bias_w.shape[-1]
        kh = bias_h.shape[-1]
        window = kv_grid[3] if kv_grid is not None else 0
        if window:
            # Block-diagonal mode: bias_h carries each query's OWN
            # window's kh grid-row terms; they expand window-locally
            # across the whole key tile — cross-window columns pick up
            # meaningless values, but the block-diagonal kv_grid mask
            # below overwrites them with -inf, so no scatter is needed.
            bh_sel = bias_h
            row_of_col = lambda cols: (cols % window) // kw  # noqa: E731
        else:
            # Select this kv tile's key-grid rows from bias_h with a
            # one-hot matmul (Mosaic cannot dynamically slice the lane
            # dim).  When one kv tile covers every key-grid row the
            # select is the identity — skip it.
            if rows != kh:
                row_ids = lax.broadcasted_iota(jnp.int32, (kh, rows), 0)
                col_ids = lax.broadcasted_iota(jnp.int32, (kh, rows), 1)
                sel = (row_ids == kv_idx * rows + col_ids).astype(bias_h.dtype)
                bh_sel = jnp.dot(
                    bias_h, sel, preferred_element_type=jnp.float32
                ).astype(bias_h.dtype)
            else:
                bh_sel = bias_h
            row_of_col = lambda cols: cols // kw  # noqa: E731
        # Fused bias apply: one one-hot matmul [bh_sel | bias_w] @ M both
        # expands bias_h across its kw keys and tiles bias_w across the
        # key-grid rows — replacing an expand matmul + a block_k-wide
        # lane concat + two full-tile adds with one dot and one add.
        # log2(e) is folded into the (tiny) concatenated bias matrix.
        nrows = bh_sel.shape[-1]
        cat = jnp.concatenate([bh_sel, bias_w.astype(bh_sel.dtype)], axis=1)
        cat = (cat.astype(jnp.float32) * _LOG2E).astype(q.dtype)
        expand = _bias_expand_matrix(nrows, kw, block_k, row_of_col, q.dtype)
        s = s + jnp.dot(cat, expand, preferred_element_type=jnp.float32)

    if has_kv_len:
        kv_len = kv_len_ref[pl.program_id(0), 0]
        kidx = kv_idx * block_k + lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1
        )
        s = jnp.where(kidx < kv_len, s, _NEG_INF)
    if kv_grid is not None:
        # static 2D grid mask: key k valid iff its (row, col) in the
        # padded (·, kw_pad) key grid lies inside (kh_valid, kw_valid).
        # With window_tokens set, q and k are concatenations of
        # independent windows (block-diagonal attention): validity is
        # window-local and cross-window entries are masked.
        kh_valid, kw_valid, kw_pad, window_tokens = kv_grid
        kidx = kv_idx * block_k + lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1
        )
        if window_tokens:
            k_local = kidx % window_tokens
            valid = (
                (k_local // kw_pad < kh_valid)
                & (k_local % kw_pad < kw_valid)
            )
            qidx = lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            valid &= (qidx // window_tokens) == (kidx // window_tokens)
        else:
            valid = (kidx // kw_pad < kh_valid) & (kidx % kw_pad < kw_valid)
        s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # softmax weights in the input dtype: for bf16 inputs the (bq, bk)
    # exp is the VPU hot spot and bf16 halves it; running statistics
    # (m, l, acc) stay fp32.  fp32 inputs keep the fully-fp32 path.
    # exp2 because scores are in log2 units (softmax is invariant).
    p = jnp.exp2((s - m_new).astype(q.dtype))
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True,
                                     dtype=jnp.float32)
    m_scratch[...] = m_new
    l_scratch[...] = l_new
    # PV in the value dtype (bf16 on the fast path) with fp32 accumulation
    acc_scratch[...] = acc_scratch[...] * alpha + jnp.dot(
        p.astype(vblk.dtype), vblk, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        l = l_scratch[...]
        safe_l = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scratch[...] / safe_l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_grid", "window_tokens", "scale", "block_q",
                     "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias_h: jax.Array | None = None,
    bias_w: jax.Array | None = None,
    kv_len: jax.Array | None = None,
    *,
    kv_grid: tuple[int, int] | None = None,
    window_tokens: int | None = None,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over (B, H, S, D) with online softmax.

    Args:
        q, k, v: (B, H, Sq, D) / (B, H, Sk, D).  Sq must be divisible by
            block_q and Sk by block_k (callers pad; kv_len masks pads).
        bias_h: optional (B, H, Sq, Kh) decomposed rel-pos term for the
            key-grid rows; requires ``bias_w`` and ``Sk == Kh*Kw``.
        bias_w: optional (B, H, Sq, Kw) term for the key-grid columns.
        kv_len: optional (B,) int32 valid key counts (padding mask).
        kv_grid: optional static (kh_valid, kw_valid): keys form a 2D grid
            padded to (Sk // Kw, Kw) and only the top-left (kh_valid,
            kw_valid) sub-grid is real — used for SAM windowed attention
            where 14×14 windows are padded to 16×16 for tiling.  Requires
            ``bias_h``/``bias_w`` (their last dims define the padded grid).
        window_tokens: optional static window size for BLOCK-DIAGONAL
            attention: q/k are concatenations of independent windows of
            this many tokens (each a padded kv_grid grid); a window only
            attends to itself.  bias_h stays PER-WINDOW (Kh·Kw ==
            window_tokens): the kernel expands it window-locally, with
            cross-window entries overwritten by the block-diagonal mask.
            Requires kv_grid, Sq == Sk, and window_tokens | block; the kv
            tile follows the q tile so several windows batch into one
            grid step — built for SAM windowed layers where per-window
            grid rows are step-overhead-bound.
        scale: softmax scale, default 1/sqrt(D).
        interpret: run in Pallas interpreter mode (CPU tests).
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    scale = (d ** -0.5) if scale is None else scale
    has_bias = bias_h is not None
    has_kv_len = kv_len is not None
    if has_bias != (bias_w is not None):
        raise ValueError("bias_h and bias_w must be given together")

    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    if sq % block_q or sk % block_k:
        raise ValueError(
            f"seq lens ({sq}, {sk}) must divide blocks ({block_q}, {block_k})"
        )

    kv_rows_per_block = 0
    if kv_grid is not None and not has_bias:
        raise ValueError("kv_grid requires bias_h/bias_w (they set Kw)")
    if has_bias:
        kh, kw = bias_h.shape[-1], bias_w.shape[-1]
        if not window_tokens and kh * kw != sk:
            raise ValueError(f"Kh*Kw = {kh}*{kw} != Sk = {sk}")
        if block_k % kw:
            # keep key tiles aligned to whole key-grid rows
            block_k = kw * max(1, block_k // kw) if block_k > kw else kw
            if sk % block_k:
                block_k = kw
        kv_rows_per_block = block_k // kw

    if window_tokens:
        if kv_grid is None:
            raise ValueError("window_tokens requires kv_grid")
        if sq != sk:
            raise ValueError("window_tokens requires Sq == Sk")
        if has_kv_len:
            # the kv tile follows the q tile (kv program id stays 0), so
            # the kernel's kv_len mask would compare tile-local columns
            # against a global count — reject like the fused-QKV variant
            raise ValueError(
                "kv_len is not supported in window mode; express validity "
                "via the kv_grid (kh_valid, kw_valid) sub-grid instead"
            )
        block_q = block_k = min(block_q, sq)
        if block_q % window_tokens or sq % block_q:
            raise ValueError(
                f"window_tokens {window_tokens} must divide block {block_q}"
                f" and block must divide seq {sq}"
            )
        kv_rows_per_block = block_k // kw
        if kh * kw != window_tokens:
            raise ValueError(
                f"block-diagonal bias grid {kh}x{kw} must equal "
                f"window_tokens = {window_tokens} (per-window bias layout)"
            )

    kv_grid_full = None
    if kv_grid is not None:
        kv_grid_full = (kv_grid[0], kv_grid[1], kw, window_tokens or 0)

    bh_flat = b * h
    qf = q.reshape(bh_flat, sq, d)
    kf = k.reshape(bh_flat, sk, d)
    vf = v.reshape(bh_flat, sk, d)

    if window_tokens:
        # block-diagonal: the kv tile follows the q tile; one kv step
        grid = (bh_flat, sq // block_q, 1)
        kv_index = lambda i, j, t: (i, j, 0)  # noqa: E731
    else:
        grid = (bh_flat, sq // block_q, sk // block_k)
        kv_index = lambda i, j, t: (i, t, 0)  # noqa: E731

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j, t: (i, j, 0)),
        pl.BlockSpec((1, block_k, d), kv_index),
        pl.BlockSpec((1, block_k, d), kv_index),
    ]
    args = [qf, kf, vf]

    if has_bias:
        bias_h_f = bias_h.reshape(bh_flat, sq, kh)
        bias_w_f = bias_w.reshape(bh_flat, sq, kw)
        in_specs += [
            pl.BlockSpec((1, block_q, kh), lambda i, j, t: (i, j, 0)),
            pl.BlockSpec((1, block_q, kw), lambda i, j, t: (i, j, 0)),
        ]
        args += [bias_h_f, bias_w_f]
    if has_kv_len:
        # (BH, 1) scalars in SMEM, indexed by program_id inside the kernel
        kv_len_f = jnp.repeat(kv_len.astype(jnp.int32), h).reshape(bh_flat, 1)
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [kv_len_f]

    kernel = functools.partial(
        _flash_kernel,
        block_k=block_k,
        kv_rows_per_block=kv_rows_per_block,
        # the kernel works in log2 units (exp2 softmax); biases get the
        # same factor folded in inside the kernel
        scale=scale * _LOG2E,
        has_bias=has_bias,
        has_kv_len=has_kv_len,
        kv_grid=kv_grid_full,
    )

    # pallas kernels take a fixed arg list: splice missing optional refs
    def wrapped(*refs):
        it = iter(refs)
        q_ref = next(it)
        k_ref = next(it)
        v_ref = next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        o_ref = next(it)
        kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, kl_ref, o_ref, *it)

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, t: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh_flat, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),    # running max
            pltpu.VMEM((block_q, 1), jnp.float32),    # running sum
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh_flat * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=bh_flat * sq * sk,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(b, h, sq, d)


# --------------------------------------------------------------------------
# Fused-QKV flash attention: kernel-side layout
# --------------------------------------------------------------------------
#
# The standard path materialises per-head (B, H, S, D) q/k/v arrays from the
# QKV projection's (B, S, 3·H·D) output — on TPU that costs a chain of
# slice/transpose/pad relayout copies worth ~25% of the SAM encoder forward
# (measured).  Here the Pallas kernel instead reads q, k and v directly out
# of the projection output via BlockSpec index maps over the SAME array,
# and writes its output straight into a (B, S, H·D) array — the exact
# layout the output projection consumes.  No slice, transpose, pad or
# relayout ops exist at the XLA level at all.
#
# Two kernel bodies:
#
# * **window mode** (``window_tokens``) — SAM's windowed layers, UNPADDED:
#   a grid row is a group of independent 14×14=196-token windows laid out
#   consecutively along the token axis.  A token only attends inside its
#   own window (block-diagonal iota mask), the kv tile IS the q tile, and
#   softmax needs a single pass — no online-softmax scratch at all.  The
#   kernel takes the FULL (block_q, 3·H·D) qkv rows in one ref (contiguous
#   maximal-length DMA runs) and statically unrolls the head loop with
#   64-lane in-register slices.  vs the padded 16×16 grouped path this
#   also saves the 256²/196² ≈ 1.7× score-matrix inflation.
# * **global mode** — online-softmax kv loop; Mosaic requires lane-dim
#   block sizes to be multiples of 128, so a grid step covers a PAIR of
#   64-wide heads and walks them with static lane slices.


def _head_group(num_heads: int, head_dim: int) -> int | None:
    """Heads per grid step so the lane block is a 128 multiple, or None.

    Prefers 256-lane groups (4 heads at D=64) when the head count
    divides: the per-grid-step one-hot/expand builds and dispatch
    overhead amortise over twice as many heads.
    """
    if head_dim % 128 == 0:
        return 1
    if 128 % head_dim == 0:
        pair = 128 // head_dim
        if num_heads % (2 * pair) == 0:
            return 2 * pair
        if num_heads % pair == 0:
            return pair
    return None


def _bias_expand_matrix(nrows, kw, block_k, row_of_col, dtype):
    """One-hot (nrows + kw, block_k) matrix so that
    ``[bias_h | bias_w] @ expand`` both spreads each query's kh grid-row
    terms across their kw keys and tiles the kw column terms across the
    key-grid rows — one matmul instead of an expand matmul + lane concat +
    two full-tile adds.  Head-independent: callers build it ONCE per grid
    step and reuse it across the in-kernel head loop (it used to be
    rebuilt per head — a measurable VPU cost at SAM-global scale)."""
    e_rows = lax.broadcasted_iota(jnp.int32, (nrows + kw, block_k), 0)
    e_cols = lax.broadcasted_iota(jnp.int32, (nrows + kw, block_k), 1)
    return jnp.where(
        e_rows < nrows,
        (row_of_col(e_cols) == e_rows).astype(dtype),
        (e_cols % kw == e_rows - nrows).astype(dtype),
    )


def _expand_bias(bias_h, bias_w, s, *, expand):
    """Apply the decomposed bias to scores ``s`` via the fused one-hot
    matmul; log2(e) is folded into the tiny concatenated matrix so the
    tile lands directly in the kernel's log2-unit scores.  The dot
    accumulates fp32 (Mosaic requires 32-bit matmul accumulators); add in
    fp32 and cast once afterwards."""
    cat = jnp.concatenate([bias_h, bias_w.astype(bias_h.dtype)], axis=1)
    cat = (cat.astype(jnp.float32) * _LOG2E).astype(expand.dtype)
    return s + jnp.dot(cat, expand, preferred_element_type=jnp.float32)


def _mxu_passes(k: int) -> int:
    """MXU contraction passes for a K-deep matmul (128-deep per pass)."""
    return -(-k // 128)


def _bias_onehot_cols(nrows, kw, block_k, row_of_col, dtype):
    """One-hot (block_k, nrows [+ kw]) matrix E so that folding the bias
    terms into the QK contraction — ``[q·scale | bias] @ [k | E]ᵀ`` —
    reproduces ``q·kᵀ·scale + bias_expand``.  E[j, t] selects key j's grid
    row (t < nrows) and, when ``with_cols``, its grid column (t ≥ nrows).

    This is the transpose of :func:`_bias_expand_matrix`, built directly
    in (key, term) orientation so no in-kernel transpose is needed.  The
    point: a d=64 head leaves half of the MXU's 128-deep contraction
    idle, so the bias terms ride the SAME matmul pass as QK — the
    full-score-tile bias expand matmul (as many MXU passes as QK itself)
    disappears entirely."""
    with_cols = kw > 0
    width = nrows + (kw if with_cols else 0)
    j_ids = lax.broadcasted_iota(jnp.int32, (block_k, width), 0)
    t_ids = lax.broadcasted_iota(jnp.int32, (block_k, width), 1)
    if not with_cols:
        return (row_of_col(j_ids) == t_ids).astype(dtype)
    return jnp.where(
        t_ids < nrows,
        (row_of_col(j_ids) == t_ids).astype(dtype),
        (j_ids % kw == t_ids - nrows).astype(dtype),
    )


def _pair_slot_expands(pair, kh, kw, bq, row_of_col, dtype):
    """Per-pair-slot expand matrices for pair-merged decomposed bias.

    Slot ``hh`` applies rows [hh·kh, (hh+1)·kh) of the pair-merged
    bias_h block and rows [pair·kh + hh·kw, …) of the bias_w block; all
    other rows are zero — so the pair-merged ``[bias_h | bias_w]``
    concat feeds the matmul unsliced (an unaligned kh-offset lane slice
    would cost a relayout; zero rows are free).  Shared by the fused
    window forward and the single-pass window backward
    (ops/attention_grad.py), which uses the TRANSPOSED contraction to
    group-reduce score gradients back into the same layout.
    """
    width = pair * (kh + kw)
    t_ids = lax.broadcasted_iota(jnp.int32, (width, bq), 0)
    j_ids = lax.broadcasted_iota(jnp.int32, (width, bq), 1)
    expands = []
    for hh in range(pair):
        h_lo = hh * kh
        w_lo = pair * kh + hh * kw
        expands.append(jnp.where(
            (t_ids >= h_lo) & (t_ids < h_lo + kh),
            (row_of_col(j_ids) == t_ids - h_lo).astype(dtype),
            jnp.where(
                (t_ids >= w_lo) & (t_ids < w_lo + kw),
                (j_ids % kw == t_ids - w_lo).astype(dtype),
                jnp.zeros((), dtype),
            ),
        ))
    return expands


def _fused_window_kernel(
    qkv_ref, kv_ref, bias_h_ref, bias_w_ref, o_ref,
    *, num_heads: int, head_dim: int, window_tokens: int,
    kh: int, kw: int, pair: int, scale: float, nomax: bool = False,
):
    """Block-diagonal window attention over full qkv rows, single pass.

    grid = (B/G, Sq/block_q); qkv_ref block is (G, block_q, 3·H·D) —
    every head's q, k and v for G batch rows (windows) — so the
    (window, head) loop below runs on VMEM-resident data with no HBM
    traffic of its own.  G > 1 (``window_batch``) amortises per-grid-step
    dispatch and the one-hot/mask builds over G windows with ZERO
    cross-window score waste (unlike folding windows into the token axis,
    which squares the block) — each window is a clean leading-dim index,
    so there are no misaligned sublane slices either.

    Bias refs are PAIR-MERGED, (1, H/pair, block_q, pair·K): the bias
    einsum emits 128/D heads side by side along the minor dim (full-width
    lanes, no narrow-tile relayouts anywhere in XLA), and the kernel
    applies each head's share via a one-hot expand matmul whose rows for
    the OTHER head of the pair are zero — so the pair-merged
    ``[bias_h | bias_w]`` concat feeds the matmul unsliced (an unaligned
    kh-offset lane slice would cost a relayout; zero rows are free).
    Contraction-folding the bias (as in the global kernel) was measured
    SLOWER at 196-token tiles — per-head lane concats outweigh the tiny
    MXU passes saved.
    """
    gsz, bq = qkv_ref.shape[0], qkv_ref.shape[1]
    c = num_heads * head_dim
    has_bias = bias_h_ref is not None
    # bf16 inputs run the whole score pipeline in bf16 (the (bq, bq)
    # elementwise chain is the VPU hot spot and bf16 halves it); fp32
    # inputs keep the exact path for parity.  VDR_FLASH_SCORE_F32=1
    # forces fp32 scores (trace-time A/B knob — see the global kernel).
    rdtype = qkv_ref.dtype
    sdtype = rdtype if rdtype == jnp.bfloat16 else jnp.float32
    if os.environ.get("VDR_FLASH_SCORE_F32", "0") == "1":
        sdtype = jnp.float32

    if window_tokens < bq:
        qidx = lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
        kidx = lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
        same_window = qidx // window_tokens == kidx // window_tokens
        row_of_col = lambda cols: (cols % window_tokens) // kw  # noqa: E731
    else:
        # one window per block: no cross-window masking needed at all
        same_window = None
        row_of_col = lambda cols: cols // kw  # noqa: E731
    expands = None
    if has_bias:
        # per-pair-slot expand matrices, built once and reused across the
        # head loop (see _pair_slot_expands)
        expands = _pair_slot_expands(pair, kh, kw, bq, row_of_col, rdtype)
    # ones column rides the PV matmul so the softmax denominator comes out
    # of the MXU for free (the out tile is lane-padded anyway) instead of
    # costing a VPU reduction over the full (bq, bq) score tile
    ones_col = jnp.ones((bq, 1), rdtype)

    for g in range(gsz):
        rows = qkv_ref[g]                # (bq, 3C), or (bq, C) q rows
        kv_rows = kv_ref[g] if kv_ref is not None else None   # (bq, 2C)
        outs = []
        cat = None
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = rows[:, sl]
            if kv_rows is not None:
                kblk = kv_rows[:, sl]
                vblk = kv_rows[:, c + h * head_dim:c + (h + 1) * head_dim]
            else:
                kblk = rows[:, c + h * head_dim:c + (h + 1) * head_dim]
                vblk = rows[:, 2 * c + h * head_dim:
                            2 * c + (h + 1) * head_dim]

            # scale folds into q: a (bq, d) multiply instead of a
            # (bq, bq) pass over the score tile
            s = jnp.dot(q * scale, kblk.T,
                        preferred_element_type=jnp.float32)
            if has_bias:
                if h % pair == 0:
                    # this pair's merged [bias_h | bias_w] rows, log2(e)
                    # folded in; shared by both heads of the pair
                    cat = jnp.concatenate(
                        [bias_h_ref[g, h // pair],
                         bias_w_ref[g, h // pair]],
                        axis=-1,
                    )                                  # (bq, pair·(kh+kw))
                    cat = (cat.astype(jnp.float32) * _LOG2E).astype(rdtype)
                s = s + jnp.dot(cat, expands[h % pair],
                                preferred_element_type=jnp.float32)
            s = s.astype(sdtype)
            if same_window is not None:
                s = jnp.where(same_window, s, jnp.asarray(_NEG_INF, sdtype))

            if nomax:
                # unnormalised-exponential softmax (see the global
                # kernel): drop the max scan + subtract — safe while
                # |logit| < 88 nats (measured ~5 on SAM-B; default ON,
                # VDR_FLASH_NOMAX=0 opts out)
                p = jnp.exp2(s.astype(q.dtype))
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2((s - m).astype(q.dtype))
            vaug = jnp.concatenate([vblk, ones_col], axis=-1)  # (bq, d+1)
            acc = jnp.dot(p.astype(vblk.dtype), vaug,
                          preferred_element_type=jnp.float32)
            l = acc[:, head_dim:]
            outs.append(acc[:, :head_dim] / jnp.where(l > 0, l, 1.0))

        o_ref[g] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fused_global_kernel(
    q_ref, k_ref, v_ref, bias_h_ref, bias_w_ref, kv_len_ref, o_ref,
    m_scratch, acc_scratch,
    *, block_k: int, scale: float, has_kv_len: bool,
    kh: int, kw: int, pair: int, head_dim: int, schedule: str,
    nomax: bool = False,
):
    """Online-softmax kv loop; refs carry ``pair`` heads side by side.

    ``nomax=True`` drops the running-max machinery entirely (the
    per-element max scan + subtract and the accumulator alpha-rescale —
    2 of the 3 VPU ops on the (bq, bk) score tile, the measured binding
    cost of the global layers): softmax is invariant to the subtracted
    constant, so ``p = exp2(s)`` accumulates directly and the ones-column
    denominator normalises at the end.  Safe whenever the logits stay
    below the exp2 overflow bound — |logit| < 127/log2e ≈ 88 nats (bf16
    and fp32 share the 8-bit exponent) — which holds with orders of
    magnitude of margin for trained ViT backbones (SAM/DINOv2 attention
    logits are O(10)); padding masks still work (exp2(-1e30·log2e) = 0).
    Inference-only lever; default ON since the round-3 on-chip A/B
    (+5.7%, precondition measured at ~5 nats) — ``VDR_FLASH_NOMAX=0``
    opts out.

    grid = (B, H/pair, Sq/block_q, Sk/block_k); kv innermost,
    ``arbitrary``; m/acc scratch persists across kv steps.  The softmax
    denominator is NOT a separate reduction: a ones column rides the PV
    matmul, so column ``head_dim`` of the accumulator is the running sum
    (the out tile is lane-padded past head_dim anyway — the extra MXU
    column is free, the removed (bq, block_k) VPU reduction is not).

    ``schedule`` picks the issue order of the per-head work (same math,
    same per-head online-softmax sequence — only program order differs):

    * ``base`` — score → softmax → PV per head, heads sequential.
    * ``skew`` — every head's score matmul is issued BEFORE the previous
      head's softmax chain, so the MXU (next score) and the VPU (current
      softmax) have independent work in flight at every point.
    * ``twolevel`` — two-level k tiling: the kv tile is processed in
      512-wide sub-tiles (DMA granularity stays block_k — the online
      softmax just takes more, smaller steps), skew-issued across
      (sub-tile, head) pairs.  Smaller score transients + a steady
      stream of independent MXU/VPU work.
    """
    kv_idx = pl.program_id(3)
    num_kv = pl.num_programs(3)
    has_bias = bias_h_ref is not None

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    rows_q = q_ref[0]                                  # (bq, pair·d)
    rows_k = k_ref[0]                                  # (bk, pair·d)
    rows_v = v_ref[0]
    # bf16 inputs keep scores/max/exp in bf16 — the (bq, block_k)
    # elementwise chain is the VPU hot spot and bf16 halves it; running
    # statistics (m, acc incl. the sum column) stay fp32.  fp32 inputs
    # keep the exact path for parity.  VDR_FLASH_SCORE_F32=1 forces the
    # fp32 chain on bf16 inputs — the one-shot A/B knob that turns the
    # "exp2 VPU chain is irreducible short of lower-precision exp" claim
    # into data (`bench.py scoredtype`); read at TRACE time.
    sdtype = rows_q.dtype if rows_q.dtype == jnp.bfloat16 else jnp.float32
    if os.environ.get("VDR_FLASH_SCORE_F32", "0") == "1":
        sdtype = jnp.float32

    if has_kv_len:
        kv_len = kv_len_ref[pl.program_id(0), 0]

    # Bias application, cheapest first (see _bias_onehot_cols): fold the
    # FULL (un-row-selected) bias_h into the QK contraction's idle lanes
    # when head_dim + kh fits the same MXU pass count as head_dim alone
    # (SAM global: 64 + 64 = 128 → zero extra passes, and the per-kv-step
    # row select disappears — the one-hot key matrix picks each key's
    # global grid row directly).  bias_w is periodic with period kw across
    # the key tile: pltpu.repeat tiles it block_k/kw times — a VPU add
    # that overlaps the MXU instead of the old full-tile expand matmul.
    fold = has_bias and _mxu_passes(head_dim + kh) == _mxu_passes(head_dim)
    expand = sel = onehot = None
    kv_rows = block_k // kw if has_bias else 0
    if has_bias:
        if fold:
            base = kv_idx * kv_rows
            onehot = _bias_onehot_cols(
                kh, 0, block_k, lambda cols: base + cols // kw,
                rows_q.dtype,
            )                                          # (bk, kh)
        else:
            if kv_rows != kh:
                row_ids = lax.broadcasted_iota(jnp.int32, (kh, kv_rows), 0)
                col_ids = lax.broadcasted_iota(jnp.int32, (kh, kv_rows), 1)
                sel = (row_ids == kv_idx * kv_rows + col_ids).astype(
                    rows_q.dtype)
            expand = _bias_expand_matrix(
                kv_rows, kw, block_k, lambda cols: cols // kw, rows_q.dtype
            )
    if has_bias:
        # (bq, pair·kh): this head pair's bias rows, pair-merged along
        # lanes by the block-diagonal bias einsum (see WindowedAttention);
        # per-head access below is an ALIGNED kh-wide lane slice — the
        # same pattern as the per-head qkv slices
        bias_h_pair = bias_h_ref[0, 0]
        bias_w_pair = bias_w_ref[0, 0]

    # kv sub-tiling (two-level k tiling).  The expand-matmul bias path is
    # built for full-width tiles; restrict sub-tiling to the fold and
    # no-bias paths, which slice cleanly.
    sub_k = block_k
    if schedule.startswith("twolevel") and (fold or not has_bias):
        want = int(schedule[8:]) if schedule[8:] else 512
        for cand in (want, 512, 256, 128):
            if block_k > cand and block_k % cand == 0 \
                    and (not has_bias or cand % kw == 0):
                sub_k = cand
                break
    nsub = block_k // sub_k

    def score(hh, k0):
        """Scores for head slot hh over keys [k0, k0+sub_k), bias applied
        and padding masked, in sdtype."""
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        q = rows_q[:, sl]
        kblk = rows_k[k0:k0 + sub_k, sl]
        if fold:
            bias_h = bias_h_pair[:, hh * kh:(hh + 1) * kh]    # (bq, kh)
            bias_h = (bias_h.astype(jnp.float32) * _LOG2E).astype(q.dtype)
            qa = jnp.concatenate([q * scale, bias_h], axis=-1)
            ka = jnp.concatenate([kblk, onehot[k0:k0 + sub_k]], axis=-1)
            s = jnp.dot(qa, ka.T, preferred_element_type=jnp.float32)
            s = s.astype(sdtype)
            bias_w = bias_w_pair[:, hh * kw:(hh + 1) * kw]    # (bq, kw)
            bias_w = (bias_w.astype(jnp.float32) * _LOG2E).astype(sdtype)
            s = s + pltpu.repeat(bias_w, sub_k // kw, axis=1)
        else:
            # scale folds into q (see window kernel)
            s = jnp.dot(q * scale, kblk.T,
                        preferred_element_type=jnp.float32)
            if has_bias:
                bias_h = bias_h_pair[:, hh * kh:(hh + 1) * kh]
                bias_w = bias_w_pair[:, hh * kw:(hh + 1) * kw]
                if sel is not None:
                    # select this kv tile's key-grid rows via one-hot matmul
                    bias_h = jnp.dot(
                        bias_h, sel, preferred_element_type=jnp.float32
                    ).astype(bias_h.dtype)
                s = _expand_bias(bias_h, bias_w, s, expand=expand)
            s = s.astype(sdtype)
        if has_kv_len:
            # single iota row; the where broadcasts it over q rows
            kidx = kv_idx * block_k + k0 + lax.broadcasted_iota(
                jnp.int32, (1, sub_k), 1
            )
            s = jnp.where(kidx < kv_len, s, jnp.asarray(_NEG_INF, sdtype))
        return s

    def softmax_update(hh, s, k0):
        """Online-softmax step: fold scores ``s`` (keys [k0, k0+sub_k))
        into head slot hh's running (m, acc) scratch."""
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        vblk = rows_v[k0:k0 + sub_k, sl]
        if nomax:
            p = jnp.exp2(s.astype(rows_q.dtype))
            vaug = jnp.concatenate(
                [vblk, jnp.ones((sub_k, 1), rows_v.dtype)], axis=-1
            )
            acc_scratch[hh] += jnp.dot(
                p.astype(vblk.dtype), vaug,
                preferred_element_type=jnp.float32,
            )
            return
        m_prev = m_scratch[hh]
        m_new = jnp.maximum(
            m_prev, jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
        )
        # quantise the running max through the score dtype so the SAME
        # value feeds p, alpha and the stored max: tiles accumulated
        # under different running maxima then carry no differential
        # rounding offset (in bf16 mode the max of bf16 scores is already
        # bf16-representable, so this is a numerical no-op that makes the
        # invariant explicit; in fp32 mode sdtype is fp32)
        m_new = m_new.astype(sdtype).astype(jnp.float32)
        p = jnp.exp2((s - m_new.astype(sdtype)).astype(rows_q.dtype))
        alpha = jnp.exp2(m_prev - m_new)
        m_scratch[hh] = m_new
        vaug = jnp.concatenate(
            [vblk, jnp.ones((sub_k, 1), rows_v.dtype)], axis=-1
        )                                              # (sub_k, d+1)
        acc_scratch[hh] = acc_scratch[hh] * alpha + jnp.dot(
            p.astype(vblk.dtype), vaug, preferred_element_type=jnp.float32
        )

    if schedule == "base":
        for hh in range(pair):
            softmax_update(hh, score(hh, 0), 0)
    else:
        # skew / twolevel: issue work unit i+1's score matmul before work
        # unit i's softmax chain, so the trace hands Mosaic's scheduler an
        # independent MXU stream to overlap the VPU chain with
        pending = None
        for sub in range(nsub):
            for hh in range(pair):
                s = score(hh, sub * sub_k)
                if pending is not None:
                    softmax_update(*pending)
                pending = (hh, s, sub * sub_k)
        softmax_update(*pending)

    @pl.when(kv_idx == num_kv - 1)
    def _store():
        outs = []
        for hh in range(pair):
            acc = acc_scratch[hh]
            l = acc[:, head_dim:]
            outs.append(acc[:, :head_dim] / jnp.where(l > 0, l, 1.0))
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def flash_attention_fused_qkv(
    qkv: jax.Array,
    bias_h: jax.Array | None = None,
    bias_w: jax.Array | None = None,
    kv_len: jax.Array | None = None,
    *,
    num_heads: int,
    window_tokens: int | None = None,
    window_batch: int = 1,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    schedule: str | None = None,
    nomax: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention reading q/k/v straight from the QKV projection.

    Args:
        qkv: (B, S, 3·H·D) projection output, columns ordered
            [q·H heads | k·H heads | v·H heads], each head D wide — the
            natural layout of ``x @ W_qkv`` with the standard weight order.
        bias_h: optional decomposed rel-pos row terms in PAIR-MERGED
            layout ``(B, H/pair, S, pair·Kh)`` where ``pair = 128 // D``
            head groups share one 128-lane block — produced by reshaping
            the token-major ``byxnd,ykd->byxnk`` bias einsum output from
            (B, S, H, Kh) via ``.reshape(B, S, H/pair, pair·Kh)`` then
            swapping to head-group-major (see models/vit.py); no
            narrow-minor-dim transpose is ever materialised.  In global
            mode ``Kh·Kw == S``; in window mode ``Kh·Kw ==
            window_tokens`` with the per-window bias layout (each query
            row carries its own window's grid-row terms).
        bias_w: optional ``(B, H/pair, S, pair·Kw)`` column terms, same
            pair-merged layout.
        kv_len: optional (B,) int32 valid key counts (global mode only).
        schedule: global-mode issue order — ``base`` | ``skew`` |
            ``twolevel`` (see :func:`_fused_global_kernel`); identical
            math, different MXU/VPU overlap.  ``None`` reads
            ``VDR_FLASH_SCHEDULE`` (default ``base``).
        nomax: unnormalised-exponential softmax in BOTH modes — drop the
            row max (window mode) / running max (global mode; see
            :func:`_fused_global_kernel`); requires |logit| < 88 nats
            (measured ~5 on SAM-B @1024 — probe_max_abs_logit).  ``None``
            reads ``VDR_FLASH_NOMAX`` (default ON since the round-3
            on-chip A/B: +5.7%; these fused kernels are inference-only,
            so the trainable/parity paths are unaffected).
        num_heads: H.  H·D and the per-grid-step head group (128/D heads)
            must tile into 128-lane blocks: D ∈ {64, 128, 256, …} with H a
            multiple of 128/D (``ValueError`` otherwise — callers fall
            back to :func:`flash_attention`).
        window_tokens: enable block-diagonal window mode — the token axis
            is a concatenation of independent windows of this many tokens;
            requires window_tokens | block_q (kv tile == q tile).
        window_batch: window mode only — batch rows (windows) per grid
            step.  The kernel statically loops over them with hoisted
            one-hot/mask builds, amortising per-step dispatch with zero
            cross-window score waste.  Must divide B.
        block_q / block_k: tile sizes; S must be divisible by both.

    Returns:
        (B, S, H·D) attention output in output-projection-ready layout.
    """
    if isinstance(qkv, (tuple, list)):
        # split projection: q (B, S, C) and kv (B, S, 2C) as separate
        # arrays — lets the caller's bias einsum read the q section
        # stride-uniformly instead of materialising a slice copy of the
        # packed (B, S, 3C) output
        q_arr, kv_arr = qkv
        b, s, c_w = q_arr.shape
        if kv_arr.shape != (b, s, 2 * c_w):
            raise ValueError(
                f"kv shape {kv_arr.shape} != ({b}, {s}, {2 * c_w})")
        three_c = 3 * c_w
        dtype_ref = q_arr
    else:
        q_arr = kv_arr = None
        b, s, three_c = qkv.shape
        dtype_ref = qkv
    if three_c % (3 * num_heads):
        raise ValueError(f"qkv width {three_c} != 3·H·D for H={num_heads}")
    d = three_c // (3 * num_heads)
    pair = _head_group(num_heads, d)
    if pair is None:
        raise ValueError(
            f"head layout H={num_heads}, D={d} does not tile into 128-lane "
            "blocks"
        )
    scale = (d ** -0.5) if scale is None else scale
    has_bias = bias_h is not None
    if has_bias != (bias_w is not None):
        raise ValueError("bias_h and bias_w must be given together")
    kh = kw = 0
    hp_count = num_heads // pair
    if has_bias:
        # both modes take PAIR-MERGED bias: (B, H/pair, S, pair·K)
        if bias_h.shape[-1] % pair or bias_w.shape[-1] % pair:
            raise ValueError(
                f"bias trailing dims ({bias_h.shape[-1]}, "
                f"{bias_w.shape[-1]}) must be pair-merged ({pair}·K)"
            )
        kh, kw = bias_h.shape[-1] // pair, bias_w.shape[-1] // pair
        if bias_h.shape[:3] != (b, hp_count, s):
            raise ValueError(
                f"bias_h shape {bias_h.shape} != "
                f"({b}, {hp_count}, {s}, {pair}·{kh})"
            )
    hd = num_heads * d
    out_shape = jax.ShapeDtypeStruct((b, s, hd), dtype_ref.dtype)
    block_q = min(block_q, s)

    # validate before the window-mode early return so a typo'd schedule
    # (or VDR_FLASH_SCHEDULE) fails loudly on BOTH paths — window mode
    # has a single fixed issue order and simply doesn't use it
    if schedule is None:
        schedule = os.environ.get("VDR_FLASH_SCHEDULE", "base")
    if nomax is None:
        # Default ON for these (inference-only) fused kernels since the
        # round-3 on-chip A/B: +5.7% (103.6 → 109.5 img/s, 52.1% MFU)
        # with the |logit| < 88 nat precondition now MEASURED (observed
        # ~5 on SAM-B @1024; probe_max_abs_logit / bench.py nomax).
        # The trainable and oracle paths never reach this code, so
        # training/parity numerics are untouched.  VDR_FLASH_NOMAX=0
        # restores the running-max softmax.
        nomax = os.environ.get("VDR_FLASH_NOMAX", "1") == "1"
    if schedule not in ("base", "skew") and not (
            schedule.startswith("twolevel")
            and (schedule[8:] == "" or schedule[8:].isdigit())):
        raise ValueError(f"unknown schedule {schedule!r}")

    if window_tokens:
        if kv_len is not None:
            raise ValueError("kv_len is not supported in window mode")
        if block_q % window_tokens or s % block_q:
            raise ValueError(
                f"window_tokens {window_tokens} must divide block {block_q}"
                f" and block must divide seq {s}"
            )
        if has_bias and kh * kw != window_tokens:
            raise ValueError(
                f"per-window bias grid {kh}x{kw} != window_tokens "
                f"{window_tokens}"
            )
        gsz = window_batch
        if gsz < 1 or b % gsz:
            raise ValueError(f"window_batch {gsz} must divide B = {b}")
        if q_arr is not None:
            in_specs = [
                pl.BlockSpec((gsz, block_q, three_c // 3),
                             lambda bi, j: (bi, j, 0)),
                pl.BlockSpec((gsz, block_q, 2 * (three_c // 3)),
                             lambda bi, j: (bi, j, 0)),
            ]
            args = [q_arr, kv_arr]
        else:
            in_specs = [
                pl.BlockSpec((gsz, block_q, three_c),
                             lambda bi, j: (bi, j, 0)),
            ]
            args = [qkv]
        if has_bias:
            in_specs += [
                pl.BlockSpec((gsz, hp_count, block_q, pair * kh),
                             lambda bi, j: (bi, 0, j, 0)),
                pl.BlockSpec((gsz, hp_count, block_q, pair * kw),
                             lambda bi, j: (bi, 0, j, 0)),
            ]
            args += [bias_h, bias_w]

        def wrapped_window(*refs):
            it = iter(refs)
            qkv_ref = next(it)
            kv_ref = next(it) if q_arr is not None else None
            bh_ref = next(it) if has_bias else None
            bw_ref = next(it) if has_bias else None
            _fused_window_kernel(
                qkv_ref, kv_ref, bh_ref, bw_ref, next(it),
                num_heads=num_heads, head_dim=d,
                window_tokens=window_tokens, kh=kh, kw=kw, pair=pair,
                scale=scale * _LOG2E, nomax=nomax,
            )

        return pl.pallas_call(
            wrapped_window,
            grid=(b // gsz, s // block_q),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((gsz, block_q, hd),
                                   lambda bi, j: (bi, j, 0)),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=int(os.environ.get(
                    "VDR_FLASH_VMEM_LIMIT", str(64 * 1024 * 1024))),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * num_heads * s * block_q * d,
                bytes_accessed=b * s * three_c * dtype_ref.dtype.itemsize,
                transcendentals=b * num_heads * s * block_q,
            ),
            interpret=interpret,
        )(*args)

    # ---- global mode ----
    block_k = min(block_k, s)
    if has_bias:
        if kh * kw != s:
            raise ValueError(f"Kh*Kw = {kh}*{kw} != S = {s}")
        if block_k % kw:
            block_k = kw * max(1, block_k // kw) if block_k > kw else kw
            if s % block_k:
                block_k = kw
    if s % block_q or s % block_k:
        raise ValueError(
            f"seq len {s} must divide blocks ({block_q}, {block_k})"
        )
    lane = pair * d
    # grid order (b, q, hp, kv): kv innermost (online-softmax scratch),
    # head-pair second — the bias blocks carry ALL heads for a q row range
    # (Pallas requires the trailing block dims to equal the array dims
    # here), and with hp inside q their index map is constant across the
    # hp·kv inner loops, so Pallas fetches each bias block once per
    # (batch, q block) rather than once per head pair.
    grid = (b, s // block_q, hp_count, s // block_k)
    if q_arr is not None:
        in_specs = [
            pl.BlockSpec((1, block_q, lane),
                         lambda bi, j, hp, t: (bi, j, hp)),
            pl.BlockSpec((1, block_k, lane),
                         lambda bi, j, hp, t: (bi, t, hp)),
            pl.BlockSpec((1, block_k, lane),
                         lambda bi, j, hp, t: (bi, t, hp_count + hp)),
        ]
        args = [q_arr, kv_arr, kv_arr]
    else:
        in_specs = [
            pl.BlockSpec((1, block_q, lane),
                         lambda bi, j, hp, t: (bi, j, hp)),
            pl.BlockSpec((1, block_k, lane),
                         lambda bi, j, hp, t: (bi, t, hp_count + hp)),
            pl.BlockSpec((1, block_k, lane),
                         lambda bi, j, hp, t: (bi, t, 2 * hp_count + hp)),
        ]
        args = [qkv, qkv, qkv]
    if has_bias:
        in_specs += [
            pl.BlockSpec((1, 1, block_q, pair * kh),
                         lambda bi, j, hp, t: (bi, hp, j, 0)),
            pl.BlockSpec((1, 1, block_q, pair * kw),
                         lambda bi, j, hp, t: (bi, hp, j, 0)),
        ]
        args += [bias_h, bias_w]
    has_kv_len = kv_len is not None
    if has_kv_len:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(kv_len.astype(jnp.int32).reshape(b, 1))

    kernel = functools.partial(
        _fused_global_kernel,
        block_k=block_k,
        scale=scale * _LOG2E,
        has_kv_len=has_kv_len,
        kh=kh,
        kw=kw,
        pair=pair,
        head_dim=d,
        schedule=schedule,
        nomax=nomax,
    )

    def wrapped(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref = next(it), next(it), next(it)
        bh_ref = next(it) if has_bias else None
        bw_ref = next(it) if has_bias else None
        kl_ref = next(it) if has_kv_len else None
        o_ref = next(it)
        kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, kl_ref, o_ref, *it)

    return pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, lane),
                               lambda bi, j, hp, t: (bi, j, hp)),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((pair, block_q, 1), jnp.float32),      # running max
            # accumulator; column d is the running softmax sum (ones-column
            # PV trick — see _fused_global_kernel)
            pltpu.VMEM((pair, block_q, d + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=int(os.environ.get(
                "VDR_FLASH_VMEM_LIMIT", str(64 * 1024 * 1024))),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * d,
            bytes_accessed=b * s * three_c * dtype_ref.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(*args)
