"""Fused LayerNorm → MLP → residual Pallas kernel (inference fast path).

The second half of every transformer block —
``x + gelu(LN(x) @ w1 + b1) @ w2 + b2`` — is *bandwidth*-bound on this
chip, not FLOP-bound: XLA materialises the 4×-wide hidden activation in
HBM twice (w1 output, w2 input) plus the LN output and the residual
read, ~450 MB per SAM ViT-B block at batch 4 against ~200 GB/s measured
effective HBM bandwidth.  This kernel keeps the hidden activation
entirely in VMEM: a row tile is loaded once, layer-normalised on the
VPU, pushed through both matmuls in hidden-dimension chunks on the MXU
(gelu between them in registers), and written once with the residual
added — HBM traffic drops to the row tile in + out plus one pass over
the weights.

Numerics match the unfused module path (models/vit.py ``LayerNorm`` +
``Mlp`` under the ``fast`` policy): fp32 LN statistics, bf16 matmul
inputs with fp32 accumulation, tanh gelu on the fp32 w1 output, bf16
residual add.  The trainable/parity paths keep the unfused modules (the
kernel is forward-only); reference composition at
/root/reference/src/models_archs.py:186-200 (MLPLayer) — here fused
with the pre-norm and skip connection of the standard ViT block.

STATUS (round 3): OPT-IN, default off.  The bandwidth argument above
did not survive contact with the compiler: XLA's in-context fusion of
the gelu chain leaves far less HBM traffic than the naive model
predicts, and under the promoted nomax attention path the interleaved
on-chip A/B (``bench.py mlpfuse``) measures the plain modules 2.6%
FASTER than this kernel (112.5 vs 109.7 img/s @B4; the round-2
measurement had the kernel +1 img/s ahead).  Kept opt-in
(``VDR_FUSED_MLP=1``) with its numerics tests — the bit-exactness
contract still holds.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ln_mlp_residual"]


def _kernel(
    x_ref,        # (block_n, C) compute dtype — pre-LN rows = residual
    scale_ref,    # (1, C) f32 LN scale
    lnb_ref,      # (1, C) f32 LN bias
    w1_ref,       # (C, H) compute dtype
    b1_ref,       # (1, H) f32
    w2_ref,       # (H, C) compute dtype
    b2_ref,       # (1, C) f32
    ls_ref,       # (1, C) compute dtype layerscale, or None
    out_ref,      # (block_n, C) compute dtype
    *,
    eps: float,
    chunk: int,
):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...] + lnb_ref[...]
    yb = y.astype(x.dtype)

    h_total = w1_ref.shape[1]
    c = x.shape[1]
    acc = jnp.zeros((x.shape[0], c), jnp.float32)
    # static hidden-chunk loop: the (block_n, chunk) hidden tile lives
    # only in VMEM/registers; chunk i+1's w1 matmul is independent of
    # chunk i's gelu chain, so the MXU pipelines under the VPU.
    for hk in range(0, h_total, chunk):
        h = jnp.dot(
            yb, w1_ref[:, hk:hk + chunk],
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, hk:hk + chunk]
        g = jax.nn.gelu(h, approximate=True).astype(x.dtype)
        acc = acc + jnp.dot(
            g, w2_ref[hk:hk + chunk, :],
            preferred_element_type=jnp.float32,
        )
    out = (acc + b2_ref[...]).astype(x.dtype)
    if ls_ref is not None:
        out = out * ls_ref[...]
    out_ref[...] = x + out


@functools.partial(
    jax.jit,
    static_argnames=("eps", "block_n", "chunk", "interpret"),
)
def fused_ln_mlp_residual(
    x: jax.Array,           # (..., C) compute-dtype activations
    ln_scale: jax.Array,    # (C,)
    ln_bias: jax.Array,     # (C,)
    w1: jax.Array,          # (C, H)
    b1: jax.Array,          # (H,)
    w2: jax.Array,          # (H, C)
    b2: jax.Array,          # (C,)
    layerscale: jax.Array | None = None,   # (C,) or None
    *,
    eps: float = 1e-6,
    block_n: int = 512,
    chunk: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """``x + gelu(LN(x) @ w1 + b1) @ w2 + b2`` without HBM hidden state.

    Leading dims of ``x`` are flattened to rows and padded to the row
    tile; weights/biases are cast as the unfused module path does
    (matmul inputs to ``x.dtype``, biases/LN params to fp32).
    """
    # like the attention kernels: interpreter mode off-TPU (CPU tests /
    # virtual meshes run the same kernel code)
    interpret = interpret or jax.default_backend() != "tpu"
    orig_shape = x.shape
    c = x.shape[-1]
    h_total = w1.shape[1]
    if h_total % chunk:
        chunk = h_total  # degenerate sizes: single chunk
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, c)
    pad = (-rows) % block_n
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n = x2.shape[0]

    cd = x.dtype
    args = [
        x2,
        ln_scale.astype(jnp.float32).reshape(1, c),
        ln_bias.astype(jnp.float32).reshape(1, c),
        w1.astype(cd),
        b1.astype(jnp.float32).reshape(1, h_total),
        w2.astype(cd),
        b2.astype(jnp.float32).reshape(1, c),
    ]
    in_specs = [
        pl.BlockSpec((block_n, c), lambda i: (i, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((c, h_total), lambda i: (0, 0)),
        pl.BlockSpec((1, h_total), lambda i: (0, 0)),
        pl.BlockSpec((h_total, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
    ]
    if layerscale is not None:
        args.append(layerscale.astype(cd).reshape(1, c))
        in_specs.append(pl.BlockSpec((1, c), lambda i: (0, 0)))
        kernel = functools.partial(_kernel, eps=eps, chunk=chunk)
    else:
        kernel = functools.partial(
            lambda *refs, eps, chunk: _kernel(
                *refs[:-1], None, refs[-1], eps=eps, chunk=chunk
            ),
            eps=eps, chunk=chunk,
        )

    out = pl.pallas_call(
        kernel,
        grid=(n // block_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_n, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), cd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=int(os.environ.get(
                "VDR_MLP_VMEM_LIMIT", 64 * 1024 * 1024)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c * h_total,
            bytes_accessed=(
                2 * n * c * x2.dtype.itemsize
                + (w1.size + w2.size) * jnp.dtype(cd).itemsize
            ),
            transcendentals=n * h_total,
        ),
        interpret=interpret,
    )(*args)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)
