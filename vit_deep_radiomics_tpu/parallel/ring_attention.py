"""Ring attention: sequence-parallel attention over the device mesh.

The reference bounds sequence length by construction (ROI crops, masked
tokens, 13-slice windows — SURVEY.md §5 "long-context") and has no
sequence parallelism.  For whole-volume token sets that exceed one
chip's memory, this module shards keys/values over the ``data`` axis and
rotates KV shards around the ring with ``jax.lax.ppermute`` while each
device accumulates its queries' online softmax — communication rides
ICI point-to-point and overlaps with compute.

The online-softmax accumulation is the same math as the Pallas flash
kernel (ops/attention.py), applied across devices instead of across
tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import DATA_AXIS

__all__ = ["ring_attention", "cross_attention_kv_sharded"]

_NEG_INF = -1e30


def _ring_body(q, k_local, v_local, mask_local, axis_name: str,
               scale: float, has_mask: bool):
    n = jax.lax.psum(1, axis_name)

    # initial accumulators must carry the same varying-axis type as the
    # per-device values they'll be updated with (new shard_map semantics)
    m = jax.lax.pvary(
        jnp.full(q.shape[:-1] + (1,), _NEG_INF, jnp.float32), axis_name
    )
    l = jax.lax.pvary(jnp.zeros(q.shape[:-1] + (1,), jnp.float32), axis_name)
    acc = jax.lax.pvary(jnp.zeros(q.shape, jnp.float32), axis_name)

    qf = q.astype(jnp.float32) * scale

    def step(carry, _):
        m, l, acc, k_blk, v_blk, mask_blk = carry
        s = jnp.einsum(
            "...qd,...kd->...qk", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if has_mask:
            # mask_blk: (B, Sk_local) validity of the CURRENT k shard —
            # it rotates around the ring together with k/v
            s = jnp.where(mask_blk[:, None, None, :], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "...qk,...kd->...qd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # rotate KV to the next device; overlapped with the next step's
        # compute by XLA's async collective scheduling
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if has_mask:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (m_new, l, acc, k_blk, v_blk, mask_blk), None

    (m, l, acc, _, _, _), _ = jax.lax.scan(
        step, (m, l, acc, k_local, v_local, mask_local), None, length=n
    )
    safe_l = jnp.where(l > 0, l, 1.0)
    return (acc / safe_l).astype(q.dtype)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    token_mask: jax.Array | None = None,
    *,
    axis_name: str = DATA_AXIS,
    scale: float | None = None,
):
    """Attention with KV sharded over *axis_name* of the mesh.

    Args:
        q, k, v: (B, H, S, D) global arrays; S must divide the ring size.
            Queries stay sharded (each device computes its S/N query
            rows); K/V shards rotate N-1 times so every query sees every
            key.
        token_mask: optional (B, S) bool key validity (padding mask for
            ragged whole-volume token sets); sharded with the sequence
            and rotated with the K/V shards.

    Returns the same result as full attention, computed without any
    device ever holding the whole K/V.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    has_mask = token_mask is not None

    body = functools.partial(
        _ring_body, axis_name=axis_name, scale=scale, has_mask=has_mask)
    spec = P(None, None, axis_name, None)
    mask_spec = P(None, axis_name)
    if not has_mask:
        # shard_map needs a concrete operand; a dummy all-valid shard
        token_mask = jnp.ones(q.shape[0:1] + q.shape[2:3], bool)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, mask_spec),
        out_specs=spec,
    )
    return fn(q, k, v, token_mask)


def _cross_body(q, k_local, v_local, mask_local, axis_name: str,
                scale: float, has_mask: bool):
    """Replicated-q attention over a KV shard + global softmax combine.

    Each device scores its local keys, then the partial statistics merge
    with one pmax + two psums — the distributed-softmax identity, exact
    (same math as the ring's online accumulation, collapsed to one step
    because q is tiny and replicated)."""
    qf = q.astype(jnp.float32) * scale
    s = jnp.einsum(
        "...qd,...kd->...qk", qf, k_local.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if has_mask:
        s = jnp.where(mask_local[:, None, None, :], s, _NEG_INF)
    m_loc = jnp.max(s, axis=-1, keepdims=True)
    # stability shift only — softmax is shift-invariant, so the gradient
    # must not (and mathematically does not) flow through the max.
    # stop_gradient goes on pmax's INPUT: with a symbolically-zero
    # tangent the AD machinery never needs pmax's (missing)
    # differentiation rule
    m_g = jax.lax.pmax(jax.lax.stop_gradient(m_loc), axis_name)
    p = jnp.exp(s - m_g)
    l = jax.lax.psum(jnp.sum(p, axis=-1, keepdims=True), axis_name)
    acc = jax.lax.psum(
        jnp.einsum("...qk,...kd->...qd", p, v_local.astype(jnp.float32),
                   preferred_element_type=jnp.float32),
        axis_name,
    )
    safe_l = jnp.where(l > 0, l, 1.0)
    return (acc / safe_l).astype(q.dtype)


def cross_attention_kv_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    token_mask: jax.Array | None = None,
    *,
    axis_name: str = DATA_AXIS,
    scale: float | None = None,
):
    """Cross-attention with replicated queries and KV sharded over
    *axis_name* — the whole-volume bimodal companion to
    :func:`ring_attention`.

    The bimodal classifier reads ONLY the CLS position of its
    cross-attention outputs (models/classifiers.py, mirroring reference
    models_archs.py:100-104), so its whole-volume cross step is a
    handful of query rows against a sequence-sharded KV: each device
    scores its local K/V shard and the partial softmax statistics merge
    with one ``pmax`` + two ``psum`` collectives (exact — the
    distributed-softmax identity).  q: (B, H, Sq, D) with small Sq,
    replicated; k/v: (B, H, Sk, D) sharded on Sk; optional (B, Sk) key
    validity mask, sharded with the keys.
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    has_mask = token_mask is not None
    if not has_mask:
        token_mask = jnp.ones(k.shape[0:1] + k.shape[2:3], bool)
    body = functools.partial(
        _cross_body, axis_name=axis_name, scale=scale, has_mask=has_mask)
    kv_spec = P(None, None, axis_name, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), kv_spec, kv_spec, P(None, axis_name)),
        out_specs=P(),
    )
    return fn(q, k, v, token_mask)
