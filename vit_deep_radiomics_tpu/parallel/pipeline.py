"""Pipeline parallelism (GPipe) for the ViT backbone over the mesh.

The reference has no distributed backend at all (SURVEY.md §2/§5); this
module adds the pipeline axis to the framework's parallelism surface
(data: engine/train.py GSPMD + sharding.py shard_map; tensor:
sharding.py Megatron specs; sequence: ring_attention.py).  Pipelining
serves backbones whose parameters do not fit one chip: each device holds
``depth / n_stages`` transformer blocks and activations stream through
the ring.

Design (idiomatic TPU, single-controller):

* the transformer depth is cut into ``n_stages`` equal stages, one per
  device along the ``model`` mesh axis; each stage's block parameters
  are stacked leaf-wise with a leading stage axis and sharded over that
  axis, so every device materialises only its own blocks,
* the batch splits into ``M`` microbatches; a ``lax.scan`` runs
  ``M + n_stages - 1`` ticks of the classic GPipe schedule.  Every tick
  each device runs its stage on its current activation and passes the
  result to the next device with a single ring ``lax.ppermute`` over
  ICI.  The pipeline bubble is the standard ``(P-1)/(M+P-1)`` fraction,
* SPMD requires every device to execute the same program, so the
  windowed/global block pattern must be identical across stages
  (:func:`stage_pattern` validates; SAM ViT-B's ``[w, w, global]``
  repeats exactly at 2 or 4 stages),
* patch embedding and the neck/final-norm head run outside the loop,
  replicated (they are <2% of the FLOPs),
* the batch dimension additionally shards over the ``data`` axis inside
  the same shard_map, so DP x PP composes on one 2D mesh.

Differentiable end to end: the schedule is a ``lax.scan`` over
``ppermute`` ticks, so autodiff produces the reverse pipeline
automatically — gradients through :func:`pipeline_vit_apply` match the
unpipelined oracle exactly (tests/test_parallel.py).  The backward
stores per-tick stage activations; wrap the stage in ``jax.checkpoint``
for depth-independent memory at production scale (the fine-tuning
engine's default recipe is data parallelism + remat,
engine/finetune.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.mesh import DATA_AXIS, MODEL_AXIS
from ..core.precision import FAST, Policy
from ..models.vit import (
    Block,
    LayerNorm,
    PatchEmbed,
    SamNeck,
    ViTDenseConfig,
)

__all__ = ["stage_pattern", "stack_stage_params", "gpipe",
           "pipeline_vit_apply"]


def _is_windowed(cfg: ViTDenseConfig, i: int) -> bool:
    # mirror of ViTDense.__call__'s block construction (models/vit.py)
    return cfg.window_size > 0 and i not in tuple(cfg.global_indexes)


def stage_pattern(cfg: ViTDenseConfig, n_stages: int) -> list[bool]:
    """Per-position windowed flags of one stage; validates homogeneity.

    Under shard_map every device runs the same program, so block
    position ``j`` must have the same windowed/global kind in every
    stage (parameter shapes and control flow then agree across the
    stacked stage axis).
    """
    if n_stages < 1 or cfg.depth % n_stages:
        raise ValueError(
            f"n_stages={n_stages} must divide depth={cfg.depth}")
    per = cfg.depth // n_stages
    pats = [
        [_is_windowed(cfg, s * per + j) for j in range(per)]
        for s in range(n_stages)
    ]
    if any(p != pats[0] for p in pats[1:]):
        raise ValueError(
            f"stage block patterns differ across stages ({pats}); "
            "pick n_stages so the windowed/global pattern repeats "
            "(SAM ViT-B: 1, 2 or 4 stages)")
    return pats[0]


def stack_stage_params(params: dict, depth: int, n_stages: int) -> list:
    """Per-block-position param trees stacked over a leading stage axis.

    Returns ``depth // n_stages`` pytrees; leaf ``l`` of tree ``j`` is
    ``stack([params['block_{s*per+j}'][...l] for s in stages])`` with
    shape ``(n_stages, ...)`` — shard that leading axis over the pipe
    axis and each device holds exactly its stage's blocks.
    """
    per = depth // n_stages
    return [
        jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[params[f"block_{s * per + j}"] for s in range(n_stages)],
        )
        for j in range(per)
    ]


def gpipe(stage_fn, local_stage_params, x_microbatches, axis: str):
    """Circular GPipe schedule; call INSIDE shard_map.

    Args:
        stage_fn: ``(stage_params, x) -> y`` with ``y.shape == x.shape``
            (one pipeline stage; same program on every device).
        local_stage_params: this device's stage params (leading stage
            axis of size 1 already local after sharding).
        x_microbatches: ``(M, mb, ...)`` microbatched input, replicated
            over *axis* (only stage 0 reads it).
        axis: mesh axis name the pipeline rides on.

    Returns ``(M, mb, ...)`` outputs, identical on every device of
    *axis* (a psum broadcasts the last stage's results).
    """
    idx = jax.lax.axis_index(axis)
    n_stages = jax.lax.axis_size(axis)
    m = x_microbatches.shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    state = jnp.zeros_like(x_microbatches[0])
    outputs = jnp.zeros_like(x_microbatches)

    def tick(carry, t):
        state, outputs = carry
        feed = jax.lax.dynamic_index_in_dim(
            x_microbatches, jnp.clip(t, 0, m - 1), 0, keepdims=False)
        inp = jnp.where(idx == 0, feed, state)
        y = stage_fn(local_stage_params, inp)
        # the last stage finishes microbatch t-(P-1) at tick t
        out_t = t - (n_stages - 1)
        safe_t = jnp.clip(out_t, 0, m - 1)
        write = (idx == n_stages - 1) & (out_t >= 0)
        cur = jax.lax.dynamic_index_in_dim(outputs, safe_t, 0,
                                           keepdims=False)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, jnp.where(write, y, cur), safe_t, 0)
        state = jax.lax.ppermute(y, axis, perm)
        return (state, outputs), None

    (_, outputs), _ = jax.lax.scan(
        tick, (state, outputs), jnp.arange(m + n_stages - 1))
    # results live on the last stage only; zero elsewhere + psum = bcast
    outputs = jnp.where(idx == n_stages - 1, outputs, 0)
    return jax.lax.psum(outputs, axis)


def pipeline_vit_apply(
    cfg: ViTDenseConfig,
    params,
    images: jax.Array,          # (B, H, W, 3) in [0, 1]
    mesh: Mesh,
    *,
    policy: Policy = FAST,
    use_flash: bool = False,
    num_microbatches: int | None = None,
    axis: str = MODEL_AXIS,
) -> jax.Array:
    """ViTDense forward pipelined over ``mesh.shape[axis]`` stages.

    Output matches ``ViTDense(cfg, policy, use_flash).apply`` (the
    blocks run the same code; only their placement changes).  The batch
    dimension also shards over the ``data`` axis, composing DP x PP.
    ``num_microbatches`` defaults to the stage count and must divide the
    per-data-shard batch.
    """
    n_stages = mesh.shape[axis]
    pattern = stage_pattern(cfg, n_stages)
    p = params.get("params", params)

    # ---- embed (replicated; <2% of FLOPs) --------------------------------
    x = policy.cast_input(images)
    x = PatchEmbed(cfg, policy).apply({"params": p["patch_embed"]}, x)
    b, hp, wp, c = x.shape
    if cfg.use_cls_token:
        # mirror of ViTDense.__call__'s cls/pos handling (models/vit.py)
        pos = p["pos_embed"]
        tokens = x.reshape(b, hp * wp, c)
        pos_patch, pos_cls = pos[:, 1:], pos[:, :1]
        if hp * wp != pos_patch.shape[1]:
            g = cfg.grid
            pos_patch = jax.image.resize(
                pos_patch.reshape(1, g, g, c), (1, hp, wp, c), "bicubic"
            ).reshape(1, hp * wp, c)
        tokens = tokens + pos_patch.astype(tokens.dtype)
        cls_tok = (p["cls_token"] + pos_cls).astype(tokens.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (b, 1, c)), tokens], axis=1)
        x = tokens[:, :, None, :].transpose(0, 2, 1, 3)  # (b, 1, N, c)
    else:
        x = x + p["pos_embed"].astype(x.dtype)

    # ---- pipelined blocks -------------------------------------------------
    stacked = stack_stage_params(p, cfg.depth, n_stages)
    blocks = [
        Block(cfg, policy, windowed=w, use_flash=use_flash)
        for w in pattern
    ]

    def stage_fn(stage_params, xb):
        for blk, bp in zip(blocks, stage_params):
            xb = blk.apply({"params": jax.tree.map(lambda a: a[0], bp)}, xb)
        return xb

    m = num_microbatches or n_stages
    ndata = mesh.shape.get(DATA_AXIS, 1)
    if b % (m * ndata):
        raise ValueError(
            f"batch {b} must divide into {m} microbatches x {ndata} "
            "data shards")
    x_mb = x.reshape(m, b // m, *x.shape[1:])

    pipe = shard_map(
        lambda sp, xm: gpipe(stage_fn, sp, xm, axis),
        mesh=mesh,
        in_specs=([P(axis)] * len(stacked), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
        check_vma=False,
    )
    x = pipe(stacked, x_mb).reshape(b, *x.shape[1:])

    # ---- head (replicated) ------------------------------------------------
    if cfg.use_cls_token:
        tokens = x[:, 0]
        tokens = LayerNorm(cfg.ln_eps, policy).apply(
            {"params": p["norm"]}, tokens)
        x = tokens[:, 1:].reshape(b, hp, wp, c)
    if cfg.neck_channels:
        x = SamNeck(cfg, policy).apply({"params": p["neck"]}, x)
    return policy.cast_output(x)
