"""End-to-end backbone fine-tuning: images → trainable ViT → classifier.

A capability the reference pipeline cannot offer: its encoders are
frozen external checkpoints (`segment_anything` / torch.hub DINOv2,
tfds_dense_descriptor.py:87/104) and its trainers only ever see
precomputed descriptors.  Here the ViT backbone itself is differentiable
end to end — attention runs the custom-VJP flash kernels
(ops/attention_grad.py), so the (Sq, Sk) score matrices are recomputed
tile-wise in the backward instead of being checkpointed in HBM — and a
masked-pool classification head trains on top with the reference's focal
loss.

Typical use::

    tuner = FineTuner(FineTuneConfig(num_classes=2), mesh=mesh)
    state = tuner.init(rng, example_images)
    for images, masks, labels in batches:
        state, loss, logits = tuner.step(state, images, masks, labels)

``freeze_below`` keeps the first N transformer blocks frozen (their
gradients are zeroed through an optax mask), the standard recipe for
small medical cohorts.

``zero1=True`` shards the Adam moments over the mesh's ``data`` axis
(ZeRO stage 1, parallel/sharding.py::zero1_specs): optimizer memory and
update compute drop to 1/N with params replicated — XLA all-gathers
only the weight updates.  Same parameter trajectory as the replicated
optimizer (tested).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..core.mesh import DATA_AXIS, data_sharding, replicated
from ..core.precision import Policy, get_policy
from ..models.losses import focal_loss
from ..models.vit import DINOV2_CONFIGS, SAM_VIT_B, ViTDense, ViTDenseConfig

__all__ = ["FineTuneConfig", "FineTuner", "FineTuneModel"]


@dataclasses.dataclass(frozen=True)
class FineTuneConfig:
    backbone: str = "medsam"           # "medsam" | dinov2_* name
    num_classes: int = 2
    learning_rate: float = 1e-5
    weight_decay: float = 0.01
    freeze_below: int = 0              # freeze blocks [0, N)
    focal_gamma: float = 2.0
    focal_alpha: tuple[float, ...] = (0.25, 0.75)
    precision: str = "fast"
    # False/'none' | True/'block' (recompute whole blocks) | 'mlp'
    # (selective: recompute only the MLP hidden activations)
    remat: bool | str = False
    # gradient microbatching: split each step's batch into this many
    # equal microbatches, average grads, apply the optimizer ONCE —
    # identical update to the monolithic batch (sample-mean focal
    # loss), at 1/N the activation memory.  The physical-B16 route is
    # closed on this backend (no-remat: HBM RESOURCE_EXHAUSTED; any
    # remat: the remote compile helper crashes, HTTP 500 exit 1 —
    # artifacts/bench_ab_r5.jsonl curve rows), so effective B16 trains
    # as accum_steps=2 of B8 (VERDICT r4 item 5).
    accum_steps: int = 1
    zero1: bool = False                # shard optimizer state over `data`
    backbone_cfg: ViTDenseConfig | None = None   # override (tests)

    def resolve_backbone(self) -> ViTDenseConfig:
        if self.backbone_cfg is not None:
            return self.backbone_cfg
        if self.backbone == "medsam":
            return SAM_VIT_B
        return DINOV2_CONFIGS[self.backbone]


class FineTuneModel(nn.Module):
    """Trainable ViT + masked-average-pool + linear head.

    ``mask`` selects the nodule ROI on the feature grid (nearest-resized
    from image resolution); empty masks fall back to global average
    pooling, so padded/degenerate samples stay finite.
    """

    cfg: ViTDenseConfig
    num_classes: int
    policy: Policy
    remat: bool | str = False

    @nn.compact
    def __call__(self, images, mask):               # (B,H,W,3), (B,h,w)
        feats = ViTDense(
            self.cfg, policy=self.policy,
            use_flash=True, trainable=True, remat=self.remat,
            name="backbone",
        )(images)                                    # (B, h, w, C)
        m = mask.astype(jnp.float32)[..., None]
        denom = jnp.sum(m, axis=(1, 2))
        pooled = jnp.where(
            denom > 0,
            jnp.sum(feats.astype(jnp.float32) * m, axis=(1, 2))
            / jnp.maximum(denom, 1.0),
            jnp.mean(feats.astype(jnp.float32), axis=(1, 2)),
        )                                            # (B, C)
        pooled = nn.LayerNorm(dtype=jnp.float32, name="head_norm")(pooled)
        logits = nn.Dense(
            self.num_classes, dtype=jnp.float32, name="head",
        )(pooled)
        return logits


def _freeze_mask(params, freeze_below: int):
    """Pytree of bools: True = trainable."""
    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        frozen = any(
            p.startswith("block_") and int(p.split("_")[1]) < freeze_below
            for p in path
        )
        return not frozen
    return walk(params)


class FineTuner:
    """Jitted fine-tuning loop around :class:`FineTuneModel`."""

    def __init__(self, config: FineTuneConfig, mesh=None):
        from ..core.mesh import enable_persistent_compile_cache

        enable_persistent_compile_cache()
        self.config = config
        self.policy = get_policy(config.precision)
        if self.policy.quantized:
            raise ValueError(
                "int8 is an inference-only policy (round() kills the "
                "gradients); fine-tune with 'fast' or 'parity'")
        self.backbone_cfg = config.resolve_backbone()
        self.model = FineTuneModel(
            self.backbone_cfg, config.num_classes, self.policy,
            remat=config.remat)
        self.mesh = mesh
        self._step = None
        self._opt_shardings = None     # set by init() under zero1

    # -- state ------------------------------------------------------------
    def init(self, rng_key, images, mask=None):
        if mask is None:
            g = self.backbone_cfg.grid
            mask = jnp.ones((images.shape[0], g, g), bool)
        params = jax.jit(self.model.init)(rng_key, images, mask)
        tx = self._optimizer(params)
        opt_state = tx.init(params)
        if self.mesh is not None:
            rep = replicated(self.mesh)
            params = jax.device_put(params, rep)
            if self.config.zero1:
                # ZeRO-1: Adam moments live sharded over `data`; the
                # jitted step keeps them sharded (constraint below) and
                # XLA all-gathers only the weight updates
                from ..parallel.sharding import shard_opt_state

                opt_state, self._opt_shardings = shard_opt_state(
                    opt_state, self.mesh)
            else:
                opt_state = jax.device_put(opt_state, rep)
        return {"params": params, "opt_state": opt_state}

    def _optimizer(self, params):
        cfg = self.config
        tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
        if cfg.freeze_below:
            # multi_transform, NOT optax.masked: masked passes the raw
            # gradient through untouched for masked-out leaves — frozen
            # parameters would still move
            labels = jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze",
                _freeze_mask(params, cfg.freeze_below),
            )
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels)
        return tx

    # -- steps ------------------------------------------------------------
    def _build_step(self, params):
        cfg = self.config
        tx = self._optimizer(params)
        alpha = jnp.asarray(cfg.focal_alpha, jnp.float32)

        def loss_fn(p, images, mask, labels):
            logits = self.model.apply(p, images, mask)
            loss = focal_loss(
                logits, labels, alpha=alpha, gamma=cfg.focal_gamma,
            ) / labels.shape[0]
            return loss, logits

        opt_shardings = self._opt_shardings

        def _grads(params, images, mask, labels):
            if cfg.accum_steps <= 1:
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    params, images, mask, labels)
            # gradient microbatching: scan over accum_steps equal
            # microbatches, average grads/losses — bitwise the same
            # update semantics as the monolithic batch (sample-mean
            # focal loss) at 1/accum_steps the activation memory
            a = cfg.accum_steps
            b = images.shape[0]
            if b % a:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps {a}")
            stacked = tuple(
                x.reshape((a, b // a) + x.shape[1:])
                for x in (images, mask, labels))

            def micro(carry, xs):
                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, *xs)
                gsum, lsum = carry
                gsum = jax.tree_util.tree_map(
                    lambda s, g: s + g.astype(s.dtype), gsum, grads)
                return (gsum, lsum + loss), logits

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params)
            (gsum, lsum), logits = jax.lax.scan(
                micro, (zeros, jnp.float32(0.0)), stacked)
            grads = jax.tree_util.tree_map(lambda g: g / a, gsum)
            return (lsum / a, logits.reshape((b,) + logits.shape[2:])), \
                grads

        def step(state, images, mask, labels):
            (loss, logits), grads = _grads(
                state["params"], images, mask, labels)
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            if opt_shardings is not None:
                # pin the ZeRO-1 layout: without the constraints GSPMD
                # propagates the replicated grads' sharding into the
                # moments (re-replicating them) — or worse, the sharded
                # updates' into the params
                opt_state = jax.lax.with_sharding_constraint(
                    opt_state, opt_shardings)
                params = jax.lax.with_sharding_constraint(
                    params, replicated(self.mesh))
            return {"params": params, "opt_state": opt_state}, loss, logits

        return jax.jit(step, donate_argnums=(0,))

    def step(self, state, images, mask, labels):
        """One fine-tuning step; returns (state, loss, logits)."""
        if self._step is None:
            self._step = self._build_step(state["params"])
        if self.mesh is not None:
            sh = data_sharding(self.mesh)
            images = jax.device_put(jnp.asarray(images), sh)
            mask = jax.device_put(jnp.asarray(mask), sh)
            labels = jax.device_put(jnp.asarray(labels), sh)
        else:
            images = jnp.asarray(images)
            mask = jnp.asarray(mask)
            labels = jnp.asarray(labels)
        return self._step(state, images, mask, labels)

    # -- convenience ------------------------------------------------------
    def fit(self, state, batches, log=None):
        """Run over an iterable of (images, mask, labels_onehot)."""
        losses = []
        for i, (images, mask, labels) in enumerate(batches):
            state, loss, _ = self.step(state, images, mask, labels)
            losses.append(float(loss))
            if log:
                log(f"step {i}: loss {losses[-1]:.4f}")
        return state, np.asarray(losses)
