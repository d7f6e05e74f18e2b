"""Backbone fine-tuning: differentiable flash path + FineTuner loop."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.core.precision import PARITY
from vit_deep_radiomics_tpu.engine.finetune import (
    FineTuneConfig,
    FineTuner,
)
from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

TINY_SAM = dataclasses.replace(
    SAM_VIT_B, image_size=64, width=128, depth=3, num_heads=2,
    window_size=4, global_indexes=(1,), neck_channels=32,
)

# cls-token / no-rel-pos config whose token count (33² + cls = 1090)
# pads to 1536 — NOT a multiple of 1024.  Regression guard for the
# block_k divisor bug: min(1024, sq_pad) does not divide 1536 and the
# kernel raised ValueError on any dinov2_* forward at this scale.
TINY_DINO_1536 = dataclasses.replace(
    SAM_VIT_B, image_size=462, patch_size=14, width=128, depth=1,
    num_heads=2, window_size=0, global_indexes=(0,), use_rel_pos=False,
    neck_channels=0, use_cls_token=True, layerscale_init=1e-5,
)


class TestTrainableViT:
    def test_forward_matches_oracle(self, rng):
        imgs = jnp.asarray(
            rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
        oracle = ViTDense(TINY_SAM, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), imgs)
        want = oracle.apply(params, imgs)
        got = ViTDense(
            TINY_SAM, policy=PARITY, use_flash=True, trainable=True,
        ).apply(params, imgs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_bf16_fused_window_grads_track_oracle(self, rng):
        """The bf16 FAST trainable path routes windowed layers through
        the fused-layout window VJP (ops/attention_grad.py::
        window_attention_trainable, round 3); its gradients must track
        the fp32 XLA oracle within bf16 rounding.  Exact kernel-level
        equality is pinned separately in tests/test_attention_grad.py::
        TestWindowTrainable (fp32 interpret vs dense reference)."""
        from vit_deep_radiomics_tpu.core.precision import FAST

        imgs = jnp.asarray(
            rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
        oracle = ViTDense(TINY_SAM, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), imgs)
        fast = ViTDense(
            TINY_SAM, policy=FAST, use_flash=True, trainable=True)

        def loss(model, p):
            out = model.apply(p, imgs)
            return (out.astype(jnp.float32) ** 2).mean()

        out_ref = oracle.apply(params, imgs).astype(jnp.float32)
        out_fast = fast.apply(params, imgs).astype(jnp.float32)
        scale = float(jnp.abs(out_ref).max())
        assert float(jnp.abs(out_fast - out_ref).max()) < 0.05 * scale

        g_ref = jax.grad(lambda p: loss(oracle, p))(params)
        g_fl = jax.grad(lambda p: loss(fast, p))(params)
        flat_fl = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_fl)
        )
        for key, ref in jax.tree_util.tree_leaves_with_path(g_ref):
            ks = jax.tree_util.keystr(key)
            ref = np.asarray(ref, np.float32)
            got = np.asarray(flat_fl[ks], np.float32)
            # 5% of the leaf's own scale, floored at 1e-4 absolute:
            # near-zero leaves (e.g. proj_bias whose grads cancel across
            # the symmetric loss) otherwise demand sub-bf16-noise equality
            tol = max(0.05 * float(np.abs(ref).max()), 5e-4)
            np.testing.assert_allclose(got, ref, atol=tol, err_msg=ks)

    def test_nonpow2_padded_len_forward(self, rng):
        """1090 tokens pad to 1536 (not a 1024 multiple): both the
        inference and the trainable no-bias flash paths must pick a
        block_k that divides the padded length (ADVICE r1, high)."""
        imgs = jnp.asarray(
            rng.uniform(size=(1, 462, 462, 3)).astype(np.float32))
        oracle = ViTDense(TINY_DINO_1536, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), imgs)
        want = np.asarray(oracle.apply(params, imgs))
        for trainable in (False, True):
            got = ViTDense(
                TINY_DINO_1536, policy=PARITY, use_flash=True,
                trainable=trainable,
            ).apply(params, imgs)
            np.testing.assert_allclose(
                np.asarray(got), want, atol=2e-5, rtol=2e-5,
                err_msg=f"trainable={trainable}")

    def test_grads_match_oracle(self, rng):
        imgs = jnp.asarray(
            rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        oracle = ViTDense(TINY_SAM, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), imgs)
        trainable = ViTDense(
            TINY_SAM, policy=PARITY, use_flash=True, trainable=True)

        def loss(model, p):
            out = model.apply(p, imgs)
            return (out.astype(jnp.float32) ** 2).mean()

        g_ref = jax.grad(lambda p: loss(oracle, p))(params)
        g_fl = jax.grad(lambda p: loss(trainable, p))(params)
        flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
        flat_fl = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_fl)
        )
        for key, ref in flat_ref:
            ks = jax.tree_util.keystr(key)
            np.testing.assert_allclose(
                np.asarray(flat_fl[ks]), np.asarray(ref),
                atol=5e-5, rtol=5e-4, err_msg=ks,
            )


class TestFineTuner:
    def _batch(self, rng, b=2, size=64, grid=4):
        images = rng.uniform(size=(b, size, size, 3)).astype(np.float32)
        mask = np.zeros((b, grid, grid), bool)
        mask[:, 1:3, 1:3] = True
        labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=b)]
        return images, mask, labels

    def test_loss_decreases(self, rng):
        cfg = FineTuneConfig(
            num_classes=2, learning_rate=3e-3, precision="parity",
            backbone_cfg=TINY_SAM,
        )
        tuner = FineTuner(cfg)
        images, mask, labels = self._batch(rng)
        state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state, losses = tuner.fit(
            state, [(images, mask, labels)] * 6)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_freeze_below_keeps_early_blocks(self, rng):
        cfg = FineTuneConfig(
            num_classes=2, learning_rate=1e-2, freeze_below=2,
            precision="parity", backbone_cfg=TINY_SAM,
        )
        tuner = FineTuner(cfg)
        images, mask, labels = self._batch(rng)
        state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
        before = jax.tree_util.tree_map(np.asarray, state["params"])
        state, _, _ = tuner.step(state, images, mask, labels)
        after = state["params"]

        blocks = before["params"]["backbone"]["block_0"]["attn"]
        blocks_after = after["params"]["backbone"]["block_0"]["attn"]
        np.testing.assert_array_equal(
            np.asarray(blocks_after["qkv_kernel"]),
            blocks["qkv_kernel"],
        )
        # unfrozen block 2 must move
        assert not np.array_equal(
            np.asarray(after["params"]["backbone"]["block_2"]["attn"]
                       ["qkv_kernel"]),
            before["params"]["backbone"]["block_2"]["attn"]["qkv_kernel"],
        )

    def test_empty_mask_finite(self, rng):
        cfg = FineTuneConfig(
            num_classes=2, precision="parity", backbone_cfg=TINY_SAM)
        tuner = FineTuner(cfg)
        images, mask, labels = self._batch(rng)
        mask[:] = False
        state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state, loss, logits = tuner.step(state, images, mask, labels)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(logits)).all()

    def test_data_parallel_mesh(self, rng, devices):
        from vit_deep_radiomics_tpu.core.mesh import make_mesh

        mesh = make_mesh(devices[:8])
        cfg = FineTuneConfig(
            num_classes=2, precision="parity", backbone_cfg=TINY_SAM)
        tuner = FineTuner(cfg, mesh=mesh)
        images, mask, labels = self._batch(rng, b=8)
        state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state, loss, logits = tuner.step(state, images, mask, labels)
        assert np.isfinite(float(loss))
        assert logits.shape == (8, 2)

    def test_zero1_matches_replicated_and_is_sharded(self, rng, devices):
        """ZeRO-1: Adam moments sharded over `data` must produce the
        SAME parameter trajectory as the replicated-optimizer path, with
        the moment leaves actually distributed (1/8 per device)."""
        from jax.sharding import PartitionSpec as P

        from vit_deep_radiomics_tpu.core.mesh import DATA_AXIS, make_mesh

        mesh = make_mesh(devices[:8])
        base = FineTuneConfig(
            num_classes=2, learning_rate=3e-3, precision="parity",
            backbone_cfg=TINY_SAM)
        images, mask, labels = self._batch(rng, b=8)

        states = {}
        for zero1 in (False, True):
            tuner = FineTuner(
                dataclasses.replace(base, zero1=zero1), mesh=mesh)
            state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
            for _ in range(2):
                state, loss, _ = tuner.step(state, images, mask, labels)
            assert np.isfinite(float(loss))
            states[zero1] = state

        # the two programs psum grads in different orders (GSPMD chooses
        # per-program schedules) and Adam's mhat/sqrt(vhat) amplifies
        # that f32 noise at early steps — observed ~5e-5.  A genuinely
        # wrong update (dropped/mis-sharded moment) shifts params by
        # O(lr)=3e-3, well above the tolerance.
        for a, b in zip(
            jax.tree.leaves(states[False]["params"]),
            jax.tree.leaves(states[True]["params"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=0)

        sharded = [
            leaf for leaf in jax.tree.leaves(states[True]["opt_state"])
            if hasattr(leaf, "sharding")
            and any(ax == DATA_AXIS for ax in tuple(leaf.sharding.spec))
        ]
        assert sharded, "no optimizer-state leaf is data-sharded"
        big = max(sharded, key=lambda x: x.size)
        shard_size = big.addressable_shards[0].data.size
        assert shard_size * 8 == big.size, (shard_size, big.size)
        assert P(DATA_AXIS) != P()  # sanity on the spec import

    def test_accum_steps_matches_monolithic(self, rng):
        """Gradient microbatching (accum_steps=2) reproduces the
        monolithic batch's loss, logits and parameter trajectory —
        the effective-B16 route past the backend's physical-batch wall
        (VERDICT r4 item 5)."""
        cfg = FineTuneConfig(
            num_classes=2, learning_rate=3e-3, precision="parity",
            backbone_cfg=TINY_SAM, accum_steps=2,
        )
        tuner = FineTuner(cfg)
        images, mask, labels = self._batch(rng, b=4)
        state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state, loss_a, logits_a = tuner.step(state, images, mask, labels)
        state, loss_a2, _ = tuner.step(state, images, mask, labels)

        cfg2 = dataclasses.replace(cfg, accum_steps=1)
        tuner2 = FineTuner(cfg2)
        state2 = tuner2.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state2, loss_m, logits_m = tuner2.step(
            state2, images, mask, labels)
        state2, loss_m2, _ = tuner2.step(state2, images, mask, labels)

        np.testing.assert_allclose(float(loss_a), float(loss_m),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(logits_a),
                                   np.asarray(logits_m),
                                   atol=1e-5, rtol=1e-5)
        # second step ran on functionally-equal params
        np.testing.assert_allclose(float(loss_a2), float(loss_m2),
                                   rtol=1e-4)
        # params: AdamW normalizes by sqrt(v), so leaves whose gradient
        # is at rounding scale take sign-noise steps — bounded by one
        # lr per step, never a divergence
        leaves = zip(jax.tree_util.tree_leaves(state["params"]),
                     jax.tree_util.tree_leaves(state2["params"]))
        for a, b in leaves:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2 * 3e-3, rtol=1)

        # the accumulation MATH, checked directly: microbatch-averaged
        # grads == monolithic grads at fp tolerance
        from vit_deep_radiomics_tpu.models.losses import focal_loss

        imj, mkj, lbj = (jnp.asarray(x) for x in (images, mask, labels))

        def mono_loss(p):
            logits = tuner.model.apply(p, imj, mkj)
            return focal_loss(logits, lbj, alpha=jnp.asarray(
                cfg.focal_alpha, jnp.float32), gamma=cfg.focal_gamma,
            ) / lbj.shape[0]

        def micro_loss(p):
            halves = [
                focal_loss(
                    tuner.model.apply(p, imj[i:i + 2], mkj[i:i + 2]),
                    lbj[i:i + 2], alpha=jnp.asarray(
                        cfg.focal_alpha, jnp.float32),
                    gamma=cfg.focal_gamma) / 2
                for i in (0, 2)
            ]
            return (halves[0] + halves[1]) / 2

        p0 = tuner2.init(jax.random.PRNGKey(0),
                         jnp.asarray(images))["params"]
        g_mono = jax.grad(mono_loss)(p0)
        g_micro = jax.grad(micro_loss)(p0)
        for a, b in zip(jax.tree_util.tree_leaves(g_mono),
                        jax.tree_util.tree_leaves(g_micro)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)

        with pytest.raises(ValueError, match="divisible"):
            tuner.step(state, images[:3], mask[:3], labels[:3])

    def test_remat_matches_no_remat(self, rng):
        cfg = FineTuneConfig(
            num_classes=2, learning_rate=3e-3, precision="parity",
            backbone_cfg=TINY_SAM, remat=True,
        )
        tuner = FineTuner(cfg)
        images, mask, labels = self._batch(rng)
        state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state, loss_r, _ = tuner.step(state, images, mask, labels)

        cfg2 = dataclasses.replace(cfg, remat=False)
        tuner2 = FineTuner(cfg2)
        state2 = tuner2.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state2, loss, _ = tuner2.step(state2, images, mask, labels)
        np.testing.assert_allclose(float(loss_r), float(loss), rtol=1e-6)

    def test_selective_mlp_remat_matches_no_remat(self, rng):
        """remat='mlp' recomputes only the MLP hidden activations —
        identical loss and parameter trajectory to remat=False."""
        cfg = FineTuneConfig(
            num_classes=2, learning_rate=3e-3, precision="parity",
            backbone_cfg=TINY_SAM, remat="mlp",
        )
        tuner = FineTuner(cfg)
        images, mask, labels = self._batch(rng)
        state = tuner.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state, loss_r, _ = tuner.step(state, images, mask, labels)

        cfg2 = dataclasses.replace(cfg, remat=False)
        tuner2 = FineTuner(cfg2)
        state2 = tuner2.init(jax.random.PRNGKey(0), jnp.asarray(images))
        state2, loss, _ = tuner2.step(state2, images, mask, labels)
        # loss equality only, like the block-remat test: Adam's first
        # step is ±lr·sign(g), so XLA fusion-order rounding on
        # near-zero gradients flips whole update signs — recompute
        # paths are never bitwise-identical
        np.testing.assert_allclose(float(loss_r), float(loss), rtol=1e-6)


class TestBlockKSelection:
    """_pick_block_k: largest ×128 divisor ≤ cap — NOT pow2-only.

    ViT-L@518 pads to 1536 tokens: the single-tile 1536 kv step is 2×
    faster than 512-wide tiles (docs/ROADMAP.md); the round-2 pow2-only
    divisor fix regressed it (113 → 99 img/s measured) — pinned here."""

    def test_divisor_choices(self):
        from vit_deep_radiomics_tpu.models.vit import _pick_block_k

        assert _pick_block_k(1536, 2048) == 1536   # single kv step
        assert _pick_block_k(1536, 1024) == 768    # trainable cap
        assert _pick_block_k(3072, 2048) == 1536
        assert _pick_block_k(4096, 2048) == 2048
        assert _pick_block_k(1024, 2048) == 1024
        assert _pick_block_k(2176, 2048) == 128    # 17×128: only 128 fits
        for sq, cap in ((1536, 2048), (3072, 2048), (2176, 2048),
                        (1536, 1024), (8192, 2048)):
            bk = _pick_block_k(sq, cap)
            assert sq % bk == 0 and bk % 128 == 0 and bk <= cap
