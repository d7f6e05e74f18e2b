"""Multi-device sharding tests over the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vit_deep_radiomics_tpu.core.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    replicated,
)
from vit_deep_radiomics_tpu.parallel.sharding import (
    data_parallel_step,
    shard_batch,
    shard_params,
    vit_param_specs,
)


@pytest.fixture(scope="module")
def mesh8(devices):
    return make_mesh(devices[:8])


@pytest.fixture(scope="module")
def mesh_4x2(devices):
    return make_mesh(devices[:8], model_parallel=2)


class TestMesh:
    def test_axis_sizes(self, mesh8, mesh_4x2):
        assert mesh8.shape[DATA_AXIS] == 8
        assert mesh8.shape[MODEL_AXIS] == 1
        assert mesh_4x2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}

    def test_invalid_model_parallel(self, devices):
        with pytest.raises(ValueError):
            make_mesh(devices[:8], model_parallel=3)

    def test_data_sharding_splits_axis0(self, mesh8):
        x = jnp.arange(16.0).reshape(16, 1)
        xs = jax.device_put(x, data_sharding(mesh8, 2))
        assert len(xs.addressable_shards) == 8
        assert xs.addressable_shards[0].data.shape == (2, 1)


class TestDataParallelStep:
    def test_matches_single_device_grads(self, mesh8, rng):
        dim = 4

        def loss_fn(params, batch):
            pred = batch["x"] @ params["w"]
            return jnp.mean((pred - batch["y"]) ** 2)

        params = {"w": jnp.asarray(rng.normal(size=(dim, 1)).astype(np.float32))}
        batch = {
            "x": jnp.asarray(rng.normal(size=(16, dim)).astype(np.float32)),
            "y": jnp.asarray(rng.normal(size=(16, 1)).astype(np.float32)),
        }
        step = data_parallel_step(loss_fn, mesh8)
        loss_dp, grads_dp = step(params, batch)

        loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, batch)
        assert float(loss_dp) == pytest.approx(float(loss_ref), rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(grads_dp["w"]), np.asarray(grads_ref["w"]), atol=1e-5
        )


class TestModelParallelViT:
    def test_param_specs_shard_attention_and_mlp(self):
        params = {
            "block_0": {
                "attn": {
                    "qkv_kernel": np.zeros((8, 24)),
                    "qkv_bias": np.zeros(24),
                    "proj_kernel": np.zeros((8, 8)),
                    "proj_bias": np.zeros(8),
                },
                "mlp": {
                    "w1": np.zeros((8, 32)), "b1": np.zeros(32),
                    "w2": np.zeros((32, 8)), "b2": np.zeros(8),
                },
                "norm1": {"scale": np.zeros(8), "bias": np.zeros(8)},
            },
            "pos_embed": np.zeros((1, 4, 4, 8)),
        }
        specs = vit_param_specs(params)
        assert specs["block_0"]["attn"]["qkv_kernel"] == P(None, MODEL_AXIS)
        assert specs["block_0"]["attn"]["proj_kernel"] == P(MODEL_AXIS, None)
        assert specs["block_0"]["mlp"]["w1"] == P(None, MODEL_AXIS)
        assert specs["block_0"]["mlp"]["w2"] == P(MODEL_AXIS, None)
        assert specs["block_0"]["norm1"]["scale"] == P()
        assert specs["pos_embed"] == P()

    def test_sharded_vit_forward_matches_replicated(self, mesh_4x2, rng):
        """Model-parallel ViT forward over (4 data × 2 model) must equal
        the single-device result."""
        import dataclasses

        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

        cfg = dataclasses.replace(
            SAM_VIT_B, image_size=32, width=64, depth=2, num_heads=2,
            window_size=0, global_indexes=(0, 1), neck_channels=16,
        )
        model = ViTDense(cfg, policy=PARITY, use_flash=False)
        imgs = jnp.asarray(
            rng.uniform(size=(4, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)

        base = model.apply(params, imgs)

        sharded_params = {
            "params": shard_params(params["params"], mesh_4x2)
        }
        sharded_imgs = shard_batch(imgs, mesh_4x2)
        out = jax.jit(model.apply)(sharded_params, sharded_imgs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5
        )


class TestRingAttention:
    def test_matches_full_attention(self, mesh8, rng):
        from vit_deep_radiomics_tpu.ops.attention import attention_reference
        from vit_deep_radiomics_tpu.parallel.ring_attention import (
            ring_attention,
        )

        b, h, s, d = 2, 3, 64, 16  # 8 tokens per device
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
            for _ in range(3)
        )
        out = ring_attention(q, k, v, mesh8)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_no_device_holds_full_kv(self, mesh8, rng):
        """The sharded inputs stay sharded — shard shape check."""
        from vit_deep_radiomics_tpu.core.mesh import DATA_AXIS
        from vit_deep_radiomics_tpu.parallel.ring_attention import (
            ring_attention,
        )
        from jax.sharding import NamedSharding

        b, h, s, d = 1, 2, 32, 8
        spec = P(None, None, DATA_AXIS, None)
        k = jax.device_put(
            jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32)),
            NamedSharding(mesh8, spec),
        )
        assert k.addressable_shards[0].data.shape == (1, 2, 4, 8)
        q = jax.device_put(
            jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32)),
            NamedSharding(mesh8, spec),
        )
        out = ring_attention(q, k, k, mesh8)
        assert out.shape == (b, h, s, d)


class TestGSPMDTrainStepMultiDevice:
    def test_trainer_step_over_mesh(self, mesh8, rng):
        """The engine's jitted train step runs sharded over 8 devices and
        produces finite loss (same path as __graft_entry__.dryrun)."""
        from vit_deep_radiomics_tpu.engine.train import (
            FoldTrainer,
            TrainerConfig,
        )

        d = 16
        cfg = {"models": {"transformer": {
            "learning_rate": 5e-4, "feature_dim": d, "batch_size": 8,
            "virtual_batch_size": 2, "num_epochs": 2, "patience": 5,
            "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
        }}}
        tcfg = TrainerConfig(arch="transformer", modality="ct",
                             loss="focal", batch_size=8, precision="parity")
        trainer = FoldTrainer(cfg, tcfg, mesh=mesh8)
        batch = {
            "ct": rng.normal(size=(8, 32, d)).astype(np.float32),
            "ct_mask": np.ones((8, 32), bool),
            "pet": rng.normal(size=(8, 8, d)).astype(np.float32),
            "pet_mask": np.ones((8, 8), bool),
            "labels": np.eye(2, dtype=np.float32)[
                rng.integers(0, 2, size=8)],
            "patient_ids": [f"p{i}" for i in range(8)],
        }
        trainer.init_params(batch)
        dev = trainer._shard(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)})
        step = trainer._get_step(trainer._shape_key(batch), train=True)
        grad_accum = jax.tree.map(jnp.zeros_like, trainer.params["params"])
        grad_accum, loss, logits = step(
            trainer.params, grad_accum, dev,
            jax.random.PRNGKey(0), jnp.float32(1.0),
        )
        params, opt_state, grad_accum = trainer._get_apply_step()(
            trainer.params, trainer.opt_state, grad_accum,
            jnp.float32(1e-3),
        )
        assert np.isfinite(float(loss))
        assert logits.shape == (8, 2)
        assert all(
            np.isfinite(np.asarray(g)).all()
            for g in jax.tree_util.tree_leaves(params))


class TestSequenceParallelClassifier:
    """Whole-volume mode: the downstream transformer over ring attention."""

    def _inputs(self, rng, b=2, s=39, d=32):
        # 39 real tokens + CLS = 40 → divisible by the 8-device ring
        tokens = rng.normal(size=(b, s, d)).astype(np.float32)
        mask = np.ones((b, s), bool)
        mask[0, 30:] = False           # ragged volume
        return jnp.asarray(tokens), jnp.asarray(mask)

    def test_matches_unsharded(self, mesh8, rng):
        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleClassifier,
        )

        tokens, mask = self._inputs(rng)
        base = TransformerNoduleClassifier(
            input_dim=32, ffn_dim=64, num_heads=4, num_classes=2,
            num_layers=2, policy=PARITY,
        )
        params = base.init(jax.random.PRNGKey(0), tokens, mask)
        want_logits, want_cls = base.apply(params, tokens, mask)

        ring = TransformerNoduleClassifier(
            input_dim=32, ffn_dim=64, num_heads=4, num_classes=2,
            num_layers=2, policy=PARITY, seq_mesh=mesh8,
        )
        got_logits, got_cls = ring.apply(params, tokens, mask)
        np.testing.assert_allclose(
            np.asarray(got_logits), np.asarray(want_logits),
            atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_cls), np.asarray(want_cls),
            atol=1e-5, rtol=1e-5)

    def test_grads_match_unsharded(self, mesh8, rng):
        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleClassifier,
        )

        tokens, mask = self._inputs(rng)
        kw = dict(input_dim=32, ffn_dim=64, num_heads=4, num_classes=2,
                  num_layers=1, policy=PARITY)
        base = TransformerNoduleClassifier(**kw)
        ring = TransformerNoduleClassifier(**kw, seq_mesh=mesh8)
        params = base.init(jax.random.PRNGKey(0), tokens, mask)

        def loss(model, p):
            logits, _ = model.apply(p, tokens, mask)
            return (logits.astype(jnp.float32) ** 2).sum()

        g_ref = jax.grad(lambda p: loss(base, p))(params)
        g_ring = jax.grad(lambda p: loss(ring, p))(params)
        ref_flat = jax.tree_util.tree_leaves_with_path(g_ref)
        ring_flat = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_ring))
        for key, ref in ref_flat:
            ks = jax.tree_util.keystr(key)
            np.testing.assert_allclose(
                np.asarray(ring_flat[ks]), np.asarray(ref),
                atol=1e-4, rtol=1e-3, err_msg=ks)

    def test_non_divisible_length_pads(self, mesh8, rng):
        """S + CLS not divisible by the ring: the classifier pads."""
        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleClassifier,
        )

        tokens, mask = self._inputs(rng, s=42)   # 43 with CLS: pads to 48
        kw = dict(input_dim=32, ffn_dim=64, num_heads=4, num_classes=2,
                  num_layers=1, policy=PARITY)
        base = TransformerNoduleClassifier(**kw)
        params = base.init(jax.random.PRNGKey(0), tokens, mask)
        want, _ = base.apply(params, tokens, mask)
        got, _ = TransformerNoduleClassifier(
            **kw, seq_mesh=mesh8).apply(params, tokens, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


class TestSequenceParallelBimodal:
    """Whole-volume BIMODAL mode: per-modality ring encoders + CLS-query
    cross-attention over sequence-sharded K/V — equality with the
    unsharded bimodal classifier (values + grads)."""

    def _inputs(self, rng, b=2, s_ct=39, s_pet=15, d=32):
        # +CLS → 40 / 16 tokens: both divisible by the 8-device ring
        ct = jnp.asarray(rng.normal(size=(b, s_ct, d)).astype(np.float32))
        pet = jnp.asarray(rng.normal(size=(b, s_pet, d)).astype(np.float32))
        ct_mask = np.ones((b, s_ct), bool)
        ct_mask[0, 30:] = False          # ragged CT volume
        pet_mask = np.ones((b, s_pet), bool)
        pet_mask[1, 12:] = False
        return ct, pet, jnp.asarray(ct_mask), jnp.asarray(pet_mask)

    def _kw(self, d=32):
        from vit_deep_radiomics_tpu.core.precision import PARITY

        return dict(
            input_dim=d, ffn_dim_ct=2 * d, ffn_dim_pet=2 * d,
            num_heads_ct=4, num_heads_pet=4, num_layers_ct=1,
            num_layers_pet=1, num_classes=2, policy=PARITY,
            dropout_rate=0.0,
        )

    def test_matches_unsharded(self, mesh8, rng):
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleBimodalClassifier,
        )

        ct, pet, ct_mask, pet_mask = self._inputs(rng)
        base = TransformerNoduleBimodalClassifier(**self._kw())
        params = base.init(
            jax.random.PRNGKey(0), ct_tokens=ct, pet_tokens=pet,
            ct_mask=ct_mask, pet_mask=pet_mask)
        want = base.apply(params, ct_tokens=ct, pet_tokens=pet,
                          ct_mask=ct_mask, pet_mask=pet_mask)
        ring = TransformerNoduleBimodalClassifier(
            **self._kw(), seq_mesh=mesh8)
        got = ring.apply(params, ct_tokens=ct, pet_tokens=pet,
                         ct_mask=ct_mask, pet_mask=pet_mask)
        for g, w, name in zip(got, want, ("logits", "cls", "l_ct",
                                          "l_pet")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5,
                err_msg=name)

    def test_non_divisible_lengths_pad(self, mesh8, rng):
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleBimodalClassifier,
        )

        ct, pet, ct_mask, pet_mask = self._inputs(rng, s_ct=42, s_pet=13)
        base = TransformerNoduleBimodalClassifier(**self._kw())
        params = base.init(
            jax.random.PRNGKey(0), ct_tokens=ct, pet_tokens=pet,
            ct_mask=ct_mask, pet_mask=pet_mask)
        want = base.apply(params, ct_tokens=ct, pet_tokens=pet,
                          ct_mask=ct_mask, pet_mask=pet_mask)
        got = TransformerNoduleBimodalClassifier(
            **self._kw(), seq_mesh=mesh8,
        ).apply(params, ct_tokens=ct, pet_tokens=pet,
                ct_mask=ct_mask, pet_mask=pet_mask)
        for g, w, name in zip(got, want, ("logits", "cls", "l_ct",
                                          "l_pet")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-5, rtol=1e-5,
                err_msg=name)

    def test_grads_match_unsharded(self, mesh8, rng):
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleBimodalClassifier,
        )

        ct, pet, ct_mask, pet_mask = self._inputs(rng)
        base = TransformerNoduleBimodalClassifier(**self._kw())
        ring = TransformerNoduleBimodalClassifier(
            **self._kw(), seq_mesh=mesh8)
        params = base.init(
            jax.random.PRNGKey(0), ct_tokens=ct, pet_tokens=pet,
            ct_mask=ct_mask, pet_mask=pet_mask)

        def loss(model, p):
            logits, cls, l_ct, l_pet = model.apply(
                p, ct_tokens=ct, pet_tokens=pet,
                ct_mask=ct_mask, pet_mask=pet_mask)
            return (
                (logits.astype(jnp.float32) ** 2).sum()
                + (l_ct.astype(jnp.float32) ** 2).sum()
                + (l_pet.astype(jnp.float32) ** 2).sum()
            )

        g_ref = jax.grad(lambda p: loss(base, p))(params)
        g_ring = jax.grad(lambda p: loss(ring, p))(params)
        ring_flat = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_ring))
        for key, ref in jax.tree_util.tree_leaves_with_path(g_ref):
            ks = jax.tree_util.keystr(key)
            np.testing.assert_allclose(
                np.asarray(ring_flat[ks]), np.asarray(ref),
                atol=1e-4, rtol=1e-3, err_msg=ks)


class TestPipelineViT:
    """GPipe pipeline parallelism over the model axis (parallel/pipeline.py)."""

    def _sam_cfg(self):
        import dataclasses

        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

        # depth 6 with globals at (2, 5): the [w, w, g] stage pattern of
        # SAM ViT-B, so 2 stages are homogeneous and 3 are not
        return dataclasses.replace(
            SAM_VIT_B, image_size=32, width=64, depth=6, num_heads=2,
            window_size=2, global_indexes=(2, 5), neck_channels=16,
        )

    def test_sam_matches_unpipelined(self, mesh_4x2, rng):
        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import ViTDense
        from vit_deep_radiomics_tpu.parallel.pipeline import (
            pipeline_vit_apply,
        )

        cfg = self._sam_cfg()
        model = ViTDense(cfg, policy=PARITY, use_flash=False)
        imgs = jnp.asarray(rng.uniform(size=(8, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        base = model.apply(params, imgs)
        out = pipeline_vit_apply(
            cfg, params, imgs, mesh_4x2, policy=PARITY)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5)

    def test_cls_token_model_matches_unpipelined(self, devices, rng):
        """DINOv2-style (CLS token, layerscale, no windows), 4 stages x
        2-way data parallel, 2 microbatches per stage count default."""
        import dataclasses

        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import DINOV2_CONFIGS, ViTDense
        from vit_deep_radiomics_tpu.parallel.pipeline import (
            pipeline_vit_apply,
        )

        cfg = dataclasses.replace(
            DINOV2_CONFIGS["dinov2_vits14"], image_size=28, width=48,
            depth=4, num_heads=2,
        )
        mesh = make_mesh(devices[:8], model_parallel=4)
        model = ViTDense(cfg, policy=PARITY, use_flash=False)
        imgs = jnp.asarray(rng.uniform(size=(8, 28, 28, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        base = model.apply(params, imgs)
        out = pipeline_vit_apply(cfg, params, imgs, mesh, policy=PARITY)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5)

    def test_heterogeneous_stage_pattern_rejected(self):
        from vit_deep_radiomics_tpu.parallel.pipeline import stage_pattern

        cfg = self._sam_cfg()
        assert stage_pattern(cfg, 2) == [True, True, False]
        with pytest.raises(ValueError, match="pattern"):
            stage_pattern(cfg, 3)   # stages [w,w], [g,w], [w,g] differ
        with pytest.raises(ValueError, match="divide"):
            stage_pattern(cfg, 4)

    def test_more_microbatches_than_stages(self, mesh_4x2, rng):
        """M=4 microbatches on 2 stages (smaller bubble) stays exact."""
        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import ViTDense
        from vit_deep_radiomics_tpu.parallel.pipeline import (
            pipeline_vit_apply,
        )

        cfg = self._sam_cfg()
        model = ViTDense(cfg, policy=PARITY, use_flash=False)
        imgs = jnp.asarray(
            rng.uniform(size=(16, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        base = model.apply(params, imgs)
        out = pipeline_vit_apply(
            cfg, params, imgs, mesh_4x2, policy=PARITY, num_microbatches=4)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=2e-5)

    def test_batch_divisibility_error(self, mesh_4x2, rng):
        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import ViTDense
        from vit_deep_radiomics_tpu.parallel.pipeline import (
            pipeline_vit_apply,
        )

        cfg = self._sam_cfg()
        model = ViTDense(cfg, policy=PARITY, use_flash=False)
        imgs = jnp.asarray(rng.uniform(size=(6, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        with pytest.raises(ValueError, match="microbatch"):
            pipeline_vit_apply(cfg, params, imgs, mesh_4x2, policy=PARITY)

    def test_gradients_match_unpipelined(self, mesh_4x2, rng):
        """Autodiff through the GPipe scan/ppermute schedule is the
        reverse pipeline; grads must equal the single-device oracle."""
        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import ViTDense
        from vit_deep_radiomics_tpu.parallel.pipeline import (
            pipeline_vit_apply,
        )

        cfg = self._sam_cfg()
        model = ViTDense(cfg, policy=PARITY, use_flash=False)
        imgs = jnp.asarray(rng.uniform(size=(8, 32, 32, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), imgs)
        g_base = jax.grad(lambda p: model.apply(p, imgs).sum())(params)
        g_pipe = jax.grad(lambda p: pipeline_vit_apply(
            cfg, p, imgs, mesh_4x2, policy=PARITY).sum())(params)
        flat_b = jax.tree_util.tree_leaves_with_path(g_base)
        flat_p = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_pipe))
        for k, vb in flat_b:
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_p[ks]), np.asarray(vb),
                atol=1e-5, rtol=1e-4, err_msg=ks)
