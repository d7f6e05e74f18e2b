"""Dynamic-int8 inference path (ops/quant.py + the ``int8`` policy).

The reference has no quantization (its frozen encoders run fp32 CUDA,
tfds_dense_descriptor.py:110-139); this is a beyond-parity TPU lever —
the v5e MXU runs s8×s8→s32 at twice the bf16 rate.  These tests pin the
numerics on CPU: kernel-level error bounds, exact-zero padding rows,
whole-backbone feature fidelity, and the inference-only guard rails.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_deep_radiomics_tpu.core.precision import PARITY, get_policy
from vit_deep_radiomics_tpu.ops.quant import (
    int8_dot,
    quantize_rows,
    quantize_weight,
)


class TestKernel:
    def test_int8_dot_close_to_fp32(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32) / 16)
        got = int8_dot(x, w)
        want = x @ w
        assert got.dtype == jnp.float32
        # dynamic per-row/per-channel int8 on gaussian data: ~1% norm
        # error (quantization noise grows as sqrt(K) but so does the
        # output norm; the residual ~1% is the standard dynamic-int8
        # floor)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 2e-2, rel
        cos = float(
            jnp.sum(got * want)
            / (jnp.linalg.norm(got) * jnp.linalg.norm(want)))
        assert cos > 0.999

    def test_batched_rank3(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 17, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
        got = int8_dot(x, w)
        want = jnp.einsum("bsk,kn->bsn", x, w)
        assert got.shape == (2, 17, 96)
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 1e-2, rel

    def test_zero_rows_stay_exactly_zero(self):
        """Window-padding rows are all-zero; the eps-clamped scale must
        keep them exactly 0 through quantize→matmul→rescale."""
        x = jnp.zeros((4, 32), jnp.float32)
        w = jnp.ones((32, 8), jnp.float32)
        assert not np.any(np.asarray(int8_dot(x, w)))

    def test_scales_shapes_and_range(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(5, 7, 33)).astype(np.float32))
        q, s = quantize_rows(x)
        assert q.dtype == jnp.int8 and s.shape == (5, 7, 1)
        assert int(jnp.max(jnp.abs(q))) <= 127
        # the row max quantizes to exactly ±127
        flat = np.asarray(q).reshape(-1, 33)
        assert np.all(np.abs(flat).max(axis=1) == 127)
        w = jnp.asarray(rng.normal(size=(33, 11)).astype(np.float32))
        wq, ws = quantize_weight(w)
        assert wq.dtype == jnp.int8 and ws.shape == (1, 11)
        np.testing.assert_array_equal(
            np.abs(np.asarray(wq)).max(axis=0), np.full(11, 127))

    def test_jit_and_grad_free(self):
        """The op is jit-safe (static shapes, no value branching)."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(jax.jit(int8_dot)(x, w)),
            np.asarray(int8_dot(x, w)), rtol=0, atol=0)


class TestBackbone:
    def _tiny_cfg(self):
        import dataclasses

        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

        return dataclasses.replace(
            SAM_VIT_B, image_size=32, width=64, depth=2, num_heads=2,
            window_size=2, global_indexes=(1,), neck_channels=16,
        )

    def test_vitdense_int8_features_close(self):
        """End-to-end backbone: int8 features track the fp32 oracle —
        the downstream radiomics classifiers consume these descriptors,
        so per-map cosine must stay ≈1."""
        from vit_deep_radiomics_tpu.models.vit import ViTDense

        cfg = self._tiny_cfg()
        rng = np.random.default_rng(4)
        images = jnp.asarray(
            rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        oracle = ViTDense(cfg, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), images)
        want = np.asarray(oracle.apply(params, images))

        quant = ViTDense(cfg, policy=get_policy("int8"), use_flash=False)
        got = np.asarray(quant.apply(params, images))
        assert got.dtype == np.float32
        w = want.reshape(-1, want.shape[-1])
        g = got.reshape(-1, got.shape[-1])
        cos = np.sum(w * g, -1) / (
            np.linalg.norm(w, axis=-1) * np.linalg.norm(g, axis=-1))
        assert cos.min() > 0.995, cos.min()

    def test_fused_flash_path_int8(self):
        """The fused-QKV (split q/kv projection) int8 branch: flash
        kernels in interpret mode on CPU, int8 projections around them —
        features must track the fp32 oracle like the unfused branch."""
        from vit_deep_radiomics_tpu.models.vit import (
            ViTDense,
            ViTDenseConfig,
        )

        cfg = ViTDenseConfig(
            name="sam_quant_fused_test", image_size=64, patch_size=8,
            width=128, depth=3, num_heads=2, window_size=4,
            global_indexes=(1,), use_rel_pos=True, neck_channels=32,
        )
        rng = np.random.default_rng(6)
        images = jnp.asarray(
            rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
        oracle = ViTDense(cfg, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), images)
        want = np.asarray(oracle.apply(params, images))
        quant = ViTDense(cfg, policy=get_policy("int8"), use_flash=True)
        got = np.asarray(quant.apply(params, images))
        w = want.reshape(-1, want.shape[-1])
        g = got.reshape(-1, got.shape[-1])
        cos = np.sum(w * g, -1) / (
            np.linalg.norm(w, axis=-1) * np.linalg.norm(g, axis=-1))
        assert cos.min() > 0.995, cos.min()

    def test_serving_export_int8_roundtrip(self, tmp_path):
        """The int8 graph lowers through jax.export into a .vdr artifact
        and reproduces the library forward bit-exactly."""
        from vit_deep_radiomics_tpu.engine.serve import (
            export_dense_model,
            load_exported,
        )
        from vit_deep_radiomics_tpu.models.vit import ViTDense

        cfg = self._tiny_cfg()
        rng = np.random.default_rng(5)
        images = jnp.asarray(
            rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
        model = ViTDense(cfg, policy=get_policy("int8"), use_flash=False)
        params = model.init(jax.random.PRNGKey(0), images)
        # compare against the JITTED forward: eager op-by-op execution
        # rounds the dynamic scales at different fusion points, so only
        # whole-graph compilation is bit-reproducible for int8
        want = np.asarray(jax.jit(model.apply)(params, images))
        artifact = export_dense_model(
            params, cfg, tmp_path / "int8.vdr",
            batch=2, policy="int8", use_flash=False,
        )
        served = load_exported(artifact)
        assert served.meta["policy"] == "int8"
        got = np.asarray(served(images))
        np.testing.assert_array_equal(got, want)

    def test_policy_flag(self):
        p = get_policy("int8")
        assert p.quantized and p.compute_dtype == jnp.bfloat16
        assert not get_policy("fast").quantized
        assert not get_policy("parity").quantized

    def test_classifier_export_rejects_int8(self, tmp_path):
        """export-clf must not mislabel a bf16 graph as int8 — the
        classifiers have no quantized matmuls."""
        from vit_deep_radiomics_tpu.engine.serve import export_classifier

        cfg = {"models": {"transformer": {
            "learning_rate": 5e-4, "feature_dim": 16, "batch_size": 1,
            "virtual_batch_size": 2, "num_epochs": 1, "patience": 5,
            "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
        }}}
        with pytest.raises(ValueError, match="dense backbone only"):
            export_classifier(
                {"params": {}}, cfg, "transformer", "ct",
                tmp_path / "x.vdr", policy="int8")

    def test_training_engines_reject_int8(self):
        from vit_deep_radiomics_tpu.engine.finetune import (
            FineTuneConfig,
            FineTuner,
        )
        from vit_deep_radiomics_tpu.engine.train import (
            FoldTrainer,
            TrainerConfig,
        )

        tcfg = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            dataset="stanford", precision="int8",
        )
        cfg = {"models": {"transformer": {
            "learning_rate": 5e-4, "feature_dim": 16, "batch_size": 1,
            "virtual_batch_size": 2, "num_epochs": 1, "patience": 5,
            "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
        }}}
        with pytest.raises(ValueError, match="inference-only"):
            FoldTrainer(cfg, tcfg, None, "pet", "ct")
        with pytest.raises(ValueError, match="inference-only"):
            FineTuner(FineTuneConfig(precision="int8"))

    def test_evaluate_rejects_int8_with_inference_message(self):
        """evaluate_checkpoint is an inference entry point: the guard
        must explain the classifier-has-no-quantized-matmuls reason, not
        FoldTrainer's training-specific 'round() kills the gradients'."""
        from vit_deep_radiomics_tpu.engine.evaluate import (
            evaluate_checkpoint,
        )
        from vit_deep_radiomics_tpu.engine.train import TrainerConfig

        tcfg = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            dataset="stanford", precision="int8",
        )
        with pytest.raises(ValueError, match="dense backbone only"):
            evaluate_checkpoint(None, {}, tcfg, None, None, None, 0)

    def test_dense_export_rejects_int8_patch_embed_only(self, tmp_path):
        """A patch-embed-only graph has no projection/MLP matmuls —
        exporting it under the int8 policy would mislabel a float conv
        graph as quantized."""
        from vit_deep_radiomics_tpu.engine.serve import export_dense_model

        cfg = self._tiny_cfg()
        with pytest.raises(ValueError, match="patch-embed-only"):
            export_dense_model(
                {"params": {}}, cfg, tmp_path / "pe.vdr",
                batch=1, policy="int8", use_flash=False,
                patch_embed_only=True)

    def test_extractor_rejects_int8_patch_embed_mode(self):
        """`extract --precision int8` with the dinov2 patch_embed mode
        is the same silent no-op; the extractor rejects it up front."""
        from vit_deep_radiomics_tpu.engine.extract import (
            DenseExtractor,
            ExtractionConfig,
        )

        cfg = ExtractionConfig(
            model_name="dinov2_vits14", dinov2_mode="patch_embed",
            precision="int8", use_flash=False)
        with pytest.raises(ValueError, match="patch_embed mode"):
            DenseExtractor(config=cfg)

    def test_trainable_model_int8_policy_keeps_float_matmuls(self):
        """Constructing ViTDense(trainable=True) directly under the int8
        policy (bypassing the engine guards) must not quantize ANY
        matmul — attention *and* MLP fall back to the policy's float
        path, so the forward is bit-identical to the bf16 fast policy
        and gradients stay live."""
        from vit_deep_radiomics_tpu.core.precision import FAST
        from vit_deep_radiomics_tpu.models.vit import ViTDense

        cfg = self._tiny_cfg()
        rng = np.random.default_rng(7)
        images = jnp.asarray(
            rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        ref = ViTDense(cfg, policy=FAST, use_flash=False, trainable=True)
        params = ref.init(jax.random.PRNGKey(0), images)
        want = np.asarray(jax.jit(ref.apply)(params, images))
        quant = ViTDense(cfg, policy=get_policy("int8"), use_flash=False,
                         trainable=True)
        got = np.asarray(jax.jit(quant.apply)(params, images))
        np.testing.assert_array_equal(got, want)

        def loss(p):
            return jnp.sum(quant.apply(p, images) ** 2)

        grads = jax.grad(loss)(params)
        w1g = np.asarray(
            grads["params"]["block_0"]["mlp"]["w1"], dtype=np.float32)
        assert np.any(w1g != 0.0), "MLP gradient is dead"


class TestInt8FootgunGuard:
    """warn_if_int8_emulated (VERDICT r2 item 7): --precision int8 must
    not silently run on a backend that emulates int8 contractions."""

    def test_emulated_backend_raises_without_optin(self, monkeypatch):
        from vit_deep_radiomics_tpu.ops import quant

        monkeypatch.setattr(quant, "int8_matmul_rate_ratio", lambda: 0.04)
        monkeypatch.delenv("VDR_ALLOW_INT8", raising=False)
        with pytest.raises(RuntimeError, match="VDR_ALLOW_INT8"):
            quant.warn_if_int8_emulated()

    def test_optin_downgrades_to_warning(self, monkeypatch):
        from vit_deep_radiomics_tpu.ops import quant

        monkeypatch.setattr(quant, "int8_matmul_rate_ratio", lambda: 0.04)
        monkeypatch.setenv("VDR_ALLOW_INT8", "1")
        logged = []
        assert quant.warn_if_int8_emulated(log=logged.append) == 0.04
        assert logged and "0.04x" in logged[0]

    def test_parity_rate_warns_no_benefit(self, monkeypatch):
        # ratio ≈ 1: not emulation (no raise) but no speed benefit
        # either — the round-4 demotion warning must fire
        from vit_deep_radiomics_tpu.ops import quant

        monkeypatch.setattr(quant, "int8_matmul_rate_ratio", lambda: 0.97)
        monkeypatch.delenv("VDR_ALLOW_INT8", raising=False)
        logged = []
        assert quant.warn_if_int8_emulated(log=logged.append) == 0.97
        assert logged and "no speed benefit" in logged[0]

    def test_genuine_speedup_passes_silently(self, monkeypatch):
        from vit_deep_radiomics_tpu.ops import quant

        monkeypatch.setattr(quant, "int8_matmul_rate_ratio", lambda: 1.8)
        monkeypatch.delenv("VDR_ALLOW_INT8", raising=False)
        logged = []
        assert quant.warn_if_int8_emulated(log=logged.append) == 1.8
        assert not logged

    def test_live_probe_returns_finite_ratio(self):
        # mechanics of the real probe on the test backend (CPU): just
        # require a sane positive number, not a particular rate
        from vit_deep_radiomics_tpu.ops.quant import int8_matmul_rate_ratio

        r = int8_matmul_rate_ratio(m=256, k=128, n=256, reps=2)
        assert 0 < r < 1000


ON_TPU = jax.default_backend() == "tpu"


class TestPallasS8Matmul:
    """int8_matmul_pallas: exact s32 accumulation vs the int64 oracle
    across tilings (the on-chip rate A/B is `bench.py int8kernel`)."""

    def test_exact_vs_oracle(self, rng):
        from vit_deep_radiomics_tpu.ops.quant import int8_matmul_pallas

        x = jnp.asarray(rng.integers(-127, 128, size=(256, 384)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, size=(384, 256)), jnp.int8)
        want = np.asarray(x, np.int64) @ np.asarray(w, np.int64)
        for bm, bn, bk in ((128, 128, 128), (256, 256, 384),
                           (128, 256, 192)):
            got = int8_matmul_pallas(
                x, w, block_m=bm, block_n=bn, block_k=bk,
                interpret=not ON_TPU)
            assert got.dtype == jnp.int32
            np.testing.assert_array_equal(np.asarray(got, np.int64), want)

    def test_rejects_untiled_shapes(self):
        from vit_deep_radiomics_tpu.ops.quant import int8_matmul_pallas

        x = jnp.zeros((100, 128), jnp.int8)
        w = jnp.zeros((128, 128), jnp.int8)
        with pytest.raises(ValueError):
            int8_matmul_pallas(x, w, block_m=64, interpret=not ON_TPU)
