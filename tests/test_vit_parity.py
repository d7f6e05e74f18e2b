"""Golden fp32 activation parity: ViTDense vs torch oracles.

The SAM/DINOv2 implementations in HuggingFace ``transformers`` (torch,
CPU) serve as independent oracles: we instantiate them with random
weights, convert the state dict with models/convert.py, and require the
Flax forward to match in fp32.  This validates both the architecture and
the weight converter — the exact path a real ``medsam_vit_b.pth``
checkpoint takes (reference loads it at tfds_dense_descriptor.py:104).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.core.precision import PARITY
from vit_deep_radiomics_tpu.models import convert
from vit_deep_radiomics_tpu.models.vit import (
    DINOV2_CONFIGS,
    SAM_VIT_B,
    ViTDense,
    ViTDenseConfig,
)

torch = pytest.importorskip("torch")


SMALL_SAM = ViTDenseConfig(
    name="sam_small_test",
    image_size=64,
    patch_size=16,
    width=96,
    depth=3,
    num_heads=3,
    mlp_ratio=4.0,
    window_size=2,
    global_indexes=(1,),
    use_rel_pos=True,
    neck_channels=32,
)


@pytest.fixture(scope="module")
def sam_oracle():
    from transformers import SamVisionConfig, SamVisionModel

    cfg = SamVisionConfig(
        hidden_size=SMALL_SAM.width,
        num_hidden_layers=SMALL_SAM.depth,
        num_attention_heads=SMALL_SAM.num_heads,
        image_size=SMALL_SAM.image_size,
        patch_size=SMALL_SAM.patch_size,
        window_size=SMALL_SAM.window_size,
        global_attn_indexes=list(SMALL_SAM.global_indexes),
        output_channels=SMALL_SAM.neck_channels,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = SamVisionModel(cfg).eval()
    return model


class TestSamParity:
    @pytest.mark.parametrize("use_flash", [False, True])
    def test_full_encoder_matches_transformers(self, sam_oracle, use_flash):
        state = {k: v.numpy() for k, v in sam_oracle.state_dict().items()}
        params = convert.sam_params_from_torch(state, SMALL_SAM)

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

        with torch.no_grad():
            ref = sam_oracle(
                torch.from_numpy(img.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()  # (B, C, H, W)
        ref = ref.transpose(0, 2, 3, 1)  # NHWC

        model = ViTDense(SMALL_SAM, policy=PARITY, use_flash=use_flash)
        with jax.default_matmul_precision("highest"):
            out = model.apply({"params": params}, jnp.asarray(img))
        out = np.asarray(out)

        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    def test_logit_probe_within_nomax_bound(self, sam_oracle):
        """The nomax softmax precondition, measured rather than asserted
        in prose: max |scaled attention logit| (rel-pos bias included)
        stays far below the exp2 overflow bound 127/log2e ≈ 88 nats
        (ops/attention.py::_fused_global_kernel).  The probe path is the
        same instrumentation `bench.py nomax` reports the margin with.
        """
        from vit_deep_radiomics_tpu.models.vit import probe_max_abs_logit

        state = {k: v.numpy() for k, v in sam_oracle.state_dict().items()}
        params = convert.sam_params_from_torch(state, SMALL_SAM)
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

        model = ViTDense(SMALL_SAM, policy=PARITY, use_flash=False)
        observed = probe_max_abs_logit(
            model, {"params": params}, jnp.asarray(img))
        bound = 127 / np.log2(np.e)
        assert 0.0 < observed < 0.5 * bound, (
            f"max |logit| {observed} vs exp2 overflow bound {bound}")

    def test_original_sam_naming_matches_transformers_naming(
        self, sam_oracle
    ):
        """A real ``medsam_vit_b.pth`` ships segment_anything naming
        (``image_encoder.blocks.N.*`` / ``neck.0-3``, reference loads it
        at tfds_dense_descriptor.py:104); converting the SAME weights
        under either naming must give identical params (VERDICT r1 #6)."""
        state = {k: v.numpy() for k, v in sam_oracle.state_dict().items()}

        def to_original(key):
            k = key.replace("vision_encoder.", "image_encoder.")
            k = k.replace("patch_embed.projection.", "patch_embed.proj.")
            k = k.replace(".layers.", ".blocks.")
            # neck first: its LN keys would otherwise be caught by the
            # block-LN rename below
            k = k.replace("neck.conv1.weight", "neck.0.weight")
            k = k.replace("neck.layer_norm1.weight", "neck.1.weight")
            k = k.replace("neck.layer_norm1.bias", "neck.1.bias")
            k = k.replace("neck.conv2.weight", "neck.2.weight")
            k = k.replace("neck.layer_norm2.weight", "neck.3.weight")
            k = k.replace("neck.layer_norm2.bias", "neck.3.bias")
            k = k.replace(".layer_norm1.", ".norm1.")
            k = k.replace(".layer_norm2.", ".norm2.")
            return k

        original_state = {to_original(k): v for k, v in state.items()}
        # the fabricated dict really uses the original-SAM key shapes
        assert any(
            k.startswith("image_encoder.blocks.0.") for k in original_state)
        assert "image_encoder.neck.0.weight" in original_state

        want = convert.sam_params_from_torch(state, SMALL_SAM)
        got = convert.sam_params_from_torch(original_state, SMALL_SAM)
        flat_want = jax.tree_util.tree_leaves_with_path(want)
        flat_got = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(got))
        assert len(flat_want) == len(flat_got)
        for key, w in flat_want:
            np.testing.assert_array_equal(
                flat_got[jax.tree_util.keystr(key)], w,
                err_msg=jax.tree_util.keystr(key))

    def test_patch_embed_matches(self, sam_oracle):
        state = {k: v.numpy() for k, v in sam_oracle.state_dict().items()}
        params = convert.sam_params_from_torch(state, SMALL_SAM)
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = sam_oracle.vision_encoder.patch_embed(
                torch.from_numpy(img.transpose(0, 3, 1, 2))
            ).numpy()  # (B, H', W', C)
        model = ViTDense(SMALL_SAM, policy=PARITY, patch_embed_only=True)
        with jax.default_matmul_precision("highest"):
            out = model.apply({"params": params}, jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


SMALL_DINO = ViTDenseConfig(
    name="dinov2_small_test",
    image_size=56,
    patch_size=14,
    width=96,
    depth=2,
    num_heads=3,
    use_cls_token=True,
    layerscale_init=1e-5,
)


@pytest.fixture(scope="module")
def dino_oracle():
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=SMALL_DINO.width,
        num_hidden_layers=SMALL_DINO.depth,
        num_attention_heads=SMALL_DINO.num_heads,
        image_size=SMALL_DINO.image_size,
        patch_size=SMALL_DINO.patch_size,
        layerscale_value=SMALL_DINO.layerscale_init,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return Dinov2Model(cfg).eval()


class TestDinov2Parity:
    def test_patch_embed_only_matches(self, dino_oracle):
        """Reference parity mode: model.patch_embed(img) tokens
        (tfds_dense_descriptor.py:128-133)."""
        state = {k: v.numpy() for k, v in dino_oracle.state_dict().items()}
        params = convert.dinov2_params_from_torch(state, SMALL_DINO)
        rng = np.random.default_rng(2)
        img = rng.uniform(size=(1, 56, 56, 3)).astype(np.float32)
        with torch.no_grad():
            ref = dino_oracle.embeddings.patch_embeddings(
                torch.from_numpy(img.transpose(0, 3, 1, 2))
            ).numpy()  # (B, N, C)
        model = ViTDense(SMALL_DINO, policy=PARITY, patch_embed_only=True)
        with jax.default_matmul_precision("highest"):
            out = model.apply({"params": params}, jnp.asarray(img))
        out = np.asarray(out).reshape(ref.shape)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_full_dense_matches_transformers(self, dino_oracle):
        """Full dense mode: normalised patch tokens after the transformer."""
        state = {k: v.numpy() for k, v in dino_oracle.state_dict().items()}
        params = convert.dinov2_params_from_torch(state, SMALL_DINO)
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(2, 56, 56, 3)).astype(np.float32)
        with torch.no_grad():
            ref = dino_oracle(
                torch.from_numpy(img.transpose(0, 3, 1, 2))
            ).last_hidden_state.numpy()  # (B, 1+N, C) post-layernorm
        ref_patches = ref[:, 1:]
        model = ViTDense(SMALL_DINO, policy=PARITY, use_flash=False)
        with jax.default_matmul_precision("highest"):
            out = model.apply({"params": params}, jnp.asarray(img))
        g = SMALL_DINO.grid
        out = np.asarray(out).reshape(ref_patches.shape)
        np.testing.assert_allclose(out, ref_patches, atol=2e-4, rtol=1e-3)


class TestFullSamConfig:
    def test_sam_vit_b_shapes(self):
        """Smoke: full-size config builds and emits (B, 64, 64, 256)."""
        model = ViTDense(SAM_VIT_B, policy=PARITY, use_flash=False)
        img = jnp.zeros((1, 1024, 1024, 3))
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), img)
        )
        out = jax.eval_shape(
            lambda p: model.apply(p, img), params
        )
        assert out.shape == (1, 64, 64, 256)

    def test_dinov2_config_registry(self):
        assert DINOV2_CONFIGS["dinov2_vitl14"].width == 1024
        assert DINOV2_CONFIGS["dinov2_vitl14"].depth == 24
