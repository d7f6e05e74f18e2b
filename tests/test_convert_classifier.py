"""Reference-checkpoint classifier conversion: torch .pth → our params.

Builds torch modules with the reference's state-dict naming contract
(models_archs.py:127-147 layout: cls_token / norm / transformer_encoder
.layers.N / classifier.dense{1,2}) and checks the converted params
reproduce the torch forward in fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.core.precision import PARITY, cast_params
from vit_deep_radiomics_tpu.models.classifiers import (
    TransformerNoduleClassifier,
)
from vit_deep_radiomics_tpu.models.convert import (
    transformer_classifier_params_from_torch,
)

torch = pytest.importorskip("torch")


class _TorchMLPHead(torch.nn.Module):
    """dense1 → GELU → dense2 (eval: dropout off) with reference naming."""

    def __init__(self, d, hidden, out):
        super().__init__()
        self.dense1 = torch.nn.Linear(d, hidden)
        self.activation = torch.nn.GELU()
        self.dense2 = torch.nn.Linear(hidden, out)

    def forward(self, x):
        return self.dense2(self.activation(self.dense1(x)))


class _TorchUnimodal(torch.nn.Module):
    """Reference-contract unimodal classifier (state-dict names only)."""

    def __init__(self, d=32, heads=4, layers=2, ff=64, ncls=2):
        super().__init__()
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=ff, activation="gelu",
            batch_first=True, dropout=0.0,
        )
        self.transformer_encoder = torch.nn.TransformerEncoder(layer, layers)
        self.norm = torch.nn.LayerNorm(d)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, d))
        self.classifier = _TorchMLPHead(d, d * 2, ncls)

    def forward(self, x):
        b = x.shape[0]
        x = torch.cat([self.cls_token.repeat(b, 1, 1), x], dim=1)
        x = self.norm(x)
        x = self.transformer_encoder(x)
        cls = x[:, 0]
        return self.classifier(cls), cls


class _TorchCrossAttention(torch.nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.multihead_attn = torch.nn.MultiheadAttention(
            embed_dim=d, num_heads=heads, batch_first=True)

    def forward(self, query, key, value):
        out, _ = self.multihead_attn(query, key, value)
        return out


class _TorchBimodal(torch.nn.Module):
    """Reference-contract bimodal classifier (state-dict names only):
    per-modality encoders + CLS, bidirectional cross-attention, three
    MLP heads + projection (models_archs.py:38-124 layout)."""

    def __init__(self, d=32, heads=4, layers=1, ff=64, ncls=2):
        super().__init__()

        def encoder():
            layer = torch.nn.TransformerEncoderLayer(
                d_model=d, nhead=heads, dim_feedforward=ff,
                activation="gelu", batch_first=True, dropout=0.0)
            return torch.nn.TransformerEncoder(layer, layers)

        self.transformer_encoder_ct = encoder()
        self.transformer_encoder_pet = encoder()
        self.norm_ct = torch.nn.LayerNorm(d)
        self.norm_pet = torch.nn.LayerNorm(d)
        self.cls_token_ct = torch.nn.Parameter(torch.randn(1, 1, d))
        self.cls_token_pet = torch.nn.Parameter(torch.randn(1, 1, d))
        self.classifier_ct = _TorchMLPHead(d, d * 2, ncls)
        self.classifier_pet = _TorchMLPHead(d, d * 2, ncls)
        self.projection_petct = _TorchMLPHead(d * 2, d, d)
        self.cross_attention_ct = _TorchCrossAttention(d, heads)
        self.cross_attention_pet = _TorchCrossAttention(d, heads)
        self.classifier_petct = _TorchMLPHead(d, d * 2, ncls)

    def forward(self, x_ct, x_pet):
        b = x_ct.shape[0]
        x_ct = torch.cat([self.cls_token_ct.repeat(b, 1, 1), x_ct], dim=1)
        x_ct = self.transformer_encoder_ct(self.norm_ct(x_ct))
        x_pet = torch.cat([self.cls_token_pet.repeat(b, 1, 1), x_pet], dim=1)
        x_pet = self.transformer_encoder_pet(self.norm_pet(x_pet))
        ct_cls = self.cross_attention_ct(x_ct, x_pet, x_pet)[:, 0]
        pet_cls = self.cross_attention_pet(x_pet, x_ct, x_ct)[:, 0]
        logits_ct = self.classifier_ct(ct_cls)
        logits_pet = self.classifier_pet(pet_cls)
        joint = self.projection_petct(torch.cat([ct_cls, pet_cls], dim=1))
        logits_joint = self.classifier_petct(joint)
        return logits_joint, joint, logits_ct, logits_pet


class TestClassifierConversion:
    def test_bimodal_roundtrip(self):
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleBimodalClassifier,
        )

        d, heads, layers, ff, ncls = 32, 4, 1, 64, 2
        torch.manual_seed(1)
        tm = _TorchBimodal(d, heads, layers, ff, ncls).eval()
        ct = torch.randn(2, 7, d)
        pet = torch.randn(2, 5, d)
        with torch.no_grad():
            ref = [t.numpy() for t in tm(ct, pet)]

        state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = transformer_classifier_params_from_torch(
            state, layers, bimodal=True)
        model = TransformerNoduleBimodalClassifier(
            input_dim=d, ffn_dim_ct=ff, ffn_dim_pet=ff,
            num_heads_ct=heads, num_heads_pet=heads,
            num_layers_ct=layers, num_layers_pet=layers,
            num_classes=ncls, policy=PARITY, dropout_rate=0.0,
        )
        with jax.default_matmul_precision("highest"):
            outs = model.apply(
                {"params": params},
                jnp.asarray(ct.numpy()), jnp.asarray(pet.numpy()),
            )
        for ours, want, name in zip(
            outs, ref, ("logits_joint", "joint_cls", "logits_ct",
                        "logits_pet")
        ):
            np.testing.assert_allclose(
                np.asarray(ours), want, atol=3e-5, err_msg=name)

    def test_unimodal_roundtrip(self):
        d, heads, layers, ff, ncls = 32, 4, 2, 64, 2
        torch.manual_seed(0)
        tm = _TorchUnimodal(d, heads, layers, ff, ncls).eval()
        x = torch.randn(3, 9, d)
        with torch.no_grad():
            ref_logits, ref_cls = tm(x)

        state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = transformer_classifier_params_from_torch(state, layers)
        model = TransformerNoduleClassifier(
            input_dim=d, ffn_dim=ff, num_heads=heads, num_classes=ncls,
            num_layers=layers, policy=PARITY, dropout_rate=0.0,
        )
        with jax.default_matmul_precision("highest"):
            logits, cls = model.apply(
                {"params": params}, jnp.asarray(x.numpy())
            )
        np.testing.assert_allclose(
            np.asarray(cls), ref_cls.numpy(), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits.numpy(), atol=2e-5)

    def test_cast_params_bf16(self):
        d = 16
        model = TransformerNoduleClassifier(
            input_dim=d, ffn_dim=32, num_heads=2, num_classes=2,
            num_layers=1, policy=PARITY,
        )
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, d)))
        bf16 = cast_params(params, jnp.bfloat16)
        leaves = jax.tree.leaves(bf16)
        assert all(l.dtype == jnp.bfloat16 for l in leaves)
