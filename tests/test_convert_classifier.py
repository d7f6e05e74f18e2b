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

    def __init__(self, d=32, heads=4, layers=1, ff=64, ncls=2,
                 layers_pet=None):
        super().__init__()

        def encoder(n):
            layer = torch.nn.TransformerEncoderLayer(
                d_model=d, nhead=heads, dim_feedforward=ff,
                activation="gelu", batch_first=True, dropout=0.0)
            return torch.nn.TransformerEncoder(layer, n)

        self.transformer_encoder_ct = encoder(layers)
        self.transformer_encoder_pet = encoder(
            layers if layers_pet is None else layers_pet)
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

    def test_bimodal_asymmetric_depths_inferred(self):
        """CT and PET encoders may have different depths (the config
        schema sets num_layers per modality); num_layers=None infers
        each from the checkpoint keys."""
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleBimodalClassifier,
        )

        d, heads, ff, ncls = 32, 4, 64, 2
        torch.manual_seed(3)
        tm = _TorchBimodal(d, heads, layers=1, ff=ff, ncls=ncls,
                           layers_pet=2).eval()
        ct = torch.randn(2, 6, d)
        pet = torch.randn(2, 4, d)
        with torch.no_grad():
            ref = [t.numpy() for t in tm(ct, pet)]

        state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = transformer_classifier_params_from_torch(
            state, bimodal=True)
        assert set(params["encoder_ct"]) == {"layer_0"}
        assert set(params["encoder_pet"]) == {"layer_0", "layer_1"}
        model = TransformerNoduleBimodalClassifier(
            input_dim=d, ffn_dim_ct=ff, ffn_dim_pet=ff,
            num_heads_ct=heads, num_heads_pet=heads,
            num_layers_ct=1, num_layers_pet=2,
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
        # an explicit num_layers that contradicts the checkpoint is
        # rejected instead of silently truncating an encoder
        with pytest.raises(ValueError, match="checkpoint has 2"):
            transformer_classifier_params_from_torch(
                state, 1, bimodal=True)

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


class _TorchSELayer(torch.nn.Module):
    """Reference SELayer naming (models_archs.py:203-216)."""

    def __init__(self, channel, reduction=16):
        super().__init__()
        self.avg_pool = torch.nn.AdaptiveAvgPool3d(1)
        self.fc = torch.nn.Sequential(
            torch.nn.Linear(channel, channel // reduction, bias=False),
            torch.nn.ReLU(inplace=True),
            torch.nn.Linear(channel // reduction, channel, bias=False),
            torch.nn.Sigmoid(),
        )

    def forward(self, x):
        b, c = x.shape[:2]
        y = self.avg_pool(x).view(b, c)
        return x * self.fc(y).view(b, c, 1, 1, 1)


class _TorchConv(torch.nn.Module):
    """Reference-contract conv classifier (models_archs.py:150-171)."""

    def __init__(self, d=32, div=2, ncls=2):
        super().__init__()
        self.conv1 = torch.nn.Conv3d(d, d // div, 3, padding=1)
        self.se1 = _TorchSELayer(d // div)
        self.conv2 = torch.nn.Conv3d(d // div, d // (div * div), 3,
                                     padding=1)
        self.se2 = _TorchSELayer(d // (div * div))
        self.fc1 = torch.nn.Linear(d // (div * div), d)
        self.classifier = _TorchMLPHead(d, d * 2, ncls)

    def forward(self, x):
        import torch.nn.functional as F

        x = self.se1(F.relu(self.conv1(x)))
        x = self.se2(F.relu(self.conv2(x)))
        x = torch.flatten(F.adaptive_avg_pool3d(x, 1), 1)
        x = F.relu(self.fc1(x))
        return self.classifier(x), x


class TestConvClassifierConversion:
    def test_conv_import_forward_parity(self):
        from vit_deep_radiomics_tpu.models.classifiers import (
            ConvNoduleClassifier,
        )
        from vit_deep_radiomics_tpu.models.convert import (
            conv_classifier_params_from_torch,
        )

        d, ncls = 64, 2  # d//(div*div) must stay >= reduction=16 per the
        # reference SELayer (models_archs.py:204 would build a 0-dim
        # hidden below that; our _SELayer clamps with max(1, ...))
        torch.manual_seed(3)
        tm = _TorchConv(d, 2, ncls).eval()
        x = torch.randn(2, d, 4, 5, 6)  # (B, C, S, H, W) reference layout
        with torch.no_grad():
            ref_logits, ref_emb = tm(x)

        state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = conv_classifier_params_from_torch(state)
        model = ConvNoduleClassifier(input_dim=d, num_classes=ncls, div=2,
                                     policy=PARITY)
        xl = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))  # channels-last
        with jax.default_matmul_precision("highest"):
            logits, emb = model.apply({"params": params}, xl)
        np.testing.assert_allclose(np.asarray(emb), ref_emb.numpy(),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   atol=3e-5)


class TestClassifierExport:
    """classifier_params_to_torch is the exact inverse of the importers,
    so models trained here drop into the reference's tooling."""

    def _assert_tree_equal(self, a, b):
        flat_a = jax.tree.leaves(a)
        flat_b = jax.tree.leaves(b)
        assert len(flat_a) == len(flat_b)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_unimodal_roundtrip(self):
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleClassifier,
        )
        from vit_deep_radiomics_tpu.models.convert import (
            classifier_params_to_torch,
        )

        model = TransformerNoduleClassifier(
            input_dim=32, ffn_dim=64, num_heads=4, num_classes=2,
            num_layers=2, policy=PARITY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 5, 32)))["params"]
        sd = classifier_params_to_torch({"params": params})
        back = transformer_classifier_params_from_torch(sd, 2)
        self._assert_tree_equal(params, back)
        # a torch module with the reference naming loads it directly
        tm = _TorchUnimodal(32, 4, 2, 64, 2)
        tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})

    def test_bimodal_roundtrip(self):
        from vit_deep_radiomics_tpu.models.classifiers import (
            TransformerNoduleBimodalClassifier,
        )
        from vit_deep_radiomics_tpu.models.convert import (
            classifier_params_to_torch,
        )

        model = TransformerNoduleBimodalClassifier(
            input_dim=32, ffn_dim_ct=64, ffn_dim_pet=64,
            num_heads_ct=4, num_heads_pet=4,
            num_layers_ct=1, num_layers_pet=1,
            num_classes=2, policy=PARITY)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 5, 32)), jnp.zeros((1, 4, 32)))["params"]
        sd = classifier_params_to_torch({"params": params})
        back = transformer_classifier_params_from_torch(sd, 1, bimodal=True)
        self._assert_tree_equal(params, back)
        tm = _TorchBimodal(32, 4, 1, 64, 2)
        tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})

    def test_conv_roundtrip(self):
        from vit_deep_radiomics_tpu.models.classifiers import (
            ConvNoduleClassifier,
        )
        from vit_deep_radiomics_tpu.models.convert import (
            classifier_params_to_torch,
            conv_classifier_params_from_torch,
        )

        model = ConvNoduleClassifier(input_dim=64, num_classes=2, div=2,
                                     policy=PARITY)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 3, 4, 4, 64)))["params"]
        sd = classifier_params_to_torch({"params": params})
        back = conv_classifier_params_from_torch(sd)
        self._assert_tree_equal(params, back)
        tm = _TorchConv(64, 2, 2)
        tm.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})


def test_convert_cli_to_pth(tmp_path):
    """convert to-pth: fold msgpack checkpoint → reference-named .pth."""
    from flax import serialization

    from vit_deep_radiomics_tpu.cli.convert import main as convert_main
    from vit_deep_radiomics_tpu.models.classifiers import (
        TransformerNoduleClassifier,
    )
    from vit_deep_radiomics_tpu.models.convert import (
        load_torch_state_dict,
        transformer_classifier_params_from_torch,
    )

    model = TransformerNoduleClassifier(
        input_dim=32, ffn_dim=64, num_heads=4, num_classes=2,
        num_layers=2, policy=PARITY)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 5, 32)))
    ckpt_path = tmp_path / "model_epoch_0003.msgpack"
    ckpt_path.write_bytes(serialization.msgpack_serialize(
        {"params": params, "epoch": 3}))

    out = tmp_path / "model_epoch_0003.pth"
    assert convert_main(["to-pth", str(ckpt_path), "-o", str(out)]) == 0
    back = transformer_classifier_params_from_torch(
        load_torch_state_dict(out), 2)
    for a, b in zip(jax.tree.leaves(params["params"]),
                    jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
