"""Downstream classifier + loss tests: torch-oracle parity, mask
invariance, and hand-computed loss values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.core.precision import PARITY
from vit_deep_radiomics_tpu.models.classifiers import (
    ConvNoduleClassifier,
    TransformerNoduleBimodalClassifier,
    TransformerNoduleClassifier,
    build_classifier,
)
from vit_deep_radiomics_tpu.models.losses import (
    cross_modal_focal_loss,
    focal_loss,
)

torch = pytest.importorskip("torch")


def _torch_encoder_layer_params(layer, prefix_params):
    """Map a torch TransformerEncoderLayer state onto our layer names."""
    sd = {k: v.detach().numpy() for k, v in layer.state_dict().items()}
    prefix_params["self_attn"] = {
        "in_kernel": sd["self_attn.in_proj_weight"].T,
        "in_bias": sd["self_attn.in_proj_bias"],
        "out_kernel": sd["self_attn.out_proj.weight"].T,
        "out_bias": sd["self_attn.out_proj.bias"],
    }
    prefix_params["linear1"] = {"kernel": sd["linear1.weight"].T,
                                "bias": sd["linear1.bias"]}
    prefix_params["linear2"] = {"kernel": sd["linear2.weight"].T,
                                "bias": sd["linear2.bias"]}
    prefix_params["norm1"] = {"scale": sd["norm1.weight"],
                              "bias": sd["norm1.bias"]}
    prefix_params["norm2"] = {"scale": sd["norm2.weight"],
                              "bias": sd["norm2.bias"]}
    return prefix_params


class TestTransformerClassifierParity:
    def test_matches_torch_post_norm_encoder(self):
        """Our CLS+norm+encoder+head stack vs an equivalent torch stack."""
        d, heads, layers, ff, ncls = 32, 4, 2, 64, 2
        torch.manual_seed(0)
        enc_layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=ff, activation="gelu",
            batch_first=True, dropout=0.0,
        )
        encoder = torch.nn.TransformerEncoder(enc_layer, num_layers=layers)
        norm = torch.nn.LayerNorm(d)
        cls_token = torch.randn(1, 1, d)
        head1 = torch.nn.Linear(d, d * 2)
        head2 = torch.nn.Linear(d * 2, ncls)
        encoder.eval()

        x = torch.randn(3, 11, d)
        with torch.no_grad():
            t = torch.cat([cls_token.repeat(3, 1, 1), x], dim=1)
            t = norm(t)
            t = encoder(t)
            cls_out = t[:, 0]
            ref_logits = head2(
                torch.nn.functional.gelu(head1(cls_out))
            ).numpy()
            ref_cls = cls_out.numpy()

        params = {
            "cls_token": cls_token.numpy(),
            "norm": {"scale": norm.weight.detach().numpy(),
                     "bias": norm.bias.detach().numpy()},
            "encoder": {
                f"layer_{i}": _torch_encoder_layer_params(
                    encoder.layers[i], {}
                )
                for i in range(layers)
            },
            "head": {
                "dense1": {"kernel": head1.weight.detach().numpy().T,
                           "bias": head1.bias.detach().numpy()},
                "dense2": {"kernel": head2.weight.detach().numpy().T,
                           "bias": head2.bias.detach().numpy()},
            },
        }
        model = TransformerNoduleClassifier(
            input_dim=d, ffn_dim=ff, num_heads=heads, num_classes=ncls,
            num_layers=layers, policy=PARITY, dropout_rate=0.0,
        )
        with jax.default_matmul_precision("highest"):
            logits, cls_out = model.apply(
                {"params": params}, jnp.asarray(x.numpy())
            )
        np.testing.assert_allclose(np.asarray(cls_out), ref_cls, atol=2e-5)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-5)


class TestMaskInvariance:
    def _model_and_params(self, rng_key, d=16):
        model = TransformerNoduleClassifier(
            input_dim=d, ffn_dim=32, num_heads=2, num_classes=2,
            num_layers=1, policy=PARITY,
        )
        tokens = jnp.zeros((1, 8, d))
        params = model.init(rng_key, tokens)
        return model, params

    def test_padding_does_not_change_logits(self, rng):
        d = 16
        model, params = self._model_and_params(jax.random.PRNGKey(0), d)
        tokens = jnp.asarray(rng.normal(size=(1, 5, d)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            base, _ = model.apply(params, tokens)
            padded = jnp.concatenate(
                [tokens, jnp.asarray(
                    rng.normal(size=(1, 3, d)).astype(np.float32))], axis=1
            )
            mask = jnp.asarray([[True] * 5 + [False] * 3])
            out, _ = model.apply(params, padded, token_mask=mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=1e-5
        )

    def test_bimodal_shapes_and_unimodal_fallback(self, rng):
        d = 16
        model = TransformerNoduleBimodalClassifier(
            input_dim=d, ffn_dim_ct=32, ffn_dim_pet=32,
            num_heads_ct=2, num_heads_pet=2,
            num_layers_ct=1, num_layers_pet=1,
            num_classes=2, policy=PARITY,
        )
        ct = jnp.asarray(rng.normal(size=(2, 6, d)).astype(np.float32))
        pet = jnp.asarray(rng.normal(size=(2, 4, d)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), ct, pet)
        lj, cls, lc, lp = model.apply(params, ct, pet)
        assert lj.shape == (2, 2) and cls.shape == (2, d)
        # unimodal: logits duplicated across outputs, CLS is *encoded*
        lj1, cls1, lc1, lp1 = model.apply(params, ct, None)
        np.testing.assert_array_equal(np.asarray(lj1), np.asarray(lc1))
        np.testing.assert_array_equal(np.asarray(lp1), np.asarray(lc1))
        assert not np.allclose(np.asarray(cls1), 0)

    def test_conv_classifier_shapes(self, rng):
        model = ConvNoduleClassifier(input_dim=32, num_classes=2, div=2,
                                     policy=PARITY)
        x = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 32)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        logits, emb = model.apply(params, x)
        assert logits.shape == (2, 2) and emb.shape == (2, 32)

    def test_conv_masked_gap_padding_insensitive_to_scale(self, rng):
        """With valid_mask, padded-volume pooling averages only valid
        voxels (conv boundary bleed aside, logits stay close)."""
        model = ConvNoduleClassifier(input_dim=16, num_classes=2, div=2,
                                     policy=PARITY)
        x = jnp.asarray(rng.normal(size=(1, 3, 6, 6, 16)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        base, _ = model.apply(params, x)
        # pad spatially with zeros + mask
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 2), (0, 2), (0, 0)))
        mask = np.zeros((1, 4, 8, 8), bool)
        mask[:, :3, :6, :6] = True
        padded, _ = model.apply(params, xp, valid_mask=jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(padded), np.asarray(base), atol=0.15
        )
        # without the mask, dilution moves logits further
        diluted, _ = model.apply(params, xp)
        err_masked = np.abs(np.asarray(padded) - np.asarray(base)).max()
        err_plain = np.abs(np.asarray(diluted) - np.asarray(base)).max()
        assert err_masked <= err_plain

    def test_build_classifier_from_config(self):
        cfg = {
            "models": {
                "transformer": {
                    "feature_dim": 32,
                    "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                    "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                },
                "conv": {"feature_dim": 32, "ct": {"div": 2}},
            }
        }
        m1 = build_classifier(cfg, "transformer", "ct")
        assert isinstance(m1, TransformerNoduleClassifier)
        m2 = build_classifier(cfg, "transformer", "petct")
        assert isinstance(m2, TransformerNoduleBimodalClassifier)
        m3 = build_classifier(cfg, "conv", "ct")
        assert isinstance(m3, ConvNoduleClassifier)


class TestFocalLoss:
    def test_hand_computed_binary_case(self):
        # logits (0, 0) -> p = 0.5 for both classes; target class 1,
        # alpha = (0.25, 0.75), gamma = 2:
        # loss = 0.75 * (1-0.5)^2 * (-log 0.5) = 0.75*0.25*0.6931 = 0.12997
        logits = jnp.asarray([[0.0, 0.0]])
        target = jnp.asarray([[0.0, 1.0]])
        out = float(focal_loss(logits, target, gamma=2.0, alpha=(0.25, 0.75)))
        assert out == pytest.approx(0.75 * 0.25 * np.log(2.0), abs=1e-6)

    def test_sum_reduction_over_batch(self, rng):
        logits = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
        t = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1, 1, 0]])
        total = float(focal_loss(logits, t, alpha=(0.25, 0.75)))
        parts = sum(
            float(focal_loss(logits[i:i + 1], t[i:i + 1], alpha=(0.25, 0.75)))
            for i in range(4)
        )
        assert total == pytest.approx(parts, rel=1e-6)

    def test_matches_torch_nll_semantics(self, rng):
        """Weighting semantics vs torch F.nll_loss with per-class weights."""
        import torch.nn.functional as F

        logits = rng.normal(size=(6, 2)).astype(np.float32)
        y = rng.integers(0, 2, size=6)
        onehot = np.eye(2, dtype=np.float32)[y]
        alpha = np.asarray([0.25, 0.75], np.float32)
        gamma = 2.0

        tl = torch.from_numpy(logits)
        logpt = F.log_softmax(tl, dim=1)
        pt = torch.exp(logpt)
        mod = (1 - pt) ** gamma * logpt
        ref = F.nll_loss(
            mod, torch.from_numpy(y), torch.from_numpy(alpha),
            reduction="sum",
        ).item()
        ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(onehot),
                                gamma=gamma, alpha=alpha))
        assert ours == pytest.approx(ref, rel=1e-5)


class TestCrossModalFocalLoss:
    def test_matches_torch_composition(self, rng):
        """Full formula vs a direct torch composition of the documented
        spec (log_softmax/nll_loss building blocks)."""
        import torch.nn.functional as F

        n = 5
        lj = rng.normal(size=(n, 2)).astype(np.float32)
        lc = rng.normal(size=(n, 2)).astype(np.float32)
        lp = rng.normal(size=(n, 2)).astype(np.float32)
        y = rng.integers(0, 2, size=n)
        onehot = np.eye(2, dtype=np.float32)[y]
        alpha = np.asarray([0.25, 0.75], np.float32)
        gb, gu, beta, eps = 1.0, 2.0, 0.6, 1e-8

        tj, tc, tp = (torch.from_numpy(a) for a in (lj, lc, lp))
        ty = torch.from_numpy(y)
        ta = torch.from_numpy(alpha)
        logpt_j = F.log_softmax(tj, dim=1)
        logpt_c = F.log_softmax(tc, dim=1)
        logpt_p = F.log_softmax(tp, dim=1)
        pt_j, pt_c, pt_p = (torch.exp(x) for x in (logpt_j, logpt_c, logpt_p))
        l_j = F.nll_loss((1 - pt_j) ** gb * logpt_j, ty, ta, reduction="mean")
        pt_m = (2 * pt_c * pt_p) / (pt_c + pt_p + eps)
        l_c = F.nll_loss((1 - pt_m * pt_c) ** gu * logpt_c, ty, ta,
                         reduction="mean")
        l_p = F.nll_loss((1 - pt_m * pt_p) ** gu * logpt_p, ty, ta,
                         reduction="mean")
        ref = (beta * l_j + (1 - beta) * (l_c + l_p)).item()

        ours = float(cross_modal_focal_loss(
            jnp.asarray(lj), jnp.asarray(lc), jnp.asarray(lp),
            jnp.asarray(onehot), gamma_bimodal=gb, gamma_unimodal=gu,
            alpha=alpha, beta=beta,
        ))
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_gradients_finite(self, rng):
        lj = jnp.asarray(rng.normal(size=(3, 2)).astype(np.float32))
        t = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1, 0]])

        g = jax.grad(
            lambda x: cross_modal_focal_loss(x, x, x, t, alpha=(0.25, 0.75))
        )(lj)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_example_weight_drops_padding(self, rng):
        lj = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
        t = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1, 1, 0]])
        base = float(cross_modal_focal_loss(
            lj[:2], lj[:2], lj[:2], t[:2], alpha=(0.25, 0.75)))
        w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        padded = float(cross_modal_focal_loss(
            lj, lj, lj, t, alpha=(0.25, 0.75), example_weight=w))
        assert padded == pytest.approx(base, rel=1e-6)
