"""ROI geometry, 3D positional encoding, and metric kernel tests."""

import numpy as np
import pytest
from sklearn.metrics import roc_auc_score

import jax.numpy as jnp

from vit_deep_radiomics_tpu.ops import metrics as M
from vit_deep_radiomics_tpu.ops import posenc, roi


class TestRoi:
    def test_extract_coords_reference_shift_semantics(self):
        mask = np.zeros((20, 20), bool)
        mask[5:10, 8:12] = True  # ys 5..9, xs 8..11
        # reference arithmetic: ymin=5-m, ymax=9-m, xmin=8+m, xmax=11+m
        # h = max(ymax-ymin, m) = 4, w = max(xmax-xmin, m) = 3
        xmin, ymin, xmax, ymax = roi.extract_coords(mask, margin=2)
        assert (xmin, ymin) == (10, 3)
        assert (xmax - xmin, ymax - ymin) == (3, 4)

    def test_extract_coords_symmetric(self):
        mask = np.zeros((20, 20), bool)
        mask[5:10, 8:12] = True
        xmin, ymin, xmax, ymax = roi.extract_coords(mask, 2, symmetric=True)
        # ys 5..9 ± 2 -> 3..11, xs 8..11 ± 2 -> 6..13
        assert (xmin, ymin, xmax, ymax) == (6, 3, 13, 11)

    def test_crop_clamps_to_bounds(self):
        img = np.arange(25).reshape(5, 5)
        out = roi.crop_image(img, -3, -3, 10, 2)
        np.testing.assert_array_equal(out, img[0:2, 0:5])

    def test_extract_roi_feature_scale(self):
        # 64x64 feature map vs 128x128 mask: coords halve.
        mask = np.zeros((128, 128), bool)
        mask[40:60, 40:60] = True
        feat = np.random.default_rng(0).normal(size=(64, 64, 8))
        out = roi.extract_roi(feat, mask, margin=1)
        assert out.ndim == 3 and out.shape[2] == 8
        assert 0 < out.shape[0] <= 64

    def test_square_crop_box_is_square_and_centered(self):
        mask = np.zeros((100, 100), bool)
        mask[40:50, 45:55] = True
        xmin, ymin, xmax, ymax = roi.square_crop_box(mask, margin=2)
        assert xmax - xmin == ymax - ymin  # square

    def test_scaled_roi_box_matches_extract_roi(self, rng):
        """Device-crop geometry (scaled_roi_box) must reproduce
        extract_roi's crop exactly."""
        mask = np.zeros((128, 128), bool)
        mask[40:60, 50:75] = True
        feat = rng.normal(size=(64, 64, 4)).astype(np.float32)
        ref = roi.extract_roi(feat, mask, margin=1)
        xmin, ymin, xmax, ymax = roi.scaled_roi_box((64, 64), mask, margin=1)
        np.testing.assert_array_equal(feat[ymin:ymax, xmin:xmax], ref)

    def test_device_bbox_matches_numpy(self, rng):
        mask = rng.uniform(size=(32, 24)) > 0.8
        ys, xs = np.where(mask)
        ymin, xmin, ymax, xmax = (
            int(v) for v in roi.mask_bbox_device(jnp.asarray(mask))
        )
        assert (ymin, xmin, ymax, xmax) == (
            ys.min(), xs.min(), ys.max(), xs.max(),
        )

    def test_device_bbox_empty_mask(self):
        out = roi.mask_bbox_device(jnp.zeros((8, 8), bool))
        assert tuple(int(v) for v in out) == (0, 0, 0, 0)

    def test_dynamic_crop_static_shape(self, rng):
        img = jnp.asarray(rng.normal(size=(32, 32, 4)))
        out = roi.dynamic_crop(img, jnp.int32(30), jnp.int32(-5), 8, 8)
        assert out.shape == (8, 8, 4)
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(img)[24:32, 0:8]
        )


class TestPosEnc3D:
    def _reference_loop(self, x, y, z, d, scale=10000.0):
        """Direct per-band loop from the documented formula
        (train_models.py:30-44 spec)."""
        n = len(x)
        enc = np.zeros((n, d))
        for i in range(d // 6):
            ex = scale ** (6 * i / d)
            enc[:, 2 * i] = np.sin(x / ex)
            enc[:, 2 * i + 1] = np.cos(x / ex)
            enc[:, 2 * i + d // 3] = np.sin(y / ex)
            enc[:, 2 * i + 1 + d // 3] = np.cos(y / ex)
            enc[:, 2 * i + 2 * d // 3] = np.sin(z / ex)
            enc[:, 2 * i + 1 + 2 * d // 3] = np.cos(z / ex)
        return enc

    @pytest.mark.parametrize("d", [256, 96])
    def test_matches_reference_formula(self, rng, d):
        x, y, z = (rng.normal(size=17) * 50 for _ in range(3))
        ours = np.asarray(posenc.positional_encoding_3d(x, y, z, d))
        ref = self._reference_loop(x, y, z, d)
        # fp32 device math vs fp64 host loop: sin/cos of large phases
        # carry a few-ulp error.
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_uncovered_channels_zero(self, rng):
        d = 256  # bands cover 2*42=84 channels per third; ch 84+k*85, 255 zero
        x = rng.normal(size=5)
        out = np.asarray(posenc.positional_encoding_3d(x, x, x, d))
        for ch in (84, 169, 254, 255):
            np.testing.assert_array_equal(out[:, ch], 0)

    def test_batched_shape(self, rng):
        x = rng.normal(size=(4, 7))
        out = posenc.positional_encoding_3d(x, x, x, 96)
        assert out.shape == (4, 7, 96)


class TestMetrics:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_auc_matches_sklearn(self, seed):
        rng = np.random.default_rng(seed)
        n = 101
        y = (rng.uniform(size=n) > 0.4).astype(int)
        s = rng.uniform(size=n)
        ours = float(M.roc_auc(jnp.asarray(y), jnp.asarray(s)))
        ref = roc_auc_score(y, s)
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_auc_weighted_matches_sklearn(self):
        rng = np.random.default_rng(3)
        n = 64
        y = (rng.uniform(size=n) > 0.5).astype(int)
        s = rng.uniform(size=n)
        w = rng.uniform(0.1, 2.0, size=n)
        ours = float(M.roc_auc(jnp.asarray(y), jnp.asarray(s), jnp.asarray(w)))
        ref = roc_auc_score(y, s, sample_weight=w)
        assert ours == pytest.approx(ref, abs=1e-6)

    def test_auc_with_ties_matches_sklearn(self):
        y = np.array([0, 0, 1, 1, 0, 1, 1, 0])
        s = np.array([0.1, 0.5, 0.5, 0.5, 0.2, 0.9, 0.2, 0.9])
        ours = float(M.roc_auc(jnp.asarray(y), jnp.asarray(s)))
        assert ours == pytest.approx(roc_auc_score(y, s), abs=1e-6)

    def test_auc_padding_invariant(self):
        y = np.array([0, 1, 1, 0, 1])
        s = np.array([0.2, 0.8, 0.5, 0.4, 0.9])
        base = float(M.roc_auc(jnp.asarray(y), jnp.asarray(s)))
        yp = np.concatenate([y, [0, 0, 0]])
        sp = np.concatenate([s, [0.99, 0.01, 0.5]])
        wp = np.concatenate([np.ones(5), np.zeros(3)])
        padded = float(
            M.roc_auc(jnp.asarray(yp), jnp.asarray(sp), jnp.asarray(wp))
        )
        assert padded == pytest.approx(base, abs=1e-6)

    def test_auc_degenerate_single_class(self):
        out = float(M.roc_auc(jnp.zeros(4), jnp.asarray([0.1, 0.2, 0.3, 0.4])))
        assert np.isnan(out)

    def test_report_metrics_match_sklearn(self):
        from sklearn.metrics import classification_report

        rng = np.random.default_rng(5)
        y = (rng.uniform(size=50) > 0.5).astype(int)
        p = (rng.uniform(size=50) > 0.5).astype(int)
        w = rng.uniform(0.5, 1.5, size=50)
        ours = {
            k: float(v)
            for k, v in M.binary_report_metrics(
                jnp.asarray(y), jnp.asarray(p), jnp.asarray(w)
            ).items()
        }
        ref = classification_report(
            y, p, output_dict=True, zero_division=0, sample_weight=w
        )
        assert ours["precision_1"] == pytest.approx(ref["1"]["precision"], abs=1e-6)
        assert ours["recall_0"] == pytest.approx(ref["0"]["recall"], abs=1e-6)
        assert ours["f1_1"] == pytest.approx(ref["1"]["f1-score"], abs=1e-6)
        assert ours["accuracy"] == pytest.approx(ref["accuracy"], abs=1e-6)
        assert ours["macro_f1"] == pytest.approx(
            ref["macro avg"]["f1-score"], abs=1e-6
        )

    @pytest.mark.parametrize("weighted", [False, True])
    def test_device_epoch_report_equals_sklearn_report(self, weighted):
        """The live trainer path (device kernels) must emit the exact
        JSON the sklearn renderer produces (VERDICT r1 next-step #3)."""
        from vit_deep_radiomics_tpu.analysis.reports import (
            device_epoch_report,
            epoch_report,
        )

        rng = np.random.default_rng(7)
        n = 80
        y = (rng.uniform(size=n) > 0.45).astype(int)
        s = rng.uniform(size=n)
        w = rng.uniform(0.5, 1.5, size=n) if weighted else None
        kw = dict(kfold=2, loss=0.31, epoch=4, split="test")
        dev = device_epoch_report(y, s, w, **kw)
        ref = epoch_report(y, s, w, **kw)
        assert set(dev) == set(ref)
        for key in ("0", "1", "macro avg", "weighted avg"):
            for field in ("precision", "recall", "f1-score", "support"):
                assert dev[key][field] == pytest.approx(
                    ref[key][field], abs=1e-5), (key, field)
        for key in ("accuracy", "ROC AUC", "loss"):
            assert dev[key] == pytest.approx(ref[key], abs=1e-5), key
        for key in ("kfold", "epoch", "split"):
            assert dev[key] == ref[key]

    @pytest.mark.parametrize("case", ["true_single", "pred_adds_class"])
    def test_device_epoch_report_single_class_matches_sklearn(self, case):
        """Degenerate folds: sklearn's classification_report only emits
        classes present in y_true ∪ y_pred and averages over those; the
        device report must match or the AUC²·√macro_f1 gate diverges
        from the reference trainer on single-class splits."""
        import math

        from vit_deep_radiomics_tpu.analysis.reports import (
            device_epoch_report,
            epoch_report,
        )

        n = 20
        y = np.ones(n, int)
        if case == "true_single":
            s = np.full(n, 0.9)          # predicts all 1 → only class 1
        else:
            s = np.linspace(0.2, 0.9, n)  # some preds 0 → adds class 0
        kw = dict(kfold=0, loss=0.5, epoch=1, split="test")
        dev = device_epoch_report(y, s, None, **kw)
        ref = epoch_report(y, s, None, **kw)
        assert set(dev) == set(ref)
        if case == "true_single":
            assert "0" not in dev
        for key in set(ref) - {"ROC AUC", "kfold", "split", "accuracy",
                               "loss", "epoch"}:
            for field in ("precision", "recall", "f1-score", "support"):
                assert dev[key][field] == pytest.approx(
                    ref[key][field], abs=1e-6), (key, field)
        assert dev["accuracy"] == pytest.approx(ref["accuracy"], abs=1e-6)
        # single-class AUC is undefined on BOTH paths (sklearn raises →
        # nan; the device path pins nan explicitly)
        assert math.isnan(ref["ROC AUC"]) and math.isnan(dev["ROC AUC"])
