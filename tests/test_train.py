"""End-to-end k-fold training smoke + unit tests for trainer pieces."""

import math

import numpy as np
import pandas as pd
import pytest

from vit_deep_radiomics_tpu.data import feature_store, splits
from vit_deep_radiomics_tpu.data.datasets import (
    PETCTDataset,
    batch_items,
    find_divisor,
    nearest_resize,
    pad_tokens,
    prepare_windows,
)
from vit_deep_radiomics_tpu.engine.train import (
    TrainerConfig,
    cosine_lr,
    train_kfold,
)


class TestWindows:
    def test_find_divisor_parity(self):
        assert find_divisor(40, "ct") == 13
        assert find_divisor(40, "chest") == 13
        assert find_divisor(40, "pet") == 2
        assert find_divisor(5, "ct") == 5
        assert find_divisor(1, "pet") == 1

    def test_prepare_windows_sliding(self):
        rows = []
        for s in range(20):
            rows.append({"patient_id": "p1", "modality": "ct", "slice": s,
                         "feature_id": s, "angle": 0, "flip": "None",
                         "label": 1, "spatial_res": np.ones(3)})
        for s in range(4):
            rows.append({"patient_id": "p1", "modality": "pet", "slice": s,
                         "feature_id": s, "angle": 0, "flip": "None",
                         "label": 1, "spatial_res": np.ones(3)})
        df = prepare_windows(pd.DataFrame(rows))
        ct = df[df["modality"] == "ct"]
        # 20 slices, window 13 -> starts 0..6 (range(0, 20-13))
        assert ct["patient_id_new"].nunique() == 7
        w0 = ct[ct["patient_id_new"] == "p1:0"]["slice"]
        assert w0.min() == 0 and w0.max() == 13  # inclusive window
        pet = df[df["modality"] == "pet"]
        assert set(pet["patient_id_new"]) <= {"p1:0", "p1:1", "p1:2"}

    def test_short_volume_kept(self):
        rows = [
            {"patient_id": "p1", "modality": "ct", "slice": s,
             "feature_id": s, "angle": 0, "flip": "None", "label": 0,
             "spatial_res": np.ones(3)}
            for s in range(3)
        ] + [
            {"patient_id": "p1", "modality": "pet", "slice": 0,
             "feature_id": 0, "angle": 0, "flip": "None", "label": 0,
             "spatial_res": np.ones(3)}
        ]
        df = prepare_windows(pd.DataFrame(rows))
        ct = df[df["modality"] == "ct"]
        assert ct["patient_id_new"].nunique() == 1  # not dropped

    def test_nearest_resize_half_pixel(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = nearest_resize(img, (2, 2))
        # skimage order-0 convention: samples at rows/cols {0.5, 2.5}->{0,2}
        # rounded banker's -> indices (0, 2)
        assert out.shape == (2, 2)
        assert out[0, 0] in (img[0, 0], img[1, 1])

    def test_pad_tokens_buckets(self, rng):
        t = rng.normal(size=(100, 8)).astype(np.float32)
        padded, mask = pad_tokens(t, (64, 128, 256))
        assert padded.shape == (128, 8)
        assert mask.sum() == 100

    def test_pad_tokens_overlong_warns(self, rng):
        t = rng.normal(size=(300, 8)).astype(np.float32)
        with pytest.warns(UserWarning, match="truncating"):
            padded, mask = pad_tokens(t, (64, 128, 256))
        assert padded.shape == (256, 8) and mask.all()

    def test_token_buckets_extend_for_whole_volume(self, rng):
        """Whole-volume token sets beyond the default 4096 cap get
        doubled buckets instead of silent truncation."""
        from vit_deep_radiomics_tpu.data.datasets import (
            TokenItem, batch_items, token_buckets_for,
        )

        big = TokenItem(
            rng.normal(size=(5000, 8)).astype(np.float32),
            rng.normal(size=(600, 8)).astype(np.float32),
            np.array([1.0, 0.0], np.float32), "p0",
        )
        buckets = token_buckets_for([big])
        assert buckets[-1] >= 5000
        b = next(batch_items([big], 1, buckets=buckets))
        assert b["ct"].shape[1] == 8192
        assert b["ct_mask"].sum() == 5000  # nothing dropped


class TestCosineLr:
    def test_matches_torch_schedule(self):
        torch = pytest.importorskip("torch")
        lr0, epochs = 5e-4, 50
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr0)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=epochs * 0.8, eta_min=1e-4
        )
        for epoch in range(epochs):
            torch_lr = opt.param_groups[0]["lr"]
            ours = cosine_lr(epoch, lr0, epochs)
            assert ours == pytest.approx(torch_lr, rel=1e-5), f"epoch {epoch}"
            sched.step()


def _small_cfg(folds, feature_dim=16):
    return {
        "models": {
            "transformer": {
                "learning_rate": 5e-4, "feature_dim": feature_dim,
                "batch_size": 2, "virtual_batch_size": 4,
                "num_epochs": 2, "patience": 15,
                "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                "chest": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            },
            "conv": {
                "learning_rate": 5e-4, "feature_dim": 16,
                "batch_size": 1, "virtual_batch_size": 4,
                "num_epochs": 1, "patience": 15,
                "ct": {"div": 2}, "pet": {"div": 2},
            },
        },
        "kfold_patients": folds,
    }


class TestDatasetPipeline:
    def test_token_items_and_batches(self, extracted):
        df = prepare_windows(extracted["df"].copy())
        ds = PETCTDataset(
            df, extracted["hdf5_ct"], extracted["hdf5_pet"],
            use_augmentation=False, feature_dim=16, arch="transformer",
        )
        assert len(ds) > 0
        item = ds[0]
        assert item.tokens_ct.ndim == 2 and item.tokens_ct.shape[1] == 16
        assert item.tokens_pet.shape[1] == 16
        batches = list(batch_items([ds[i] for i in range(len(ds))], 2))
        b = batches[0]
        assert b["ct"].shape[0] == 2
        assert b["ct_mask"].dtype == bool

    def test_single_slice_volume_items(self, tmp_path):
        """1-slice volumes (kept by prepare_windows, unlike the reference
        which dropped them) must yield a usable item instead of crashing
        on the squeezed one-row lookup / exclusive-end window quirk."""
        rng = np.random.default_rng(0)
        h5_ct = tmp_path / "f_ct.hdf5"
        h5_pet = tmp_path / "f_pet.hdf5"
        feat = [rng.normal(size=(4, 4, 16)).astype(np.float32)]
        mask = [np.zeros((8, 8), np.float32)]
        mask[0][2:6, 2:6] = 1.0
        feature_store.save_features(h5_ct, feat, mask, "p0")
        feature_store.save_features(h5_pet, feat, mask, "p0")
        rows = [
            {"patient_id": "p0", "modality": mod, "slice": 0,
             "flip": "None", "angle": 0, "feature_id": 0,
             "label": 1, "dataset": "stanford",
             "spatial_res": (0.8, 0.8, 0.8)}
            for mod in ("ct", "pet")
        ]
        df = prepare_windows(pd.DataFrame(rows))
        ds = PETCTDataset(
            df, h5_ct, h5_pet, use_augmentation=False,
            feature_dim=16, arch="transformer",
        )
        assert len(ds) == 1
        item = ds[0]
        assert item.tokens_ct.shape[0] > 0
        assert item.tokens_pet.shape[0] > 0

    def test_augmented_items_vary(self, extracted):
        df = prepare_windows(extracted["df"].copy())
        ds = PETCTDataset(
            df, extracted["hdf5_ct"], extracted["hdf5_pet"],
            use_augmentation=True, feature_dim=16, arch="transformer",
            seed=3,
        )
        a = ds[0].tokens_ct
        b = ds[0].tokens_ct
        # jitter/PE noise should make repeated draws differ
        assert a.shape != b.shape or not np.allclose(a, b)


class TestTrainKfold:
    def test_bimodal_crossmodal_end_to_end(self, extracted):
        cfg = _small_cfg(extracted["folds"])
        tcfg = TrainerConfig(
            arch="transformer", modality="petct", loss="crossmodal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=2,
        )
        models_dir = extracted["dir"] / "models"
        results = train_kfold(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"], models_dir,
            folds=[0], log=lambda *_: None,
        )
        hist = results[0]
        assert len(hist) == 2
        assert np.isfinite(hist["train_loss"]).all()
        fold_dir = (models_dir / "petct" / "medsam_transformer_stanford"
                    / "petct" / "kfold_0")
        assert (fold_dir / "train_metrics_0.json").exists()
        assert (fold_dir / "test_metrics_1.json").exists()
        assert (fold_dir / "losses.html").exists()
        # checkpoint gate saved at least one epoch
        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt

        assert ckpt.best_epochs(fold_dir)

    def test_unimodal_focal_and_resume(self, extracted):
        cfg = _small_cfg(extracted["folds"])
        tcfg = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=1,
        )
        models_dir = extracted["dir"] / "models2"
        train_kfold(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"], models_dir,
            folds=[0], log=lambda *_: None,
        )
        # run again with more epochs: must resume past epoch 0
        logs = []
        tcfg2 = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=2,
        )
        train_kfold(
            extracted["df"], cfg, tcfg2,
            extracted["hdf5_ct"], extracted["hdf5_pet"], models_dir,
            folds=[0], log=logs.append,
        )
        assert any("resumed" in str(s) for s in logs)

    def test_resume_restores_patience_counter(self):
        """The early-stop state replays from restored history instead of
        resetting on every resume (live rule: strict improvement resets,
        ties/NaNs count)."""
        from vit_deep_radiomics_tpu.engine.train import _early_stop_state

        assert _early_stop_state([]) == (-np.inf, 0)
        # best at index 1, two stagnant epochs after it
        best, since = _early_stop_state([0.5, 0.7, 0.7, 0.6])
        assert best == pytest.approx(0.7) and since == 2
        # improvement on the last epoch resets the counter
        assert _early_stop_state([0.5, 0.6, 0.9])[1] == 0
        # NaN targets (degenerate splits) never count as improvement
        best, since = _early_stop_state([0.4, np.nan, np.nan])
        assert best == pytest.approx(0.4) and since == 2
        assert _early_stop_state([np.nan, np.nan]) == (-np.inf, 2)

    def test_evaluate_checkpoint(self, extracted):
        """engine.evaluate reproduces a trained fold's report shape."""
        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt
        from vit_deep_radiomics_tpu.engine.evaluate import evaluate_checkpoint

        cfg = _small_cfg(extracted["folds"])
        tcfg = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=1,
        )
        models_dir = extracted["dir"] / "models_eval"
        train_kfold(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"], models_dir,
            folds=[0], log=lambda *_: None,
        )
        fold_dir = (models_dir / "petct" / "medsam_transformer_stanford"
                    / "ct" / "kfold_0")
        epoch = ckpt.best_epochs(fold_dir)[-1]
        test_patients = extracted["folds"]["ct"]["stanford"][0]["test"]
        df_test = extracted["df"][
            extracted["df"]["patient_id"].isin(test_patients)]
        report = evaluate_checkpoint(
            df_test, cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"],
            fold_dir, epoch,
        )
        assert report["split"] == "test" and report["epoch"] == epoch
        assert "ROC AUC" in report and "accuracy" in report

    def test_chest_modality_end_to_end(self, extracted):
        """petchest trains against the chest feature store and both
        evaluate_checkpoint and extract_embeddings handle the chest
        modality (they previously built an empty CT frame and crashed)."""
        import shutil

        from vit_deep_radiomics_tpu.analysis.embeddings import (
            extract_embeddings,
        )
        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt
        from vit_deep_radiomics_tpu.engine.evaluate import evaluate_checkpoint

        df = extracted["df"].copy()
        df.loc[df["modality"] == "ct", "modality"] = "chest"
        h5_chest = (extracted["hdf5_ct"].parent
                    / "features_masks_chest.hdf5")
        if not h5_chest.exists():
            shutil.copy(extracted["hdf5_ct"], h5_chest)
        folds = splits.build_kfold_patients(df, n_splits=2)
        cfg = _small_cfg(folds)
        tcfg = TrainerConfig(
            arch="transformer", modality="petchest", loss="crossmodal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=1,
        )
        models_dir = extracted["dir"] / "models_chest"
        train_kfold(
            df, cfg, tcfg, h5_chest, extracted["hdf5_pet"], models_dir,
            folds=[0], log=lambda *_: None,
        )
        fold_dir = (models_dir / "petct" / "medsam_transformer_stanford"
                    / "petchest" / "kfold_0")
        assert (fold_dir / "losses.html").exists()
        epoch = ckpt.best_epochs(fold_dir)[-1]
        test_patients = folds["chest"]["stanford"][0]["test"]
        df_test = df[df["patient_id"].isin(test_patients)]
        report = evaluate_checkpoint(
            df_test, cfg, tcfg, h5_chest, extracted["hdf5_pet"],
            fold_dir, epoch,
        )
        assert "ROC AUC" in report
        emb = extract_embeddings(
            df_test, cfg, tcfg, h5_chest, extracted["hdf5_pet"],
            fold_dir, epoch,
        )
        assert len(emb) > 0

    def test_whole_volume_fold_smoke(self, extracted):
        """Whole-volume mode end to end over the 8-device mesh: one
        unchunked token set per patient, ring-attention sequence
        parallelism in the classifier, extended token buckets (no
        truncation warning may fire)."""
        import warnings

        from vit_deep_radiomics_tpu.core.mesh import make_mesh

        cfg = _small_cfg(extracted["folds"])
        tcfg = TrainerConfig(
            arch="transformer", modality="ct", loss="focal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=1, whole_volume=True,
        )
        models_dir = extracted["dir"] / "models_wv"
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)  # no truncation
            train_kfold(
                extracted["df"], cfg, tcfg,
                extracted["hdf5_ct"], extracted["hdf5_pet"], models_dir,
                folds=[0], mesh=make_mesh(), log=lambda *_: None,
            )
        fold_dir = (models_dir / "petct" / "medsam_transformer_stanford"
                    / "ct" / "kfold_0")
        assert (fold_dir / "losses.html").exists()

        # evaluate the whole-volume checkpoint standalone: the eval path
        # must extend the token buckets too (a 4096-capped bucket would
        # silently truncate the unchunked volume it trained on)
        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt
        from vit_deep_radiomics_tpu.engine.evaluate import (
            evaluate_checkpoint,
        )

        epoch = ckpt.best_epochs(fold_dir)[-1]
        test_patients = extracted["folds"]["ct"]["stanford"][0]["test"]
        df_test = extracted["df"][
            extracted["df"]["patient_id"].isin(test_patients)]
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)  # no truncation
            report = evaluate_checkpoint(
                df_test, cfg, tcfg,
                extracted["hdf5_ct"], extracted["hdf5_pet"],
                fold_dir, epoch,
            )
        assert report["split"] == "test" and "ROC AUC" in report

    def test_conv_arch_smoke(self, extracted):
        cfg = _small_cfg(extracted["folds"])
        tcfg = TrainerConfig(
            arch="conv", modality="ct", loss="focal",
            dataset="stanford", batch_size=2, precision="parity",
            max_epochs=1,
        )
        models_dir = extracted["dir"] / "models3"
        results = train_kfold(
            extracted["df"], cfg, tcfg,
            extracted["hdf5_ct"], extracted["hdf5_pet"], models_dir,
            folds=[0], log=lambda *_: None,
        )
        assert np.isfinite(results[0]["train_loss"]).all()


class TestWholeVolumeWindows:
    def test_one_window_per_patient(self):
        import pandas as pd

        from vit_deep_radiomics_tpu.data.datasets import prepare_windows

        rows = []
        for pid, n_ct, n_pet in [("p0", 30, 8), ("p1", 17, 4)]:
            for mod, n in (("ct", n_ct), ("pet", n_pet)):
                for s in range(n):
                    rows.append({
                        "patient_id": pid, "modality": mod, "slice": s,
                        "flip": "None", "angle": 0, "feature_id": f"{pid}_{s}",
                        "label": 0, "dataset": "stanford",
                    })
        df = pd.DataFrame(rows)
        out = prepare_windows(df, whole_volume=True)
        ct = out[out["modality"] == "ct"]
        # exactly one sub-volume id per patient, covering every slice
        for pid, n_ct in [("p0", 30), ("p1", 17)]:
            sub = ct[ct["patient_id"] == pid]
            assert sub["patient_id_new"].nunique() == 1
            assert sorted(sub["slice"].unique()) == list(range(n_ct))

    def test_chunked_default_still_windows(self):
        import pandas as pd

        from vit_deep_radiomics_tpu.data.datasets import prepare_windows

        rows = [
            {"patient_id": "p0", "modality": "ct", "slice": s,
             "flip": "None", "angle": 0, "feature_id": f"p0_{s}",
             "label": 0, "dataset": "stanford"}
            for s in range(30)
        ]
        out = prepare_windows(pd.DataFrame(rows))
        assert out["patient_id_new"].nunique() > 1


class TestAsyncCheckpoint:
    """save_checkpoint_async: byte-identical artifacts, snapshot
    semantics, atomic tmp-rename (engine/checkpoint.py)."""

    def _state(self):
        import jax.numpy as jnp

        return {
            "params": {"w": jnp.arange(12.0).reshape(3, 4),
                       "b": jnp.ones((4,))},
            "epoch": 3,
            "history": {"loss": [1.0, 0.5], "auc": [0.6, 0.8]},
        }

    def test_async_matches_sync_bytes(self, tmp_path):
        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt

        s = self._state()
        sync_path = ckpt.save_checkpoint(dict(s), tmp_path / "sync", 3)
        fut = ckpt.save_checkpoint_async(dict(s), tmp_path / "async", 3)
        async_path = fut.result()
        assert async_path in ckpt.wait_pending()
        assert ckpt.wait_pending() == []   # drained
        with open(sync_path, "rb") as a, open(async_path, "rb") as b:
            assert a.read() == b.read()
        # history snapshot written alongside
        assert (tmp_path / "async" / "history_0003.json").exists()

    def test_history_snapshot_not_mutated_later(self, tmp_path):
        import json

        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt

        s = self._state()
        fut = ckpt.save_checkpoint_async(s, tmp_path, 1)
        # caller keeps training: appends AFTER the submit
        s["history"]["loss"].append(999.0)
        fut.result()
        ckpt.wait_pending()
        with open(tmp_path / "history_0001.json") as fh:
            hist = json.load(fh)
        assert hist["loss"] == [1.0, 0.5]

    def test_no_tmp_files_left_and_loadable(self, tmp_path):
        import numpy as np

        from vit_deep_radiomics_tpu.engine import checkpoint as ckpt

        s = self._state()
        ckpt.save_checkpoint_async(s, tmp_path, 7)
        ckpt.wait_pending()
        assert not list(tmp_path.glob("*.tmp"))
        template = {"params": {"w": np.zeros((3, 4), np.float32),
                               "b": np.zeros((4,), np.float32)},
                    "epoch": 0}
        restored = ckpt.load_checkpoint(template, tmp_path, 7)
        np.testing.assert_array_equal(
            restored["params"]["w"], np.arange(12.0).reshape(3, 4))
        assert restored["history"]["auc"] == [0.6, 0.8]
        assert ckpt.latest_epoch(tmp_path) == 7
