"""CLI end-to-end: extract → merge → split → train → aggregate → umap →
pointcloud, all through the command-line entry points in a temp project.

Uses the DINOv2-small patch-embed-only backbone at a tiny image size so
the whole chain runs on CPU in seconds.
"""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

from vit_deep_radiomics_tpu.cli import (
    aggregate as cli_aggregate,
    extract as cli_extract,
    merge as cli_merge,
    pointcloud as cli_pointcloud,
    split as cli_split,
    train as cli_train,
    umap_embed as cli_umap,
)
from vit_deep_radiomics_tpu.data import synthetic

FEATURE_DIM = 384  # dinov2_vits14 width


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    """Temp project dir: .git, conf, synthetic isotropic dataset."""
    root = tmp_path_factory.mktemp("proj")
    (root / ".git").mkdir()
    conf = root / "conf"
    conf.mkdir()
    (conf / "parameters_models.yaml").write_text(yaml.dump({
        "models": {
            "transformer": {
                "learning_rate": 5e-4, "feature_dim": FEATURE_DIM,
                "batch_size": 2, "virtual_batch_size": 4,
                "num_epochs": 2, "patience": 15,
                "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                "chest": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            },
            "conv": {
                "learning_rate": 5e-4, "feature_dim": FEATURE_DIM,
                "batch_size": 1, "virtual_batch_size": 4,
                "num_epochs": 1, "patience": 15,
                "ct": {"div": 2}, "pet": {"div": 2},
            },
        }
    }))
    cohort = synthetic.synthetic_cohort(
        n_patients=4, seed=11, dataset="stanford",
        height=56, width=56, ct_slices=3, pet_slices=2,
    )
    data_dir = root / "data" / "lung_radiomics"
    data_dir.mkdir(parents=True)
    synthetic.write_isotropic_hdf5(
        cohort, data_dir / "iso.hdf5", data_dir / "iso.csv"
    )
    return root


@pytest.fixture(scope="module")
def in_project(project):
    old = os.getcwd()
    os.chdir(project)
    yield project
    os.chdir(old)


@pytest.mark.usefixtures("in_project")
class TestCliPipeline:
    def test_01_extract(self, project):
        rc = cli_extract.main([
            "-mn", "dinov2_vits14",
            "-h5", "data/lung_radiomics/iso.hdf5",
            "-df", "data/lung_radiomics/iso.csv",
            "-f", "data/features",
            "-mod", "ct",
            "--datasets", "stanford",
            "--precision", "parity",
            "--image-size", "56",
            "--no-flash",
        ])
        assert rc == 0
        assert (project / "data/features/features_masks_ct.hdf5").exists()
        assert (project / "data/features/features_masks_pet.hdf5").exists()

    def test_02_merge(self, project):
        assert cli_merge.main(["--feature-dir", "data/features"]) == 0
        df = pd.read_parquet(project / "data/features/petct.parquet")
        assert df["patient_id"].nunique() == 4

    def test_03_split(self, project):
        assert cli_split.main([
            "--feature-dir", "data/features", "--n-splits", "2",
        ]) == 0
        kf = yaml.safe_load(
            (project / "conf/parameters_kfold.yaml").read_text())
        assert "kfold_patients" in kf
        assert set(kf["kfold_patients"]) == {"ct", "pet"}

    def test_04_train(self, project):
        rc = cli_train.main([
            "-a", "transformer", "-d", "stanford", "-m", "petct",
            "-l", "crossmodal", "-e", "petct",
            "--precision", "parity", "--max-epochs", "2",
        ])
        assert rc == 0
        fold_dir = (project / "models/petct/medsam_transformer_stanford"
                    / "petct/kfold_0")
        assert (fold_dir / "losses.html").exists()

    def test_04aa_evaluate_cli(self, project):
        """Standalone evaluation of the fold just trained: same report
        contract as the trainer's per-epoch JSONs."""
        import json

        from vit_deep_radiomics_tpu.cli import evaluate as cli_evaluate

        out = project / "eval_report.json"
        rc = cli_evaluate.main([
            "-a", "transformer", "-d", "stanford", "-m", "petct",
            "-l", "crossmodal", "-e", "petct",
            "--fold", "0", "--out", str(out),
        ])
        assert rc == 0
        report = json.loads(out.read_text())
        assert report["split"] == "test"
        assert "ROC AUC" in report and "accuracy" in report

    def test_04a_multiprocess_fold_sharding(self, project, monkeypatch):
        """Under a multi-process launch WITHOUT --data-parallel, each
        process trains a disjoint round-robin shard of the folds instead
        of duplicating them all (which would race artifact writes)."""
        from vit_deep_radiomics_tpu.core import distributed as dist
        from vit_deep_radiomics_tpu.engine import train as engine_train

        seen = {}

        def fake_train_kfold(df, cfg, tcfg, hdf5_ct_path, hdf5_pet_path,
                             models_dir, mesh=None, folds=None, **kw):
            seen["folds"] = folds
            seen["mesh"] = mesh
            return {}

        monkeypatch.setattr(engine_train, "train_kfold", fake_train_kfold)
        for pid, want in ((0, [0]), (1, [1])):
            monkeypatch.setattr(
                dist, "initialize_from_env",
                lambda pid=pid: dist.LaunchEnv("h:1", 2, pid, "vdr"))
            rc = cli_train.main([
                "-a", "transformer", "-d", "stanford", "-m", "petct",
                "-l", "crossmodal", "-e", "petct_mp",
            ])
            assert rc == 0
            assert seen["mesh"] is None
            assert list(seen["folds"]) == want

    def test_04b_sweep(self, project):
        """In-process grid sweep shares step caches across experiments
        and writes the same artifact tree as per-experiment train
        calls."""
        from vit_deep_radiomics_tpu.cli import sweep as cli_sweep

        rc = cli_sweep.main([
            "-e", "sweep_test", "--precision", "parity",
            "--max-epochs", "1", "--datasets", "stanford",
            "--archs", "transformer",
        ])
        assert rc == 0
        base = project / "models/sweep_test"
        # transformer grid rows for stanford: pet, ct (focal), petct
        for modality in ("pet", "ct", "petct"):
            fold_dir = (base / "medsam_transformer_stanford"
                        / modality / "kfold_0")
            assert (fold_dir / "losses.html").exists(), modality

    def test_05_aggregate(self, project):
        assert cli_aggregate.main([
            "--models-dir", "models", "--metrics-dir", "metrics",
        ]) == 0
        csv = project / "metrics/petct_metrics_sumary.csv"
        assert csv.exists()
        df = pd.read_csv(csv)
        assert "Best Kfold" in df.columns

    def test_06_umap(self, project):
        rc = cli_umap.main([
            "--archs", "transformer",
            "--datasets", "stanford",
            "--modalities", "petct",
        ])
        assert rc == 0
        out = project / "data/petct_embeddings_umap.parquet"
        assert out.exists()
        df = pd.read_parquet(out)
        assert {"umap_x", "umap_y", "umap_z", "embedding"} <= set(df.columns)

    def test_07_pointcloud(self, project):
        rc = cli_pointcloud.main([
            "-h5", "data/lung_radiomics/iso.hdf5",
            "-df", "data/lung_radiomics/iso.csv",
            "--datasets", "stanford",
        ])
        assert rc == 0
        df = pd.read_parquet(
            project / "data/lung_radiomics/petct_pointcloud.parquet")
        assert {"x", "y", "z", "raw", "norm", "mask_box"} <= set(df.columns)


def test_cli_modules_have_help():
    for mod in (cli_extract, cli_train):
        with pytest.raises(SystemExit) as exc:
            mod.main(["--help"])
        assert exc.value.code == 0


def test_fusion_cli(tmp_path):
    """ROC + late fusion over a synthetic embeddings parquet."""
    import numpy as np

    from vit_deep_radiomics_tpu.cli import fusion as cli_fusion

    rng = np.random.default_rng(0)
    rows = []
    for i in range(10):
        label = i % 2
        for modality in ("pet", "ct"):
            rows.append({
                "patient_id": f"p{i}", "dataset": "stanford",
                "modality": modality, "arch": "transformer",
                "y_true": label,
                "y_score": float(np.clip(0.3 + 0.4 * label
                                         + rng.normal(0, 0.1), 0, 1)),
                "y_pred": label,
                "embedding": list(rng.normal(
                    loc=label, size=6).astype(np.float32)),
            })
    emb_path = tmp_path / "emb.parquet"
    pd.DataFrame(rows).to_parquet(emb_path)
    roc_out = tmp_path / "roc.html"
    rc = cli_fusion.main([
        "--embeddings", str(emb_path), "--dataset", "stanford",
        "--arch", "transformer", "--roc-out", str(roc_out),
        "--n-splits", "2",
    ])
    assert rc == 0
    assert roc_out.exists()


def test_top_level_dispatcher():
    from vit_deep_radiomics_tpu.__main__ import main as dispatch

    assert dispatch([]) == 2
    assert dispatch(["--help"]) == 0


def test_extract_cli_pipelined_full_dinov2(tmp_path):
    """--pipeline-stages 2 with the full-transformer dinov2 mode: the
    ViT depth splits over the model mesh axis (parallel/pipeline.py)."""
    cohort = synthetic.synthetic_cohort(
        n_patients=2, seed=3, dataset="stanford",
        height=48, width=48, ct_slices=2, pet_slices=2,
    )
    h5 = tmp_path / "iso.hdf5"
    csv = tmp_path / "iso.csv"
    synthetic.write_isotropic_hdf5(cohort, h5, csv)
    rc = cli_extract.main([
        "-mn", "dinov2_vits14",
        "--dinov2-mode", "full",
        "-h5", str(h5),
        "-df", str(csv),
        "-f", str(tmp_path / "features"),
        "-mod", "ct",
        "--datasets", "stanford",
        "--precision", "parity",
        "--image-size", "28",
        "--no-flash",
        "--pipeline-stages", "2",
    ])
    assert rc == 0
    assert (tmp_path / "features" / "features_masks_ct.hdf5").exists()
    pq = list((tmp_path / "features").glob("*/*.parquet"))
    assert len(pq) == 4  # 2 patients x 2 modalities


def test_extract_cli_tfds_mode(tmp_path, monkeypatch):
    """--source tfds: the reference CLI's tfds branch end to end through
    duck-typed sample streams (no tensorflow_datasets needed) — label
    filter, per-modality normalisation and the extraction dead-branch
    fix (tfds_dense_descriptor.py:402-447; VERDICT r1 #5)."""
    rng = np.random.default_rng(5)

    def make_stream(pid, modality, label, n_slices=2):
        samples = []
        for _ in range(n_slices):
            if modality == "ct":
                img = rng.normal(-500, 300, size=(48, 48)).astype(
                    np.float32)
            else:
                img = np.abs(rng.normal(0.6, 0.3, size=(48, 48))).astype(
                    np.float32)
            mask = np.zeros((48, 48), bool)
            mask[16:32, 16:32] = True
            s = {
                "img_exam": img,
                "mask_exam": mask,
                "egfr_label": np.int64(label),
                "exam_metadata": {
                    "space_directions": np.asarray([0.7, 0.7, 1.2])},
            }
            if modality == "pet":
                liver = np.zeros((4, 4), np.float32)
                liver[1:3, 1:3] = 2.0
                s["pet_liver"] = liver
            samples.append(s)
        return samples

    # p2 carries an unknown label (2) and must be skipped with a warning
    labels = {"p0": 0, "p1": 1, "p2": 2}
    ds_pet = {p: make_stream(p, "pet", l) for p, l in labels.items()}
    ds_ct = {p: make_stream(p, "ct", l) for p, l in labels.items()}

    def fake_loader(dataset_name, data_dir):
        assert dataset_name == "stanford_dataset"
        return ds_pet, ds_ct, sorted(labels)

    from vit_deep_radiomics_tpu.data import ingest

    monkeypatch.setattr(ingest, "load_tfds_pair", fake_loader)
    rc = cli_extract.main([
        "--source", "tfds",
        "-mn", "dinov2_vits14",
        "-f", str(tmp_path / "features"),
        "-mod", "ct",
        "--datasets", "stanford",
        "--precision", "parity",
        "--image-size", "28",
        "--no-flash",
    ])
    assert rc == 0
    pq = sorted((tmp_path / "features").glob("*/*.parquet"))
    names = {p.name for p in pq}
    # 2 usable patients x 2 modalities; the label-2 patient skipped
    assert names == {"p0_ct.parquet", "p0_pet.parquet",
                     "p1_ct.parquet", "p1_pet.parquet"}
    df = pd.read_parquet(pq[0])
    assert set(df.columns) >= {
        "feature_id", "slice", "angle", "flip", "patient_id", "label",
        "dataset", "modality", "augmentation", "spatial_res"}
    assert (df["dataset"] == "stanford").all()
    import h5py

    with h5py.File(tmp_path / "features/features_masks_ct.hdf5") as h5:
        assert set(h5.keys()) == {"p0", "p1"}
        assert "features/0" in h5["p0"]
    # second run: idempotent resume writes nothing new
    rc = cli_extract.main([
        "--source", "tfds",
        "-mn", "dinov2_vits14",
        "-f", str(tmp_path / "features"),
        "-mod", "ct",
        "--datasets", "stanford",
        "--precision", "parity",
        "--image-size", "28",
        "--no-flash",
    ])
    assert rc == 0


def test_finetune_cli(tmp_path):
    """Backbone fine-tuning CLI on a tiny cohort + smoke-scale ViT."""
    from vit_deep_radiomics_tpu.cli import finetune as cli_finetune

    cohort = synthetic.synthetic_cohort(
        n_patients=2, seed=5, dataset="stanford",
        height=48, width=48, ct_slices=3, pet_slices=2,
    )
    h5 = tmp_path / "iso.hdf5"
    csv = tmp_path / "iso.csv"
    synthetic.write_isotropic_hdf5(cohort, h5, csv)
    rc = cli_finetune.main([
        "-h5", str(h5),
        "-df", str(csv),
        "-s", str(tmp_path / "ckpt"),
        "--datasets", "stanford",
        "--epochs", "1",
        "--batch-size", "2",
        "--precision", "parity",
        "--image-size", "64",
        "--depth", "2",
        "--width", "128",
        "--num-heads", "2",
        "--window-size", "2",
    ])
    assert rc == 0
    assert (tmp_path / "ckpt" / "model_epoch_0000.msgpack").exists()


def test_serve_cli_info_and_run(tmp_path, capsys):
    """serve info/run over a tiny engine-exported artifact: padding to
    the static batch, output equality with a direct apply."""
    import dataclasses
    import json

    import jax
    import jax.numpy as jnp

    from vit_deep_radiomics_tpu.cli import serve as cli_serve
    from vit_deep_radiomics_tpu.core.precision import PARITY
    from vit_deep_radiomics_tpu.engine.serve import export_dense_model
    from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

    tiny = dataclasses.replace(
        SAM_VIT_B, image_size=32, width=64, depth=2, num_heads=2,
        window_size=2, global_indexes=(1,), neck_channels=16,
    )
    rng = np.random.default_rng(1)
    images = rng.uniform(size=(5, 32, 32, 3)).astype(np.float32)  # 5 % 2 != 0
    model = ViTDense(tiny, policy=PARITY, use_flash=False)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images[:2]))
    want = np.asarray(model.apply(params, jnp.asarray(images)))
    artifact = export_dense_model(
        params, tiny, tmp_path / "tiny.vdr",
        batch=2, policy="parity", use_flash=False,
    )

    assert cli_serve.main(["info", artifact]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["batch"] == 2 and meta["image_size"] == 32

    np.save(tmp_path / "imgs.npy", images)
    rc = cli_serve.main([
        "run", artifact,
        "--input", str(tmp_path / "imgs.npy"),
        "--output", str(tmp_path / "feats.npy"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["images"] == 5 and report["out_shape"][0] == 5
    got = np.load(tmp_path / "feats.npy")
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # --labels on a dense artifact is a user error, not a silent no-op
    np.save(tmp_path / "lbl.npy", np.zeros(5, np.float32))
    with pytest.raises(SystemExit, match="classifier artifacts"):
        cli_serve.main([
            "run", artifact,
            "--input", str(tmp_path / "imgs.npy"),
            "--output", str(tmp_path / "feats2.npy"),
            "--labels", str(tmp_path / "lbl.npy"),
        ])


def test_serve_classifier_cli(tmp_path, capsys, monkeypatch):
    """export-clf + classifier-aware run: a fold checkpoint serializes
    to a .vdr, the CLI pads ragged token inputs + auto-builds the
    validity mask, and outputs match the library oracle."""
    import json

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vit_deep_radiomics_tpu.cli import serve as cli_serve
    from vit_deep_radiomics_tpu.core.precision import get_policy
    from vit_deep_radiomics_tpu.models.classifiers import build_classifier
    from vit_deep_radiomics_tpu.utils import config as config_mod

    D = 16
    cfg = {"models": {"transformer": {
        "learning_rate": 5e-4, "feature_dim": D, "batch_size": 2,
        "virtual_batch_size": 4, "num_epochs": 1, "patience": 5,
        "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
        "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
    }}}
    rng = np.random.default_rng(7)
    m = build_classifier(cfg, "transformer", "ct",
                         policy=get_policy("parity"))
    toks0 = jnp.asarray(rng.normal(size=(2, 8, D)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), toks0)
    ckpt = tmp_path / "model_epoch_0000.msgpack"
    state = jax.tree.map(np.asarray, {"params": dict(variables)})
    ckpt.write_bytes(serialization.msgpack_serialize(state))

    monkeypatch.setattr(config_mod, "load_conf", lambda *a, **k: cfg)
    artifact = tmp_path / "clf.vdr"
    rc = cli_serve.main([
        "export-clf", str(ckpt), "-a", "transformer", "-m", "ct",
        "-o", str(artifact), "--batch", "2", "--max-tokens", "8",
        "--precision", "parity",
    ])
    assert rc == 0
    capsys.readouterr()

    # ragged input (5 items % batch 2, 5 tokens < static 8), mask omitted
    tokens = rng.normal(size=(5, 5, D)).astype(np.float32)
    np.savez(tmp_path / "in.npz", tokens=tokens)
    rc = cli_serve.main([
        "run", str(artifact),
        "--input", str(tmp_path / "in.npz"),
        "--output", str(tmp_path / "out.npz"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["items"] == 5
    out = np.load(tmp_path / "out.npz")
    assert set(out.files) == {"logits", "cls_embedding"}

    padded = np.zeros((5, 8, D), np.float32)
    padded[:, :5] = tokens
    mask = np.zeros((5, 8), bool)
    mask[:, :5] = True
    want_logits, want_cls = m.apply(
        variables, jnp.asarray(padded), jnp.asarray(mask),
        deterministic=True)
    np.testing.assert_allclose(out["logits"], np.asarray(want_logits),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out["cls_embedding"], np.asarray(want_cls),
                               rtol=1e-5, atol=1e-5)

    # --overlap (double-buffered uploads) must be output-identical to
    # the sequential path — only the H2D scheduling changes
    rc = cli_serve.main([
        "run", str(artifact), "--overlap",
        "--input", str(tmp_path / "in.npz"),
        "--output", str(tmp_path / "out_ov.npz"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["overlap"] is True and report["items"] == 5
    out_ov = np.load(tmp_path / "out_ov.npz")
    np.testing.assert_array_equal(out_ov["logits"], out["logits"])
    np.testing.assert_array_equal(
        out_ov["cls_embedding"], out["cls_embedding"])

    # --labels adds device-kernel AUC/accuracy/F1 for each logits output
    labels = np.array([0, 1, 0, 1, 1], np.float32)
    np.save(tmp_path / "labels.npy", labels)
    rc = cli_serve.main([
        "run", str(artifact),
        "--input", str(tmp_path / "in.npz"),
        "--output", str(tmp_path / "out2.npz"),
        "--labels", str(tmp_path / "labels.npy"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    ev = report["eval"]["logits"]
    assert set(ev) == {"auc", "accuracy", "macro_f1"}
    from sklearn.metrics import roc_auc_score

    lg = out["logits"]
    score = np.exp(lg - lg.max(-1, keepdims=True))
    score = (score / score.sum(-1, keepdims=True))[:, 1]
    assert ev["auc"] == pytest.approx(
        float(roc_auc_score(labels, score)), abs=1e-6)

    # non-binary logits heads refuse --labels instead of mis-scoring
    m3 = build_classifier(cfg, "transformer", "ct", num_classes=3,
                          policy=get_policy("parity"))
    vars3 = m3.init(jax.random.PRNGKey(0), toks0)
    ckpt3 = tmp_path / "model3_epoch_0000.msgpack"
    ckpt3.write_bytes(serialization.msgpack_serialize(
        jax.tree.map(np.asarray, {"params": dict(vars3)})))
    art3 = tmp_path / "clf3.vdr"
    rc = cli_serve.main([
        "export-clf", str(ckpt3), "-a", "transformer", "-m", "ct",
        "-o", str(art3), "--batch", "2", "--max-tokens", "8",
        "--precision", "parity", "--num-classes", "3",
    ])
    assert rc == 0
    capsys.readouterr()
    with pytest.raises(SystemExit, match="binary heads only"):
        cli_serve.main([
            "run", str(art3),
            "--input", str(tmp_path / "in.npz"),
            "--output", str(tmp_path / "out3c.npz"),
            "--labels", str(tmp_path / "labels.npy"),
        ])

    # one-hot / 2-D label arrays are rejected with a pointer to argmax
    np.save(tmp_path / "labels_2d.npy", np.eye(2, dtype=np.float32)[
        labels.astype(int)])
    with pytest.raises(SystemExit, match="flat"):
        cli_serve.main([
            "run", str(artifact),
            "--input", str(tmp_path / "in.npz"),
            "--output", str(tmp_path / "out2d.npz"),
            "--labels", str(tmp_path / "labels_2d.npy"),
        ])

    # label count must match the input count
    np.save(tmp_path / "labels_short.npy", labels[:3])
    with pytest.raises(SystemExit, match="entries for"):
        cli_serve.main([
            "run", str(artifact),
            "--input", str(tmp_path / "in.npz"),
            "--output", str(tmp_path / "out3.npz"),
            "--labels", str(tmp_path / "labels_short.npy"),
        ])

    # polymorphic-batch artifact: same outputs, no batch padding
    poly_artifact = tmp_path / "clf_poly.vdr"
    rc = cli_serve.main([
        "export-clf", str(ckpt), "-a", "transformer", "-m", "ct",
        "-o", str(poly_artifact), "--batch", "poly", "--max-tokens", "8",
        "--precision", "parity",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = cli_serve.main([
        "run", str(poly_artifact),
        "--input", str(tmp_path / "in.npz"),
        "--output", str(tmp_path / "out_poly.npz"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["items"] == 5 and report["batch"] == 5
    out_poly = np.load(tmp_path / "out_poly.npz")
    np.testing.assert_allclose(out_poly["logits"], out["logits"],
                               rtol=1e-5, atol=1e-5)

    # wrong feature dim is rejected loudly, not zero-padded into garbage
    np.savez(tmp_path / "bad.npz",
             tokens=rng.normal(size=(2, 5, D // 2)).astype(np.float32))
    with pytest.raises(SystemExit, match="feature dim"):
        cli_serve.main([
            "run", str(artifact),
            "--input", str(tmp_path / "bad.npz"),
            "--output", str(tmp_path / "bad_out.npz"),
        ])

    # poly inputs stream in --poly-chunk slices (2+2+1 here), with the
    # final remainder unpadded; outputs match the one-call run
    rc = cli_serve.main([
        "run", str(poly_artifact),
        "--input", str(tmp_path / "in.npz"),
        "--output", str(tmp_path / "out_poly2.npz"),
        "--poly-chunk", "2",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["items"] == 5 and report["batch"] == 2
    out_poly2 = np.load(tmp_path / "out_poly2.npz")
    np.testing.assert_allclose(out_poly2["logits"], out["logits"],
                               rtol=1e-5, atol=1e-5)
    assert out_poly2["logits"].shape[0] == 5

    # zero-item inputs fail with a clear message on both artifact kinds
    np.savez(tmp_path / "empty.npz",
             tokens=np.zeros((0, 5, D), np.float32))
    for art in (artifact, poly_artifact):
        with pytest.raises(SystemExit, match="0 items"):
            cli_serve.main([
                "run", str(art),
                "--input", str(tmp_path / "empty.npz"),
                "--output", str(tmp_path / "empty_out.npz"),
            ])

    # malformed --batch values exit via argparse, not a traceback
    with pytest.raises(SystemExit):
        cli_serve.main([
            "export-clf", str(ckpt), "-a", "transformer", "-m", "ct",
            "-o", str(tmp_path / "x.vdr"), "--batch", "8x",
        ])
    err = capsys.readouterr().err
    assert "positive integer or 'poly'" in err
