"""Config tree tests (reference contract: config_manager.py semantics)."""

import subprocess

from vit_deep_radiomics_tpu.utils import config as cfg


def test_merges_all_parameter_files(tmp_path):
    (tmp_path / ".git").mkdir()
    conf = tmp_path / "conf"
    conf.mkdir()
    (conf / "parameters_models.yaml").write_text("models: {transformer: {lr: 1}}\n")
    (conf / "parameters_kfold.yaml").write_text("kfold_patients: {ct: {}}\n")
    (conf / "other.yaml").write_text("ignored: true\n")

    out = cfg.load_conf(root=tmp_path)
    assert set(out) == {"models", "kfold_patients"}
    assert out["models"]["transformer"]["lr"] == 1


def test_deep_merge_section_union(tmp_path):
    (tmp_path / ".git").mkdir()
    conf = tmp_path / "conf"
    conf.mkdir()
    (conf / "parameters_a.yaml").write_text("models: {a: 1}\n")
    (conf / "parameters_b.yaml").write_text("models: {b: 2}\n")
    out = cfg.load_conf(root=tmp_path)
    assert out["models"] == {"a": 1, "b": 2}


def test_project_dir_walks_up(tmp_path):
    (tmp_path / ".git").mkdir()
    nested = tmp_path / "a" / "b" / "c"
    nested.mkdir(parents=True)
    assert cfg.get_project_dir(nested) == tmp_path


def test_repo_conf_loads():
    out = cfg.load_conf(root=cfg.get_project_dir(__file__))
    assert out["models"]["transformer"]["feature_dim"] == 256
    assert out["models"]["transformer"]["ct"]["num_heads"] == 4
    assert out["models"]["conv"]["ct"]["div"] == 2


def test_save_yaml_roundtrip(tmp_path):
    path = tmp_path / "conf" / "parameters_kfold.yaml"
    cfg.save_yaml({"kfold_patients": {"ct": {"stanford": {0: {"train": ["p1"]}}}}}, path)
    (tmp_path / ".git").mkdir()
    out = cfg.load_conf(root=tmp_path)
    assert out["kfold_patients"]["ct"]["stanford"][0]["train"] == ["p1"]
