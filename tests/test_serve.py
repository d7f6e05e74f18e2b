"""Serving export (engine/serve.py): StableHLO artifact roundtrips."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.core.precision import PARITY
from vit_deep_radiomics_tpu.engine.serve import (
    export_dense_model,
    load_exported,
)
from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

TINY = dataclasses.replace(
    SAM_VIT_B, image_size=32, width=64, depth=2, num_heads=2,
    window_size=2, global_indexes=(1,), neck_channels=16,
)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory, rng=None):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    model = ViTDense(TINY, policy=PARITY, use_flash=False)
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    path = export_dense_model(
        params, TINY, tmp_path_factory.mktemp("serve") / "tiny.vdr",
        batch=2, policy="parity", use_flash=False,
    )
    return path, x, want


class TestServingExport:
    def test_roundtrip_bitexact(self, artifact):
        path, x, want = artifact
        m = load_exported(path)
        got = np.asarray(m(x))
        np.testing.assert_array_equal(got, want)

    def test_metadata_self_describes(self, artifact):
        path, _, want = artifact
        m = load_exported(path)
        assert m.meta["model"] == TINY.name
        assert m.meta["batch"] == 2
        assert m.meta["image_size"] == 32
        assert m.meta["out_shape"] == list(want.shape)
        assert m.meta["config"]["depth"] == 2
        assert m.meta["platforms"]  # export records its target platform

    def test_kernel_env_knobs_recorded(self, tmp_path, monkeypatch):
        """Trace-time kernel env knobs are baked into the lowered graph —
        the artifact header must record which were set."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        model = ViTDense(TINY, policy=PARITY, use_flash=False)
        params = model.init(jax.random.PRNGKey(0), x)
        from vit_deep_radiomics_tpu.engine.serve import _FLASH_ENV_KNOBS

        for knob in _FLASH_ENV_KNOBS:   # isolate from the invoking shell
            monkeypatch.delenv(knob, raising=False)
        monkeypatch.setenv("VDR_FLASH_NOMAX", "1")
        path = export_dense_model(
            params, TINY, tmp_path / "knobs.vdr",
            batch=1, policy="parity", use_flash=False,
        )
        m = load_exported(path)
        assert m.meta["kernel_env"] == {"VDR_FLASH_NOMAX": "1"}

    def test_wrong_shape_rejected(self, artifact):
        path, _, _ = artifact
        m = load_exported(path)
        bad = jnp.zeros((3, 32, 32, 3), jnp.float32)  # batch is static
        with pytest.raises(Exception):
            m(bad)

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "junk.vdr"
        p.write_bytes(b"NOTVDR00junkjunk")
        with pytest.raises(ValueError, match="not a VDR export"):
            load_exported(p)


class TestClassifierExport:
    """export_classifier: the downstream diagnosis heads (all three
    reference model families, models_archs.py:38-216) round-trip through
    self-contained .vdr artifacts with static shapes + validity masks."""

    D = 16

    @pytest.fixture(scope="class")
    def cfg(self):
        d = self.D
        return {"models": {
            "transformer": {
                "learning_rate": 5e-4, "feature_dim": d, "batch_size": 2,
                "virtual_batch_size": 4, "num_epochs": 1, "patience": 5,
                "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            },
            "conv": {
                "learning_rate": 5e-4, "feature_dim": d, "batch_size": 2,
                "virtual_batch_size": 4, "num_epochs": 1, "patience": 5,
                "ct": {"div": 2}, "pet": {"div": 2},
            },
        }}

    def test_unimodal_transformer_roundtrip(self, cfg, tmp_path):
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        rng = np.random.default_rng(0)
        m = build_classifier(cfg, "transformer", "ct",
                             policy=get_policy("parity"))
        toks = jnp.asarray(rng.normal(size=(2, 8, self.D)).astype(
            np.float32))
        mask = jnp.asarray(rng.random((2, 8)) > 0.3)
        v = m.init(jax.random.PRNGKey(0), toks, mask)
        want = m.apply(v, toks, mask, deterministic=True)
        p = export_classifier(
            v, cfg, "transformer", "ct", tmp_path / "t.vdr",
            batch=2, max_tokens=8, policy="parity")
        em = load_exported(p)
        assert em.meta["kind"] == "classifier"
        assert em.meta["out_names"] == ["logits", "cls_embedding"]
        assert list(em.meta["in_spec"]) == ["tokens", "mask"]
        got = em(toks, mask)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_polymorphic_batch_roundtrip(self, cfg, tmp_path):
        """batch='poly' exports a symbolic batch dimension: one artifact
        serves any batch size with no padding."""
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        rng = np.random.default_rng(4)
        m = build_classifier(cfg, "transformer", "ct",
                             policy=get_policy("parity"))
        toks2 = jnp.asarray(
            rng.normal(size=(2, 8, self.D)).astype(np.float32))
        mask2 = jnp.asarray(rng.random((2, 8)) > 0.3)
        v = m.init(jax.random.PRNGKey(0), toks2, mask2)
        p = export_classifier(
            v, cfg, "transformer", "ct", tmp_path / "poly.vdr",
            batch="poly", max_tokens=8, policy="parity")
        em = load_exported(p)
        assert em.meta["batch"] == "poly"
        assert em.meta["in_spec"]["tokens"][0][0] is None
        for n in (1, 2, 5):
            toks = jnp.asarray(
                rng.normal(size=(n, 8, self.D)).astype(np.float32))
            mask = jnp.asarray(rng.random((n, 8)) > 0.3)
            want = m.apply(v, toks, mask, deterministic=True)
            got = em(toks, mask)
            assert got[0].shape == (n, 2)
            for a, b in zip(got, want):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_multi_platform_export(self, cfg, tmp_path):
        """platforms=('cpu','tpu') lowers both targets into one artifact
        (export anywhere, deploy anywhere); the CPU call still matches
        the oracle."""
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        rng = np.random.default_rng(5)
        m = build_classifier(cfg, "transformer", "ct",
                             policy=get_policy("parity"))
        toks = jnp.asarray(
            rng.normal(size=(2, 8, self.D)).astype(np.float32))
        mask = jnp.asarray(rng.random((2, 8)) > 0.3)
        v = m.init(jax.random.PRNGKey(0), toks, mask)
        p = export_classifier(
            v, cfg, "transformer", "ct", tmp_path / "xp.vdr",
            batch=2, max_tokens=8, policy="parity",
            platforms=("cpu", "tpu"))
        em = load_exported(p)
        assert set(em.meta["platforms"]) == {"cpu", "tpu"}
        want = m.apply(v, toks, mask, deterministic=True)
        got = em(toks, mask)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_bimodal_roundtrip(self, cfg, tmp_path):
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        rng = np.random.default_rng(1)
        m = build_classifier(cfg, "transformer", "petct",
                             policy=get_policy("parity"))
        ct = jnp.asarray(rng.normal(size=(2, 8, self.D)).astype(np.float32))
        pet = jnp.asarray(rng.normal(size=(2, 8, self.D)).astype(np.float32))
        cm = jnp.asarray(rng.random((2, 8)) > 0.3)
        pm = jnp.asarray(rng.random((2, 8)) > 0.3)
        v = m.init(jax.random.PRNGKey(0), ct_tokens=ct, pet_tokens=pet,
                   ct_mask=cm, pet_mask=pm)
        want = m.apply(v, ct_tokens=ct, pet_tokens=pet, ct_mask=cm,
                       pet_mask=pm, deterministic=True)
        p = export_classifier(
            v, cfg, "transformer", "petct", tmp_path / "b.vdr",
            batch=2, max_tokens=8, policy="parity")
        em = load_exported(p)
        assert em.meta["out_names"] == [
            "logits", "petct_cls", "logits_ct", "logits_pet"]
        got = em(ct, pet, cm, pm)
        assert len(got) == 4
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_conv_roundtrip_and_checkpoint_tree(self, cfg, tmp_path):
        """Also covers the fold-checkpoint input form (state['params']
        is the flax variables dict; a bare inner tree is wrapped)."""
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        rng = np.random.default_rng(2)
        m = build_classifier(cfg, "conv", "ct", policy=get_policy("parity"))
        vol = jnp.asarray(
            rng.normal(size=(2, 4, 6, 6, self.D)).astype(np.float32))
        vm = jnp.asarray(rng.random((2, 4, 6, 6)) > 0.2)
        v = m.init(jax.random.PRNGKey(0), vol, vm)
        want = m.apply(v, vol, vm, deterministic=True)
        p = export_classifier(
            v["params"], cfg, "conv", "ct", tmp_path / "c.vdr",
            batch=2, conv_shape=(4, 6, 6), policy="parity")
        em = load_exported(p)
        assert em.meta["conv_shape"] == [4, 6, 6]
        got = em(vol, vm)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


class TestPipelineExport:
    """export_pipeline: images → descriptors → tokens → logits in ONE
    artifact, fusing the reference's two separate Python stages
    (tfds_dense_descriptor.py:110-139 → train_models.py:143-182 →
    models_archs.py:127-147)."""

    D = 16  # == TINY.neck_channels so the stages plug together

    @pytest.fixture(scope="class")
    def cfg(self):
        d = self.D
        return {"models": {
            "transformer": {
                "learning_rate": 5e-4, "feature_dim": d, "batch_size": 2,
                "virtual_batch_size": 4, "num_epochs": 1, "patience": 5,
                "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
                "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            },
            "conv": {
                "learning_rate": 5e-4, "feature_dim": d, "batch_size": 2,
                "virtual_batch_size": 4, "num_epochs": 1, "patience": 5,
                "ct": {"div": 2},
            },
        }}

    def _setup(self, cfg, arch):
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        rng = np.random.default_rng(0)
        s, g = 3, TINY.grid
        images = rng.uniform(size=(1, s, 32, 32, 3)).astype(np.float32)
        mask = rng.random((1, s, g, g)) > 0.4
        mask[0, 0, 0, 0] = True  # at least one masked voxel
        res = np.asarray([[1.5, 2.0, 3.5]], np.float32)

        vit = ViTDense(TINY, policy=PARITY, use_flash=False)
        params = vit.init(
            jax.random.PRNGKey(0), jnp.asarray(images[0]))
        clf = build_classifier(cfg, arch, "ct",
                               policy=get_policy("parity"))
        if arch == "conv":
            pv = clf.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, s, g, g, self.D)),
                          jnp.ones((1, s, g, g), bool))
        else:
            pv = clf.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8, self.D)),
                          jnp.ones((1, 8), bool))
        return images, mask, res, vit, params, clf, pv

    def test_transformer_pipeline_matches_two_stage(self, cfg, tmp_path):
        from vit_deep_radiomics_tpu.engine.serve import export_pipeline
        from vit_deep_radiomics_tpu.ops.posenc import (
            positional_encoding_3d,
        )

        images, mask, res, vit, params, clf, pv = self._setup(
            cfg, "transformer")
        s, g, d, t = 3, TINY.grid, self.D, 12

        path = export_pipeline(
            params, TINY, pv, cfg, "transformer", "ct",
            tmp_path / "pipe.vdr", slices=s, max_tokens=t, batch=1,
            policy="parity", use_flash=False)
        m = load_exported(path)
        assert m.meta["kind"] == "pipeline"
        assert m.meta["out_names"] == ["logits", "cls_embedding"]
        got_logits, got_cls = (
            np.asarray(a) for a in m(images, mask, res))

        # two-stage oracle: dense forward + the trainer's host token
        # semantics (data/datasets.py::_get_features, h_orig == h_new,
        # noise = 0), then the classifier
        feats = np.asarray(vit.apply(params, jnp.asarray(images[0])))
        ii, jj, kk = np.meshgrid(
            np.arange(g), np.arange(g), np.arange(s), indexing="ij")
        x = jj * res[0, 0]
        y = ii * res[0, 1]
        z = kk * res[0, 2]
        mflat = mask[0].transpose(1, 2, 0).reshape(-1)
        fflat = feats.transpose(1, 2, 0, 3).reshape(-1, d)
        xs = (x - x.mean()).reshape(-1)[mflat]
        ys = (y - y.mean()).reshape(-1)[mflat]
        zs = (z - z.mean()).reshape(-1)[mflat]
        pe = np.asarray(positional_encoding_3d(xs, ys, zs, d))
        tok = fflat[mflat] + pe / 4.0
        n = tok.shape[0]
        assert 0 < n <= t
        padded = np.zeros((1, t, d), np.float32)
        padded[0, :n] = tok
        valid = np.zeros((1, t), bool)
        valid[0, :n] = True
        want_logits, want_cls = clf.apply(
            pv, jnp.asarray(padded), jnp.asarray(valid),
            deterministic=True)
        np.testing.assert_allclose(
            got_logits, np.asarray(want_logits), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            got_cls, np.asarray(want_cls), rtol=1e-5, atol=1e-5)

    def test_conv_pipeline_matches_two_stage(self, cfg, tmp_path):
        from vit_deep_radiomics_tpu.engine.serve import export_pipeline

        images, mask, res, vit, params, clf, pv = self._setup(cfg, "conv")
        s = 3

        path = export_pipeline(
            params, TINY, pv, cfg, "conv", "ct", tmp_path / "conv.vdr",
            slices=s, batch=1, policy="parity", use_flash=False)
        m = load_exported(path)
        assert m.meta["out_names"] == ["logits", "embedding"]
        got = [np.asarray(a) for a in m(images, mask, res)]

        feats = np.asarray(vit.apply(params, jnp.asarray(images[0])))
        vol = (feats * mask[0][..., None])[None]
        want = clf.apply(pv, jnp.asarray(vol.astype(np.float32)),
                         jnp.asarray(mask), deterministic=True)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                a, np.asarray(b), rtol=1e-5, atol=1e-5)

    def _raw_vs_host(self, cfg, tmp_path, backbone, modality, raw,
                     host_fn, rtol=1e-5, atol=1e-5):
        """raw-mode artifact(raw) == rgb-mode artifact(host_fn(raw))."""
        from vit_deep_radiomics_tpu.engine.serve import export_pipeline

        images, mask, res, vit, params, clf, pv = self._setup(
            cfg, "transformer")
        s, t = 3, 12
        ns = raw.shape[-1]
        common = dict(slices=s, max_tokens=t, batch=1, policy="parity",
                      use_flash=False)
        path = export_pipeline(
            params, backbone, pv, cfg, "transformer", modality,
            tmp_path / "raw.vdr", input_mode="raw_hu", native_size=ns,
            **common)
        m = load_exported(path)
        assert m.meta["input_mode"] == "raw_hu"
        assert m.meta["in_spec"]["images"] == [
            [1, s, ns, ns], np.dtype(raw.dtype).name]
        got = [np.asarray(a) for a in m(raw, mask, res)]

        rgb = np.asarray(host_fn(jnp.asarray(raw[0])))[None]
        path2 = export_pipeline(
            params, backbone, pv, cfg, "transformer", modality,
            tmp_path / "rgb.vdr", **common)
        m2 = load_exported(path2)
        assert m2.meta["input_mode"] == "rgb"
        want = [np.asarray(a) for a in m2(rgb, mask, res)]
        for a, b in zip(got, want):
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)

    def test_raw_hu_medsam_window_in_graph(self, cfg, tmp_path):
        """raw_hu + medsam: int16 HU → window W800/L40 + resize on
        device == the host DenseExtractor._normalize chain feeding the
        rgb artifact (ref tfds_dense_descriptor.py:441-443)."""
        import dataclasses as dc

        from vit_deep_radiomics_tpu.ops import preprocess as pp

        rng = np.random.default_rng(3)
        hu = rng.integers(
            -1024, 1500, size=(1, 3, 24, 24)).astype(np.int16)
        self._raw_vs_host(
            cfg, tmp_path, dc.replace(TINY, name="medsam"), "ct", hu,
            lambda v: pp.prepare_vit_input(
                pp.apply_window_ct(v.astype(jnp.float32), 800.0, 40.0),
                TINY.image_size))

    def test_raw_hu_dinov2_rgb_and_pet_norm_in_graph(self, cfg, tmp_path):
        """Non-medsam CT raw mode runs HU→RGB/255 in-graph; PET raw mode
        runs the per-volume /max (ref tfds_dense_descriptor.py:445-447)."""
        from vit_deep_radiomics_tpu.ops import preprocess as pp

        rng = np.random.default_rng(4)
        hu = rng.integers(
            -1024, 1500, size=(1, 3, 24, 24)).astype(np.int16)
        # hu_to_rgb ends in an integer trunc: a 1-ulp fusion-order
        # difference between the exported graph and the eager host chain
        # flips trunc by a whole /255 step at a band boundary, so this
        # comparison is structurally looser than the medsam window one
        self._raw_vs_host(
            cfg, tmp_path, TINY, "ct", hu,
            lambda v: pp.prepare_vit_input(
                pp.hu_to_rgb(v).astype(jnp.float32) / 255.0,
                TINY.image_size),
            rtol=1e-2, atol=1e-3)
        pet = rng.uniform(
            0.1, 9.0, size=(1, 3, 24, 24)).astype(np.float32)
        self._raw_vs_host(
            cfg, tmp_path, TINY, "pet", pet,
            lambda v: pp.prepare_vit_input(
                pp.normalize_pet(v), TINY.image_size))

    @staticmethod
    def _np_tokens(feats, mask, res, t):
        """Host oracle for the trainer token semantics
        (data/datasets.py::_get_features, h_orig == h_new, noise=0)."""
        from vit_deep_radiomics_tpu.ops.posenc import (
            positional_encoding_3d,
        )

        s, g, d = feats.shape[0], feats.shape[1], feats.shape[-1]
        ii, jj, kk = np.meshgrid(
            np.arange(g), np.arange(g), np.arange(s), indexing="ij")
        x, y, z = jj * res[0], ii * res[1], kk * res[2]
        mflat = mask.transpose(1, 2, 0).reshape(-1)
        fflat = feats.transpose(1, 2, 0, 3).reshape(-1, d)
        xs = (x - x.mean()).reshape(-1)[mflat]
        ys = (y - y.mean()).reshape(-1)[mflat]
        zs = (z - z.mean()).reshape(-1)[mflat]
        pe = np.asarray(positional_encoding_3d(xs, ys, zs, d))
        tok = fflat[mflat] + pe / 4.0
        n = tok.shape[0]
        assert 0 < n <= t
        padded = np.zeros((t, d), np.float32)
        padded[:n] = tok
        valid = np.zeros((t,), bool)
        valid[:n] = True
        return padded, valid

    def _bimodal_setup(self, cfg):
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        rng = np.random.default_rng(7)
        s_ct, s_pet, g, t = 3, 2, TINY.grid, 12
        ct_mask = rng.random((1, s_ct, g, g)) > 0.5
        pet_mask = rng.random((1, s_pet, g, g)) > 0.5
        ct_mask[0, 0, 0, 0] = pet_mask[0, 0, 0, 0] = True
        ct_res = np.asarray([[1.5, 2.0, 3.5]], np.float32)
        pet_res = np.asarray([[4.0, 4.0, 5.0]], np.float32)

        vit = ViTDense(TINY, policy=PARITY, use_flash=False)
        params = vit.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3), jnp.float32))
        clf = build_classifier(cfg, "transformer", "petct",
                               policy=get_policy("parity"))
        pv = clf.init(jax.random.PRNGKey(1),
                      ct_tokens=jnp.zeros((1, t, self.D)),
                      pet_tokens=jnp.zeros((1, t, self.D)),
                      ct_mask=jnp.ones((1, t), bool),
                      pet_mask=jnp.ones((1, t), bool))
        return (rng, s_ct, s_pet, t, ct_mask, pet_mask, ct_res, pet_res,
                vit, params, clf, pv)

    def test_bimodal_pipeline_matches_two_stage(self, cfg, tmp_path):
        """petct fused artifact == dense forwards on both stacks + host
        token building + the bimodal cross-attention classifier (the
        reference's flagship crossmodal config, models_archs.py:38-124,
        served as ONE graph)."""
        from vit_deep_radiomics_tpu.engine.serve import export_pipeline

        (rng, s_ct, s_pet, t, ct_mask, pet_mask, ct_res, pet_res,
         vit, params, clf, pv) = self._bimodal_setup(cfg)
        ct_images = rng.uniform(
            size=(1, s_ct, 32, 32, 3)).astype(np.float32)
        pet_images = rng.uniform(
            size=(1, s_pet, 32, 32, 3)).astype(np.float32)

        path = export_pipeline(
            params, TINY, pv, cfg, "transformer", "petct",
            tmp_path / "bi.vdr", slices=s_ct, pet_slices=s_pet,
            max_tokens=t, batch=1, policy="parity", use_flash=False)
        m = load_exported(path)
        assert m.meta["pet_slices"] == s_pet
        assert list(m.meta["in_spec"]) == [
            "ct_images", "pet_images", "ct_grid_mask", "pet_grid_mask",
            "ct_res", "pet_res"]
        assert m.meta["out_names"] == [
            "logits", "petct_cls", "logits_ct", "logits_pet"]
        got = [np.asarray(a) for a in m(
            ct_images, pet_images, ct_mask, pet_mask, ct_res, pet_res)]

        ct_feats = np.asarray(vit.apply(params, jnp.asarray(ct_images[0])))
        pet_feats = np.asarray(
            vit.apply(params, jnp.asarray(pet_images[0])))
        ct_tok, ct_valid = self._np_tokens(
            ct_feats, ct_mask[0], ct_res[0], t)
        pet_tok, pet_valid = self._np_tokens(
            pet_feats, pet_mask[0], pet_res[0], t)
        want = clf.apply(
            pv, ct_tokens=jnp.asarray(ct_tok[None]),
            pet_tokens=jnp.asarray(pet_tok[None]),
            ct_mask=jnp.asarray(ct_valid[None]),
            pet_mask=jnp.asarray(pet_valid[None]), deterministic=True)
        assert len(got) == 4
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                a, np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_bimodal_raw_hu_pipeline(self, cfg, tmp_path):
        """Bimodal raw mode: int16 HU CT at one native size + f32 PET at
        another, each normalized in-graph per modality (ref
        tfds_dense_descriptor.py:441-447) == host-preprocessed rgb
        artifact.  hu_to_rgb trunc tolerance as in the unimodal test."""
        from vit_deep_radiomics_tpu.engine.serve import export_pipeline
        from vit_deep_radiomics_tpu.ops import preprocess as pp

        (rng, s_ct, s_pet, t, ct_mask, pet_mask, ct_res, pet_res,
         vit, params, clf, pv) = self._bimodal_setup(cfg)
        ct_hu = rng.integers(
            -1024, 1500, size=(1, s_ct, 24, 24)).astype(np.int16)
        pet_act = rng.uniform(
            0.1, 9.0, size=(1, s_pet, 16, 16)).astype(np.float32)
        common = dict(slices=s_ct, pet_slices=s_pet, max_tokens=t,
                      batch=1, policy="parity", use_flash=False)

        path = export_pipeline(
            params, TINY, pv, cfg, "transformer", "petct",
            tmp_path / "biraw.vdr", input_mode="raw_hu",
            native_size=24, pet_native_size=16, **common)
        m = load_exported(path)
        assert m.meta["input_mode"] == "raw_hu"
        assert m.meta["pet_native_size"] == 16
        assert m.meta["in_spec"]["ct_images"] == [
            [1, s_ct, 24, 24], "int16"]
        assert m.meta["in_spec"]["pet_images"] == [
            [1, s_pet, 16, 16], "float32"]
        got = [np.asarray(a) for a in m(
            ct_hu, pet_act, ct_mask, pet_mask, ct_res, pet_res)]

        ct_rgb = np.asarray(pp.prepare_vit_input(
            pp.hu_to_rgb(jnp.asarray(ct_hu[0])).astype(jnp.float32)
            / 255.0, TINY.image_size))[None]
        pet_rgb = np.asarray(pp.prepare_vit_input(
            pp.normalize_pet(jnp.asarray(pet_act[0])),
            TINY.image_size))[None]
        path2 = export_pipeline(
            params, TINY, pv, cfg, "transformer", "petct",
            tmp_path / "birgb.vdr", **common)
        want = [np.asarray(a) for a in load_exported(path2)(
            ct_rgb, pet_rgb, ct_mask, pet_mask, ct_res, pet_res)]
        for a, b in zip(got, want):
            np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)

    def test_bimodal_conv_pipeline_rejected(self, cfg, tmp_path):
        from vit_deep_radiomics_tpu.engine.serve import export_pipeline

        with pytest.raises(ValueError, match="transformer"):
            export_pipeline({}, TINY, {}, cfg, "conv", "petct",
                            tmp_path / "x.vdr")

    def test_bad_input_mode_rejected(self, cfg, tmp_path):
        from vit_deep_radiomics_tpu.engine.serve import export_pipeline

        with pytest.raises(ValueError, match="input_mode"):
            export_pipeline({}, TINY, {}, cfg, "transformer", "ct",
                            tmp_path / "x.vdr", input_mode="jpeg")

    def test_feature_dim_mismatch_rejected(self, cfg, tmp_path):
        import copy

        from vit_deep_radiomics_tpu.engine.serve import export_pipeline

        bad = copy.deepcopy(cfg)
        bad["models"]["transformer"]["feature_dim"] = 32
        with pytest.raises(ValueError, match="feature_dim"):
            export_pipeline(
                {}, TINY, {"params": {}}, bad, "transformer", "ct",
                tmp_path / "x.vdr", policy="parity", use_flash=False)


class TestExecutableCache:
    """ExportedModel.warm(): AOT compile through the on-disk EXECUTABLE
    cache — first warm saves the compiled binary, a fresh load of the
    same artifact warms from disk ('hit') and produces identical
    outputs; poly artifacts skip AOT (per-shape specialization)."""

    def _cfg(self, d=16):
        return {"models": {"transformer": {
            "learning_rate": 5e-4, "feature_dim": d, "batch_size": 2,
            "virtual_batch_size": 4, "num_epochs": 1, "patience": 5,
            "ct": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
            "pet": {"num_layers": 1, "num_heads": 2, "mlp_ratio": 2},
        }}}

    def test_warm_miss_then_hit(self, tmp_path, monkeypatch):
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        monkeypatch.setenv("VDR_EXEC_CACHE", str(tmp_path / "exec"))
        cfg = self._cfg()
        rng = np.random.default_rng(0)
        m = build_classifier(cfg, "transformer", "ct",
                             policy=get_policy("parity"))
        toks = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
        mask = jnp.asarray(rng.random((2, 8)) > 0.3)
        v = m.init(jax.random.PRNGKey(0), toks, mask)
        p = export_classifier(
            v, cfg, "transformer", "ct", tmp_path / "t.vdr",
            batch=2, max_tokens=8, policy="parity")

        em1 = load_exported(p).warm()
        assert em1.cache_status in ("miss-saved", "miss")
        want = em1(toks, mask)

        em2 = load_exported(p).warm()
        # TPU round-trips the executable ('hit'); the CPU backend cannot
        # re-load its own serialized binaries (validation call fails) —
        # warm() then falls back to a fresh compile ('miss-saved'),
        # which is the designed degradation.  The on-chip hit is
        # measured by the serving bench artifact.
        assert em2.cache_status in ("hit", "miss-saved")
        got = em2(toks, mask)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # warm() is idempotent
        assert em2.warm() is em2

    def test_poly_artifact_skips_aot(self, tmp_path, monkeypatch):
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        monkeypatch.setenv("VDR_EXEC_CACHE", str(tmp_path / "exec"))
        cfg = self._cfg()
        rng = np.random.default_rng(1)
        m = build_classifier(cfg, "transformer", "ct",
                             policy=get_policy("parity"))
        toks = jnp.asarray(rng.normal(size=(3, 8, 16)).astype(np.float32))
        mask = jnp.asarray(rng.random((3, 8)) > 0.3)
        v = m.init(jax.random.PRNGKey(0), toks, mask)
        p = export_classifier(
            v, cfg, "transformer", "ct", tmp_path / "poly.vdr",
            batch="poly", max_tokens=8, policy="parity")
        em = load_exported(p).warm()
        assert em.cache_status == "poly"
        got = em(toks, mask)      # lazy per-shape path still works
        assert np.asarray(got[0]).shape == (3, 2)

    def test_cache_off_env(self, tmp_path, monkeypatch):
        from vit_deep_radiomics_tpu.core.precision import get_policy
        from vit_deep_radiomics_tpu.engine.serve import export_classifier
        from vit_deep_radiomics_tpu.models.classifiers import (
            build_classifier,
        )

        monkeypatch.setenv("VDR_EXEC_CACHE", "off")
        cfg = self._cfg()
        rng = np.random.default_rng(2)
        m = build_classifier(cfg, "transformer", "ct",
                             policy=get_policy("parity"))
        toks = jnp.asarray(rng.normal(size=(2, 8, 16)).astype(np.float32))
        mask = jnp.asarray(rng.random((2, 8)) > 0.3)
        v = m.init(jax.random.PRNGKey(0), toks, mask)
        p = export_classifier(
            v, cfg, "transformer", "ct", tmp_path / "off.vdr",
            batch=2, max_tokens=8, policy="parity")
        em = load_exported(p).warm()
        assert em.cache_status == "miss"   # compiled, nothing persisted
        got = em(toks, mask)
        assert np.asarray(got[0]).shape == (2, 2)


class TestHTTPServer:
    """`serve server` HTTP endpoint (cli/serve.py::make_server): health
    + npz-in/npz-out inference equal to the direct artifact call."""

    def test_dense_infer_roundtrip(self, artifact):
        import io
        import json as _json
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer

        from vit_deep_radiomics_tpu.cli.serve import make_server

        path, x, want = artifact
        model = load_exported(path).warm()
        handler = make_server(model)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=30) as r:
                health = _json.loads(r.read())
            assert health["status"] == "ok"
            assert health["kind"] == "dense"

            # 3 images against a batch-2 artifact: pads + trims
            imgs = np.concatenate([np.asarray(x), np.asarray(x[:1])])
            buf = io.BytesIO()
            np.savez(buf, images=imgs)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer", data=buf.getvalue(),
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                out = np.load(io.BytesIO(r.read()))
            got = out["features"]
            assert got.shape[0] == 3
            np.testing.assert_array_equal(got[:2], want)
            np.testing.assert_array_equal(got[2], want[0])

            # malformed body -> structured 400, server stays up
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/infer", data=b"not-an-npz",
                method="POST")
            try:
                urllib.request.urlopen(bad, timeout=30)
                assert False, "expected HTTP 400"
            except urllib.error.HTTPError as exc:
                assert exc.code == 400
                assert "error" in _json.loads(exc.read())
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=30) as r:
                assert _json.loads(r.read())["status"] == "ok"
        finally:
            httpd.shutdown()
            httpd.server_close()
