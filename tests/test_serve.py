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
