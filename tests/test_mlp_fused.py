"""Fused LN→MLP→residual kernel (ops/mlp_fused.py) vs the module path.

The kernel must reproduce models/vit.py ``LayerNorm`` + ``Mlp`` +
layerscale + residual composition exactly (same cast points), so the
bf16 inference fast path and the unfused trainable/parity paths are
interchangeable per checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_deep_radiomics_tpu.core.precision import FAST
from vit_deep_radiomics_tpu.models.vit import Block, LayerNorm, Mlp
from vit_deep_radiomics_tpu.ops.mlp_fused import fused_ln_mlp_residual


def _inputs(c=128, h=512, rows=(2, 80), dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s, scale=1.0: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * scale)
    x = mk(*rows, c).astype(dtype)
    return (
        x, mk(c), mk(c, scale=0.1), mk(c, h, scale=0.05),
        mk(h, scale=0.1), mk(h, c, scale=0.05), mk(c, scale=0.1),
        mk(c, scale=0.5),
    )


def _oracle(x, sc, lb, w1, b1, w2, b2, ls, eps=1e-6):
    """The exact unfused composition from models/vit.py (fast policy)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps) * sc + lb).astype(x.dtype)
    hh = jnp.dot(y, w1.astype(x.dtype),
                 preferred_element_type=jnp.float32) + b1
    g = jax.nn.gelu(hh, approximate=True)
    o = jnp.dot(g.astype(x.dtype), w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    o = o.astype(x.dtype)
    if ls is not None:
        o = o * ls.astype(x.dtype)
    return x + o


class TestFusedKernel:
    @pytest.mark.parametrize("layerscale", [False, True])
    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
    def test_matches_unfused_composition(self, layerscale, dtype):
        x, sc, lb, w1, b1, w2, b2, ls = _inputs(dtype=dtype)
        ls_ = ls if layerscale else None
        got = fused_ln_mlp_residual(
            x, sc, lb, w1, b1, w2, b2, ls_,
            eps=1e-6, block_n=128, chunk=256, interpret=True,
        )
        want = _oracle(x, sc, lb, w1, b1, w2, b2, ls_)
        assert got.dtype == x.dtype and got.shape == x.shape
        # bf16: the casts quantize every intermediate → bit-exact.
        # f32: interpreter-vs-XLA reassociation leaves ~1 ulp noise.
        atol = 0.0 if dtype == jnp.bfloat16 else 5e-6
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=atol, rtol=0,
        )

    def test_row_padding(self):
        # rows (2, 80) = 160 not a multiple of block_n=128: the pad rows
        # must not leak into the output
        x, sc, lb, w1, b1, w2, b2, _ = _inputs(rows=(2, 80))
        got = fused_ln_mlp_residual(
            x, sc, lb, w1, b1, w2, b2, None,
            block_n=128, chunk=512, interpret=True,
        )
        want = _oracle(x, sc, lb, w1, b1, w2, b2, None)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))

    def test_non_dividing_chunk_collapses(self):
        # h=512 with chunk=300 → kernel falls back to a single chunk
        x, sc, lb, w1, b1, w2, b2, _ = _inputs()
        got = fused_ln_mlp_residual(
            x, sc, lb, w1, b1, w2, b2, None,
            block_n=128, chunk=300, interpret=True,
        )
        want = _oracle(x, sc, lb, w1, b1, w2, b2, None)
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))


class TestParamOnlyCalls:
    """LayerNorm/Mlp called with x=None return their params — the same
    tree the compute call creates, so the fused path shares checkpoints."""

    def test_layernorm_param_call(self):
        ln = LayerNorm(1e-6, FAST, dim=16)
        vs = jax.eval_shape(ln.init, jax.random.PRNGKey(0))
        params = ln.init(jax.random.PRNGKey(0))
        sc, bi = ln.apply(params)
        assert sc.shape == (16,) and bi.shape == (16,)
        # identical tree to a compute-call init
        x = jnp.zeros((2, 16))
        params2 = LayerNorm(1e-6, FAST).init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(params) == jax.tree.structure(params2)
        assert vs is not None

    def test_mlp_param_call(self, small_cfg=None):
        import dataclasses

        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

        cfg = dataclasses.replace(SAM_VIT_B, width=32, mlp_ratio=2.0)
        mlp = Mlp(cfg, FAST)
        params = mlp.init(jax.random.PRNGKey(0))
        w1, b1, w2, b2 = mlp.apply(params)
        assert w1.shape == (32, 64) and w2.shape == (64, 32)
        params2 = Mlp(cfg, FAST).init(
            jax.random.PRNGKey(0), jnp.zeros((2, 32)))
        assert jax.tree.structure(params) == jax.tree.structure(params2)
        # param-only values equal the compute-call tree's values
        for a, b in zip(
            jax.tree.leaves(params), jax.tree.leaves(params2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBlockWiring:
    """The fused flag routes only the (use_flash, inference, bf16) path;
    CPU/parity/trainable paths are byte-identical to before."""

    def test_unfused_paths_unchanged(self):
        import dataclasses

        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B

        cfg = dataclasses.replace(
            SAM_VIT_B, width=32, depth=1, num_heads=2, window_size=0,
            global_indexes=(0,), mlp_ratio=2.0,
        )
        x = jnp.asarray(
            np.random.default_rng(0)
            .normal(size=(1, 4, 4, 32)).astype(np.float32))
        # use_flash=False → fused gate closed regardless of fused_mlp
        blk_a = Block(cfg, FAST, windowed=False, use_flash=False,
                      fused_mlp=True)
        blk_b = Block(cfg, FAST, windowed=False, use_flash=False,
                      fused_mlp=False)
        p = blk_a.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(
            np.asarray(blk_a.apply(p, x)), np.asarray(blk_b.apply(p, x)))
