"""Flash-attention kernel vs XLA reference parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.ops.attention import (
    attention_reference,
    flash_attention,
)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


class TestFlashAttention:
    @pytest.mark.parametrize("sq,sk", [(256, 256), (128, 512)])
    def test_matches_reference(self, rng, sq, sk):
        b, h, d = 2, 3, 64
        q, k, v = (_rand(rng, b, h, s, d) for s in (sq, sk, sk))
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=INTERPRET)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_kv_len_masking(self, rng):
        b, h, s, d = 2, 2, 256, 32
        q, k, v = (_rand(rng, b, h, s, d) for _ in range(3))
        kv_len = jnp.asarray([100, 256], jnp.int32)
        out = flash_attention(
            q, k, v, kv_len=kv_len, block_q=128, block_k=128, interpret=INTERPRET
        )
        ref = attention_reference(q, k, v, kv_len=kv_len)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_decomposed_rel_pos_bias(self, rng):
        # key grid 16x16 = 256 keys, queries 256
        b, h, d, kh, kw = 1, 2, 32, 16, 16
        sq, sk = 256, kh * kw
        q, k, v = (_rand(rng, b, h, s, d) for s in (sq, sk, sk))
        bias_h = _rand(rng, b, h, sq, kh)
        bias_w = _rand(rng, b, h, sq, kw)
        dense_bias = (
            bias_h[..., :, None] + bias_w[..., None, :]
        ).reshape(b, h, sq, sk)
        out = flash_attention(
            q, k, v, bias_h=bias_h, bias_w=bias_w,
            block_q=128, block_k=64, interpret=INTERPRET,
        )
        ref = attention_reference(q, k, v, bias=dense_bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_rel_pos_bias_multi_row_blocks(self, rng):
        # block_k spanning 2 key-grid rows (kw=64, block_k=128)
        b, h, d, kh, kw = 1, 1, 32, 4, 64
        sq, sk = 128, kh * kw
        q, k, v = (_rand(rng, b, h, s, d) for s in (sq, sk, sk))
        bias_h = _rand(rng, b, h, sq, kh)
        bias_w = _rand(rng, b, h, sq, kw)
        dense_bias = (
            bias_h[..., :, None] + bias_w[..., None, :]
        ).reshape(b, h, sq, sk)
        out = flash_attention(
            q, k, v, bias_h=bias_h, bias_w=bias_w,
            block_q=128, block_k=128, interpret=INTERPRET,
        )
        ref = attention_reference(q, k, v, bias=dense_bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_kv_grid_static_mask(self, rng):
        # padded 16x16 key grid, valid 14x14 (SAM windowed-attention shape)
        b, h, d, kh, kw = 1, 2, 32, 16, 16
        sq, sk = 256, kh * kw
        q, k, v = (_rand(rng, b, h, s, d) for s in (sq, sk, sk))
        bias_h = _rand(rng, b, h, sq, kh)
        bias_w = _rand(rng, b, h, sq, kw)
        out = flash_attention(
            q, k, v, bias_h=bias_h, bias_w=bias_w, kv_grid=(14, 14),
            block_q=128, block_k=128, interpret=INTERPRET,
        )
        dense_bias = (
            bias_h[..., :, None] + bias_w[..., None, :]
        ).reshape(b, h, sq, sk)
        ky, kx = np.divmod(np.arange(sk), kw)
        valid = (ky < 14) & (kx < 14)
        dense_bias = jnp.where(
            jnp.asarray(valid)[None, None, None, :], dense_bias, -1e30
        )
        ref = attention_reference(q, k, v, bias=dense_bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16_inputs(self, rng):
        b, h, s, d = 1, 2, 256, 64
        q, k, v = (
            _rand(rng, b, h, s, d).astype(jnp.bfloat16) for _ in range(3)
        )
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=INTERPRET)
        ref = attention_reference(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )

    def test_fully_masked_rows_finite(self, rng):
        b, h, s, d = 1, 1, 128, 32
        q, k, v = (_rand(rng, b, h, s, d) for _ in range(3))
        out = flash_attention(
            q, k, v, kv_len=jnp.asarray([0], jnp.int32),
            block_q=128, block_k=128, interpret=INTERPRET,
        )
        assert bool(jnp.all(jnp.isfinite(out)))


class TestReferenceAttention:
    def test_softmax_rows_sum_to_one_effect(self, rng):
        # uniform values -> output equals value row regardless of scores
        b, h, s, d = 1, 1, 8, 4
        q, k = _rand(rng, b, h, s, d), _rand(rng, b, h, s, d)
        v = jnp.ones((b, h, s, d))
        out = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)

    def test_grad_flows(self, rng):
        b, h, s, d = 1, 2, 16, 8
        q, k, v = (_rand(rng, b, h, s, d) for _ in range(3))

        def loss(q):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        g = jax.grad(loss)(q)
        assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0
