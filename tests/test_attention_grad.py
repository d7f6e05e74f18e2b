"""Differentiable flash attention vs jax.grad of the XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.ops.attention import attention_reference
from vit_deep_radiomics_tpu.ops.attention_grad import (
    flash_attention_trainable,
)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _ref_loss(q, k, v, bias_h=None, bias_w=None, kv_len=None):
    bias = None
    if bias_h is not None:
        b, h, sq, kh = bias_h.shape
        kw = bias_w.shape[-1]
        bias = (
            bias_h[..., :, None] + bias_w[..., None, :]
        ).reshape(b, h, sq, kh * kw)
    out = attention_reference(q, k, v, bias=bias, kv_len=kv_len)
    return (out * jnp.sin(jnp.arange(out.size).reshape(out.shape))).sum()


def _flash_loss(q, k, v, bias_h=None, bias_w=None, kv_len=None,
                block_q=64, block_k=64):
    out = flash_attention_trainable(
        q, k, v, bias_h=bias_h, bias_w=bias_w, kv_len=kv_len,
        block_q=block_q, block_k=block_k, interpret=INTERPRET,
    )
    return (out * jnp.sin(jnp.arange(out.size).reshape(out.shape))).sum()


class TestForwardValue:
    def test_plain(self, rng):
        q, k, v = (_rand(rng, 2, 3, 128, 32) for _ in range(3))
        out = flash_attention_trainable(
            q, k, v, block_q=64, block_k=64, interpret=INTERPRET)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_bias_multi_tile(self, rng):
        kh = kw = 16
        s = kh * kw
        q, k, v = (_rand(rng, 1, 2, s, 32) for _ in range(3))
        bias_h = _rand(rng, 1, 2, s, kh) * 0.3
        bias_w = _rand(rng, 1, 2, s, kw) * 0.3
        out = flash_attention_trainable(
            q, k, v, bias_h=bias_h, bias_w=bias_w,
            block_q=128, block_k=64, interpret=INTERPRET)
        dense = (
            bias_h[..., :, None] + bias_w[..., None, :]
        ).reshape(1, 2, s, s)
        ref = attention_reference(q, k, v, bias=dense)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


class TestGradients:
    def test_plain_grads(self, rng):
        q, k, v = (_rand(rng, 2, 2, 128, 32) for _ in range(3))
        g_ref = jax.grad(_ref_loss, argnums=(0, 1, 2))(q, k, v)
        g_fl = jax.grad(_flash_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_fl, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"d{name}")

    def test_kv_len_grads(self, rng):
        q, k, v = (_rand(rng, 2, 2, 128, 32) for _ in range(3))
        kv_len = jnp.asarray([70, 128], jnp.int32)
        g_ref = jax.grad(
            lambda *a: _ref_loss(*a, kv_len=kv_len), argnums=(0, 1, 2)
        )(q, k, v)
        g_fl = jax.grad(
            lambda *a: _flash_loss(*a, kv_len=kv_len), argnums=(0, 1, 2)
        )(q, k, v)
        for a, b, name in zip(g_fl, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"d{name}")
        # padded key/value positions must get zero gradient
        assert np.allclose(np.asarray(g_fl[1])[0, :, 70:], 0.0)
        assert np.allclose(np.asarray(g_fl[2])[0, :, 70:], 0.0)

    def test_decomposed_bias_grads(self, rng):
        """Bias-factor gradients: group reductions of the score grad."""
        kh = kw = 16
        s = kh * kw
        q, k, v = (_rand(rng, 1, 2, s, 32) for _ in range(3))
        bias_h = _rand(rng, 1, 2, s, kh) * 0.3
        bias_w = _rand(rng, 1, 2, s, kw) * 0.3

        g_ref = jax.grad(_ref_loss, argnums=(0, 1, 2, 3, 4))(
            q, k, v, bias_h, bias_w)
        g_fl = jax.grad(
            lambda *a: _flash_loss(*a, block_q=128, block_k=64),
            argnums=(0, 1, 2, 3, 4),
        )(q, k, v, bias_h, bias_w)
        names = ["dq", "dk", "dv", "dbias_h", "dbias_w"]
        for a, b, name in zip(g_fl, g_ref, names):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=name)

    def test_single_tile_bias_grads(self, rng):
        """block_k covering the whole key grid (rows == kh fast path)."""
        kh, kw = 4, 16
        s = kh * kw
        q, k, v = (_rand(rng, 1, 2, s, 32) for _ in range(3))
        bias_h = _rand(rng, 1, 2, s, kh) * 0.3
        bias_w = _rand(rng, 1, 2, s, kw) * 0.3
        g_ref = jax.grad(_ref_loss, argnums=(3, 4))(q, k, v, bias_h, bias_w)
        g_fl = jax.grad(
            lambda bh, bw: _flash_loss(q, k, v, bh, bw,
                                       block_q=64, block_k=64),
            argnums=(0, 1),
        )(bias_h, bias_w)
        for a, b, name in zip(g_fl, g_ref, ["dbias_h", "dbias_w"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=name)

    def test_bf16_inputs(self, rng):
        q, k, v = (
            _rand(rng, 1, 2, 128, 32).astype(jnp.bfloat16) for _ in range(3)
        )
        g = jax.grad(
            lambda q: _flash_loss(q, k, v).astype(jnp.float32))(q)
        assert g.dtype == jnp.bfloat16
        g_ref = jax.grad(
            lambda q: _ref_loss(q, k, v).astype(jnp.float32))(q)
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(g_ref, np.float32),
            atol=5e-2, rtol=5e-2)
