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


class TestWindowTrainable:
    """Fused-layout window attention VJP (window_attention_trainable)
    vs a dense per-head reference on the same packed inputs — values and
    gradients for q_arr, kv_arr and both pair-merged bias operands."""

    @staticmethod
    def _make(rng, b=6, heads=4, d=64, kh=4, kw=4):
        from vit_deep_radiomics_tpu.ops.attention import _head_group

        pair = _head_group(heads, d)
        s = kh * kw
        c = heads * d
        q_arr = _rand(rng, b, s, c) * 0.5
        kv_arr = _rand(rng, b, s, 2 * c) * 0.5
        bias_h = _rand(rng, b, heads // pair, s, pair * kh) * 0.3
        bias_w = _rand(rng, b, heads // pair, s, pair * kw) * 0.3
        return q_arr, kv_arr, bias_h, bias_w, heads, d, pair, s, c

    @staticmethod
    def _dense_ref(q_arr, kv_arr, bias_h, bias_w, heads, d, pair, s, c):
        """Per-head dense softmax attention on the packed layout."""
        outs = []
        scale = d ** -0.5
        for n in range(heads):
            q = q_arr[:, :, n * d:(n + 1) * d]
            k = kv_arr[:, :, n * d:(n + 1) * d]
            v = kv_arr[:, :, c + n * d:c + (n + 1) * d]
            slot = n % pair
            kh = bias_h.shape[-1] // pair
            kw = bias_w.shape[-1] // pair
            bh = bias_h[:, n // pair, :, slot * kh:(slot + 1) * kh]
            bw = bias_w[:, n // pair, :, slot * kw:(slot + 1) * kw]
            logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
            logits = (
                logits
                + bh[:, :, jnp.arange(s) // kw]
                + bw[:, :, jnp.arange(s) % kw]
            )
            p = jax.nn.softmax(logits, axis=-1)
            outs.append(jnp.einsum("bqk,bkd->bqd", p, v))
        return jnp.concatenate(outs, axis=-1)

    def test_forward_matches_dense(self, rng):
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            window_attention_trainable,
        )

        q_arr, kv_arr, bh, bw, heads, d, pair, s, c = self._make(rng)
        out = window_attention_trainable(
            q_arr, kv_arr, bias_h=bh, bias_w=bw,
            num_heads=heads, window_tokens=s, window_batch=3,
            interpret=INTERPRET,
        )
        ref = self._dense_ref(q_arr, kv_arr, bh, bw, heads, d, pair, s, c)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_grads_match_dense(self, rng):
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            window_attention_trainable,
        )

        q_arr, kv_arr, bh, bw, heads, d, pair, s, c = self._make(rng)
        cot = jnp.asarray(
            np.sin(np.arange(q_arr.size)).reshape(q_arr.shape)
            .astype(np.float32))

        def loss_flash(q_arr, kv_arr, bh, bw):
            out = window_attention_trainable(
                q_arr, kv_arr, bias_h=bh, bias_w=bw,
                num_heads=heads, window_tokens=s, window_batch=2,
                interpret=INTERPRET,
            )
            return (out * cot).sum()

        def loss_ref(q_arr, kv_arr, bh, bw):
            out = self._dense_ref(
                q_arr, kv_arr, bh, bw, heads, d, pair, s, c)
            return (out * cot).sum()

        got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(
            q_arr, kv_arr, bh, bw)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
            q_arr, kv_arr, bh, bw)
        for g, w, name in zip(got, want, ("dq", "dkv", "dbh", "dbw")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4,
                err_msg=name)

    def test_no_bias_grads(self, rng):
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            window_attention_trainable,
        )

        q_arr, kv_arr, _, _, heads, d, pair, s, c = self._make(rng, b=4)
        cot = jnp.asarray(
            np.cos(np.arange(q_arr.size)).reshape(q_arr.shape)
            .astype(np.float32))

        def loss_flash(q_arr, kv_arr):
            out = window_attention_trainable(
                q_arr, kv_arr,
                num_heads=heads, window_tokens=s, window_batch=1,
                interpret=INTERPRET,
            )
            return (out * cot).sum()

        def loss_ref(q_arr, kv_arr):
            zero_bh = jnp.zeros((4, heads // pair, s, pair * 4))
            zero_bw = jnp.zeros((4, heads // pair, s, pair * 4))
            out = self._dense_ref(
                q_arr, kv_arr, zero_bh, zero_bw, heads, d, pair, s, c)
            return (out * cot).sum()

        got = jax.grad(loss_flash, argnums=(0, 1))(q_arr, kv_arr)
        want = jax.grad(loss_ref, argnums=(0, 1))(q_arr, kv_arr)
        for g, w, name in zip(got, want, ("dq", "dkv")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4,
                err_msg=name)


class TestGlobalTrainable:
    """Fused-layout GLOBAL attention VJP (global_attention_trainable)
    vs a dense per-head reference on the same packed inputs — the
    trainable twin of the inference fused-global kernel (values + grads
    for q_arr, kv_arr and both pair-merged bias operands, multi-tile
    kv loops, kv_len masking)."""

    @staticmethod
    def _make(rng, b=2, heads=4, d=64, kh=8, kw=16):
        from vit_deep_radiomics_tpu.ops.attention import _head_group

        pair = _head_group(heads, d)
        s = kh * kw
        c = heads * d
        q_arr = _rand(rng, b, s, c) * 0.5
        kv_arr = _rand(rng, b, s, 2 * c) * 0.5
        bias_h = _rand(rng, b, heads // pair, s, pair * kh) * 0.3
        bias_w = _rand(rng, b, heads // pair, s, pair * kw) * 0.3
        return q_arr, kv_arr, bias_h, bias_w, heads, d, pair, s, c, kh, kw

    @staticmethod
    def _dense_ref(q_arr, kv_arr, bias_h, bias_w, heads, d, pair, s, c,
                   kh, kw, kv_len=None):
        """Per-head dense softmax attention; bias_h indexes the GLOBAL
        key-grid row (Kh·Kw == S)."""
        outs = []
        scale = d ** -0.5
        for n in range(heads):
            q = q_arr[:, :, n * d:(n + 1) * d]
            k = kv_arr[:, :, n * d:(n + 1) * d]
            v = kv_arr[:, :, c + n * d:c + (n + 1) * d]
            logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale
            if bias_h is not None:
                slot = n % pair
                bh = bias_h[:, n // pair, :, slot * kh:(slot + 1) * kh]
                bw = bias_w[:, n // pair, :, slot * kw:(slot + 1) * kw]
                logits = (
                    logits
                    + bh[:, :, jnp.arange(s) // kw]
                    + bw[:, :, jnp.arange(s) % kw]
                )
            if kv_len is not None:
                mask = (jnp.arange(s)[None, :] < kv_len[:, None])[:, None, :]
                logits = jnp.where(mask, logits, -1e30)
            p = jax.nn.softmax(logits, axis=-1)
            outs.append(jnp.einsum("bqk,bkd->bqd", p, v))
        return jnp.concatenate(outs, axis=-1)

    @pytest.mark.parametrize("block_q,block_k", [
        (128, 128), (128, 64), (64, 32), (32, 128),
    ])
    def test_forward_matches_dense(self, rng, block_q, block_k):
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            global_attention_trainable,
        )

        made = self._make(rng)
        q_arr, kv_arr, bh, bw, heads = made[:5]
        out = global_attention_trainable(
            q_arr, kv_arr, bias_h=bh, bias_w=bw, num_heads=heads,
            block_q=block_q, block_k=block_k, interpret=INTERPRET,
        )
        ref = self._dense_ref(*made)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_forward_matches_inference_kernel(self, rng):
        """Bit-identical to the fused inference kernel (max path) — the
        forward IS that kernel plus the lse residual."""
        from vit_deep_radiomics_tpu.ops.attention import (
            flash_attention_fused_qkv,
        )
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            global_attention_trainable,
        )

        made = self._make(rng)
        q_arr, kv_arr, bh, bw, heads = made[:5]
        out = global_attention_trainable(
            q_arr, kv_arr, bias_h=bh, bias_w=bw, num_heads=heads,
            block_q=128, block_k=64, interpret=INTERPRET,
        )
        ref = flash_attention_fused_qkv(
            (q_arr, kv_arr), bias_h=bh, bias_w=bw, num_heads=heads,
            block_q=128, block_k=64, nomax=False, schedule="base",
            interpret=INTERPRET,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))

    @pytest.mark.parametrize("schedule,nomax", [
        ("base", False), ("skew", False), ("skew", True),
    ])
    def test_grads_match_dense(self, rng, schedule, nomax):
        """Grad equality incl. the nomax forward (VERDICT r4 item 7):
        the backward consumes only the lse residual, which the nomax
        forward still emits (as log2 Σ exp2 s, no max term)."""
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            global_attention_trainable,
        )

        made = self._make(rng)
        q_arr, kv_arr, bh, bw, heads = made[:5]
        cot = jnp.asarray(
            np.sin(np.arange(q_arr.size)).reshape(q_arr.shape)
            .astype(np.float32))

        def loss_flash(q_arr, kv_arr, bh, bw):
            out = global_attention_trainable(
                q_arr, kv_arr, bias_h=bh, bias_w=bw, num_heads=heads,
                block_q=128, block_k=64, schedule=schedule,
                nomax=nomax, interpret=INTERPRET,
            )
            return (out * cot).sum()

        def loss_ref(q_arr, kv_arr, bh, bw):
            out = self._dense_ref(
                q_arr, kv_arr, bh, bw, *made[4:])
            return (out * cot).sum()

        got = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(
            q_arr, kv_arr, bh, bw)
        want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(
            q_arr, kv_arr, bh, bw)
        for g, w, name in zip(got, want, ("dq", "dkv", "dbh", "dbw")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-4,
                err_msg=name)

    def test_nomax_forward_matches_max(self, rng):
        """nomax and max forwards agree (softmax shift-invariance) and
        both lse layouts drive the same backward."""
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            global_attention_trainable,
        )

        made = self._make(rng)
        q_arr, kv_arr, bh, bw, heads = made[:5]
        kw = dict(bias_h=bh, bias_w=bw, num_heads=heads,
                  block_q=128, block_k=64, interpret=INTERPRET)
        out_max = global_attention_trainable(q_arr, kv_arr, **kw)
        out_nomax = global_attention_trainable(
            q_arr, kv_arr, nomax=True, **kw)
        np.testing.assert_allclose(
            np.asarray(out_nomax), np.asarray(out_max),
            atol=2e-5, rtol=2e-5)

    def test_kv_len_grads(self, rng):
        """No-bias + padding mask (the DINOv2 trainable configuration)."""
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            global_attention_trainable,
        )

        made = self._make(rng)
        q_arr, kv_arr, _, _, heads, d, pair, s, c, kh, kw = made
        kv_len = jnp.asarray([s - 40, s], jnp.int32)
        cot = jnp.asarray(
            np.cos(np.arange(q_arr.size)).reshape(q_arr.shape)
            .astype(np.float32))

        def loss_flash(q_arr, kv_arr):
            out = global_attention_trainable(
                q_arr, kv_arr, kv_len=kv_len, num_heads=heads,
                block_q=64, block_k=64, interpret=INTERPRET,
            )
            return (out * cot).sum()

        def loss_ref(q_arr, kv_arr):
            out = self._dense_ref(
                q_arr, kv_arr, None, None, heads, d, pair, s, c, kh, kw,
                kv_len=kv_len)
            return (out * cot).sum()

        got = jax.grad(loss_flash, argnums=(0, 1))(q_arr, kv_arr)
        want = jax.grad(loss_ref, argnums=(0, 1))(q_arr, kv_arr)
        for g, w, name in zip(got, want, ("dq", "dkv")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-4,
                err_msg=name)
        # padded key/value positions must get zero gradient
        assert np.allclose(np.asarray(got[1])[0, s - 40:, :], 0.0)

    def test_bf16_inputs(self, rng):
        from vit_deep_radiomics_tpu.ops.attention_grad import (
            global_attention_trainable,
        )

        made = self._make(rng)
        q_arr, kv_arr, bh, bw, heads = made[:5]
        q_arr = q_arr.astype(jnp.bfloat16)
        kv_arr = kv_arr.astype(jnp.bfloat16)
        bh = bh.astype(jnp.bfloat16)
        bw = bw.astype(jnp.bfloat16)

        def loss(q_arr):
            out = global_attention_trainable(
                q_arr, kv_arr, bias_h=bh, bias_w=bw, num_heads=heads,
                block_q=128, block_k=64, interpret=INTERPRET,
            )
            return out.astype(jnp.float32).sum()

        g = jax.grad(loss)(q_arr)
        assert g.dtype == jnp.bfloat16

        def loss_ref(q_arr):
            out = self._dense_ref(
                q_arr.astype(jnp.float32), kv_arr.astype(jnp.float32),
                bh.astype(jnp.float32), bw.astype(jnp.float32), *made[4:])
            return out.sum()

        g_ref = jax.grad(loss_ref)(q_arr.astype(jnp.float32))
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(g_ref, np.float32),
            atol=5e-2, rtol=5e-2)
