"""Fused-QKV flash attention: kernel-side layout (no XLA relayout ops).

The kernel reads q/k/v straight out of the (B, S, 3·H·D) QKV-projection
output via BlockSpec index maps and writes (B, S, H·D) in
output-projection-ready layout; these tests pin its numerics to the
per-head XLA oracle across global, padded, and block-diagonal-window
modes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_deep_radiomics_tpu.ops.attention import (
    attention_reference,
    flash_attention_fused_qkv,
)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def _pack_pairs(bias, pair):
    """(B, H, S, K) per-head bias -> (B, H/pair, S, pair*K) pair-merged
    (the global-mode kernel layout)."""
    b, h, s, k = bias.shape
    return bias.reshape(b, h // pair, pair, s, k).transpose(
        0, 1, 3, 2, 4).reshape(b, h // pair, s, pair * k)


def _split_heads(qkv, num_heads):
    """(B, S, 3HD) -> q, k, v each (B, H, S, D)."""
    b, s, three_c = qkv.shape
    d = three_c // (3 * num_heads)
    parts = qkv.reshape(b, s, 3, num_heads, d)
    return (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))


class TestFusedQKVGlobal:
    @pytest.mark.parametrize("s,block_q,block_k", [
        (256, 128, 128), (512, 256, 128), (384, 384, 384),
    ])
    def test_matches_reference(self, rng, s, block_q, block_k):
        b, heads, d = 2, 4, 32
        qkv = _rand(rng, b, s, 3 * heads * d)
        out = flash_attention_fused_qkv(
            qkv, num_heads=heads, block_q=block_q, block_k=block_k,
            interpret=INTERPRET,
        )
        q, k, v = _split_heads(qkv, heads)
        ref = attention_reference(q, k, v)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_kv_len_masking(self, rng):
        b, heads, s, d = 2, 8, 256, 16
        qkv = _rand(rng, b, s, 3 * heads * d)
        kv_len = jnp.asarray([100, 256], jnp.int32)
        out = flash_attention_fused_qkv(
            qkv, kv_len=kv_len, num_heads=heads, block_q=128, block_k=128,
            interpret=INTERPRET,
        )
        q, k, v = _split_heads(qkv, heads)
        ref = attention_reference(q, k, v, kv_len=kv_len)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_decomposed_rel_pos_bias(self, rng):
        """Global mode with Kh·Kw == S and multi-row key tiles."""
        b, heads, d = 2, 4, 32
        kh = kw = 16
        s = kh * kw
        qkv = _rand(rng, b, s, 3 * heads * d)
        bh = _rand(rng, b, heads, s, kh) * 0.3
        bw = _rand(rng, b, heads, s, kw) * 0.3
        pair = 128 // d
        out = flash_attention_fused_qkv(
            qkv, bias_h=_pack_pairs(bh, pair), bias_w=_pack_pairs(bw, pair),
            num_heads=heads, block_q=128, block_k=64, interpret=INTERPRET,
        )
        q, k, v = _split_heads(qkv, heads)
        dense = (
            bh[..., :, None] + bw[..., None, :]
        ).reshape(b, heads, s, s)
        ref = attention_reference(q, k, v, bias=dense)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("schedule", ["skew", "twolevel"])
    def test_schedules_match_base(self, rng, schedule):
        """Issue-order schedules (skew / two-level k tiling) are program-
        order transforms of the same online softmax: same oracle numerics
        as the base schedule (twolevel takes more, smaller online-softmax
        steps, so equality is to flash tolerance, not bitwise)."""
        b, heads, d = 2, 4, 64
        kh = kw = 16
        s = kh * kw
        qkv = _rand(rng, b, s, 3 * heads * d)
        bh = _rand(rng, b, heads, s, kh) * 0.3
        bw = _rand(rng, b, heads, s, kw) * 0.3
        pair = 128 // d * 2            # _head_group prefers 4-head groups
        kw_args = dict(
            bias_h=_pack_pairs(bh, pair), bias_w=_pack_pairs(bw, pair),
            num_heads=heads, block_q=128, block_k=256, interpret=INTERPRET,
        )
        out = flash_attention_fused_qkv(qkv, schedule=schedule, **kw_args)
        base = flash_attention_fused_qkv(qkv, schedule="base", **kw_args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=2e-5, rtol=2e-5)
        q, k, v = _split_heads(qkv, heads)
        dense = (bh[..., :, None] + bw[..., None, :]).reshape(b, heads, s, s)
        ref = attention_reference(q, k, v, bias=dense)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_schedule_twolevel_with_kv_len(self, rng):
        b, heads, s, d = 2, 8, 512, 16
        qkv = _rand(rng, b, s, 3 * heads * d)
        kv_len = jnp.asarray([300, 512], jnp.int32)
        out = flash_attention_fused_qkv(
            qkv, kv_len=kv_len, num_heads=heads, block_q=256, block_k=256,
            schedule="twolevel", interpret=INTERPRET,
        )
        q, k, v = _split_heads(qkv, heads)
        ref = attention_reference(q, k, v, kv_len=kv_len)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_nomax_matches_base(self, rng):
        """The unnormalised-exponential path (running max dropped) is the
        same softmax up to rounding whenever logits stay far below the
        exp2 overflow bound — oracle equality on the SAM-global bias
        config, with multiple kv steps exercising the rescale-free
        accumulation."""
        b, heads, d = 2, 4, 64
        kh = kw = 16
        s = kh * kw
        qkv = _rand(rng, b, s, 3 * heads * d)
        bh = _rand(rng, b, heads, s, kh) * 0.3
        bw = _rand(rng, b, heads, s, kw) * 0.3
        pair = 128 // d * 2
        kw_args = dict(
            bias_h=_pack_pairs(bh, pair), bias_w=_pack_pairs(bw, pair),
            num_heads=heads, block_q=128, block_k=128, interpret=INTERPRET,
        )
        out = flash_attention_fused_qkv(qkv, nomax=True, **kw_args)
        base = flash_attention_fused_qkv(qkv, nomax=False, **kw_args)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=2e-5, rtol=2e-5)

    def test_nomax_with_kv_len_and_bf16(self, rng):
        """Padding masks still zero out under nomax (exp2(-inf·log2e)=0),
        and the bf16 score pipeline stays within flash tolerance."""
        b, heads, s, d = 2, 8, 256, 16
        qkv = _rand(rng, b, s, 3 * heads * d)
        kv_len = jnp.asarray([100, 256], jnp.int32)
        out = flash_attention_fused_qkv(
            qkv, kv_len=kv_len, num_heads=heads, block_q=128, block_k=128,
            nomax=True, interpret=INTERPRET,
        )
        q, k, v = _split_heads(qkv, heads)
        ref = attention_reference(q, k, v, kv_len=kv_len)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        qkv16 = qkv.astype(jnp.bfloat16)
        out16 = flash_attention_fused_qkv(
            qkv16, num_heads=heads, block_q=128, block_k=128,
            nomax=True, interpret=INTERPRET,
        )
        assert out16.dtype == jnp.bfloat16
        ref16 = attention_reference(*_split_heads(qkv16, heads))
        ref16 = ref16.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(
            np.asarray(out16, np.float32), np.asarray(ref16, np.float32),
            atol=2e-2, rtol=2e-2,
        )

    def test_nomax_window_mode(self, rng):
        """Window mode drops the row max under nomax — same softmax up to
        rounding, including the cross-window block-diagonal mask."""
        b, heads, d = 4, 2, 64
        wt = 128
        s = 256   # 2 windows per block
        qkv = _rand(rng, b, s, 3 * heads * d)
        out = flash_attention_fused_qkv(
            qkv, num_heads=heads, window_tokens=wt, block_q=256,
            block_k=256, nomax=True, interpret=INTERPRET,
        )
        base = flash_attention_fused_qkv(
            qkv, num_heads=heads, window_tokens=wt, block_q=256,
            block_k=256, nomax=False, interpret=INTERPRET,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=2e-5, rtol=2e-5)

    def test_unknown_schedule_raises(self, rng):
        qkv = _rand(rng, 1, 256, 3 * 2 * 64)
        with pytest.raises(ValueError, match="unknown schedule"):
            flash_attention_fused_qkv(
                qkv, num_heads=2, schedule="bogus", interpret=INTERPRET)

    def test_unknown_schedule_raises_in_window_mode(self, rng):
        """Window mode doesn't USE the schedule, but a typo'd value
        (or VDR_FLASH_SCHEDULE) must not pass silently on one path and
        raise on the other."""
        qkv = _rand(rng, 2, 256, 3 * 2 * 64)
        with pytest.raises(ValueError, match="unknown schedule"):
            flash_attention_fused_qkv(
                qkv, num_heads=2, window_tokens=128, block_q=256,
                block_k=256, schedule="bogus", interpret=INTERPRET)

    def test_bf16(self, rng):
        b, heads, s, d = 1, 2, 256, 64
        qkv = _rand(rng, b, s, 3 * heads * d).astype(jnp.bfloat16)
        out = flash_attention_fused_qkv(
            qkv, num_heads=heads, block_q=128, block_k=128,
            interpret=INTERPRET,
        )
        assert out.dtype == jnp.bfloat16
        q, k, v = _split_heads(qkv, heads)
        ref = attention_reference(q, k, v)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, heads * d)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


class TestFusedQKVWindowed:
    def test_matches_per_window_attention(self, rng):
        """Unpadded block-diagonal windows (e.g. SAM's 196-token 14x14)."""
        b, heads, d = 2, 4, 32
        ky, kx = 3, 5                   # non-square, non-pow2 window grid
        win = ky * kx                   # 15 tokens per window
        n_win = 8                       # per batch row: 2 blocks of 4
        g = 4
        s = n_win * win
        qkv = _rand(rng, b, s, 3 * heads * d)
        bias_h = _rand(rng, b, heads, s, ky) * 0.3
        bias_w = _rand(rng, b, heads, s, kx) * 0.3
        pair = 128 // d
        out = flash_attention_fused_qkv(
            qkv, bias_h=_pack_pairs(bias_h, pair),
            bias_w=_pack_pairs(bias_w, pair), num_heads=heads,
            window_tokens=win, block_q=g * win, block_k=g * win,
            interpret=INTERPRET,
        )
        q, k, v = _split_heads(qkv, heads)
        for w_idx in range(n_win):
            lo = w_idx * win
            sl = slice(lo, lo + win)
            dense = (
                bias_h[:, :, sl, :, None] + bias_w[:, :, sl, None, :]
            ).reshape(b, heads, win, win)
            ref = attention_reference(
                q[:, :, sl], k[:, :, sl], v[:, :, sl], bias=dense
            )
            ref = ref.transpose(0, 2, 1, 3).reshape(b, win, heads * d)
            np.testing.assert_allclose(
                np.asarray(out[:, sl]), np.asarray(ref),
                atol=2e-5, rtol=2e-5,
                err_msg=f"window {w_idx}",
            )

    def test_no_bias_windows(self, rng):
        b, heads, d, win, n_win = 1, 8, 16, 32, 4
        s = n_win * win
        qkv = _rand(rng, b, s, 3 * heads * d)
        out = flash_attention_fused_qkv(
            qkv, num_heads=heads, window_tokens=win,
            block_q=2 * win, block_k=2 * win, interpret=INTERPRET,
        )
        q, k, v = _split_heads(qkv, heads)
        for w_idx in range(n_win):
            sl = slice(w_idx * win, (w_idx + 1) * win)
            ref = attention_reference(q[:, :, sl], k[:, :, sl], v[:, :, sl])
            ref = ref.transpose(0, 2, 1, 3).reshape(b, win, heads * d)
            np.testing.assert_allclose(
                np.asarray(out[:, sl]), np.asarray(ref),
                atol=2e-5, rtol=2e-5,
            )

    def test_window_must_divide_block(self, rng):
        qkv = _rand(rng, 1, 60, 3 * 8 * 16)
        with pytest.raises(ValueError, match="must divide block"):
            flash_attention_fused_qkv(
                qkv, num_heads=8, window_tokens=7, block_q=60, block_k=60,
                interpret=INTERPRET,
            )

    def test_incompatible_head_layout_raises(self, rng):
        # 3 heads of 32 lanes cannot tile into 128-lane blocks
        qkv = _rand(rng, 1, 64, 3 * 3 * 32)
        with pytest.raises(ValueError, match="128-lane"):
            flash_attention_fused_qkv(
                qkv, num_heads=3, interpret=INTERPRET,
            )

    @pytest.mark.parametrize("gsz", [2, 4])
    def test_window_batch_matches_ungrouped(self, rng, gsz):
        """window_batch=G batches G windows per grid step (leading block
        dim); output must be bit-identical to the G=1 schedule."""
        b, heads, d = 4, 4, 32
        ky, kx = 3, 5
        win = ky * kx
        n_win = 4
        s = n_win * win
        qkv = _rand(rng, b, s, 3 * heads * d)
        bias_h = _rand(rng, b, heads, s, ky) * 0.3
        bias_w = _rand(rng, b, heads, s, kx) * 0.3
        pair = 128 // d
        kwargs = dict(
            bias_h=_pack_pairs(bias_h, pair),
            bias_w=_pack_pairs(bias_w, pair), num_heads=heads,
            window_tokens=win, block_q=2 * win, block_k=2 * win,
            interpret=INTERPRET,
        )
        base = flash_attention_fused_qkv(qkv, window_batch=1, **kwargs)
        grouped = flash_attention_fused_qkv(qkv, window_batch=gsz, **kwargs)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(grouped))

    def test_window_batch_must_divide_batch(self, rng):
        qkv = _rand(rng, 3, 64, 3 * 8 * 16)
        with pytest.raises(ValueError, match="window_batch"):
            flash_attention_fused_qkv(
                qkv, num_heads=8, window_tokens=32, window_batch=2,
                block_q=64, block_k=64, interpret=INTERPRET,
            )

    def test_bias_grid_must_match_window(self, rng):
        heads, d, win = 8, 16, 16
        qkv = _rand(rng, 1, 64, 3 * heads * d)
        bias_h = _rand(rng, 1, heads // 8, 64, 8 * 3)
        bias_w = _rand(rng, 1, heads // 8, 64, 8 * 3)
        with pytest.raises(ValueError, match="per-window bias grid"):
            flash_attention_fused_qkv(
                qkv, bias_h=bias_h, bias_w=bias_w, num_heads=heads,
                window_tokens=win, block_q=64, block_k=64,
                interpret=INTERPRET,
            )


class TestFusedViTModel:
    def test_sam_style_encoder_fused_vs_oracle(self, rng):
        """Full mini SAM-style encoder: fused-QKV flash path must match the
        XLA oracle path (TPU-legal head layout: D=64, even heads)."""
        import jax.numpy as jnp

        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import ViTDense, ViTDenseConfig

        cfg = ViTDenseConfig(
            name="sam_fused_test",
            image_size=64,
            patch_size=8,
            width=128,
            depth=3,
            num_heads=2,
            window_size=4,
            global_indexes=(1,),
            use_rel_pos=True,
            neck_channels=32,
        )
        images = jnp.asarray(
            rng.uniform(size=(2, 64, 64, 3)).astype("float32"))
        oracle = ViTDense(cfg, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), images)
        want = oracle.apply(params, images)
        flash = ViTDense(cfg, policy=PARITY, use_flash=True)
        # window grids (4x4=16 tokens) take the fused window path; the
        # 8x8=64-token global layer takes the fused window path too
        # (s <= 1024); both must agree with the oracle
        got = flash.apply(params, images)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
