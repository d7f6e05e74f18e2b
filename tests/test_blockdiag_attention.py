"""Block-diagonal multi-window flash attention (window_tokens mode)."""

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


class TestBlockDiagonalWindows:
    def test_matches_per_window_attention(self, rng):
        """G windows batched per block must equal attending each window
        separately."""
        g, win, kh, kw = 2, 64, 8, 8   # padded 8x8 window grids
        b, heads, d = 3, 2, 32
        n_win = 4                       # windows per (b, h): 2 blocks of G=2
        sq = n_win * win
        q, k, v = (_rand(rng, b, heads, sq, d) for _ in range(3))
        # per-window bias layout: each query row carries its OWN window's
        # kh grid-row terms; the kernel expands window-locally
        bias_h_win = _rand(rng, b, heads, sq, kh) * 0.3
        bias_w = _rand(rng, b, heads, sq, kw) * 0.3
        block = g * win
        out = flash_attention(
            q, k, v,
            bias_h=bias_h_win, bias_w=bias_w,
            kv_grid=(6, 6),              # valid 6x6 of the padded 8x8
            window_tokens=win,
            block_q=block, block_k=block,
            interpret=INTERPRET,
        )

        # reference: per-window dense attention with the same masks
        ky, kx = np.divmod(np.arange(win), kw)
        valid = (ky < 6) & (kx < 6)
        for w_idx in range(n_win):
            lo = w_idx * win
            qs = q[:, :, lo:lo + win]
            ks = k[:, :, lo:lo + win]
            vs = v[:, :, lo:lo + win]
            dense = (
                bias_h_win[:, :, lo:lo + win, :, None]
                + bias_w[:, :, lo:lo + win, None, :]
            ).reshape(b, heads, win, win)
            dense = jnp.where(jnp.asarray(valid)[None, None, None, :],
                              dense, -1e30)
            ref = attention_reference(qs, ks, vs, bias=dense)
            np.testing.assert_allclose(
                np.asarray(out[:, :, lo:lo + win]), np.asarray(ref),
                atol=3e-5,
                err_msg=f"window {w_idx}",
            )

    def test_model_grouped_path_matches_oracle(self, rng):
        """A 14×14-window SAM-style config routes through
        _flash_grouped (sq_pad == sk_pad == 256, G=4) and must match the
        XLA oracle."""
        import dataclasses

        from vit_deep_radiomics_tpu.core.precision import PARITY
        from vit_deep_radiomics_tpu.models.vit import SAM_VIT_B, ViTDense

        cfg = dataclasses.replace(
            SAM_VIT_B, image_size=224, width=96, depth=2, num_heads=3,
            window_size=14, global_indexes=(1,), neck_channels=32,
        )
        imgs = jnp.asarray(
            rng.uniform(size=(5, 224, 224, 3)).astype(np.float32))
        oracle = ViTDense(cfg, policy=PARITY, use_flash=False)
        params = oracle.init(jax.random.PRNGKey(0), imgs)
        with jax.default_matmul_precision("highest"):
            ref = oracle.apply(params, imgs)
            out = ViTDense(cfg, policy=PARITY, use_flash=True).apply(
                params, imgs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3
        )

    def test_requires_kv_grid(self, rng):
        q = _rand(rng, 1, 1, 128, 16)
        with pytest.raises(ValueError, match="requires kv_grid"):
            flash_attention(q, q, q, window_tokens=64,
                            interpret=INTERPRET)

    def test_window_rejects_kv_len(self, rng):
        # in window mode the kv tile follows the q tile (kv program id
        # stays 0), so a global kv_len mask would compare tile-local
        # columns against a global count — must be rejected, not
        # silently mis-masked
        import jax.numpy as jnp
        q = _rand(rng, 1, 1, 128, 16)
        bh = _rand(rng, 1, 1, 128, 8)
        bw = _rand(rng, 1, 1, 128, 8)
        with pytest.raises(ValueError, match="kv_len is not supported"):
            flash_attention(q, q, q, bias_h=bh, bias_w=bw,
                            kv_len=jnp.array([100]),
                            kv_grid=(8, 8), window_tokens=64,
                            block_q=128, block_k=128, interpret=INTERPRET)

    def test_window_must_divide_block(self, rng):
        q = _rand(rng, 1, 1, 128, 16)
        bh = _rand(rng, 1, 1, 128, 16)
        bw = _rand(rng, 1, 1, 128, 8)
        with pytest.raises(ValueError, match="must divide"):
            flash_attention(q, q, q, bias_h=bh, bias_w=bw,
                            kv_grid=(6, 6), window_tokens=48,
                            block_q=128, block_k=128, interpret=INTERPRET)
