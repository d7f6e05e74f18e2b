"""3D sin/cos positional encoding for voxel token sequences.

Vectorised parity implementation of the reference's
``positional_encoding_3d`` (/root/reference/src/train_models.py:30-44):
D//6 frequency bands; for band i, channels (2i, 2i+1) carry sin/cos of
x / scale^(6i/D), with the y and z copies offset by D//3 and 2·D//3.
Channels not covered by any band (e.g. 84, 169, 254, 255 for D=256)
stay zero, exactly as in the reference's zero-initialised buffer.

The reference recomputes this per training step on host inside
``Dataset.__getitem__`` (train_models.py:178); here it is a jitted,
batched device op fused into the token pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["positional_encoding_3d"]


def positional_encoding_3d(x, y, z, d: int, scale: float = 10000.0):
    """Encode (N,) voxel coordinates into (N, d) sin/cos features.

    Args:
        x, y, z: physical coordinates in mm, shape (N,) (any broadcastable
            leading shape works — the encoding is appended as a new last
            axis).
        d: embedding dim (the reference uses the classifier feature_dim,
            256).
        scale: frequency scale (ref default 10000).
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    n_bands = d // 6
    third = d // 3

    i = jnp.arange(n_bands, dtype=jnp.float32)
    inv_freq = scale ** (-6.0 * i / d)  # 1 / scale^(6i/d), shape (n_bands,)

    def sincos(coord):
        phase = coord[..., None] * inv_freq  # (..., n_bands)
        return jnp.sin(phase), jnp.cos(phase)

    sx, cx = sincos(x)
    sy, cy = sincos(y)
    sz, cz = sincos(z)

    out = jnp.zeros(x.shape + (d,), jnp.float32)
    idx = jnp.arange(n_bands) * 2
    out = out.at[..., idx].set(sx)
    out = out.at[..., idx + 1].set(cx)
    out = out.at[..., idx + third].set(sy)
    out = out.at[..., idx + 1 + third].set(cy)
    out = out.at[..., idx + 2 * third].set(sz)
    out = out.at[..., idx + 1 + 2 * third].set(cz)
    return out
