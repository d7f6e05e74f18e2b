"""ctypes bindings for the native host-side kernels.

The trainer's per-item data path (mask resize + 3D positional encoding +
masked token gather) is host-bound Python in the reference
(train_models.py:143-182, recomputed every step).  ``native/token_pack.cpp``
implements it as an OpenMP C++ kernel with a plain C ABI (pybind11 is not
in this image), auto-built with g++ on first use; everything degrades to
the numpy implementation when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = [
    "available", "build", "pack_tokens", "mask_features",
    "lzf_available", "lzf_compress_batch", "lzf_decompress",
]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libtoken_pack.so"
_LZF_PATH = _NATIVE_DIR / "build" / "liblzf_codec.so"
_lib = None
_load_failed = False
_lzf = None
_lzf_load_failed = False


def build(quiet: bool = True) -> bool:
    """Compile the shared library (idempotent). Returns success."""
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB_PATH.exists() and not build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None
    c_long = ctypes.c_long
    fptr = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    dptr = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.count_tokens.restype = c_long
    lib.count_tokens.argtypes = [fptr] + [c_long] * 5
    lib.pack_tokens.restype = c_long
    lib.pack_tokens.argtypes = (
        [fptr, fptr] + [c_long] * 6 + [dptr, dptr,
                                       ctypes.c_double, ctypes.c_double,
                                       fptr, c_long]
    )
    lib.mask_features.restype = None
    lib.mask_features.argtypes = [fptr, fptr] + [c_long] * 6 + [fptr]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def pack_tokens(
    features: np.ndarray,     # (S, H, W, D) float32
    masks: np.ndarray,        # (S, Hm, Wm) float32 (image-res masks)
    spatial_res: np.ndarray,  # (3,)
    noise: np.ndarray,        # (3,)
    pe_scale: float = 10000.0,
    pe_div: float = 4.0,
) -> np.ndarray | None:
    """(n_tokens, D) packed tokens, or None when the library is absent."""
    lib = _load()
    if lib is None:
        return None
    features = np.ascontiguousarray(features, np.float32)
    masks = np.ascontiguousarray(masks, np.float32)
    s, h, w, d = features.shape
    hm, wm = masks.shape[1:3]
    n = lib.count_tokens(masks, s, hm, wm, h, w)
    out = np.empty((max(1, n), d), np.float32)
    wrote = lib.pack_tokens(
        features, masks, s, h, w, d, hm, wm,
        np.ascontiguousarray(spatial_res, np.float64),
        np.ascontiguousarray(noise, np.float64),
        float(pe_scale), float(pe_div), out, n,
    )
    if wrote < 0:
        raise RuntimeError("token buffer undersized (count/pack mismatch)")
    return out[:wrote]


def _load_lzf():
    global _lzf, _lzf_load_failed
    if _lzf is not None or _lzf_load_failed:
        return _lzf
    if not _LZF_PATH.exists() and not build():
        _lzf_load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LZF_PATH))
    except OSError:
        _lzf_load_failed = True
        return None
    i64 = ctypes.c_int64
    lib.vdr_lzf_compress.restype = i64
    lib.vdr_lzf_compress.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_void_p, i64]
    lib.vdr_lzf_decompress.restype = i64
    lib.vdr_lzf_decompress.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_void_p, i64]
    lib.vdr_lzf_compress_batch.restype = None
    lib.vdr_lzf_compress_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(i64),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(i64), i64]
    _lzf = lib
    return _lzf


def lzf_available() -> bool:
    return _load_lzf() is not None


def lzf_compress_batch(
    buffers: "list[np.ndarray]",
) -> "list[bytes | None] | None":
    """LZF-compress chunks in parallel (h5py-lzf-filter-compatible).

    Returns one ``bytes`` per buffer, or ``None`` for incompressible
    buffers (caller writes the raw chunk with the filter masked out,
    matching the h5py lzf filter's own behaviour) — or ``None`` overall
    when the native library is unavailable.
    """
    lib = _load_lzf()
    if lib is None:
        return None
    n = len(buffers)
    if n == 0:
        return []
    raw = [np.ascontiguousarray(b) for b in buffers]
    sizes = (ctypes.c_int64 * n)(*[b.nbytes for b in raw])
    outs = [ctypes.create_string_buffer(max(1, b.nbytes - 1)) for b in raw]
    in_ptrs = (ctypes.c_void_p * n)(
        *[b.ctypes.data_as(ctypes.c_void_p).value for b in raw])
    out_ptrs = (ctypes.c_void_p * n)(
        *[ctypes.addressof(o) for o in outs])
    out_sizes = (ctypes.c_int64 * n)()
    lib.vdr_lzf_compress_batch(in_ptrs, sizes, out_ptrs, out_sizes, n)
    return [
        outs[i].raw[:out_sizes[i]] if out_sizes[i] > 0 else None
        for i in range(n)
    ]


def lzf_decompress(data: bytes, out_nbytes: int) -> bytes | None:
    """Decode one LZF stream (tests / tooling), or None if unavailable."""
    lib = _load_lzf()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(out_nbytes)
    got = lib.vdr_lzf_decompress(data, len(data), out, out_nbytes)
    if got != out_nbytes:
        raise ValueError(
            f"corrupt LZF stream: decoded {got} of {out_nbytes} bytes")
    return out.raw


def mask_features(features: np.ndarray, masks: np.ndarray) -> np.ndarray | None:
    """(S, H, W, D) features ⊙ nearest-resized masks, or None."""
    lib = _load()
    if lib is None:
        return None
    features = np.ascontiguousarray(features, np.float32)
    masks = np.ascontiguousarray(masks, np.float32)
    s, h, w, d = features.shape
    hm, wm = masks.shape[1:3]
    out = np.empty_like(features)
    lib.mask_features(features, masks, s, h, w, d, hm, wm, out)
    return out
