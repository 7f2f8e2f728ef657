"""ctypes binding for the native ingest kernels, with numpy fallbacks.

`window_normalize_collate` fuses the whole host-side batch-assembly path of
the style datasets — window crop, (x - mean) / std, zero-pad, (T, C) ->
(C, 1, T) transpose, batch stack (dataset.py:522-553 + tensors.py:90-97
semantics, as implemented in data/datasets.py / data/collate.py) — into one
multithreaded C++ pass. The numpy fallback is the exact same math, so every
caller works without a toolchain; parity is tested (tests/test_native.py).
"""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

_lib = None
_lib_tried = False


def _load(allow_build: bool = True):
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    if not allow_build:
        # only use an already-built, UP-TO-DATE library: callers on
        # otherwise pure-Python paths (e.g. post/bvh.py) must not spawn a
        # g++ build as a side effect of their first call — including the
        # rebuild build() triggers when the source is newer than the
        # binary. Don't mark tried — a later opt-in caller may still build.
        import os

        from motionstyle.native.build import LIB, SRC

        if not os.path.exists(LIB):
            return None
        if os.path.exists(SRC) and \
                os.path.getmtime(SRC) > os.path.getmtime(LIB):
            return None
    _lib_tried = True
    from motionstyle.native.build import build

    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    pf = ctypes.POINTER(ctypes.c_float)
    pi64 = ctypes.POINTER(ctypes.c_int64)
    lib.msn_window_normalize_collate.argtypes = [
        ctypes.POINTER(pf), pi64, pi64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, pf, pf, pf, ctypes.c_int32]
    lib.msn_window_normalize_collate.restype = None
    lib.msn_lengths_to_mask.argtypes = [pi64, ctypes.c_int64, ctypes.c_int64, pf]
    lib.msn_lengths_to_mask.restype = None
    lib.msn_parse_floats.argtypes = [ctypes.c_char_p, ctypes.c_int64, pf,
                                     ctypes.c_int64]
    lib.msn_parse_floats.restype = ctypes.c_int64
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _as_f32_c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def window_normalize_collate(motions: Sequence[np.ndarray],
                             starts: Sequence[int], m_lens: Sequence[int],
                             max_len: int, mean: np.ndarray, std: np.ndarray,
                             nthreads: int = 0,
                             force_numpy: bool = False) -> np.ndarray:
    """motions: per-item (len_i, C) float arrays; crop [start, start+m_len),
    normalize, pad to max_len, return (B, C, 1, max_len) float32."""
    B = len(motions)
    mean = _as_f32_c(mean)
    C = mean.shape[0]
    inv_std = _as_f32_c(1.0 / np.asarray(std, np.float64))
    lib = None if force_numpy else _load()
    if lib is None:
        out = np.zeros((B, C, max_len), np.float32)
        for b, (m, s, l) in enumerate(zip(motions, starts, m_lens)):
            win = np.asarray(m[s:s + l], np.float32)
            out[b, :, :l] = ((win - mean) * inv_std).T
        return out[:, :, None, :]

    mats = [_as_f32_c(m) for m in motions]
    ptrs = (ctypes.POINTER(ctypes.c_float) * B)(
        *[m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for m in mats])
    starts64 = np.ascontiguousarray(starts, np.int64)
    lens64 = np.ascontiguousarray(m_lens, np.int64)
    out = np.empty((B, C, 1, max_len), np.float32)
    lib.msn_window_normalize_collate(
        ptrs,
        starts64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, C, max_len,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inv_std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(nthreads))
    return out


def parse_floats(text: str, force_numpy: bool = False,
                 allow_build: bool = True) -> np.ndarray:
    """Parse whitespace-separated floats (BVH MOTION tables) in one native
    strtof pass — no per-token Python strings. Fallback: numpy's own string
    parsing via text.split(). The native pass STOPS at the first non-numeric
    byte — callers must validate the returned count against the expected
    token count (the fallback raises instead). allow_build=False uses the
    native library only if it is already built (no g++ side effect)."""
    lib = None if force_numpy else _load(allow_build)
    if lib is None:
        return np.array(text.split(), np.float32) if text.strip() else \
            np.empty((0,), np.float32)
    raw = text.encode()
    cap = max(1, len(raw) // 2 + 1)  # a float needs >= 2 bytes incl. space
    out = np.empty((cap,), np.float32)
    n = lib.msn_parse_floats(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
    return out[:n].copy()


def lengths_to_mask(lengths: Sequence[int], max_len: int,
                    force_numpy: bool = False) -> np.ndarray:
    """(B, 1, 1, T) float32 broadcast mask (collate.py:15 semantics)."""
    lib = None if force_numpy else _load()
    lens = np.ascontiguousarray(lengths, np.int64)
    B = lens.shape[0]
    if lib is None:
        from motionstyle.data.collate import lengths_to_mask as np_mask

        return np_mask(lens, max_len)[:, None, None, :]
    out = np.empty((B, 1, 1, max_len), np.float32)
    lib.msn_lengths_to_mask(
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), B, max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
