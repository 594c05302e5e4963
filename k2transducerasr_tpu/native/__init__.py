"""ctypes loader for the native audio library (C++, C ABI).

The library is built on demand with g++ and cached next to the source; if
the toolchain or build is unavailable everything falls back to the numpy
implementations (audio/wav.py, audio/resample.py) — the native path must be
behaviorally identical (tests/test_native.py asserts parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audio_native.cpp")
_LIB = os.path.join(_HERE, "libk2taudio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.k2t_wav_decode.restype = ctypes.c_longlong
        lib.k2t_wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ]
        lib.k2t_resample_linear.restype = ctypes.c_longlong
        lib.k2t_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.k2t_rb_create.restype = ctypes.c_void_p
        lib.k2t_rb_create.argtypes = [ctypes.c_longlong]
        lib.k2t_rb_free.argtypes = [ctypes.c_void_p]
        lib.k2t_rb_push.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong
        ]
        lib.k2t_rb_size.restype = ctypes.c_longlong
        lib.k2t_rb_size.argtypes = [ctypes.c_void_p]
        lib.k2t_rb_window.restype = ctypes.c_int
        lib.k2t_rb_window.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong
        ]
        lib.k2t_rb_advance.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# Media decode/encode library (separate .so: links the host ffmpeg stack —
# libavformat/avcodec/swresample — so the core lib stays dependency-free)
# ---------------------------------------------------------------------------

_MEDIA_SRC = os.path.join(_HERE, "media_native.cpp")
_MEDIA_LIB = os.path.join(_HERE, "libk2tmedia.so")
_media_lib = None
_media_tried = False


def _build_media() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17", _MEDIA_SRC,
                "-o", _MEDIA_LIB,
                "-lavformat", "-lavcodec", "-lavutil", "-lswresample",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_media_lib():
    """Load (building if needed) the ffmpeg-backed media library; None if the
    host has no ffmpeg dev stack."""
    global _media_lib, _media_tried
    with _lock:
        if _media_lib is not None or _media_tried:
            return _media_lib
        _media_tried = True
        if (
            not os.path.exists(_MEDIA_LIB)
            or os.path.getmtime(_MEDIA_LIB) < os.path.getmtime(_MEDIA_SRC)
        ):
            if not _build_media():
                return None
        try:
            lib = ctypes.CDLL(_MEDIA_LIB)
        except OSError:
            return None
        lib.k2t_media_decode.restype = ctypes.c_void_p
        lib.k2t_media_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.k2t_media_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.k2t_media_free.argtypes = [ctypes.c_void_p]
        lib.k2t_media_encode.restype = ctypes.c_int
        lib.k2t_media_encode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong, ctypes.c_int,
        ]
        _media_lib = lib
        return _media_lib


def media_available() -> bool:
    return get_media_lib() is not None


def media_decode(path: str):
    """Decode any host-codec-supported media file -> (float32 mono, rate),
    or None if the media stack is unavailable or the file can't be decoded."""
    lib = get_media_lib()
    if lib is None:
        return None
    n = ctypes.c_longlong(0)
    rate = ctypes.c_int(0)
    h = lib.k2t_media_decode(
        os.fsencode(path), ctypes.byref(n), ctypes.byref(rate)
    )
    if not h:
        return None
    try:
        out = np.empty(n.value, np.float32)
        lib.k2t_media_copy(h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    finally:
        lib.k2t_media_free(h)
    return out, int(rate.value)


def media_encode(path: str, pcm: np.ndarray, rate: int) -> bool:
    """Encode mono float32 PCM to `path` (codec from extension).  Fixture
    and examples helper.  Returns False if unavailable or encode failed."""
    lib = get_media_lib()
    if lib is None:
        return False
    x = np.ascontiguousarray(pcm, np.float32)
    rc = lib.k2t_media_encode(
        os.fsencode(path),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(x), rate,
    )
    return rc == 0


# ---------------------------------------------------------------------------
# Python-facing wrappers
# ---------------------------------------------------------------------------


def wav_decode(data: bytes):
    """Native wav decode -> (samples float32 mono, rate) or None on
    fallback/unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    rate = ctypes.c_int(0)
    n = lib.k2t_wav_decode(data, len(data), None, ctypes.byref(rate))
    if n < 0:
        return None
    out = np.empty(n, np.float32)
    lib.k2t_wav_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(rate),
    )
    return out, int(rate.value)


def resample_linear(x: np.ndarray, src: int, dst: int):
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n_out = lib.k2t_resample_linear(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), src, dst, None
    )
    out = np.empty(n_out, np.float32)
    lib.k2t_resample_linear(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), src, dst,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


class RingBuffer:
    """Native per-stream sample buffer: push samples, peek fixed windows,
    advance by hop — O(1) amortized, no per-chunk numpy reallocation."""

    def __init__(self, capacity: int = 1 << 16):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.k2t_rb_create(capacity)

    def push(self, samples: np.ndarray) -> None:
        x = np.ascontiguousarray(samples, np.float32)
        self._lib.k2t_rb_push(
            self._h, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x)
        )

    def __len__(self) -> int:
        return int(self._lib.k2t_rb_size(self._h))

    def window(self, win: int):
        out = np.empty(win, np.float32)
        rc = self._lib.k2t_rb_window(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), win
        )
        return out if rc == 0 else None

    def advance(self, hop: int) -> None:
        self._lib.k2t_rb_advance(self._h, hop)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.k2t_rb_free(h)
            self._h = None
