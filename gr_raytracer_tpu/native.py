"""ctypes bindings for the native host runtime (native/gr_native.cpp).

Builds the shared library with g++ on first use (cached next to the source);
every entry point has a pure-numpy fallback so the renderer works without a
toolchain. The native paths cover host-side hot spots: PNG/RGBE frame
encoding and the adaptive supersampler's splitmix64 jitter batches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgrnative.so")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                os.path.join(_NATIVE_DIR, "gr_native.cpp")
            ):
                subprocess.run(
                    ["make", "-s", "libgrnative.so"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
            lib.stratified_offsets.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64, f64p, f64p]
            lib.rgbe_encode.argtypes = [f32p, ctypes.c_int64, u8p]
            lib.png_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
            lib.png_encode.restype = ctypes.c_int64
            lib.trajectory_csv.argtypes = [i64p, f64p, f64p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
            lib.trajectory_csv.restype = ctypes.c_int64
            lib.png_decode_info.argtypes = [u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
            lib.png_decode_info.restype = ctypes.c_int64
            lib.png_decode.argtypes = [u8p, ctypes.c_int64, u8p]
            lib.png_decode.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def stratified_offsets(rows: np.ndarray, cols: np.ndarray, n: int):
    """Bit-exact splitmix64 stratified jitter; [P, n²] dx/dy (f64)."""
    lib = _load()
    if lib is None:
        from gr_raytracer_tpu.rendering.raytracer import stratified_sample_offsets

        return stratified_sample_offsets(np.asarray(rows), np.asarray(cols), n)
    p = len(rows)
    dx = np.empty((p, n * n), np.float64)
    dy = np.empty((p, n * n), np.float64)
    lib.stratified_offsets(
        np.ascontiguousarray(rows, np.int64),
        np.ascontiguousarray(cols, np.int64),
        p,
        n,
        dx,
        dy,
    )
    return dx, dy


def rgbe_encode(rgb: np.ndarray) -> np.ndarray:
    """[H, W, 3] float32 -> [H, W, 4] RGBE bytes."""
    lib = _load()
    h, w, _ = rgb.shape
    if lib is None:
        return None
    out = np.empty((h, w, 4), np.uint8)
    lib.rgbe_encode(np.ascontiguousarray(rgb, np.float32).reshape(-1), h * w, out.reshape(-1))
    return out


def png_encode(rgb: np.ndarray) -> bytes | None:
    """[H, W, 3] uint8 -> PNG bytes, or None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    h, w, _ = rgb.shape
    flat = np.ascontiguousarray(rgb, np.uint8).reshape(-1)
    cap = lib.png_encode(flat, w, h, None, 0)
    if cap < 0:
        return None
    buf = ctypes.create_string_buffer(int(cap))
    size = lib.png_encode(flat, w, h, ctypes.cast(buf, ctypes.c_void_p), cap)
    if size < 0:
        return None
    return buf.raw[:size]


def png_decode(data: bytes) -> np.ndarray | None:
    """PNG bytes -> [H, W, 4] RGBA8, or None if the native decoder can't
    handle this file (16-bit, interlaced, ...) or the lib is unavailable —
    callers fall back to PIL. Covers every reference texture
    (resources/*.png: 8-bit RGB/RGBA, interlace 0)."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    if lib.png_decode_info(buf, len(buf), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, 4), np.uint8)
    if lib.png_decode(buf, len(buf), out.reshape(-1)) != 0:
        return None
    return out


def trajectory_csv(steps: np.ndarray, affine: np.ndarray, cart: np.ndarray) -> str | None:
    """CSV text for a trajectory (i,t,tau,x,y,z), or None without the lib."""
    lib = _load()
    if lib is None:
        return None
    n = len(steps)
    cap = lib.trajectory_csv(
        np.ascontiguousarray(steps, np.int64),
        np.ascontiguousarray(affine, np.float64),
        np.ascontiguousarray(cart, np.float64).reshape(-1),
        n,
        None,
        0,
    )
    buf = ctypes.create_string_buffer(int(cap))
    size = lib.trajectory_csv(
        np.ascontiguousarray(steps, np.int64),
        np.ascontiguousarray(affine, np.float64),
        np.ascontiguousarray(cart, np.float64).reshape(-1),
        n,
        ctypes.cast(buf, ctypes.c_void_p),
        cap,
    )
    if size < 0:
        return None
    return buf.raw[:size].decode()
