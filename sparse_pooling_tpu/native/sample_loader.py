"""ctypes binding for the native per-frame sample loader.

Loads ``native/sample_loader/libsample_loader.so`` (building it with make on
first use when a toolchain is present) and exposes the two host-hot loader
loops with the SAME semantics as their numpy/PIL twins:

- :func:`decode_png_canvas` == PIL open/convert("RGB")/asarray + memcpy into
  the zeroed canvas (``data.dataset.load_sample`` device-resize path)
- :func:`load_points` == ``data.pointcloud.load_points_filtered``

Callers fall back to the twins when the library can't build (no toolchain /
no libpng) or when a frame hits an unsupported case (raw image larger than
the canvas, point-cap overflow) — so the native path is a pure accelerator,
never a behavior change.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "sample_loader")
_SO = os.path.join(_DIR, "libsample_loader.so")
_lib = None
_load_failed = False


def build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, text=True
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO) and not build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _load_failed = True
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.spt_decode_png_canvas.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.spt_decode_png_canvas.restype = ctypes.c_int
    lib.spt_load_points.argtypes = [
        ctypes.c_char_p, f32p, f32p, ctypes.c_int, ctypes.c_int, f32p,
        f32p, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.spt_load_points.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_png_canvas(
    path: str, canvas_h: int, canvas_w: int, out: Optional[np.ndarray] = None
) -> Optional[Tuple[np.ndarray, Tuple[int, int]]]:
    """Decode ``path`` into a zeroed canvas [H, W, 3] u8 (raw content
    top-left). Returns (canvas, (raw_h, raw_w)), or None when the library is
    unavailable, the image exceeds the canvas, or decode fails — callers
    fall back to the PIL path.

    ``out``: caller-provided ZERO-FILLED canvas (e.g. one row of a batch
    array) decoded into in place — the eval loader's per-frame canvas
    alloc + batch np.stack memcpy was the single largest host cost of the
    3.7k-frame TPU sweep (55 s of CPU, measured), so the decoder writes
    straight into the batch array instead. Must be C-contiguous uint8
    [canvas_h, canvas_w, 3]; only the raw-image region is written."""

    lib = _load()
    if lib is None:
        return None
    if out is not None:
        canvas = out
        assert canvas.shape == (canvas_h, canvas_w, 3)
        assert canvas.dtype == np.uint8 and canvas.flags.c_contiguous
    else:
        canvas = np.zeros((canvas_h, canvas_w, 3), np.uint8)
    rh, rw = ctypes.c_int(), ctypes.c_int()
    rc = lib.spt_decode_png_canvas(
        path.encode(), canvas, canvas_h, canvas_w,
        ctypes.byref(rh), ctypes.byref(rw),
    )
    if rc != 0:
        return None
    return canvas, (rh.value, rw.value)


def load_points(
    velo_path: str,
    velo_to_rect: np.ndarray,  # [3+, 4] f64/f32 (FrameCalib.velo_to_rect)
    p2: np.ndarray,  # [3, 4]
    image_shape: Tuple[int, int],
    extents,  # AreaExtents
    cap: int = 1 << 18,
) -> Optional[np.ndarray]:
    """Fused scan load + frustum + area-extents filter -> (N, 3) f32 in scan
    order. Returns None when the library is unavailable, IO fails, or more
    than ``cap`` points survive (the numpy twin then applies its seeded
    subsample to the full set)."""

    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(velo_to_rect[:3], np.float32)
    p = np.ascontiguousarray(p2, np.float32)
    ext = np.array(
        [extents.x_min, extents.x_max, extents.y_min, extents.y_max,
         extents.z_min, extents.z_max],
        np.float32,
    )
    out = np.empty((cap, 3), np.float32)
    n = ctypes.c_int()
    rc = lib.spt_load_points(
        velo_path.encode(), m, p, image_shape[0], image_shape[1], ext,
        out, cap, ctypes.byref(n),
    )
    if rc != 0 or n.value > cap:
        return None
    return out[: n.value]
