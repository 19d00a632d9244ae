"""ctypes binding for the native KITTI prediction-row formatter.

Loads ``native/pred_format/libpred_format.so`` (building it with make on
first use when a toolchain is present) and exposes :func:`format_rows`,
which renders the writer's pre-stacked ``[N, 13]`` numeric block into the
full txt-file byte content — byte-identical to the Python ``%.6f`` path in
``runtime.predictions`` (both glibc snprintf and CPython's float formatting
are correctly rounded).

The eval sweep's txt-write phase is per-frame Python %-formatting of
~hundreds of rows on this VM's single host core (measured 49 s of a 261 s
3.7k-frame sweep); the ctypes call releases the GIL, so the consumer's
write phase also overlaps the loader threads. Callers fall back to the
Python formatter when the library can't build — the native path is a pure
accelerator, never a behavior change.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "pred_format")
_SO = os.path.join(_DIR, "libpred_format.so")
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
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.spt_format_kitti_rows.argtypes = [
        f64p, i32p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.spt_format_kitti_rows.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def format_rows(
    num: np.ndarray,  # [N, 13] float64
    cls: np.ndarray,  # [N] int32 indices into class_names
    class_names: Sequence[str],
) -> Optional[bytes]:
    """Format the writer's numeric block into the txt-file content.

    Returns the bytes (one ``<name> -1 -1 <13 x %.6f>\\n`` row per entry),
    or None when the library is unavailable or the class names exceed the
    formatter's limits — callers fall back to the Python formatter.
    """

    lib = _load()
    if lib is None or len(class_names) > 64:
        return None
    num = np.ascontiguousarray(num, np.float64)
    cls = np.ascontiguousarray(cls, np.int32)
    n = int(num.shape[0])
    if n == 0:
        return b""
    names = "\n".join(class_names).encode()
    # 13 fields, each " %.6f" of a clipped image/box float stays well under
    # 32 bytes; class name + " -1 -1" + newline bounded by 80.
    cap = n * (13 * 32 + 80)
    out = ctypes.create_string_buffer(cap)
    rc = lib.spt_format_kitti_rows(num, cls, n, names, out, cap)
    if rc < 0:
        return None
    return out.raw[:rc]
