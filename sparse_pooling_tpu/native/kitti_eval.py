"""ctypes binding for the native KITTI AP evaluator.

Loads ``native/kitti_eval/libkitti_eval.so`` (building it with make on first
use if a toolchain is present) and exposes ``evaluate_dirs`` with the same
signature/return shape as the numpy oracle ``runtime.metrics.evaluate_dirs``.
The evaluator subprocess/CLI twin is ``evaluate_object_3d`` (reference:
``evaluate_object_3d_offline`` invoked via subprocess from evaluator.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Sequence

_DIR = os.path.join(os.path.dirname(__file__), "kitti_eval")
_SO = os.path.join(_DIR, "libkitti_eval.so")
_lib = None


def build() -> bool:
    """Compile the shared library + CLI. Returns True on success."""

    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, text=True
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        if not build():
            return None
    lib = ctypes.CDLL(_SO)
    if not hasattr(lib, "spt_evaluate_v2"):
        # stale pre-AOS library on disk: rebuild and reload. Remove the old
        # file first so dlopen sees a fresh inode (the already-open handle
        # would otherwise be returned again).
        del lib
        try:
            os.remove(_SO)
        except OSError:
            return None
        if not build():
            return None
        lib = ctypes.CDLL(_SO)
        if not hasattr(lib, "spt_evaluate_v2"):
            return None
    lib.spt_evaluate_v2.restype = ctypes.c_int
    lib.spt_evaluate_v2.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def evaluate_dirs(
    gt_dir: str, det_dir: str, classes: Sequence[str], n_points: int = 11
) -> Dict[str, Dict[str, Dict[str, float]]]:
    lib = _load()
    if lib is None:
        raise RuntimeError("libkitti_eval.so unavailable (no C++ toolchain?)")
    n_cls = len(classes)
    out = (ctypes.c_double * (n_cls * 12))()
    n = lib.spt_evaluate_v2(
        gt_dir.encode(), det_dir.encode(), ",".join(classes).encode(),
        n_points, out,
    )
    if n < 0:
        raise RuntimeError(f"spt_evaluate_v2 failed: {n}")
    result: Dict[str, Dict[str, Dict[str, float]]] = {}
    idx = 0
    for cls in classes:
        result[cls] = {}
        for metric in ("2d", "bev", "3d", "aos"):
            result[cls][metric] = {}
            for diff in ("easy", "moderate", "hard"):
                result[cls][metric][diff] = out[idx]
                idx += 1
    return result
