"""KITTI-format prediction writer.

Capability parity with the reference evaluator's decode-to-txt stage
(``evaluator.py`` writing ``predictions/kitti_native_eval/<thresh>/<step>/
data/*.txt``): one txt per frame, rows
``type trunc occ alpha x1 y1 x2 y2 h w l x y z ry score`` in RAW image
coordinates, consumable by the native KITTI AP evaluator (N1).
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import numpy as np

from sparse_pooling_tpu.data.calib import project_to_image
from sparse_pooling_tpu.ops import encoders


def detections_to_kitti_rows(
    det: Dict[str, np.ndarray],
    class_names: Sequence[str],
    p2_raw: np.ndarray,
    raw_image_hw,
    score_threshold: float = 0.1,
):
    """Decoded per-class detections -> list of KITTI row strings."""

    rows = []
    boxes = np.asarray(det["boxes_3d"], dtype=np.float64)  # [C, K, 7]
    scores = np.asarray(det["scores"], dtype=np.float64)
    valid = np.asarray(det["valid"])
    h_img, w_img = raw_image_hw
    for ci, cname in enumerate(class_names):
        for k in range(boxes.shape[1]):
            if not valid[ci, k] or scores[ci, k] < score_threshold:
                continue
            b = boxes[ci, k]
            x, y, z, l, w, h, ry = b
            corners = np.asarray(encoders.box_3d_to_corners(b[None]))[0]
            uv = project_to_image(corners, p2_raw)
            if not np.isfinite(uv).all():
                continue
            x1 = float(np.clip(uv[:, 0].min(), 0, w_img - 1))
            x2 = float(np.clip(uv[:, 0].max(), 0, w_img - 1))
            y1 = float(np.clip(uv[:, 1].min(), 0, h_img - 1))
            y2 = float(np.clip(uv[:, 1].max(), 0, h_img - 1))
            if x2 <= x1 or y2 <= y1:
                continue
            alpha = ry - np.arctan2(x, z)
            rows.append(
                f"{cname} -1 -1 {alpha:.6f} "
                f"{x1:.6f} {y1:.6f} {x2:.6f} {y2:.6f} "
                f"{h:.6f} {w:.6f} {l:.6f} {x:.6f} {y:.6f} {z:.6f} {ry:.6f} "
                f"{scores[ci, k]:.6f}"
            )
    return rows


def write_predictions(
    out_dir: str,
    sample_id: str,
    det: Dict[str, np.ndarray],
    class_names: Sequence[str],
    p2_raw: np.ndarray,
    raw_image_hw,
    score_threshold: float = 0.1,
):
    os.makedirs(out_dir, exist_ok=True)
    rows = detections_to_kitti_rows(
        det, class_names, p2_raw, raw_image_hw, score_threshold
    )
    with open(os.path.join(out_dir, sample_id + ".txt"), "w") as f:
        f.write("\n".join(rows) + ("\n" if rows else ""))
