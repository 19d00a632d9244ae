"""Decompose the rcnn_cars 2D-vs-BEV AP gap (round-3 verdict item 5).

rcnn_cars scored held-out moderate Car AP 2D 0.767 vs BEV 0.889 — inverted
vs the normal ordering (2D is usually the easiest metric). This tool turns
that anomaly into named numbers: for every prediction dir, it matches each
detection to its best-BEV-IoU ground-truth object and reports

  - the matched-pair IoU distributions per metric (2d / bev / 3d), and
  - COUNTERFACTUAL 2D/3D IoUs with single box parameters substituted from
    the GT (height h, vertical position y, footprint l/w, center x/z, yaw),
    which attributes the 2D shortfall to a specific regression axis.

Usage:
  python tools/analyze_2d_gap.py <gt_dir> <pred_dir> [pred_dir2 ...] \
      [--cls Car] [--min_score 0.1]

Interpretation: if 2D IoU recovers to ~BEV level when h/y come from GT,
the single-stage head's vertical extents are the cause (the AVOD family
refines them with the stage-2 box_4c head; FusionRcnn by design does not).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparse_pooling_tpu.data.calib import read_calibration, project_to_image
from sparse_pooling_tpu.data.labels import read_labels
from sparse_pooling_tpu.runtime import metrics as M
from sparse_pooling_tpu.runtime.predictions import _box_3d_to_corners_np


def _box7(lb):
    return np.array([lb.t[0], lb.t[1], lb.t[2], lb.l, lb.w, lb.h, lb.ry])


def _bbox2d_from_box7(b, p2, hw):
    corners = _box_3d_to_corners_np(b[None])
    uv = project_to_image(corners.reshape(-1, 3), p2).reshape(8, 2)
    h_img, w_img = hw
    x1 = np.clip(uv[:, 0].min(), 0, w_img - 1)
    x2 = np.clip(uv[:, 0].max(), 0, w_img - 1)
    y1 = np.clip(uv[:, 1].min(), 0, h_img - 1)
    y2 = np.clip(uv[:, 1].max(), 0, h_img - 1)
    return np.array([x1, y1, x2, y2])


def _iou2d(a, b):
    return M.bbox2d_iou(a[None], b[None])[0, 0]


def analyze(gt_dir, pred_dir, calib_dir, cls, min_score, hw):
    rows = []
    for fname in sorted(os.listdir(pred_dir)):
        if not fname.endswith(".txt"):
            continue
        sid = fname[:-4]
        gts = [g for g in read_labels(os.path.join(gt_dir, fname)) if g.type == cls]
        dets = [
            d for d in read_labels(os.path.join(pred_dir, fname))
            if d.type == cls and d.score >= min_score
        ]
        if not gts or not dets:
            continue
        p2 = read_calibration(os.path.join(calib_dir, sid + ".txt")).p2
        for d in dets:
            db = _box7(d)
            best_bev, best_g = 0.0, None
            for g in gts:
                ov = M.bev_iou(db[[0, 2, 3, 4, 6]], _box7(g)[[0, 2, 3, 4, 6]])
                if ov > best_bev:
                    best_bev, best_g = ov, g
            if best_g is None or best_bev < 0.1:
                continue  # not aimed at any object
            gb = _box7(best_g)
            gt2d = np.array([best_g.x1, best_g.y1, best_g.x2, best_g.y2])
            d2d = np.array([d.x1, d.y1, d.x2, d.y2])
            rec = {
                "score": d.score,
                "bev": best_bev,
                "iou2d": _iou2d(d2d, gt2d),
                "iou3d": M.iou_3d(db[[0, 1, 2, 3, 4, 5, 6]], gb),
                # counterfactuals: substitute one parameter group from GT,
                # reproject, re-measure 2D IoU against the GT 2D bbox
            }
            for tag, idxs in (
                ("2d|gt_hy", [1, 5]),      # vertical position + height
                ("2d|gt_lw", [3, 4]),      # footprint dims
                ("2d|gt_xz", [0, 2]),      # center
                ("2d|gt_ry", [6]),         # yaw
            ):
                cb = db.copy()
                cb[idxs] = gb[idxs]
                rec[tag] = _iou2d(_bbox2d_from_box7(cb, p2, hw), gt2d)
            cb = db.copy()
            cb[[1, 5]] = gb[[1, 5]]
            rec["3d|gt_hy"] = M.iou_3d(cb, gb)
            rows.append(rec)
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gt_dir")
    ap.add_argument("pred_dirs", nargs="+")
    ap.add_argument("--cls", default="Car")
    ap.add_argument("--min_score", type=float, default=0.1)
    ap.add_argument("--image_hw", default="375,1242")
    args = ap.parse_args()
    hw = tuple(int(v) for v in args.image_hw.split(","))
    calib_dir = os.path.join(os.path.dirname(args.gt_dir.rstrip("/")), "calib")

    for pred_dir in args.pred_dirs:
        rows = analyze(
            args.gt_dir, pred_dir, calib_dir, args.cls, args.min_score, hw
        )
        if not rows:
            print(f"{pred_dir}: no matched detections")
            continue
        keys = [
            "iou2d", "bev", "iou3d", "2d|gt_hy", "2d|gt_lw", "2d|gt_xz",
            "2d|gt_ry", "3d|gt_hy",
        ]
        print(f"\n== {pred_dir}  ({len(rows)} matched dets, {args.cls})")
        print(f"{'metric':>10s} {'mean':>7s} {'p25':>7s} {'median':>7s} "
              f"{'>=0.7':>7s}")
        for k in keys:
            v = np.array([r[k] for r in rows])
            print(
                f"{k:>10s} {v.mean():7.3f} {np.percentile(v, 25):7.3f} "
                f"{np.median(v):7.3f} {(v >= 0.7).mean():7.1%}"
            )


if __name__ == "__main__":
    main()
