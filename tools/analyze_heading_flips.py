"""Decompose orientation error: fine angle vs the pi-disambiguation bit.

The sharpened oracle's AOS metric (round 4) showed orientation as the
weakest, oscillating output. This tool splits that error into its two
physical components, using prediction dirs two checkpoints apart:

  - FINE ANGLE: |d ry| mod pi between matched detections / vs GT — how
    well the regressed axis direction tracks;
  - FLIP BIT: the fraction of matched detections whose heading differs
    by more than pi/2 (the pi-disambiguation decision).

Measured on the round-4 big run (96 train / 48 val hard frames, steps
2000 vs 4000): fine angle median **1.4 deg** (solved), flip bit **41%**
between checkpoints and 46.8%/53.6% vs GT — i.e. exact CHANCE. The
orientation "weakness" is entirely the unlearned binary disambiguation.
AOS ~ (1 - flip_rate) x AP_2d reproduces every observed AOS value.

ROUND-5 RESOLUTION: the chance-level flip bit was an ORACLE ARTIFACT —
the synthetic box sampler was front-back symmetric, making the GT heading
side statistically independent of every observable feature (no model
could learn it, at any horizon; the round-4 "training horizon" hypothesis
was untestable on that data). With typed heading asymmetry in the
generator (data/synthetic.py) plus the explicit flip head
(avod.explicit_flip_head), AOS == 2D AP to 3 decimals and the pi-flip
audit collapses AOS to 0.000 (cars_check --flip_head, 48-val).

Usage:
  python tools/analyze_heading_flips.py <gt_dir> <pred_dir_a> [pred_dir_b]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparse_pooling_tpu.data.labels import read_labels
from sparse_pooling_tpu.runtime import metrics as M


def _bev5(lb):
    return np.array([lb.t[0], lb.t[2], lb.l, lb.w, lb.ry])


def _match(det, pool, min_iou=0.5):
    best, hit = 0.0, None
    for other in pool:
        ov = M.bev_iou(_bev5(det), _bev5(other))
        if ov > best:
            best, hit = ov, other
    return hit if best >= min_iou else None


def _heading_delta(a, b):
    return abs(((a - b) + np.pi) % (2 * np.pi) - np.pi)


def compare(gt_dir, dir_a, dir_b=None, cls="Car", min_score=0.3):
    pair_flips = pair_n = 0
    fine = []
    gt_flips = {"a": 0, "b": 0}
    gt_n = {"a": 0, "b": 0}
    for f in sorted(os.listdir(dir_a)):
        if not f.endswith(".txt"):
            continue
        a = [x for x in read_labels(os.path.join(dir_a, f))
             if x.type == cls and x.score >= min_score]
        gts = [g for g in read_labels(os.path.join(gt_dir, f)) if g.type == cls]
        pools = {"a": a}
        if dir_b:
            pools["b"] = [
                x for x in read_labels(os.path.join(dir_b, f))
                if x.type == cls and x.score >= min_score
            ]
            for da in a:
                db = _match(da, pools["b"])
                if db is None:
                    continue
                pair_n += 1
                d = _heading_delta(da.ry, db.ry)
                if d > np.pi / 2:
                    pair_flips += 1
                else:
                    fine.append(d)
        for tag, dets in pools.items():
            for dd in dets:
                g = _match(dd, gts)
                if g is None:
                    continue
                gt_n[tag] += 1
                if _heading_delta(dd.ry, g.ry) > np.pi / 2:
                    gt_flips[tag] += 1
    return {
        "pairs": pair_n,
        "pair_flip_rate": pair_flips / max(pair_n, 1),
        "fine_angle_median_deg": float(np.degrees(np.median(fine))) if fine else None,
        "gt_flip_rate_a": gt_flips["a"] / max(gt_n["a"], 1),
        "gt_flip_rate_b": gt_flips["b"] / max(gt_n["b"], 1) if dir_b else None,
        "gt_matched_a": gt_n["a"],
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gt_dir")
    ap.add_argument("pred_dir_a")
    ap.add_argument("pred_dir_b", nargs="?")
    ap.add_argument("--cls", default="Car")
    ap.add_argument("--min_score", type=float, default=0.3)
    args = ap.parse_args()
    r = compare(args.gt_dir, args.pred_dir_a, args.pred_dir_b,
                args.cls, args.min_score)
    print(f"matched dets vs GT (dir_a): {r['gt_matched_a']}")
    print(f"pi-flip rate vs GT: a={r['gt_flip_rate_a']:.1%}"
          + (f"  b={r['gt_flip_rate_b']:.1%}" if r["gt_flip_rate_b"] is not None else ""))
    if r["pairs"]:
        print(f"cross-checkpoint pairs: {r['pairs']}, flip rate "
              f"{r['pair_flip_rate']:.1%}, fine-angle median "
              f"{r['fine_angle_median_deg']:.1f} deg")


if __name__ == "__main__":
    main()
