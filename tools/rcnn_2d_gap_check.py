"""Reproduce + decompose the rcnn 2D-vs-BEV AP anomaly at CPU scale.

Round-3 verdict item 5: rcnn_cars held-out 2D AP (0.767) landed BELOW its
BEV AP (0.889) — inverted vs the normal metric ordering and vs the AVOD
family (0.909 across). This tool trains BOTH families on the SAME synthetic
car scenes at the unittest lattice (CPU-feasible), evaluates held-out AP,
and runs the per-axis counterfactual decomposition of
``tools/analyze_2d_gap.py`` on both prediction dirs.

Hypothesis under test: FusionRcnn is single-stage — its boxes come straight
from dense-RPN offsets with no stage-2 box_4c refinement, so vertical
extent (y, h) is regressed more coarsely; the image-plane bbox (and the
0.7-IoU 2D bar) punishes vertical error hardest, while BEV ignores it
entirely.

Usage: python tools/rcnn_2d_gap_check.py [--steps 2000] [--scene cars]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--train_frames", type=int, default=24)
    p.add_argument("--val_frames", type=int, default=8)
    p.add_argument("--scene", default="cars")
    p.add_argument("--workdir", default=None)
    p.add_argument("--device", default="cpu")
    args = p.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    from sparse_pooling_tpu.configs import unittest_config
    from sparse_pooling_tpu.configs.config import EvalConfig, OptimizerConfig
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.runtime.evaluator import Evaluator
    from sparse_pooling_tpu.runtime.trainer import Trainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="spt_rcnn_gap_")
    root = f"{workdir}/kitti"
    n_total = args.train_frames + args.val_frames
    if not os.path.exists(os.path.join(root, "train.txt")):
        synthetic.write_kitti_tree(
            root, num_frames=n_total, n_ground=2048, n_obj=512,
            val_frames=tuple(range(args.train_frames, n_total)),
            scene=args.scene,
        )

    base = unittest_config(dataset_root=root)
    pred_dirs = {}
    for arch in ("avod", "rcnn"):
        cfg = dataclasses.replace(
            base,
            checkpoint_name=f"gap_{arch}",
            experiments_dir=f"{workdir}/exp",
            model=dataclasses.replace(base.model, architecture=arch),
            train=dataclasses.replace(
                base.train, batch_size=4, max_iterations=args.steps,
                checkpoint_interval=args.steps, summary_interval=max(args.steps // 10, 1),
                optimizer=OptimizerConfig(
                    initial_lr=8e-4, decay_steps=args.steps // 2,
                    decay_rate=0.5,
                ),
            ),
            eval=EvalConfig(
                kitti_score_threshold=0.05, batch_size=4, ap_n_points=40
            ),
            dataset=dataclasses.replace(
                base.dataset, split="train", aug_flip=True, shuffle=True
            ),
        )
        print(f"\n[{arch}] training {args.steps} steps...")
        Trainer(cfg).train()
        ev = Evaluator(
            dataclasses.replace(
                cfg, dataset=dataclasses.replace(cfg.dataset, split="val")
            )
        )
        results = ev.repeated_checkpoint_run(max_wait=0)
        ap = results[-1]["ap"]["Car"]
        print(f"[{arch}] held-out moderate Car AP (40-pt): "
              + " ".join(f"{m}={ap[m]['moderate']:.3f}"
                         for m in ("2d", "bev", "3d", "aos")))
        thresh = cfg.eval.kitti_score_threshold
        pred_dirs[arch] = os.path.join(
            ev.workdir, "predictions", "kitti_native_eval", f"{thresh:g}",
            str(results[-1]["step"]), "data",
        )

    gt_dir = os.path.join(root, "training", "label_2")
    print("\n[decomposition] per-axis counterfactual IoUs "
          "(see tools/analyze_2d_gap.py)")
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "analyze_2d_gap.py"),
         gt_dir, pred_dirs["avod"], pred_dirs["rcnn"]],
        check=True,
    )
    print(f"\nworkdir: {workdir}")


if __name__ == "__main__":
    main()
