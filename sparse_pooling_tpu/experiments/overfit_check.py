"""Overfit learning check — reproducible end-to-end training evidence.

Trains the unittest-scale detector on 2 synthetic frames and evaluates AP
on the SAME frames through the full path (trainer -> orbax checkpoints ->
evaluator -> KITTI txt -> native C++ AP). A healthy framework reaches AP
1.0/1.0/1.0 (2D/BEV/3D moderate) by ~2500 steps (measured round 1: 0.136 at
step 500 -> 1.000 at step 2500, ~3 min on the CPU backend).

Usage: python -m sparse_pooling_tpu.experiments.overfit_check [--steps 2500]
"""

from __future__ import annotations

import argparse
import dataclasses
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--workdir", default=None)
    p.add_argument("--device", default="cpu", help="cpu (default) or tpu")
    p.add_argument(
        "--roi", default="exact", choices=["exact", "fast"],
        help="'exact' = full-res reference crops; 'fast' = the production "
        "strided patch-einsum ROI path with channel projection",
    )
    args = p.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    from sparse_pooling_tpu.configs import unittest_config
    from sparse_pooling_tpu.configs.config import (
        AnchorConfig,
        EvalConfig,
        MiniBatchConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from sparse_pooling_tpu.configs.presets import CAR_SIZE
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.runtime.evaluator import Evaluator
    from sparse_pooling_tpu.runtime.trainer import Trainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="spt_overfit_")
    root = f"{workdir}/kitti"
    synthetic.write_kitti_tree(root, num_frames=2, n_ground=1024, n_obj=256, val_frames=())

    cfg = unittest_config(dataset_root=root)
    rpn = cfg.model.rpn
    if args.roi == "fast":
        rpn = dataclasses.replace(
            rpn, bev_roi_stride=2, img_roi_stride=2, roi_channels=4
        )
    cfg = dataclasses.replace(
        cfg,
        checkpoint_name="overfit_check",
        experiments_dir=f"{workdir}/exp",
        model=dataclasses.replace(
            cfg.model,
            rpn=rpn,
            anchors=AnchorConfig(sizes=(CAR_SIZE,), stride=1.0, max_anchors=1024),
            mini_batch=MiniBatchConfig(
                rpn_batch_size=128, avod_batch_size=32,
                rpn_pos_iou=(0.45, 1.0), avod_pos_iou=(0.55, 1.0),
            ),
        ),
        train=TrainConfig(
            batch_size=2, max_iterations=args.steps,
            checkpoint_interval=max(args.steps // 5, 1),
            summary_interval=max(args.steps // 10, 1),
            optimizer=OptimizerConfig(
                initial_lr=2e-3, decay_steps=args.steps // 2, decay_rate=0.5
            ),
        ),
        eval=EvalConfig(kitti_score_threshold=0.05),
        dataset=dataclasses.replace(
            cfg.dataset, split="train", aug_flip=False, aug_pca_jitter=False,
            shuffle=False,
        ),
    )

    Trainer(cfg).train()
    ev = Evaluator(cfg)
    results = ev.repeated_checkpoint_run(max_wait=0)
    print("\nstep  AP_2d(mod)  AP_bev(mod)  AP_3d(mod)")
    for r in results:
        ap = r["ap"]["Car"]
        print(
            f"{r['step']:>5} {ap['2d']['moderate']:10.3f} "
            f"{ap['bev']['moderate']:11.3f} {ap['3d']['moderate']:10.3f}"
        )
    final = results[-1]["ap"]["Car"]["3d"]["moderate"]
    print(f"\nfinal 3D moderate AP: {final:.3f} (healthy: -> 1.0 by ~2500 steps)")


if __name__ == "__main__":
    main()
