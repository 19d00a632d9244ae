"""Multi-class (people preset) learning check on a HELD-OUT val split.

The overfit check (``overfit_check.py``) proves the Car pipeline can fit its
training frames; this check proves the MULTI-CLASS path end-to-end with
generalization: it trains a Pedestrian+Cyclist detector (the people preset's
class set, IoU bands, and finer anchor stride, at the unittest lattice
scale) on synthetic street scenes and evaluates per-class AP on val frames
the trainer never saw — through the full path (trainer -> orbax checkpoints
-> evaluator -> KITTI txt -> native C++ AP).

Chance-level AP here is ~0 (the evaluator scores against a 41-point recall
sweep); a healthy run reaches moderate BEV AP well above 0.5 for both
classes by ~3000 steps (measured: see BASELINE.md).

Usage: python -m sparse_pooling_tpu.experiments.people_check [--steps 3000]
"""

from __future__ import annotations

import argparse
import dataclasses
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--train_frames", type=int, default=12)
    p.add_argument("--val_frames", type=int, default=4)
    p.add_argument("--workdir", default=None)
    p.add_argument("--device", default="cpu", help="cpu (default) or tpu")
    p.add_argument(
        "--voxel", type=float, default=0.4,
        help="BEV voxel size (m). People need finer cells than the 0.8 m "
        "unittest lattice — a pedestrian is ~0.7 m wide (one 0.8 m cell), "
        "which caps BEV localization AP",
    )
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument(
        "--scene", default="people", choices=("people", "people_hard"),
        help="people_hard adds occlusion/truncation tiers + clutter",
    )
    p.add_argument("--ap_points", type=int, default=40)
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
    from sparse_pooling_tpu.configs.presets import CYCLIST_SIZE, PEDESTRIAN_SIZE
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.runtime.evaluator import Evaluator
    from sparse_pooling_tpu.runtime.trainer import Trainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="spt_people_")
    root = f"{workdir}/kitti"
    n_total = args.train_frames + args.val_frames
    synthetic.write_kitti_tree(
        root, num_frames=n_total, n_ground=1024, n_obj=192,
        val_frames=tuple(range(args.train_frames, n_total)), scene=args.scene,
    )

    from sparse_pooling_tpu.configs.config import BevConfig, ImageConfig

    base = unittest_config(dataset_root=root)
    grid_h = round((70.0 - 0.0) / args.voxel)
    pad_h = (-grid_h) % 2  # fusion_stride 2 divisibility
    cfg = dataclasses.replace(
        base,
        checkpoint_name="people_check",
        experiments_dir=f"{workdir}/exp",
        model=dataclasses.replace(
            base.model,
            classes=("Pedestrian", "Cyclist"),
            bev=BevConfig(voxel_size=args.voxel, pad_h=pad_h),
            image=ImageConfig(height=96, width=320),
            # people preset knobs at a reduced lattice scale: per-class
            # cluster sizes, finer stride than cars, people IoU bands
            anchors=AnchorConfig(
                sizes=(PEDESTRIAN_SIZE, CYCLIST_SIZE), stride=0.8,
                max_anchors=4096,
            ),
            mini_batch=MiniBatchConfig(
                rpn_batch_size=128, avod_batch_size=64,
                rpn_neg_iou=(0.0, 0.3), rpn_pos_iou=(0.35, 1.0),
                avod_neg_iou=(0.0, 0.45), avod_pos_iou=(0.45, 1.0),
            ),
        ),
        train=TrainConfig(
            batch_size=4, max_iterations=args.steps,
            checkpoint_interval=max(args.steps // 3, 1),
            summary_interval=max(args.steps // 15, 1),
            optimizer=OptimizerConfig(
                initial_lr=args.lr, decay_steps=args.steps // 2, decay_rate=0.5
            ),
        ),
        eval=EvalConfig(
            kitti_score_threshold=0.05, batch_size=2,
            ap_n_points=args.ap_points,
        ),
        dataset=dataclasses.replace(
            base.dataset, split="train", aug_flip=True, aug_pca_jitter=False,
            shuffle=True,
        ),
    )

    Trainer(cfg).train()
    eval_cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, split="val")
    )
    ev = Evaluator(eval_cfg)
    results = ev.repeated_checkpoint_run(max_wait=0)
    print("\nstep   class       AP_2d(mod)  AP_bev(mod)  AP_3d(mod)")
    for r in results:
        for cls in ("Pedestrian", "Cyclist"):
            ap = r["ap"][cls]
            print(
                f"{r['step']:>5}  {cls:<10} {ap['2d']['moderate']:10.3f} "
                f"{ap['bev']['moderate']:11.3f} {ap['3d']['moderate']:10.3f}"
            )
    final = results[-1]["ap"]
    for cls in ("Pedestrian", "Cyclist"):
        print(
            f"final {cls} BEV moderate AP on HELD-OUT val: "
            f"{final[cls]['bev']['moderate']:.3f}"
        )


if __name__ == "__main__":
    main()
