"""Production-lattice cars learning check on a HELD-OUT val split.

The overfit/people checks run at reduced lattice scales; this check trains
the FLAGSHIP cars preset at its production geometry — 0.1 m voxels,
700x800 BEV, 384x1248 image canvas, 16384-anchor cap — on synthetic car
scenes and evaluates held-out AP through the full path (trainer -> orbax ->
evaluator -> KITTI txt -> native C++ AP).

Primary question (round-2 advisor): does roi_quad=4's block-granular cap
(512 blocks vs ~950 nonempty on bench-statistics frames — overflow is the
COMMON case) cost detection quality vs per-position filtering?  Run twice:

  python -m sparse_pooling_tpu.experiments.cars_check --roi_quad 4 --device tpu
  python -m sparse_pooling_tpu.experiments.cars_check --roi_quad 1 --device tpu

and compare the held-out AP tables (same data, same steps, same seeds).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument(
        "--preset", default="cars", choices=("cars", "rcnn_cars"),
        help="detector family: 'cars' = flagship AVOD-style SHPL detector, "
        "'rcnn_cars' = MV3D-style FusionRcnn second consumer at the same "
        "production geometry",
    )
    p.add_argument("--train_frames", type=int, default=48)
    p.add_argument("--val_frames", type=int, default=16)
    p.add_argument("--workdir", default=None)
    p.add_argument("--device", default=None, help="cpu or tpu (default: auto)")
    p.add_argument("--roi_quad", type=int, default=4)
    p.add_argument(
        "--s2_bev_stride", type=int, default=None,
        help="override avod.bev_roi_stride (stage-2 patch ROI A/B)",
    )
    p.add_argument(
        "--s2_img_stride", type=int, default=None,
        help="override avod.img_roi_stride",
    )
    p.add_argument("--max_anchors", type=int, default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=8e-4)
    p.add_argument("--dataset_root", default=None, help="reuse an existing tree")
    args = p.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    from sparse_pooling_tpu.configs.config import EvalConfig, OptimizerConfig
    from sparse_pooling_tpu.configs.presets import preset as preset_fn
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.runtime.evaluator import Evaluator
    from sparse_pooling_tpu.runtime.trainer import Trainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="spt_cars_check_")
    root = args.dataset_root or f"{workdir}/kitti"
    n_total = args.train_frames + args.val_frames
    if not os.path.exists(os.path.join(root, "train.txt")):
        synthetic.write_kitti_tree(
            root, num_frames=n_total, n_ground=12288, n_obj=4096,
            val_frames=tuple(range(args.train_frames, n_total)),
        )

    base = preset_fn(args.preset)
    model = dataclasses.replace(
        base.model,
        rpn=dataclasses.replace(base.model.rpn, roi_quad=args.roi_quad),
    )
    if args.max_anchors:
        model = dataclasses.replace(
            model,
            anchors=dataclasses.replace(
                model.anchors, max_anchors=args.max_anchors
            ),
        )
    s2_tag = ""
    if args.s2_bev_stride is not None or args.s2_img_stride is not None:
        avod = model.avod
        if args.s2_bev_stride is not None:
            avod = dataclasses.replace(avod, bev_roi_stride=args.s2_bev_stride)
        if args.s2_img_stride is not None:
            avod = dataclasses.replace(avod, img_roi_stride=args.s2_img_stride)
        model = dataclasses.replace(model, avod=avod)
        s2_tag = f"_s2b{model.avod.bev_roi_stride}i{model.avod.img_roi_stride}"
    cfg = dataclasses.replace(
        base,
        checkpoint_name=f"{args.preset}_check_q{args.roi_quad}" + s2_tag
        + (f"_a{args.max_anchors}" if args.max_anchors else ""),
        experiments_dir=f"{workdir}/exp",
        model=model,
        train=dataclasses.replace(
            base.train,
            batch_size=args.batch,
            max_iterations=args.steps,
            checkpoint_interval=max(args.steps // 2, 1),
            summary_interval=max(args.steps // 20, 1),
            optimizer=OptimizerConfig(
                initial_lr=args.lr, decay_steps=args.steps // 2,
                decay_rate=0.5,
            ),
        ),
        eval=EvalConfig(kitti_score_threshold=0.05, batch_size=4),
        dataset=dataclasses.replace(
            base.dataset, root=root, split="train", aug_flip=True,
            aug_pca_jitter=False, shuffle=True,
        ),
    )

    print(
        f"[cars_check] workdir {workdir} preset={args.preset} "
        f"roi_quad={args.roi_quad}"
    )
    Trainer(cfg).train()
    eval_cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, split="val")
    )
    ev = Evaluator(eval_cfg)
    results = ev.repeated_checkpoint_run(max_wait=0)
    print("\nstep   AP_2d(mod)  AP_bev(mod)  AP_3d(mod)   [Car, held-out val]")
    for r in results:
        ap = r["ap"]["Car"]
        print(
            f"{r['step']:>5} {ap['2d']['moderate']:10.3f} "
            f"{ap['bev']['moderate']:11.3f} {ap['3d']['moderate']:10.3f}"
        )
    summary = {
        "preset": args.preset,
        "roi_quad": args.roi_quad,
        "max_anchors": args.max_anchors,
        "steps": args.steps,
        "final_ap": results[-1]["ap"]["Car"],
        "eval_fps": results[-1]["frames_per_sec"],
    }
    out_path = os.path.join(
        workdir, f"{args.preset}_check_q{args.roi_quad}{s2_tag}.json"
    )
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[cars_check] summary -> {out_path}")


if __name__ == "__main__":
    main()
