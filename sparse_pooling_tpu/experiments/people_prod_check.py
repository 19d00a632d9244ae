"""Production-lattice PEOPLE (Pedestrian+Cyclist) check on a HELD-OUT split.

``people_check.py`` proves the multi-class path at a reduced 0.4 m lattice
on CPU; this check trains the people PRESET at its production geometry —
0.1 m voxels, 700x800 BEV, 384x1248 image canvas, 0.3 m anchor stride
(~250k dense anchors, tier-capped at 16384) — on synthetic street scenes
with bench-statistics point clouds and evaluates held-out per-class AP
through the full path (trainer -> orbax -> evaluator -> KITTI txt ->
native C++ AP).  This is the round-2 verdict item #4 run ("production-scale
multi-class"); targets: Ped/Cyc moderate BEV AP >= 0.7/0.6 held-out.

Usage:  python -m sparse_pooling_tpu.experiments.people_prod_check \
            --device tpu [--roi_quad 2] [--steps 3000]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--train_frames", type=int, default=48)
    p.add_argument(
        "--val_frames", type=int, default=48,
        help="held-out frames (48 = the certified high-resolution recipe)",
    )
    p.add_argument(
        "--seed", type=int, default=None,
        help="single-seed escape hatch for quick probes (overrides --seeds)",
    )
    p.add_argument(
        "--seeds", default="0,7",
        help="comma list of dataset seeds; mean +/- half-spread reported "
        "(the certified high-resolution recipe, round-4 verdict item 5)",
    )
    p.add_argument(
        "--flip_head", action="store_true",
        help="enable avod.explicit_flip_head (explicit pi-disambiguation)",
    )
    p.add_argument("--workdir", default=None)
    p.add_argument("--device", default=None, help="cpu or tpu (default: auto)")
    p.add_argument(
        "--roi_quad", type=int, default=None,
        help="override rpn.roi_quad (None = keep the preset's production "
        "value, Q4 since round 3; the old hardcoded default 1 silently "
        "downgraded certification runs to the non-production filter)",
    )
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=8e-4)
    p.add_argument("--dataset_root", default=None, help="reuse an existing tree")
    p.add_argument(
        "--ap_points", type=int, default=40,
        help="AP interpolation points (40 = modern protocol, check default)",
    )
    p.add_argument(
        "--scene", default="people_hard", choices=("people", "people_hard"),
        help="people_hard (default) populates moderate/hard bands with "
        "occluded/truncated objects + clutter (round-3 verdict item 1)",
    )
    args = p.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    from sparse_pooling_tpu.configs import people_pyramid_config
    from sparse_pooling_tpu.configs.config import EvalConfig, OptimizerConfig
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.runtime.evaluator import Evaluator
    from sparse_pooling_tpu.runtime.trainer import Trainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="spt_people_prod_")
    root = args.dataset_root or f"{workdir}/kitti"
    n_total = args.train_frames + args.val_frames
    if not os.path.exists(os.path.join(root, "train.txt")):
        synthetic.write_kitti_tree(
            root, num_frames=n_total, n_ground=12288, n_obj=4096,
            val_frames=tuple(range(args.train_frames, n_total)),
            scene=args.scene,
        )

    base = people_pyramid_config()
    if args.roi_quad is None:
        args.roi_quad = base.model.rpn.roi_quad
    model = dataclasses.replace(
        base.model,
        rpn=dataclasses.replace(base.model.rpn, roi_quad=args.roi_quad),
    )
    if args.flip_head:
        model = dataclasses.replace(
            model,
            avod=dataclasses.replace(model.avod, explicit_flip_head=True),
        )
    tag = "_flip" if args.flip_head else ""
    cfg = dataclasses.replace(
        base,
        checkpoint_name=f"people_prod_q{args.roi_quad}{tag}",
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
        eval=EvalConfig(
            kitti_score_threshold=0.05, batch_size=4,
            ap_n_points=args.ap_points,
        ),
        dataset=dataclasses.replace(
            base.dataset, root=root, split="train", aug_flip=True,
            aug_pca_jitter=False, shuffle=True,
        ),
    )

    from sparse_pooling_tpu.experiments import check_utils as cu

    classes = ["Pedestrian", "Cyclist"]
    seeds = cu.parse_seeds(args.seeds, args.seed)
    print(
        f"[people_prod] workdir {workdir} roi_quad={args.roi_quad} "
        f"seeds={seeds}"
    )
    per_seed = []
    for seed in seeds:
        cfg_s = dataclasses.replace(
            cfg,
            checkpoint_name=cfg.checkpoint_name + (f"_seed{seed}" if seed else ""),
            dataset=dataclasses.replace(cfg.dataset, seed=seed),
        )
        Trainer(cfg_s).train()
        eval_cfg = dataclasses.replace(
            cfg_s, dataset=dataclasses.replace(cfg_s.dataset, split="val")
        )
        ev = Evaluator(eval_cfg)
        results = ev.repeated_checkpoint_run(max_wait=0)
        print(
            f"\n[seed {seed}; {args.ap_points}-pt protocol, "
            f"scene={args.scene}] held-out val"
        )
        print("step   class       metric     easy  moderate    hard")
        for r in results:
            for cls in classes:
                ap = r["ap"][cls]
                for metric in ("2d", "bev", "3d", "aos"):
                    if metric not in ap:
                        continue
                    m = ap[metric]
                    print(
                        f"{r['step']:>5}  {cls:<10} {metric:<6} "
                        f"{m['easy']:8.3f} {m['moderate']:8.3f} "
                        f"{m['hard']:8.3f}"
                    )
        best = cu.best_result(results, classes)
        per_seed.append(
            {
                "seed": seed,
                "final_ap": {c: results[-1]["ap"][c] for c in classes},
                "best_step": best["step"],
                "best_ap": {c: best["ap"][c] for c in classes},
                "eval_fps": results[-1]["frames_per_sec"],
            }
        )

    agg_final = cu.aggregate_aps([s["final_ap"] for s in per_seed], classes)
    agg_best = cu.aggregate_aps([s["best_ap"] for s in per_seed], classes)
    if len(per_seed) > 1:
        cu.print_aggregate(agg_final, classes, seeds, "final checkpoint")
        cu.print_aggregate(agg_best, classes, seeds, "best checkpoint")
    summary = {
        "roi_quad": args.roi_quad,
        "steps": args.steps,
        "ap_points": args.ap_points,
        "scene": args.scene,
        "flip_head": args.flip_head,
        "seeds": seeds,
        "val_frames": args.val_frames,
        "per_seed": per_seed,
        "aggregate_final": agg_final,
        "aggregate_best": agg_best,
        "final_ap": per_seed[0]["final_ap"],
        "eval_fps": per_seed[0]["eval_fps"],
    }
    out_path = os.path.join(workdir, f"people_prod_q{args.roi_quad}{tag}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[people_prod] summary -> {out_path}")


if __name__ == "__main__":
    main()
