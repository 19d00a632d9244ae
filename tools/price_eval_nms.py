"""Price the eval_nms_size semantic lever on EXISTING checkpoints.

``rpn.eval_nms_size`` (stage-2 proposal count P) only affects the EVAL
path, so its AP price needs no retraining: this tool re-evaluates already
trained checkpoints under a modified eval config, via a shadow workdir
whose ``checkpoints/`` symlinks to the original (fresh
``evaluated_steps.txt``, so the sweep re-runs).

Round-5 pricing (fps side from ``bench.py --eval_nms_size``):
  P=300 (default): 133.16 fps/chip;  P=128: 145.51 (+9.3%).
AP side: run this on the round-5 flip-cert checkpoints, e.g.

  python tools/price_eval_nms.py /tmp/r5_asym/exp/cars_check_q4_flip \
      /tmp/r5_asym/kitti --eval_nms_size 128
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("workdir", help="trained check workdir (holds checkpoints/)")
    p.add_argument("dataset_root", help="the check's synthetic KITTI tree")
    p.add_argument("--eval_nms_size", type=int, default=128)
    p.add_argument("--preset", default="cars")
    p.add_argument("--flip_head", action="store_true", default=True)
    p.add_argument("--roi_quad", type=int, default=4)
    p.add_argument("--ap_points", type=int, default=40)
    args = p.parse_args(argv)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    from sparse_pooling_tpu.configs.config import EvalConfig
    from sparse_pooling_tpu.configs.presets import preset as preset_fn
    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    shadow = args.workdir.rstrip("/") + f"_nms{args.eval_nms_size}"
    os.makedirs(shadow, exist_ok=True)
    link = os.path.join(shadow, "checkpoints")
    if not os.path.exists(link):
        os.symlink(os.path.join(args.workdir, "checkpoints"), link)

    base = preset_fn(args.preset)
    model = dataclasses.replace(
        base.model,
        rpn=dataclasses.replace(
            base.model.rpn,
            roi_quad=args.roi_quad,
            eval_nms_size=args.eval_nms_size,
        ),
    )
    cfg = dataclasses.replace(
        base,
        model=model,
        eval=EvalConfig(
            kitti_score_threshold=0.05, batch_size=4,
            ap_n_points=args.ap_points,
        ),
        dataset=dataclasses.replace(
            base.dataset, root=args.dataset_root, split="val"
        ),
    )
    ev = Evaluator(cfg, workdir=shadow)
    results = ev.repeated_checkpoint_run(max_wait=0)
    for r in results:
        ap = r["ap"]["Car"]
        print(
            f"step {r['step']}: P={args.eval_nms_size} moderate "
            f"2d {ap['2d']['moderate']:.3f} bev {ap['bev']['moderate']:.3f} "
            f"3d {ap['3d']['moderate']:.3f} aos {ap['aos']['moderate']:.3f}"
        )
    out = os.path.join(shadow, "price_eval_nms.json")
    with open(out, "w") as f:
        json.dump(
            {"eval_nms_size": args.eval_nms_size,
             "results": [{"step": r["step"], "ap": r["ap"]} for r in results]},
            f, indent=1,
        )
    print("->", out)


if __name__ == "__main__":
    main()
