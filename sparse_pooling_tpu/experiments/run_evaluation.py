"""Evaluation CLI.

Capability parity with ``avod/experiments/run_evaluation.py``: evaluate one
checkpoint (``--ckpt_step``) or sweep/watch the checkpoint dir, writing
KITTI-format predictions and AP summaries per checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline_config", default=None)
    p.add_argument("--preset", default="cars", choices=["cars", "rcnn_cars", "people", "unittest"])
    p.add_argument("--data_split", default="val")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--experiments_dir", default=None)
    p.add_argument("--ckpt_step", type=int, default=None, help="evaluate one step")
    p.add_argument(
        "--watch_seconds", type=float, default=0.0,
        help="keep polling for new checkpoints this long after the last one",
    )
    p.add_argument("--device", default=None)
    args = p.parse_args(argv)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    from sparse_pooling_tpu.experiments.run_training import load_config

    cfg = load_config(args)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, split=args.data_split)
    )
    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    ev = Evaluator(cfg)
    if args.ckpt_step is not None:
        result = ev.run_checkpoint_once(args.ckpt_step)
        print(json.dumps(result, indent=2))
    else:
        results = ev.repeated_checkpoint_run(max_wait=args.watch_seconds)
        for r in results:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
