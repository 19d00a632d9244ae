"""Training CLI.

Capability parity with ``avod/experiments/run_training.py``:
``python -m sparse_pooling_tpu.experiments.run_training
--pipeline_config=cfg.json`` (or ``--preset cars``) with data-split and
device options. Config files are JSON (see ``configs.config``); shipped
examples live in ``sparse_pooling_tpu/configs/examples/*.json`` (one per
preset, the counterpart of the reference's ``avod/configs/*.config``).
"""

from __future__ import annotations

import argparse
import dataclasses


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline_config", default=None, help="JSON pipeline config path")
    p.add_argument("--preset", default="cars", choices=["cars", "rcnn_cars", "people", "unittest"])
    p.add_argument("--data_split", default=None, help="train | val | trainval")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--experiments_dir", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--device", default=None, help="jax platform override (cpu/tpu)")
    p.add_argument(
        "--multihost",
        action="store_true",
        help="join the jax.distributed coordination service before training "
        "(DCN multi-host; reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES "
        "/ JAX_PROCESS_ID, or TPU-pod metadata). The mesh then spans every "
        "host's devices and each process feeds its own batch shards.",
    )
    return p.parse_args(argv)


def load_config(args):
    from sparse_pooling_tpu.configs import pipeline_config_from_file
    from sparse_pooling_tpu.configs.presets import preset

    cfg = (
        pipeline_config_from_file(args.pipeline_config)
        if args.pipeline_config
        else preset(args.preset)
    )
    ds = cfg.dataset
    if getattr(args, "data_split", None):
        ds = dataclasses.replace(ds, split=args.data_split)
    if getattr(args, "dataset_root", None):
        ds = dataclasses.replace(ds, root=args.dataset_root)
    cfg = dataclasses.replace(cfg, dataset=ds)
    if getattr(args, "experiments_dir", None):
        cfg = dataclasses.replace(cfg, experiments_dir=args.experiments_dir)
    if getattr(args, "batch_size", None):
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch_size)
        )
    return cfg


def main(argv=None):
    args = parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()
    if args.multihost:
        from sparse_pooling_tpu.parallel import multihost

        multihost.initialize()
        print(f"[run_training] {multihost.process_info()}")
    cfg = load_config(args)
    from sparse_pooling_tpu.runtime.trainer import Trainer

    trainer = Trainer(cfg)
    state = trainer.train(max_steps=args.max_steps)
    print(f"[run_training] finished at step {state.step}")


if __name__ == "__main__":
    main()
