"""Inference CLI.

Capability parity with ``avod/experiments/run_inference.py`` + the
``demos/`` stack entry: restore a checkpoint, run single-frame forward over
a split, save decoded detections as KITTI txt (and optionally .npy), for
demo rendering via ``sparse_pooling_tpu.demos``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline_config", default=None)
    p.add_argument("--preset", default="cars", choices=["cars", "rcnn_cars", "people", "unittest"])
    p.add_argument("--data_split", default="val")
    p.add_argument("--dataset_root", default=None)
    p.add_argument("--experiments_dir", default=None)
    p.add_argument("--ckpt_step", type=int, required=False, default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--save_npy", action="store_true")
    p.add_argument("--device", default=None)
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the run here")
    args = p.parse_args(argv)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from sparse_pooling_tpu.experiments.run_training import load_config

    cfg = load_config(args)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, split=args.data_split)
    )

    from sparse_pooling_tpu.configs import AreaExtents
    from sparse_pooling_tpu.data.dataset import KittiDataset
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.models.detector import decode_detections_single
    from sparse_pooling_tpu.runtime import checkpoint as ckpt_mod
    from sparse_pooling_tpu.runtime import predictions as pred_mod

    ext = AreaExtents()
    ds = KittiDataset(cfg.dataset, cfg.model, ext)
    model = pl.make_model(cfg.model, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg.model, ext))

    workdir = os.path.join(cfg.experiments_dir, cfg.checkpoint_name)
    ckpt_dir = os.path.join(workdir, "checkpoints")
    step = args.ckpt_step or ckpt_mod.latest_step(ckpt_dir)
    key = jax.random.PRNGKey(0)

    s0 = ds.load_sample(ds.sample_ids[0])
    raw0 = pl.RawSample(*(jnp.array(a) for a in s0.as_arrays()))

    def init_fn(key, raw):
        inputs = pl.build_model_inputs(
            raw, anchors_static, jnp.ones((2,), jnp.float32), cfg.model, ext
        )
        return model.init({"params": key, "dropout": key}, inputs, train=False)

    params = jax.jit(init_fn)(key, raw0)
    if step is not None:
        from sparse_pooling_tpu.runtime.trainer import build_optimizer

        params = ckpt_mod.restore_params(
            ckpt_dir, step, params, build_optimizer(cfg)
        )
        print(f"[run_inference] restored step {step}")
    else:
        print("[run_inference] no checkpoint found; using random init")

    @jax.jit
    def infer(params, raw):
        out = pl.forward_single(model, params, raw, anchors_static, cfg.model, ext, False)
        return decode_detections_single(out, raw.ground_plane, cfg.model, ext)

    out_dir = args.out_dir or os.path.join(workdir, "inference", str(step or 0))
    os.makedirs(out_dir, exist_ok=True)
    import contextlib

    from sparse_pooling_tpu.runtime.profiling import trace

    profile_cm = trace(args.profile_dir) if args.profile_dir else contextlib.nullcontext()
    with profile_cm:
     for sid in ds.sample_ids:
        sample = ds.load_sample(sid)
        raw = pl.RawSample(*(jnp.array(a) for a in sample.as_arrays()))
        det = jax.tree.map(np.asarray, infer(params, raw))
        sy = cfg.model.image.height / sample.raw_image_hw[0]
        sx = cfg.model.image.width / sample.raw_image_hw[1]
        p2_raw = sample.p2.astype(np.float64).copy()
        p2_raw[0] /= sx
        p2_raw[1] /= sy
        pred_mod.write_predictions(
            out_dir, sid, det, cfg.model.classes, p2_raw, sample.raw_image_hw,
            score_threshold=cfg.eval.score_threshold,
        )
        if args.save_npy:
            np.save(os.path.join(out_dir, sid + ".npy"), det["boxes_3d"])
        print(f"[run_inference] {sid}: {int(det['valid'].sum())} detections")
    print(f"[run_inference] wrote predictions to {out_dir}")


if __name__ == "__main__":
    main()
