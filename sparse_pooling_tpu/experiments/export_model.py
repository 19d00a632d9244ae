"""Export a trained checkpoint as a self-contained serving artifact.

TPU-native analog of the reference lineage's frozen-inference-graph
deployment: the jitted batch forward + decode is lowered to StableHLO with
the trained weights baked in, serialized to one file, and callable from any
later process via ``runtime.export.load_serving_fn`` — no model code or
checkpoint plumbing at serving time.

Usage:
  python -m sparse_pooling_tpu.experiments.export_model \
      --preset cars --workdir <experiments_dir> [--step N] \
      --out cars_b8.shlo [--batch 8] [--verify]

Without --workdir the export uses random-init weights (artifact-format
smoke test).  --verify deserializes the written file and checks its output
against the live jitted pipeline on one synthetic batch.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="cars")
    p.add_argument("--workdir", default=None, help="experiments dir with checkpoints")
    p.add_argument("--step", type=int, default=None, help="default: latest")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--device", default=None, help="cpu or tpu (default: auto)")
    p.add_argument("--verify", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    import dataclasses

    import numpy as np

    from sparse_pooling_tpu.configs.presets import preset
    from sparse_pooling_tpu.runtime import checkpoint as ckpt_mod
    from sparse_pooling_tpu.runtime import export as export_mod
    from sparse_pooling_tpu.runtime.evaluator import Evaluator
    from sparse_pooling_tpu.runtime.trainer import build_optimizer

    cfg = preset(args.preset)
    if args.workdir:
        cfg = dataclasses.replace(cfg, experiments_dir=args.workdir)

    # params template comes from the Evaluator (it builds the model and a
    # sample batch); checkpoint restore reuses the eval restore path
    import tempfile

    if not args.workdir:
        # random-init smoke export: synthesize a one-frame dataset
        from sparse_pooling_tpu.data import synthetic

        root = tempfile.mkdtemp(prefix="spt_export_") + "/kitti"
        synthetic.write_kitti_tree(
            root, num_frames=args.batch, val_frames=tuple(range(args.batch))
        )
        cfg = dataclasses.replace(
            cfg,
            experiments_dir=tempfile.mkdtemp(prefix="spt_export_exp_"),
            dataset=dataclasses.replace(cfg.dataset, root=root, split="val"),
        )
    ev = Evaluator(cfg)
    params = ev._params_template()
    step = args.step
    if args.workdir:
        step = step or ckpt_mod.latest_step(ev.ckpt_dir)
        assert step is not None, f"no checkpoints under {ev.ckpt_dir}"
        params = ckpt_mod.restore_params(
            ev.ckpt_dir, step, params, build_optimizer(cfg)
        )
        print(f"[export] restored step {step} from {ev.ckpt_dir}")

    exp = export_mod.export_inference(cfg, params, batch_size=args.batch)
    n = export_mod.save_exported(exp, args.out)
    print(
        f"[export] wrote {args.out}: {n / 1e6:.1f} MB, platforms="
        f"{exp.platforms}, batch={args.batch}"
    )

    if args.verify:
        fn = export_mod.load_serving_fn(args.out)
        arrays, _ = next(ev.dataset.batches(args.batch, 0, augment=False))
        from sparse_pooling_tpu.models import pipeline as pl

        batch = pl.RawSample(*(jnp.array(a) for a in arrays))
        got = fn(batch)
        want = ev._make_eval_fn()(params, batch)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5
            )
        print(f"[export] verify OK: {sorted(want)} match the live pipeline")


if __name__ == "__main__":
    main()
