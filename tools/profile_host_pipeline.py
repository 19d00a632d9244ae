"""Profile the eval-sweep HOST pipeline per-frame costs (no device needed).

The 3.7k-frame TPU eval sweep is host-core-bound on this VM (nproc=1), so
the levers are all host-side: sample load (native PNG decode + fused point
filter), batch stack + bucket pad, KITTI txt render (native C formatter).
This tool times each stage over the sweep tree (or any --root) and prints
one line per stage, ms/frame.

Measured on this VM (2026-08-17, 48 frames of the 3712-frame sweep tree,
single core):

    load_sample        5.68 ms/frame serial (native decode 3.5, points 0.5)
    _host_batches      5.40 ms/frame (batch 8, 4 threads; ~= serial on 1 core)
    _stack+bucket      0.28 ms/frame (hot cache)
    write_predictions  1.76 ms/frame at 300 kept boxes (native formatter;
                       Python fallback 1.9 ms of formatting alone)

Usage: python tools/profile_host_pipeline.py [--root DIR] [--frames 48]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/spt_eval_sweep/kitti")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sparse_pooling_tpu.configs import cars_pyramid_config
    from sparse_pooling_tpu.native import pred_format, sample_loader
    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    print(f"native sample_loader: {sample_loader.available()}, "
          f"pred_format: {pred_format.available()}")

    cfg = cars_pyramid_config()
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, root=args.root, split="val")
    )
    ev = Evaluator(cfg)
    ids = ev.dataset.sample_ids[: args.frames]

    ev.dataset.load_sample(ids[0], augment_seed=None)  # warm
    t0 = time.perf_counter()
    samples = [ev.dataset.load_sample(s, augment_seed=None) for s in ids]
    dt = time.perf_counter() - t0
    print(f"load_sample        {1e3 * dt / len(ids):6.2f} ms/frame (serial)")

    gen = ev._host_batches(args.batch)
    next(gen)
    t0 = time.perf_counter()
    nb = max(len(ids) // args.batch - 1, 1)
    for _ in range(nb):
        next(gen)
    dt = time.perf_counter() - t0
    print(f"_host_batches      {1e3 * dt / (nb * args.batch):6.2f} ms/frame "
          f"(batch {args.batch}, {cfg.eval.num_workers} threads)")

    chunk = ids[: args.batch]
    batch_samples = samples[: args.batch]
    ev._stack(batch_samples, chunk)
    t0 = time.perf_counter()
    for _ in range(10):
        ev._stack(batch_samples, chunk)
    dt = time.perf_counter() - t0
    print(f"_stack+bucket      {1e3 * dt / (10 * args.batch):6.2f} ms/frame")

    from sparse_pooling_tpu.runtime import predictions as pred_mod

    rng = np.random.RandomState(0)
    C, K = len(cfg.model.classes), 300
    det = {
        "boxes_3d": np.stack(
            [rng.uniform(-20, 20, (C, K)), rng.uniform(0.5, 2.5, (C, K)),
             rng.uniform(2, 60, (C, K)), rng.uniform(0.5, 4.5, (C, K)),
             rng.uniform(0.4, 2.0, (C, K)), rng.uniform(0.8, 2.0, (C, K)),
             rng.uniform(-np.pi, np.pi, (C, K))], axis=-1),
        "scores": rng.uniform(0, 1, (C, K)),
        "valid": np.ones((C, K), bool),
    }
    p2 = np.array([[700.0, 0, 600, 0], [0, 700.0, 180, 0], [0, 0, 1.0, 0]])
    import tempfile

    d = tempfile.mkdtemp()
    pred_mod.write_predictions(d, "w", det, cfg.model.classes, p2, (375, 1242), 0.1)
    t0 = time.perf_counter()
    for i in range(50):
        pred_mod.write_predictions(
            d, f"{i:06d}", det, cfg.model.classes, p2, (375, 1242), 0.1
        )
    dt = time.perf_counter() - t0
    print(f"write_predictions  {1e3 * dt / 50:6.2f} ms/frame ({K} boxes kept)")


if __name__ == "__main__":
    main()
