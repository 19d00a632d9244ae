"""Driver benchmark: end-to-end KITTI-frame inference throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the BASELINE.json north-star: end-to-end frames/sec/chip for
the flagship cars-config SHPL fusion detector — the FULL per-frame compiled
graph (voxelize -> sparse correspondence build -> two-branch VGG pyramid +
SHPL fusion -> RPN -> stage-2 -> decode + NMS) at inference batch 8 on
synthetic KITTI-like frames (no KITTI dataset exists in this environment;
frame statistics match real scans: ~16k points in the camera frustum).

Timing note: this TPU is reached through a remote runtime whose dispatch
pipelining makes naive block_until_ready loops unreliable; the benchmark
runs N iterations inside ONE compiled fori_loop with forced data
dependencies and reads back a scalar, so the measured time is true device
execution time (the deployable number: the host pipeline double-buffers
transfers under it).

vs_baseline is against the reference detector's published end-to-end
inference rate (~10 fps on a Titan Xp, BASELINE.md); the north-star target
is 50 fps/chip.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--preset", default="cars",
        help="model preset to bench (driver metric: cars; 'people' records "
        "the multi-class preset's rate, 'rcnn_cars' the MV3D-style second "
        "consumer's)",
    )
    ap.add_argument(
        "--batch", type=int, default=48,
        help="frames per step. Throughput/chip rises with batch until HBM "
        "pressure: 92.7 fps at 8, 103.9 at 16, 111.0 at 32, 118.6 at 40, "
        "119.3 at 48, 116.7 at 56, 85.6 at 64 (TPU v5e, 2026-08-19) — 48 "
        "is the measured knee and the default; the eval sweep keeps "
        "batch 8 (host-latency-bound there)",
    )
    ap.add_argument(
        "--roi_quad", type=int, default=None,
        help="override rpn.roi_quad for A/B (preset default otherwise)",
    )
    # semantic perf levers (round-4 verdict item 2: byte floors are closed;
    # remaining fps comes from FEWER entries/proposals — price each arm
    # here for fps and in cars_check for AP before touching a default)
    ap.add_argument(
        "--eval_nms_size", type=int, default=None,
        help="override rpn.eval_nms_size (stage-2 proposal count P; the "
        "stage-2 crop/FC/NMS stages scale with it)",
    )
    ap.add_argument(
        "--pre_top_k", type=int, default=None,
        help="override rpn.pre_nms_top_k (RPN NMS candidate pool)",
    )
    ap.add_argument(
        "--pool_channels", type=int, default=None,
        help="override sparse_pool.pool_channels (SHPL bottleneck width)",
    )
    ap.add_argument(
        "--final_nms_size", type=int, default=None,
        help="override avod.nms_size (final per-class detection cap)",
    )
    args = ap.parse_args()

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents
    from sparse_pooling_tpu.configs.presets import preset
    from sparse_pooling_tpu.models import pipeline as pl

    batch_size = args.batch
    n_iters = 10
    cfg = preset(args.preset).model
    if args.roi_quad is not None:
        cfg = dataclasses.replace(
            cfg, rpn=dataclasses.replace(cfg.rpn, roi_quad=args.roi_quad)
        )
    if args.eval_nms_size is not None:
        cfg = dataclasses.replace(
            cfg, rpn=dataclasses.replace(cfg.rpn, eval_nms_size=args.eval_nms_size)
        )
    if args.pre_top_k is not None:
        cfg = dataclasses.replace(
            cfg, rpn=dataclasses.replace(cfg.rpn, pre_nms_top_k=args.pre_top_k)
        )
    if args.pool_channels is not None:
        cfg = dataclasses.replace(
            cfg,
            sparse_pool=dataclasses.replace(
                cfg.sparse_pool, pool_channels=args.pool_channels
            ),
        )
    if args.final_nms_size is not None:
        cfg = dataclasses.replace(
            cfg, avod=dataclasses.replace(cfg.avod, nms_size=args.final_nms_size)
        )
    ext = AreaExtents()
    model = pl.make_model(cfg, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))

    frames = [
        _synthetic_raw(cfg, ext, n_points=16384, seed=i) for i in range(batch_size)
    ]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    # the host pipeline pads each batch to its point BUCKET, not the cap
    # (data.pointcloud.trim_points_to_bucket) — bench does the same
    from sparse_pooling_tpu.data.pointcloud import trim_points_to_bucket
    import numpy as np
    pts, mask = trim_points_to_bucket(
        np.asarray(batch.points), np.asarray(batch.points_mask),
        cfg.sparse_pool.buckets,
    )
    batch = batch._replace(points=jnp.array(pts), points_mask=jnp.array(mask))
    key = jax.random.PRNGKey(0)
    raw0 = jax.tree.map(lambda x: x[0], batch)

    def init_fn(key, raw):
        inputs = pl.build_model_inputs(
            raw, anchors_static, jnp.ones((2,), jnp.float32), cfg, ext
        )
        return model.init({"params": key, "dropout": key}, inputs, train=False)

    params = jax.jit(init_fn)(key, raw0)

    @jax.jit
    def repeat(dep0, params, batch):
        def body(i, dep):
            b = batch._replace(points=batch.points + dep)
            out = pl.forward_batch_fn(
                model, params, b, anchors_static, cfg, ext, False
            )
            det = pl.decode_batch(out, b.ground_plane, cfg, ext)
            return dep * 0.0 + jnp.sum(det["scores"][..., :1]) * 1e-20
        return jax.lax.fori_loop(0, n_iters, body, dep0)

    float(repeat(jnp.float32(0), params, batch))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0), params, batch))
    dt = (time.perf_counter() - t0) / n_iters
    fps = batch_size / dt

    baseline_fps = 10.0  # reference end-to-end inference (~0.1 s/frame)
    suffix = "" if args.preset == "cars" else f"_{args.preset}"
    print(
        json.dumps(
            {
                "metric": f"kitti_e2e_inference_frames_per_sec_per_chip{suffix}",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
