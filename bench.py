"""Driver benchmark: end-to-end single-chip KITTI-frame inference rate.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the BASELINE.json north-star: end-to-end frames/sec/chip for
the flagship cars-config SHPL fusion detector — the FULL per-frame compiled
graph (voxelize -> sparse correspondence build -> two-branch VGG pyramid +
SHPL fusion -> RPN -> stage-2 -> decode + NMS) on synthetic KITTI-like
frames (no KITTI dataset exists in this environment; frame statistics match
real scans: ~16k points in the camera frustum).

vs_baseline is against the reference detector's published end-to-end
inference rate (~10 fps on a Titan Xp, BASELINE.md "AVOD end-to-end
inference"); the north-star target is 50 fps/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.models.detector import decode_detections

    cfg = cars_pyramid_config().model
    ext = AreaExtents()
    model = pl.make_model(cfg, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))

    frames = [
        _synthetic_raw(cfg, ext, n_points=16384, seed=i) for i in range(4)
    ]
    key = jax.random.PRNGKey(0)

    def init_fn(key, raw):
        inputs = pl.build_model_inputs(
            raw, anchors_static, jnp.ones((2,), jnp.float32), cfg, ext
        )
        return model.init({"params": key, "dropout": key}, inputs, train=False)

    params = jax.jit(init_fn)(key, frames[0])

    @jax.jit
    def infer(params, raw):
        out = pl.forward_single(model, params, raw, anchors_static, cfg, ext, False)
        return decode_detections(out, raw.ground_plane, cfg, ext)

    # warmup / compile
    jax.block_until_ready(infer(params, frames[0]))

    n_iters = 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        det = infer(params, frames[i % len(frames)])
    jax.block_until_ready(det)
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    baseline_fps = 10.0  # reference end-to-end inference (~0.1 s/frame)
    print(
        json.dumps(
            {
                "metric": "kitti_e2e_inference_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
