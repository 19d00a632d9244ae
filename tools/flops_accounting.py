"""FLOP/byte accounting and MFU for the flagship inference graph.

What the bench number means in hardware terms: compiles the PRODUCTION
batch forward+decode (the exact graph bench.py times) and reads XLA's
own cost model (`compiled.cost_analysis()`: algebraic flops + bytes
accessed), then divides by measured TPU rates to report achieved
TFLOP/s, HBM GB/s, and MFU vs the chip's bf16 peak.

The compile runs on CPU by default — XLA's flop count is the algebraic
operation count of the HLO, not a backend measurement, so it is the
same accounting the TPU graph gets (fusion differences change bytes,
not flops; bytes are reported as the CPU lower bound and labeled so).

Usage:
  python tools/flops_accounting.py [--preset cars] [--batch 8]
      [--fps 92.7] [--peak_tflops 197] [--peak_gbps 819] [--stages]

Defaults for --peak: TPU v5e single chip (197 bf16 TFLOP/s, 819 GB/s).
Pass the measured bench fps for the same preset/batch via --fps.

--stages prints a per-stage GFLOP/frame + MB/frame ranking over
tools/profile_stages.py's stage table (cars preset only). Caveat there:
XLA's "bytes accessed" counts WHOLE operands, so gather-heavy stages
(ROI crops, NMS) report upper bounds — a gather that touches 1% of a
35 MB feature map is still billed 35 MB. Measured ranking 2026-08-19
(batch 32, MB/frame): roi_rpn 616-689, bev_encode 579, shpl 471,
img_encode 433, voxelize 354, roi_s2 322-362, in_filter 316, nms 278,
decode 165-195 — the conv stages run ~33% MFU while the zero-FLOP
gather/scatter stages carry the byte budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="cars")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument(
        "--fps", type=float, default=None,
        help="measured end-to-end fps/chip for this preset+batch "
        "(bench.py); enables the TFLOP/s + MFU rows",
    )
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--peak_gbps", type=float, default=819.0)
    ap.add_argument(
        "--backend", default="cpu",
        help="compile backend for the cost analysis (cpu avoids touching "
        "the single-tenant TPU; flops are backend-independent)",
    )
    ap.add_argument(
        "--stages", action="store_true",
        help="per-stage GFLOP/MB ranking over profile_stages.py's table "
        "(cars preset; see module docstring for the gather-bytes caveat)",
    )
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.stages:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import importlib

        ps = importlib.import_module("profile_stages")
        stages = ps.build_stages(args.batch, False)
        print(f"{'stage':22s} {'GF/frame':>9s} {'MB/frame':>9s}")
        for name, (body, sargs) in stages.items():
            try:
                ca = jax.jit(body).lower(*sargs).compile().cost_analysis() or {}
                print(
                    f"{name:22s} {ca.get('flops', 0.0) / args.batch / 1e9:9.2f} "
                    f"{ca.get('bytes accessed', 0.0) / args.batch / 1e6:9.1f}"
                )
            except Exception as e:  # noqa: BLE001
                print(f"{name:22s} FAIL {type(e).__name__}: {str(e)[:60]}")
        return

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents
    from sparse_pooling_tpu.configs.presets import preset
    from sparse_pooling_tpu.data.pointcloud import trim_points_to_bucket
    from sparse_pooling_tpu.models import pipeline as pl

    b = args.batch
    cfg = preset(args.preset).model
    ext = AreaExtents()
    model = pl.make_model(cfg, ext)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))

    frames = [_synthetic_raw(cfg, ext, n_points=16384, seed=i) for i in range(b)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
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

    def step(params, batch):
        out = pl.forward_batch_fn(
            model, params, batch, anchors_static, cfg, ext, False
        )
        return pl.decode_batch(out, batch.ground_plane, cfg, ext)

    t0 = time.perf_counter()
    compiled = jax.jit(step).lower(params, batch).compile()
    ca = compiled.cost_analysis() or {}
    compile_s = time.perf_counter() - t0

    flops = float(ca.get("flops", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    gf_frame = flops / b / 1e9
    gb_frame = nbytes / b / 1e9
    rows = {
        "preset": args.preset,
        "batch": b,
        "backend": args.backend,
        "compile_s": round(compile_s, 1),
        "gflop_per_frame": round(gf_frame, 2),
        "gbyte_accessed_per_frame": round(gb_frame, 3),
        "arithmetic_intensity_flop_per_byte": round(flops / nbytes, 1)
        if nbytes else None,
    }
    if args.fps:
        tflops = gf_frame * args.fps / 1e3
        gbps = gb_frame * args.fps
        rows.update(
            fps=args.fps,
            achieved_tflops=round(tflops, 2),
            mfu_pct=round(100.0 * tflops / args.peak_tflops, 2),
            achieved_hbm_gbps_lower_bound=round(gbps, 1),
            hbm_util_pct_lower_bound=round(100.0 * gbps / args.peak_gbps, 1),
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
