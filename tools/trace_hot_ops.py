"""Real-TPU hot-op ranking: jax.profiler trace of the bench graph, parsed.

Captures a profiler trace of N un-looped calls of the EXACT benched
forward+decode (dispatch pipelining inflates host wall time, but the
DEVICE-lane op durations in the trace are true hardware times), then
aggregates the TPU lane's events by fusion name and prints the top-K
with ms/iter and share of device time.

This is the measurement the CPU cost model cannot give (XLA bills whole
operands to gathers); use it to rank byte/latency levers honestly.

Usage: python tools/trace_hot_ops.py [--preset cars] [--batch 48]
           [--iters 3] [--top 25] [--train]

--train traces the FULL train step (inputs -> forward -> loss -> grads
-> Adam) instead of the inference graph (cars preset pipeline).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import tempfile

sys.path.insert(0, ".")

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="cars")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--train", action="store_true")
    ap.add_argument(
        "--remat", action="store_true",
        help="backbone.remat=True (with --train): trace the remat backward\n        to localize the batch-32 superlinear anomaly",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents
    from sparse_pooling_tpu.configs.presets import preset
    from sparse_pooling_tpu.data.pointcloud import trim_points_to_bucket
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.runtime.profiling import trace

    b = args.batch
    cfg = preset(args.preset).model
    if args.remat:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, remat=True)
        )
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

    if args.train:
        from sparse_pooling_tpu.configs.presets import preset as preset_fn
        from sparse_pooling_tpu.runtime.trainer import (
            build_optimizer, make_train_step,
        )

        pipe = preset_fn(args.preset)
        if args.remat:
            import dataclasses

            pipe = dataclasses.replace(
                pipe, model=dataclasses.replace(
                    pipe.model, backbone=dataclasses.replace(
                        pipe.model.backbone, remat=True
                    )
                )
            )
        tx = build_optimizer(pipe)
        opt_state = jax.jit(tx.init)(params)
        train_step = make_train_step(model, tx, anchors_static, pipe, ext)

        @jax.jit
        def step(params, batch):
            return train_step(params, opt_state, batch, key)[:2]

    else:

        @jax.jit
        def step(params, batch):
            out = pl.forward_batch_fn(
                model, params, batch, anchors_static, cfg, ext, False
            )
            return pl.decode_batch(out, batch.ground_plane, cfg, ext)

    jax.block_until_ready(step(params, batch))  # compile + warm

    logdir = args.logdir or tempfile.mkdtemp(prefix="spt_trace_")
    with trace(logdir):
        for _ in range(args.iters):
            jax.block_until_ready(step(params, batch))

    path = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    tpu_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    # Aggregate op events only from "XLA Ops" device lanes. The
    # module-level executable event ("jit_step(<fingerprint>)" — or any
    # renamed/pmap equivalent) lives on its own "XLA Modules" lane and
    # spans the whole iteration, so counting it doubles the device total
    # (observed 2026-08-20). Lane NAMES come from the trace's thread_name
    # metadata — structural, not an executable-name pattern (round-3
    # advisor finding #3). Containment below is a second guard for any
    # parent-style event that still shares the op lane.
    lane_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lane_names[(e["pid"], e.get("tid"))] = str(
                e.get("args", {}).get("name", "")
            )
    lanes = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            key = (e["pid"], e.get("tid"))
            lname = lane_names.get(key, "")
            # keep unnamed lanes (older trace formats) for the containment
            # pass; drop known non-op lanes
            if lname and "XLA Ops" not in lname:
                continue
            lanes.setdefault(key, []).append(e)
    parents = set()
    for lane in lanes.values():
        lane.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        for e in lane:
            while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"]:
                stack.pop()
            if stack:  # e nests inside stack[-1] -> that event is a parent
                parents.add(id(stack[-1]))
            stack.append(e)

    agg = {}
    total = 0.0
    for lane in lanes.values():
        for e in lane:
            if id(e) in parents:
                continue
            name = e.get("name", "?")
            row = agg.setdefault(name, [0, 0.0, "", ""])
            row[0] += 1
            row[1] += e["dur"]
            total += e["dur"]
            a = e.get("args", {})
            if not row[2]:
                row[2] = str(a.get("hlo_category", ""))[:18]
                ln = str(a.get("long_name", ""))
                # keep just "<out_shape> fusion(<first operand shape>"
                row[3] = ln.split(" = ", 1)[-1][:72]
    per_iter = total / args.iters / 1e3
    print(f"trace: {path}")
    print(
        f"device total {per_iter:.2f} ms/iter ({per_iter / b:.3f} ms/frame) "
        f"over {args.iters} iters, {len(agg)} distinct ops"
    )
    # per-category rollup first (convs vs gathers vs layout copies)
    cats = {}
    for name, (c, d, cat, _) in agg.items():
        row = cats.setdefault(cat or "?", [0, 0.0])
        row[0] += c
        row[1] += d
    print("by category:")
    for cat, (c, d) in sorted(cats.items(), key=lambda kv: -kv[1][1])[:8]:
        print(
            f"{d / args.iters / 1e3:9.3f} {100.0 * d / total:6.2f} "
            f"n={c // args.iters:5d}  {cat}"
        )
    print(f"{'ms/iter':>9s} {'%dev':>6s} {'x/iter':>7s}  op")
    for name, (c, d, cat, ln) in sorted(agg.items(), key=lambda kv: -kv[1][1])[
        : args.top
    ]:
        print(
            f"{d / args.iters / 1e3:9.3f} {100.0 * d / total:6.2f} "
            f"{c / args.iters:7.1f}  {name[:40]:40s} [{cat}] {ln}"
        )


if __name__ == "__main__":
    main()
