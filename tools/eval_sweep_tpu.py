"""Timed full-evaluator val sweep on TPU (round-2 verdict item #3).

The bench number is the compiled-graph fori_loop rate; this tool clocks the
WHOLE eval stack of SURVEY.md §4.2 — host IO (PNG decode, velodyne read,
pad) -> threaded loader -> DevicePrefetcher -> batched jitted forward +
decode -> KITTI-format txt writer -> C++ AP evaluator — over a
KITTI-val-sized synthetic tree, at the flagship cars-preset shapes.

Usage:  python tools/eval_sweep_tpu.py [--frames 3712] [--root DIR]
        [--reuse]  (keep a previously generated tree)

Writes the standard eval_<step>.json via the production Evaluator and
prints the end-to-end eval fps. Record results in BASELINE.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3712)
    ap.add_argument("--root", default="/tmp/spt_eval_sweep/kitti")
    ap.add_argument("--workdir", default="/tmp/spt_eval_sweep/exp")
    ap.add_argument("--reuse", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--device", default=None)
    ap.add_argument(
        "--image_cache", default=None,
        help="decoded-image cache dir (dataset.image_cache_dir): the val "
        "set is fixed, so production sweeps decode each PNG once ever; "
        "pass a dir to use/build it (first pass pays decode + write)",
    )
    ap.add_argument("--inflight", type=int, default=None,
                    help="override eval.inflight_batches")
    ap.add_argument("--readback_group", type=int, default=None,
                    help="override eval.readback_group")
    ap.add_argument("--workers", type=int, default=None,
                    help="override eval.num_workers")
    args = ap.parse_args()

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    import sparse_pooling_tpu as _spt

    _spt.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_pooling_tpu.configs import cars_pyramid_config
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.runtime.evaluator import Evaluator

    marker = os.path.join(args.root, f".generated_{args.frames}")
    if not (args.reuse and os.path.exists(marker)):
        t0 = time.time()
        # every frame is a val frame: the sweep IS the val split
        synthetic.write_kitti_tree(
            args.root, num_frames=args.frames, n_ground=12288, n_obj=4096,
            val_frames=tuple(range(args.frames)),
        )
        open(marker, "w").write("ok\n")
        print(f"[sweep] generated {args.frames} frames in {time.time() - t0:.0f}s")

    # this environment reaches the chip through a tunneled runtime whose
    # bandwidth VARIES (measured 36-300 MB/s across sessions); the sweep is
    # transfer-bound below ~100 MB/s (1.64 MB/frame of image+points), so
    # print the link speed at measurement time or the fps is uninterpretable
    probe = np.ones((8, 384, 1248, 3), np.uint8)  # the eval image payload
    jax.device_put(probe[:1]).block_until_ready()  # warm the runtime
    t0 = time.time()
    dev = jax.device_put(probe)
    dev.block_until_ready()
    up_mbs = probe.nbytes / 1e6 / (time.time() - t0)
    # readback direction: per-fetch round-trip latency dominates the sweep's
    # readback phase (~86 KB packed detections/batch), so probe BOTH a tiny
    # fetch (latency) and a big one (bandwidth)
    tiny = jax.device_put(np.ones((64,), np.float32))
    np.asarray(tiny)
    t0 = time.time()
    for _ in range(5):
        np.asarray(tiny)
    rt_ms = (time.time() - t0) / 5 * 1e3
    t0 = time.time()
    np.asarray(dev)
    down_mbs = probe.nbytes / 1e6 / (time.time() - t0)
    print(f"[sweep] tunnel now: up {up_mbs:.0f} MB/s, down {down_mbs:.0f} "
          f"MB/s, fetch round-trip {rt_ms:.0f} ms "
          f"(upload-bound fps ceiling ~{up_mbs / 1.64:.0f})")

    cfg = cars_pyramid_config()
    eval_cfg = dataclasses.replace(cfg.eval, batch_size=args.batch)
    if args.inflight is not None:
        eval_cfg = dataclasses.replace(eval_cfg, inflight_batches=args.inflight)
    if args.readback_group is not None:
        eval_cfg = dataclasses.replace(
            eval_cfg, readback_group=args.readback_group
        )
    if args.workers is not None:
        eval_cfg = dataclasses.replace(eval_cfg, num_workers=args.workers)
    cfg = dataclasses.replace(
        cfg,
        experiments_dir=args.workdir,
        dataset=dataclasses.replace(
            cfg.dataset, root=args.root, split="val",
            image_cache_dir=args.image_cache or "",
        ),
        eval=eval_cfg,
    )
    os.makedirs(args.workdir, exist_ok=True)

    ev = Evaluator(cfg)
    # random-init params: this measures THROUGHPUT of the full stack (the
    # AP backend runs for real over all frames; its value is chance-level)
    t0 = time.time()
    params = ev._params_template()
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"[sweep] params init in {time.time() - t0:.0f}s")

    def _cpu_totals():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        user, nice, system, idle, iowait, irq, softirq, steal = (
            int(x) for x in parts[:8]
        )
        import resource

        ru = resource.getrusage(resource.RUSAGE_SELF)
        return {
            "proc_cpu": ru.ru_utime + ru.ru_stime,
            "sys_busy": (user + nice + system + irq + softirq) / 100.0,
            "sys_idle": (idle + iowait) / 100.0,
            "sys_steal": steal / 100.0,
        }

    c0 = _cpu_totals()
    t_wall = time.time()
    result = ev.run_checkpoint_once(step=0, params=params)
    t_wall = time.time() - t_wall
    c1 = _cpu_totals()
    # who held the single host core during the sweep: this PROCESS's real
    # CPU, other processes (sys_busy - proc), hypervisor steal, or idle —
    # in-context phase timings are uninterpretable without this split
    print(
        f"[sweep] core accounting over {t_wall:.1f}s wall: this process "
        f"{c1['proc_cpu'] - c0['proc_cpu']:.1f}s cpu, system busy "
        f"{c1['sys_busy'] - c0['sys_busy']:.1f}s, steal "
        f"{c1['sys_steal'] - c0['sys_steal']:.1f}s, idle+iowait "
        f"{c1['sys_idle'] - c0['sys_idle']:.1f}s"
    )
    print(
        f"[sweep] END-TO-END: {result['num_frames']} frames in "
        f"{result['seconds']:.1f}s = {result['frames_per_sec']:.1f} fps "
        f"(AP backend {result['ap_backend']})"
    )


if __name__ == "__main__":
    main()
