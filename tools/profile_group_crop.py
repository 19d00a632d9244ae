"""Grouped RPN ROI crop: 6D-einsum vs flat-layout formulation, fwd and bwd.

Motivation (ROADMAP.md round-3): the training batch-size knee sweep OOMed at
batch 32 because ``_group_einsum_impl``'s 6D intermediate t [B,P,V,ch,px,c]
tile-pads 10.7-21.3x ((px, c) = (12, 8) trailing dims vs (8,128)/(16,128)
TPU tiles) — 3.0 GB for 288 MB of payload. ``_group_flat_impl`` keeps every
materialized tensor 4D with >= 96-lane minors. This tool measures both forms
at the cars production shapes (pooled BEV src 176x200x8, P=512 positions,
V=32 variants, 3x3 crops, patch 12) across batch sizes, fwd and fwd+bwd.

Usage: python tools/profile_group_crop.py [--batches 8,16,32] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def timed(fn, args, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def repeat(dep0, *a):
        def loop(_, dep):
            out = fn(*jax.tree.map(
                lambda x: x + (dep * 0).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a,
            ))
            s = sum(
                jnp.sum(l[..., :1].astype(jnp.float32))
                for l in jax.tree.leaves(out)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            )
            return dep * 0.0 + s * 1e-20

        return jax.lax.fori_loop(0, n, loop, dep0)

    import jax.numpy as jnp

    try:
        float(repeat(jnp.float32(0), *args))
    except Exception as e:  # XLA OOM surfaces as RuntimeError
        return float("nan"), f"{type(e).__name__}: {str(e)[:120]}"
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n, ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_pooling_tpu.ops import crop_resize as cr

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    h, w, c = 176, 200, 8  # cars BEV decode/2 then roi-stride pool /2, 8ch
    p, v, s, patch = 512, 32, 3, 12
    rng = np.random.RandomState(0)

    variants = {
        "einsum6d": lambda im, bx: cr.crop_and_resize_group_einsum_px(
            im, bx, (s, s), patch=patch),
        "flat": lambda im, bx: cr.crop_and_resize_group_flat_px(
            im, bx, (s, s), patch=patch),
    }

    for b in [int(x) for x in args.batches.split(",")]:
        img = jnp.asarray(rng.randn(b, h, w, c), dtype=dt)
        cy = rng.uniform(2, h - 3, (b, p, 1))
        cx = rng.uniform(2, w - 3, (b, p, 1))
        sy = rng.uniform(0.5, 4.0, (b, p, v))
        sx = rng.uniform(0.5, 4.0, (b, p, v))
        boxes = jnp.asarray(
            np.stack([cy - sy, cx - sx, cy + sy, cx + sx], -1), jnp.float32)

        for name, fn in variants.items():
            t_fwd, err = timed(fn, (img, boxes), n=args.iters)
            if err:
                print(f"b={b:3d} {name:9s} fwd FAIL {err}")
                continue

            def step(im, bx, fn=fn):
                out, vjp = jax.vjp(lambda i: fn(i, bx), im)
                (gi,) = vjp(out)
                return gi

            t_bwd, err2 = timed(step, (img, boxes), n=args.iters)
            bwd_s = f"{t_bwd*1e3:8.2f} ms" if not err2 else f"FAIL {err2}"
            print(
                f"b={b:3d} {name:9s} fwd {t_fwd*1e3:8.2f} ms   fwd+bwd {bwd_s}"
                f"   ({t_fwd/b*1e3:.3f} ms/frame fwd)"
            )
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(f"     peak_bytes_in_use so far: {peak/2**30:.2f} GiB")


if __name__ == "__main__":
    main()
