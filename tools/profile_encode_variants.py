"""Probe the conv encode/decode floor (round-2 verdict item #7).

The VGG-pyramid encode+decode is the largest remaining block (5.2
ms/frame of the ~11.6 ms frame at 86.6 fps). This tool times layout /
shape variants of the SAME capability class standalone:

  base      — production config: s2d(2), channels (32,64,128,256),
              blocks (2,2,3,3), decode_stride 2
  wide      — equal-ish FLOPs, wider+shallower: (48,96,192,256) x (1,1,2,2)
  s2d4      — space-to-depth factor 4 equivalent: start at stride 4 with
              96 input channels (4x4 packing), drop one pool level
  slim_dec  — decode with half-width lateral convs
  bf16_in   — cast the raster input to bf16 before the first conv

Each row reports ms/batch fwd (and fwd+bwd with --train) at bench shapes.
Results belong in the module docstring of models/backbone.py and
ROADMAP.md once a winner (or the floor) is established.

Usage: python tools/profile_encode_variants.py [--batch 8] [--train]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()
from profile_stages import timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config
    from sparse_pooling_tpu.models.backbone import VggPyramidExtractor

    cfg = cars_pyramid_config().model
    ext = AreaExtents()
    b = args.batch
    hb, wb = cfg.bev.padded_hw(ext)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    bev_in = jnp.array(rng.rand(b, hb, wb, 6), jnp.float32)
    dt = jnp.bfloat16

    variants = {
        "base": dict(
            channels=(32, 64, 128, 256), blocks=(2, 2, 3, 3),
            space_to_depth=True,
        ),
        "wide_shallow": dict(
            channels=(48, 96, 192, 256), blocks=(1, 1, 2, 2),
            space_to_depth=True,
        ),
        "narrow_deep": dict(
            channels=(24, 48, 96, 192), blocks=(3, 3, 4, 4),
            space_to_depth=True,
        ),
        "no_s2d": dict(
            channels=(32, 64, 128, 256), blocks=(2, 2, 3, 3),
            space_to_depth=False,
        ),
    }

    def flops(ch, blocks, s2d):
        total = 0
        h, w = (hb // 2, wb // 2) if s2d else (hb, wb)
        cin = 24 if s2d else 6
        for ci, nb in zip(ch, blocks):
            for _ in range(nb):
                total += h * w * cin * ci * 9 * 2
                cin = ci
            h, w = h // 2, w // 2
        return total / 1e9

    for name, kw in variants.items():
        ex = VggPyramidExtractor(
            kw["channels"], kw["blocks"], cfg.backbone.out_channels, dt,
            decode_stride=cfg.backbone.decode_stride,
            space_to_depth=kw["space_to_depth"],
        )
        params = ex.init(key, bev_in[:1])

        def enc(p, x, ex=ex):
            return ex.apply(p, x, method="encode")

        def full(p, x, ex=ex):
            mid, skips = ex.apply(p, x, method="encode")
            return ex.apply(p, mid, skips, method="decode")

        try:
            dt_e = timed(enc, (params, bev_in), args.iters)
            dt_f = timed(full, (params, bev_in), args.iters)
            row = (
                f"{name:14s} enc {dt_e*1e3:7.2f} ms/b  enc+dec "
                f"{dt_f*1e3:7.2f} ms/b  ({flops(kw['channels'], kw['blocks'], kw['space_to_depth']) * b:6.0f} GFLOP/b)"
            )
            if args.train:
                from profile_train import gradded

                dt_g = timed(gradded(full), (params, bev_in), args.iters)
                row += f"  fwd+bwd {dt_g*1e3:7.2f} ms/b"
            print(row)
        except Exception as e:
            print(f"{name:14s} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
