"""SHPL pooling implementation matrix (round-2 verdict item #5 / N7).

Times every candidate formulation of the sparse cross-view pooling at
production shapes (batch 8, point bucket 16384, 64 pooled channels,
8800-target BEV fusion lattice):

  point_major      — PRODUCTION: gather 4 taps/point, fp32 combine, one
                     unsorted segment-sum (deferred row norm rides along)
  flat_coo         — 4x entries through one unsorted segment-sum
  sorted_segsum    — device sort by target row + indices_are_sorted=True
                     (the cost of making the scalar-prefetch CSR layout
                     AVAILABLE on device — Pallas needs sorted rows)
  sorted_presorted — sorted segment-sum alone (sort excluded), i.e. the
                     best case a Pallas CSR kernel could amortize against
  patch_major      — one 2x2-window gather descriptor per point
  onehot_mxu       — dense one-hot matmul on the MXU (tile x tile)

Usage: python tools/profile_shpl_variants.py [--batch 8]
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
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config
    from sparse_pooling_tpu.ops import sparse_pool as sp

    cfg = cars_pyramid_config().model
    ext = AreaExtents()
    b, p, c = args.batch, args.points, args.channels
    fs = cfg.sparse_pool.fusion_stride
    hb, wb = (d // fs for d in cfg.bev.padded_hw(ext))
    hi, wi = cfg.image.height // fs, cfg.image.width // fs
    t = hb * wb  # 8800 targets (img->bev direction)
    s = hi * wi  # 7488 sources

    rng = np.random.RandomState(0)
    rows = jnp.array(rng.randint(0, t, (b, p)), jnp.int32)
    cols = jnp.array(rng.randint(0, s, (b, p, 4)), jnp.int32)
    vals = jnp.array(rng.rand(b, p, 4), jnp.float32)
    src = jnp.array(rng.rand(b, s, c), jnp.bfloat16)

    def run(name, fn, *a):
        try:
            dt = timed(fn, a, args.iters)
            print(f"{name:18s} {dt*1e3:8.2f} ms/batch  {dt*1e3/b:6.2f} ms/frame")
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:120]}")

    run(
        "point_major",
        lambda s_, r_, c_, v_: sp.sparse_pool_point_major_batch(
            s_, r_, c_, v_, num_targets=t, divide_by_weight_sum=True
        ),
        src, rows, cols, vals,
    )

    rows4 = jnp.repeat(rows, 4, axis=-1)
    run(
        "flat_coo",
        lambda s_, r_, c_, v_: sp.sparse_pool_coo_batch(
            s_, r_, c_.reshape(b, -1), v_.reshape(b, -1), num_targets=t
        ),
        src, rows4, cols, vals,
    )

    # sorted: flatten batch into row space, sort entries by row, sorted segsum
    def sorted_pool(s_, r_, c_, v_, presorted_perm=None):
        row_off = (jnp.arange(b, dtype=jnp.int32) * t)[:, None]
        rr = (r_ + row_off).reshape(-1)
        order = jnp.argsort(rr) if presorted_perm is None else presorted_perm
        rr_s = jnp.take(rr, order)
        cc = (c_ + (jnp.arange(b, dtype=jnp.int32) * s)[:, None, None]).reshape(
            -1, 4
        )
        cc_s = jnp.take(cc, order, axis=0)
        vv_s = jnp.take(v_.reshape(-1, 4), order, axis=0)
        g = jnp.take(src.reshape(b * s, c), cc_s.reshape(-1), axis=0).reshape(
            -1, 4, c
        )
        g = jnp.sum(g.astype(jnp.float32) * vv_s[..., None], axis=1)
        return jax.ops.segment_sum(
            g, rr_s, num_segments=b * t, indices_are_sorted=True
        )

    run("sorted_segsum", sorted_pool, src, rows, cols, vals)

    row_off = (jnp.arange(b, dtype=jnp.int32) * t)[:, None]
    perm = jnp.argsort((rows + row_off).reshape(-1))
    run(
        "sorted_presorted",
        lambda s_, r_, c_, v_: sorted_pool(s_, r_, c_, v_, presorted_perm=perm),
        src, rows, cols, vals,
    )

    src_map = src.reshape(b, hi, wi, c)
    # patch-major needs corner-ordered cols from one 2x2 window
    v0 = cols[..., 0] // wi
    u0 = cols[..., 0] % wi
    v0 = jnp.clip(v0, 0, hi - 2)
    u0 = jnp.clip(u0, 0, wi - 2)
    cols_w = jnp.stack(
        [v0 * wi + u0, v0 * wi + u0 + 1, (v0 + 1) * wi + u0, (v0 + 1) * wi + u0 + 1],
        axis=-1,
    )
    run(
        "patch_major",
        lambda m_, r_, c_, v_: sp.sparse_pool_patch_major_batch(
            m_, r_, c_, v_, num_targets=t
        ),
        src_map, rows, cols_w, vals,
    )

    run(
        "patch_denom_f32",
        lambda m_, r_, c_, v_: sp.sparse_pool_patch_major_batch(
            m_, r_, c_, v_, num_targets=t, divide_by_weight_sum=True,
            accum_dtype="float32",
        ),
        src_map, rows, cols_w, vals,
    )
    run(
        "patch_denom_bf16",
        lambda m_, r_, c_, v_: sp.sparse_pool_patch_major_batch(
            m_, r_, c_, v_, num_targets=t, divide_by_weight_sum=True,
            accum_dtype="bfloat16",
        ),
        src_map, rows, cols_w, vals,
    )



if __name__ == "__main__":
    main()
