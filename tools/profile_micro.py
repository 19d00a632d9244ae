"""Micro-breakdown of the round-2 hotspots: input builders, RPN ROI patch
path, SHPL pooling variants. Ad-hoc measurement tool (fori_loop methodology).
"""

from __future__ import annotations

import sys
import time


def timed(body, args, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def repeat(dep0, *a):
        def loop(_, dep):
            out = body(*jax.tree.map(
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

    float(repeat(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n


def main():
    import functools

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.ops import anchors as anchor_ops
    from sparse_pooling_tpu.ops import bev_device, crop_resize as cr, sparse_build
    from sparse_pooling_tpu.ops.sparse_pool import sparse_pool_coo_batch

    b = 8
    cfg = cars_pyramid_config().model
    ext = AreaExtents()
    rng = np.random.RandomState(0)

    frames = [_synthetic_raw(cfg, ext, n_points=16384, seed=i) for i in range(b)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    anchors_static = jnp.array(pl.static_anchor_grid(cfg, ext))

    which = sys.argv[1:] or ["inputs", "roi", "shpl"]

    if "inputs" in which:
        # --- input builder sub-stages, vmapped as in production
        def bev_maps(pts, msk, pl_):
            return jax.vmap(
                lambda p, m, g: bev_device.bev_maps_from_points(p, m, g, ext, cfg.bev)
            )(pts, msk, pl_)

        def coo(pts, msk, p2):
            return jax.vmap(
                lambda p, m, q: sparse_build.build_coo_device(
                    p, m, q, ext, cfg.bev, cfg.image, cfg.sparse_pool
                )
            )(pts, msk, p2)

        h, w = cfg.bev.grid_hw(ext)
        occ = jnp.array(rng.rand(b, h, w) > 0.9, jnp.float32)

        def filt(occ_):
            return jax.vmap(
                lambda o: anchor_ops.filter_anchors_device(
                    anchors_static, o, ext, cfg.bev,
                    max_anchors=cfg.anchors.max_anchors,
                )
            )(occ_)

        for name, body, args in [
            ("bev_maps_vmap", bev_maps, (batch.points, batch.points_mask, batch.ground_plane)),
            ("coo_build_vmap", coo, (batch.points, batch.points_mask, batch.p2)),
            ("anchor_filter_vmap", filt, (occ,)),
        ]:
            dt = timed(body, args)
            print(f"{name:22s} {dt*1e3:8.2f} ms/batch {dt*1e3/b:6.2f} ms/frame")

    if "roi" in which:
        out_ch = cfg.backbone.out_channels
        hb, wb = cfg.bev.padded_hw(ext)
        feat = jnp.array(rng.rand(b, hb, wb, out_ch), jnp.bfloat16)
        st = 8
        pooled = jnp.array(rng.rand(b, hb // st, wb // st, out_ch), jnp.bfloat16)
        n = cfg.anchors.max_anchors
        y1 = rng.rand(b, n) * (hb // st - 8)
        x1 = rng.rand(b, n) * (wb // st - 8)
        s = rng.rand(b, n) * 5
        boxes = jnp.array(np.stack([y1, x1, y1 + s, x1 + s], -1), jnp.float32)

        print(f"{'avg_pool8':22s} {timed(lambda f: nn.avg_pool(f, (st, st), strides=(st, st)), (feat,))*1e3:8.2f} ms/batch")
        print(f"{'patch_einsum(3x3,p8)':22s} {timed(lambda f, bx: cr.crop_and_resize_patch_einsum_px(f, bx, (3, 3), 8), (pooled, boxes))*1e3:8.2f} ms/batch")

        # gather alone (one 8x8 window per box)
        def gather_only(f, bx):
            bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, n))
            ys = jnp.floor(bx[..., 0]).astype(jnp.int32)
            xs = jnp.floor(bx[..., 1]).astype(jnp.int32)
            starts = jnp.stack([bidx, ys, xs], -1).reshape(-1, 3)
            return jax.lax.gather(
                f, starts,
                dimension_numbers=jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
                    start_index_map=(0, 1, 2)),
                slice_sizes=(1, 8, 8, f.shape[-1]),
                mode=jax.lax.GatherScatterMode.CLIP,
            )

        print(f"{'patch_gather_only':22s} {timed(gather_only, (pooled, boxes))*1e3:8.2f} ms/batch")

        # einsum alone on pre-gathered patches
        patches = jnp.array(rng.rand(b, n, 8, 8, out_ch), jnp.bfloat16)
        wy = jnp.array(rng.rand(b, n, 3, 8), jnp.bfloat16)
        wx = jnp.array(rng.rand(b, n, 3, 8), jnp.bfloat16)

        def einsum_only(wy_, wx_, p_):
            return jnp.einsum("bnip,bnjq,bnpqc->bnijc", wy_, wx_, p_,
                              preferred_element_type=jnp.bfloat16)

        print(f"{'einsum_only':22s} {timed(einsum_only, (wy, wx, patches))*1e3:8.2f} ms/batch")

        def einsum_two_step(wy_, wx_, p_):
            t = jnp.einsum("bnip,bnpqc->bniqc", wy_, p_, preferred_element_type=jnp.bfloat16)
            return jnp.einsum("bnjq,bniqc->bnijc", wx_, t, preferred_element_type=jnp.bfloat16)

        print(f"{'einsum_two_step':22s} {timed(einsum_two_step, (wy, wx, patches))*1e3:8.2f} ms/batch")

        # matmul restructure: fold (i) into rows, (p q c) flattening
        def matmul_form(wy_, wx_, p_):
            # [B,N,3,8] x [B,N,8,(8c)] -> [B,N,3,(8c)]
            t = jax.lax.dot_general(
                wy_, p_.reshape(b, n, 8, -1),
                (((3,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.bfloat16,
            )  # [B,N,3,8c]
            t = t.reshape(b, n, 3, 8, out_ch)
            return jax.lax.dot_general(
                wx_, t,
                (((3,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.bfloat16,
            )

        print(f"{'matmul_form':22s} {timed(matmul_form, (wy, wx, patches))*1e3:8.2f} ms/batch")

    if "shpl" in which:
        fs = cfg.sparse_pool.fusion_stride
        hb, wb = cfg.bev.padded_hw(ext)
        hi, wi = cfg.image.height, cfg.image.width
        tgt = (hb // fs) * (wb // fs)
        srcn = (hi // fs) * (wi // fs)
        mid_ch = cfg.backbone.channels[-1]
        cap = cfg.sparse_pool.coo_cap
        src = jnp.array(rng.rand(b, srcn, mid_ch), jnp.float32)
        src_bf = src.astype(jnp.bfloat16)
        rows = jnp.array(rng.randint(0, tgt, (b, cap)), jnp.int32)
        cols = jnp.array(rng.randint(0, srcn, (b, cap)), jnp.int32)
        vals = jnp.array(rng.rand(b, cap), jnp.float32)

        print(f"{'coo_pool_f32_256c':22s} {timed(lambda s_, r, c, v: sparse_pool_coo_batch(s_, r, c, v, tgt), (src, rows, cols, vals))*1e3:8.2f} ms/batch")
        print(f"{'coo_pool_bf16_256c':22s} {timed(lambda s_, r, c, v: sparse_pool_coo_batch(s_, r, c, v.astype(jnp.bfloat16), tgt), (src_bf, rows, cols, vals))*1e3:8.2f} ms/batch")

        # point-major pre-combine: rows [B,P], cols/vals [B,P,4]
        p4 = cap // 4
        rows_p = jnp.array(rng.randint(0, tgt, (b, p4)), jnp.int32)
        cols_p = jnp.array(rng.randint(0, srcn, (b, p4, 4)), jnp.int32)
        vals_p = jnp.array(rng.rand(b, p4, 4), jnp.float32)

        def precombine(s_, r, c, v):
            bsz, sn, ch = s_.shape
            flat = s_.reshape(bsz * sn, ch)
            coff = (jnp.arange(bsz, dtype=jnp.int32) * sn)[:, None, None]
            g = jnp.take(flat, (c + coff).reshape(-1), axis=0).reshape(bsz, p4, 4, ch)
            g = jnp.einsum("bpkc,bpk->bpc", g, v.astype(s_.dtype),
                           preferred_element_type=s_.dtype)
            roff = (jnp.arange(bsz, dtype=jnp.int32) * tgt)[:, None]
            out = jax.ops.segment_sum(
                g.reshape(bsz * p4, ch), (r + roff).reshape(-1),
                num_segments=bsz * tgt,
            )
            return out

        print(f"{'precombine_f32':22s} {timed(precombine, (src, rows_p, cols_p, vals_p))*1e3:8.2f} ms/batch")
        print(f"{'precombine_bf16':22s} {timed(precombine, (src_bf, rows_p, cols_p, vals_p))*1e3:8.2f} ms/batch")

        # channel width sensitivity: 32c pooling (fuse at out_ch instead?)
        src32 = jnp.array(rng.rand(b, srcn, 32), jnp.bfloat16)
        print(f"{'coo_pool_bf16_32c':22s} {timed(lambda s_, r, c, v: sparse_pool_coo_batch(s_, r, c, v.astype(jnp.bfloat16), tgt), (src32, rows, cols, vals))*1e3:8.2f} ms/batch")


if __name__ == "__main__":
    main()
