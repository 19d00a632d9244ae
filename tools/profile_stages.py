"""Per-stage device-cost table for the flagship detector (TPU).

Measures each pipeline stage standalone with the fori_loop methodology
(ROADMAP.md "measurement discipline"): N iterations inside ONE jitted loop,
every stage output leaf feeds the readback scalar (XLA DCE's unconsumed
outputs), big arrays passed as jit args (remote-compiler payload limit).

Usage:  python tools/profile_stages.py [--batch 8] [--stages a,b,c]
Prints one line per stage: name, ms/batch, ms/frame.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")  # run as `python tools/profile_stages.py` from repo root

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()


def timed(body, args, n=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def repeat(dep0, *a):
        def loop(_, dep):
            first = jax.tree.leaves(a)[0]
            out = body(*jax.tree.map(
                lambda x: x + (dep * 0).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a,
            ))
            s = sum(
                jnp.sum(l.reshape(-1)[:1].astype(jnp.float32))
                for l in jax.tree.leaves(out)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            )
            del first
            return dep * 0.0 + s * 1e-20

        return jax.lax.fori_loop(0, n, loop, dep0)

    import jax.numpy as jnp

    float(repeat(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n


def build_stages(b: int, train: bool):
    """Stage-name -> (body, args) table at batch size ``b``.

    ``train`` switches the proposal count to the train-time NMS size (the
    shapes the backward pass sees). Shared by the inference profiler below
    and tools/profile_train.py's fwd+bwd table.
    """

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_raw
    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config
    from sparse_pooling_tpu.models import pipeline as pl
    from sparse_pooling_tpu.models.backbone import VggPyramidExtractor
    from sparse_pooling_tpu.models.detector import RpnHead, Stage2Head, decode_detections
    from sparse_pooling_tpu.models.fusion import SparsePoolFusion
    from sparse_pooling_tpu.ops import crop_resize as cr
    from sparse_pooling_tpu.ops.nms import nms_batch, top_k_nms_batch
    from sparse_pooling_tpu.ops.sparse_build import DeviceCoo

    cfg = cars_pyramid_config().model
    ext = AreaExtents()
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    hb, wb = cfg.bev.padded_hw(ext)
    hi, wi = cfg.image.height, cfg.image.width
    fs = cfg.sparse_pool.fusion_stride
    mid_ch = cfg.backbone.channels[-1]
    out_ch = cfg.backbone.out_channels
    cap = cfg.sparse_pool.coo_cap
    a_cap = cfg.anchors.max_anchors
    rc = cfg.rpn.roi_channels or cfg.backbone.out_channels
    nms_size = cfg.rpn.train_nms_size if train else cfg.rpn.eval_nms_size
    dt = jnp.bfloat16 if cfg.backbone.compute_dtype == "bfloat16" else jnp.float32

    frames = [_synthetic_raw(cfg, ext, n_points=16384, seed=i) for i in range(b)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    # production host pipeline trims to the point bucket (bench.py does too)
    from sparse_pooling_tpu.data.pointcloud import trim_points_to_bucket

    pts, mask = trim_points_to_bucket(
        np.asarray(batch.points), np.asarray(batch.points_mask),
        cfg.sparse_pool.buckets,
    )
    batch = batch._replace(points=jnp.array(pts), points_mask=jnp.array(mask))
    npts_bucket = pts.shape[1]

    bev_in = jnp.array(rng.rand(b, hb, wb, 6), jnp.float32)
    img_in = jnp.array(rng.rand(b, hi, wi, 3), jnp.float32)
    bev_mid = jnp.array(rng.rand(b, hb // fs, wb // fs, mid_ch), dt)
    img_mid = jnp.array(rng.rand(b, hi // fs, wi // fs, mid_ch), dt)
    ds = cfg.backbone.decode_stride
    bev_feat = jnp.array(rng.rand(b, hb // ds, wb // ds, out_ch), dt)
    img_feat = jnp.array(rng.rand(b, hi // ds, wi // ds, out_ch), dt)

    def rand_boxes(n, hmax, wmax, span):
        y1 = rng.rand(b, n) * (hmax - span)
        x1 = rng.rand(b, n) * (wmax - span)
        s = rng.rand(b, n) * span
        return jnp.array(np.stack([y1, x1, y1 + s, x1 + s], -1), jnp.float32)

    bev_extractor = VggPyramidExtractor(
        cfg.backbone.channels, cfg.backbone.blocks, out_ch, dt,
        decode_stride=cfg.backbone.decode_stride,
        space_to_depth=cfg.backbone.space_to_depth,
    )
    img_extractor = VggPyramidExtractor(
        cfg.backbone.channels, cfg.backbone.blocks, out_ch, dt,
        decode_stride=cfg.backbone.decode_stride,
        space_to_depth=cfg.backbone.space_to_depth,
    )
    p_bev = bev_extractor.init(key, bev_in[:1])
    p_img = img_extractor.init(key, img_in[:1])

    fusion = SparsePoolFusion(mid_ch, dt, pool_channels=cfg.sparse_pool.pool_channels)
    npts = npts_bucket  # production COO rides the point bucket
    rows = jnp.array(rng.randint(0, (hb // fs) * (wb // fs), (b, npts)), jnp.int32)
    cols = jnp.array(rng.randint(0, (hi // fs) * (wi // fs), (b, npts, 4)), jnp.int32)
    vals = jnp.array(rng.rand(b, npts, 4), jnp.float32)
    coo = DeviceCoo(rows, cols, vals, (hb // fs, wb // fs), (hi // fs, wi // fs))
    p_fus = fusion.init(key, bev_mid, img_mid, coo)

    rpn_head = RpnHead(cfg.rpn.fusion_channels, dt)
    s = cfg.rpn.proposal_roi_size
    rois_rpn = jnp.array(rng.rand(b, a_cap, s, s, rc), jnp.float32)
    p_rpn = rpn_head.init(key, rois_rpn[:, :8])

    s2 = cfg.avod.roi_size
    stage2 = Stage2Head(cfg.avod.fc_layers, cfg.num_classes, 0.5, dt)
    rois_s2 = jnp.array(rng.rand(b, nms_size, s2, s2, out_ch), jnp.float32)
    p_s2 = stage2.init(key, rois_s2[:, :8], False)

    stages = {}

    stages["inputs"] = (
        lambda bt: pl.build_model_inputs_batch(
            bt, jnp.array(pl.static_anchor_grid(cfg, ext)),
            jnp.ones((b, 2), jnp.float32), cfg, ext,
        ),
        (batch,),
    )
    # inputs sub-stages (sum ~= inputs; each is a piece of the builder)
    from sparse_pooling_tpu.ops import anchors as anchor_ops
    from sparse_pooling_tpu.ops import bev_device, sparse_build

    stages["in_voxelize"] = (
        lambda bt: bev_device.bev_maps_from_points_batch(
            bt.points, bt.points_mask, bt.ground_plane, ext, cfg.bev
        ),
        (batch,),
    )
    stages["in_coo"] = (
        lambda bt: sparse_build.build_coo_device(
            bt.points, bt.points_mask, bt.p2, ext, cfg.bev, cfg.image,
            cfg.sparse_pool,
        ),
        (batch,),
    )
    anchors_grid = jnp.array(pl.static_anchor_grid(cfg, ext))
    occ = jnp.array(
        (rng.rand(b, *cfg.bev.grid_hw(ext)) < 0.02).astype(np.float32)
    )
    anchors_framed = jax.vmap(
        lambda g: pl.anchors_with_ground_y(anchors_grid, g)
    )(batch.ground_plane)
    # the PRODUCTION filter (cars preset: quad blocks at rpn.roi_quad)
    if cfg.rpn.roi_quad > 1 and anchor_ops.quad_supported(
        cfg.anchors, cfg.bev, ext, cfg.anchors.max_anchors, cfg.rpn.roi_quad
    ):
        stages["in_filter"] = (
            lambda a_, o_: anchor_ops.filter_anchor_quads_grid(
                a_, o_, ext, cfg.bev, cfg.anchors,
                max_anchors=cfg.anchors.max_anchors, quad=cfg.rpn.roi_quad,
                density_threshold=cfg.anchors.density_threshold,
            ),
            (anchors_framed, occ),
        )
    # per-position filter: the production path when roi_quad == 1
    stages["in_filter_pos"] = (
        lambda a_, o_: anchor_ops.filter_anchor_positions_grid(
            a_, o_, ext, cfg.bev, cfg.anchors,
            max_anchors=cfg.anchors.max_anchors,
            density_threshold=cfg.anchors.density_threshold,
        ),
        (anchors_framed, occ),
    )
    stages["in_filter_gather"] = (
        lambda a_, o_: anchor_ops.filter_anchors_batch(
            a_, o_, ext, cfg.bev, max_anchors=cfg.anchors.max_anchors,
            density_threshold=cfg.anchors.density_threshold,
        ),
        (anchors_framed, occ),
    )
    stages["bev_encode"] = (lambda p, x: bev_extractor.apply(p, x, method="encode"), (p_bev, bev_in))
    stages["img_encode"] = (lambda p, x: img_extractor.apply(p, x, method="encode"), (p_img, img_in))
    rows_r = jnp.array(
        rng.randint(0, (hi // fs) * (wi // fs), (b, npts)), jnp.int32
    )
    cols_r = jnp.array(
        rng.randint(0, (hb // fs) * (wb // fs), (b, npts, 4)), jnp.int32
    )
    coo_rev = DeviceCoo(rows_r, cols_r, vals, coo.source_hw, coo.target_hw)
    stages["shpl_fusion_x2"] = (
        lambda p, a_, c_: (
            fusion.apply(p, a_, c_, coo),
            fusion.apply(p, c_, a_, coo_rev),
        ),
        (p_fus, bev_mid, img_mid),
    )

    def decode_bev(p, mid):
        skips = [
            jnp.zeros((b, hb // (2 ** i), wb // (2 ** i), c), dt)
            for i, c in enumerate(cfg.backbone.channels[:-1])
        ]
        return bev_extractor.apply(p, mid, skips, method="decode")

    def decode_img(p, mid):
        skips = [
            jnp.zeros((b, hi // (2 ** i), wi // (2 ** i), c), dt)
            for i, c in enumerate(cfg.backbone.channels[:-1])
        ]
        return img_extractor.apply(p, mid, skips, method="decode")

    stages["bev_decode"] = (decode_bev, (p_bev, bev_mid))
    stages["img_decode"] = (decode_img, (p_img, img_mid))

    st = cfg.rpn.bev_roi_stride
    bev_boxes_px = rand_boxes(a_cap, (hb - 4) // max(st, 1), wb // max(st, 1), 6)
    proj_w = jnp.array(rng.rand(1, 1, out_ch, rc), dt)

    n_var = len(cfg.anchors.sizes) * len(cfg.anchors.rotations)
    # production group width: Q*Q positions x V variants share one window
    # (cars preset roi_quad=4); the window grows with the block spread like
    # detector._rpn_patch_rois does
    quad = cfg.rpn.roi_quad if not cfg.rpn.dense_grid else 1

    def roi_view(feat, boxes, stride, group_w, extra_patch=0):
        """``group_w`` boxes share one gathered window (production:
        quad*quad*n_var); ``group_w=1`` is the per-anchor patch crop."""

        import flax.linen as nn

        k = stride // ds
        src = nn.avg_pool(feat, (k, k), strides=(k, k)) if k > 1 else feat
        if rc < out_ch:
            src = jax.lax.conv_general_dilated(
                src, proj_w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if group_w > 1:
            bsz, a = boxes.shape[:2]
            rois = cr.crop_and_resize_group_einsum_px(
                src, boxes.reshape(bsz, a // group_w, group_w, 4), (s, s),
                patch=cfg.rpn.roi_patch + extra_patch,
            )
            return rois.reshape(bsz, a, s, s, rois.shape[-1])
        return cr.crop_and_resize_patch_einsum_px(src, boxes, (s, s), cfg.rpn.roi_patch)

    def quad_extra(stride):
        spacing = cfg.anchors.stride / (cfg.bev.voxel_size * stride)
        return int(np.ceil((quad - 1) * spacing))

    stages["roi_rpn_bev"] = (
        lambda f, bx: roi_view(
            f, bx, st, quad * quad * n_var, quad_extra(st) if quad > 1 else 0
        ),
        (bev_feat, bev_boxes_px),
    )

    sti = cfg.rpn.img_roi_stride
    img_boxes_px = rand_boxes(a_cap, hi // max(sti, 1), wi // max(sti, 1), 6)
    stages["roi_rpn_img"] = (
        lambda f, bx: roi_view(
            f, bx, sti, quad * quad * n_var, quad_extra(sti) if quad > 1 else 0
        ),
        (img_feat, img_boxes_px),
    )
    stages["roi_rpn_bev_pos"] = (
        lambda f, bx: roi_view(f, bx, st, n_var), (bev_feat, bev_boxes_px)
    )
    stages["roi_rpn_bev_ungrouped"] = (
        lambda f, bx: roi_view(f, bx, st, 1), (bev_feat, bev_boxes_px)
    )
    stages["rpn_head"] = (lambda p, r: rpn_head.apply(p, r), (p_rpn, rois_rpn))

    # roi_rpn sub-parts: where do the ~2.5 ms/frame/view actually go?
    def _roi_sub(part):
        import flax.linen as nn

        def fn(feat, boxes):
            k = st // ds
            src = nn.avg_pool(feat, (k, k), strides=(k, k)) if k > 1 else feat
            if part == "pool":
                return src
            if rc < out_ch:
                src = jax.lax.conv_general_dilated(
                    src, proj_w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            if part == "pool+proj":
                return src
            bsz, a = boxes.shape[:2]
            gw = quad * quad * n_var
            rois = cr.crop_and_resize_group_einsum_px(
                src, boxes.reshape(bsz, a // gw, gw, 4), (s, s),
                patch=cfg.rpn.roi_patch + (quad_extra(st) if quad > 1 else 0),
            )
            return rois.reshape(bsz, a, s, s, rois.shape[-1])

        return fn

    for part in ("pool", "pool+proj"):
        stages[f"roi_rpn_bev_{part}"] = (_roi_sub(part), (bev_feat, bev_boxes_px))

    # candidate: fold avg_pool + 1x1 projection into ONE strided conv on
    # the MXU (kernel [k,k,32,rc] = proj/k^2) — reduce_window measured only
    # ~87 GB/s effective on the 288 MB full-res read
    def _roi_fusedconv(feat, boxes):
        k = st // ds
        kern = jnp.broadcast_to(
            proj_w / (k * k), (k, k) + proj_w.shape[2:]
        ).astype(feat.dtype)
        src = jax.lax.conv_general_dilated(
            feat, kern, (k, k), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bsz, a = boxes.shape[:2]
        gw = quad * quad * n_var
        rois = cr.crop_and_resize_group_einsum_px(
            src, boxes.reshape(bsz, a // gw, gw, 4), (s, s),
            patch=cfg.rpn.roi_patch + (quad_extra(st) if quad > 1 else 0),
        )
        return rois.reshape(bsz, a, s, s, rois.shape[-1])

    stages["roi_rpn_bev_fusedconv"] = (_roi_fusedconv, (bev_feat, bev_boxes_px))

    nms_boxes = rand_boxes(a_cap, 1.0, 1.0, 0.05)
    nms_scores = jnp.array(rng.rand(b, a_cap), jnp.float32)
    stages["rpn_nms"] = (
        lambda bx, sc: top_k_nms_batch(
            bx, sc, nms_size, cfg.rpn.nms_iou_thresh, cfg.rpn.pre_nms_top_k
        ),
        (nms_boxes, nms_scores),
    )

    s2_bev_px = rand_boxes(nms_size, (hb - 4) // ds, wb // ds, 60 // ds)
    s2_img_px = rand_boxes(nms_size, hi // ds, wi // ds, 200 // ds)
    stages["roi_s2_bev"] = (
        lambda f, bx: cr.crop_and_resize_px_batch(f, bx, (s2, s2)), (bev_feat, s2_bev_px)
    )
    stages["roi_s2_img"] = (
        lambda f, bx: cr.crop_and_resize_px_batch(f, bx, (s2, s2)), (img_feat, s2_img_px)
    )

    # stage-2 patch-einsum candidates (avod.bev/img_roi_stride knob): one
    # window per proposal from an avg-pooled map vs 49 exact sample points
    def _s2_patch(stride, patch):
        import flax.linen as fnn

        def fn(f, bx):
            k = stride // ds
            src = fnn.avg_pool(f, (k, k), strides=(k, k)) if k > 1 else f
            bp = (bx * ds - (stride - 1) / 2) / stride
            return cr.crop_and_resize_patch_einsum_px(src, bp, (s2, s2), patch=patch)

        return fn

    for stride, patch in ((2, 16), (4, 16), (8, 12)):
        stages[f"roi_s2_bev_patch_s{stride}p{patch}"] = (
            _s2_patch(stride, patch), (bev_feat, s2_bev_px)
        )
        stages[f"roi_s2_img_patch_s{stride}p{patch}"] = (
            _s2_patch(stride, patch), (img_feat, s2_img_px)
        )
    stages["stage2_head"] = (lambda p, r: stage2.apply(p, r, False), (p_s2, rois_s2))

    fin_boxes = rand_boxes(nms_size, 1.0, 1.0, 0.05)
    fin_scores = jnp.array(rng.rand(b, nms_size), jnp.float32)
    stages["final_nms"] = (
        lambda bx, sc: nms_batch(bx, sc, cfg.avod.nms_size, cfg.avod.nms_iou_thresh),
        (fin_boxes, fin_scores),
    )

    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="")
    ap.add_argument("--train", action="store_true", help="profile train-size shapes")
    args = ap.parse_args()

    b = args.batch
    stages = build_stages(b, args.train)
    want = [w for w in args.stages.split(",") if w] or list(stages)
    total = 0.0
    for name in want:
        body, sargs = stages[name]
        dt_s = timed(body, sargs, args.iters)
        total += dt_s
        print(f"{name:18s} {dt_s * 1e3:8.2f} ms/batch  {dt_s * 1e3 / b:6.2f} ms/frame")
    print(f"{'TOTAL':18s} {total * 1e3:8.2f} ms/batch  {total * 1e3 / b:6.2f} ms/frame")


if __name__ == "__main__":
    main()
