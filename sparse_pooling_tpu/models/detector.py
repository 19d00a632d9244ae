"""The SHPL fusion detector: two-branch backbone + RPN + AVOD-style stage 2.

Capability parity with the reference's model stack
(``avod/core/models/rpn_model.py`` + ``avod/core/models/avod_model.py`` with
the SHPL fusion extractor, SURVEY.md §3.5/§4.1):

  * two VGG-pyramid branches (BEV 6-channel raster, FV RGB image),
  * SHPL sparse cross-view pooling between the branches mid-backbone,
  * path-drop regularization (randomly zero one branch, never both),
  * RPN: project anchors to both views, 3x3 crop-and-resize ROI per view,
    mean-fuse, small head -> objectness + 6-d offsets, top-k + BEV NMS ->
    proposals,
  * stage 2: 7x7 ROI crops on proposals in both views, fuse, 3 FC layers
    with dropout -> per-class scores, 10-d box_4c regression, orientation
    vector; decode + final per-class BEV NMS.

TPU-first: the module is BATCH-NATIVE — every tensor carries a leading
batch dim and the hot ops use their batch-native forms (flattened-gather
crop-and-resize, batch-wide greedy NMS, batch-flattened sparse pooling).
Naively vmapping a single-sample model measured 2-7x slower per frame on
TPU v5e because XLA lowers batched gathers/sequential loops poorly; the
batch-native forms keep the fast unbatched lowerings. All dense compute is
bfloat16 on the MXU; geometry stays fp32 on the VPU. Shapes are static
end-to-end (fixed anchor cap, fixed NMS sizes, validity masks).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from sparse_pooling_tpu.configs.config import AreaExtents, ModelConfig
from sparse_pooling_tpu.models.backbone import VggPyramidExtractor
from sparse_pooling_tpu.models.fusion import SparsePoolFusion
from sparse_pooling_tpu.ops import anchors as anchor_ops
from sparse_pooling_tpu.ops import encoders, projection
from sparse_pooling_tpu.ops.crop_resize import (
    crop_and_resize_batch,
    crop_and_resize_group_einsum_px,
    crop_and_resize_patch_einsum_px,
    crop_and_resize_px_batch,
)
from sparse_pooling_tpu.ops.nms import nms_batch, top_k_nms_batch
from sparse_pooling_tpu.ops.sparse_build import DeviceCoo


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.backbone.compute_dtype == "bfloat16" else jnp.float32


def largest_group_divisor(nz: int, nx: int, group: int) -> int:
    """Largest g <= group dividing BOTH dense-grid dims (ANY divisor, not
    just powers of two — a configured group 4 on a 6x6 grid runs at 3, not
    1; the caller logs when the effective group differs)."""

    return max(d for d in range(1, group + 1) if nz % d == 0 and nx % d == 0)


class RpnHead(nn.Module):
    """ROI-fused proposal head (reference rpn_model conv/FC layers)."""

    fusion_channels: int
    dtype: Any

    @nn.compact
    def __call__(self, rois):  # [B, A, S, S, C] fused ROI features
        b, a = rois.shape[:2]
        x = rois.reshape(b, a, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.fusion_channels, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fusion_channels, dtype=self.dtype, name="fc2")(x))
        objectness = nn.Dense(2, dtype=jnp.float32, name="objectness")(x)
        offsets = nn.Dense(6, dtype=jnp.float32, name="offsets")(x)
        return objectness.astype(jnp.float32), offsets.astype(jnp.float32)


class Stage2Head(nn.Module):
    """AVOD second-stage head: FC stack(s) -> cls / box_4c / orientation.

    ``fusion_type`` selects WHERE the views fuse (reference avod_model's
    early/late/deep axis); ``fusion_method`` selects HOW ('mean' respects
    path-drop via the caller's denom, 'concat' relies on dropped branches
    being zeroed).
    """

    fc_layers: tuple
    num_classes: int
    keep_dropout_prob: float
    dtype: Any
    fusion_type: str = "early"
    fusion_method: str = "mean"
    box_dim: int = 10  # 10 = box_4c, 24 = box_8c, 6 = anchor offsets (rcnn)
    # emit the explicit pi-disambiguation logits (config.explicit_flip_head)
    flip_head: bool = False

    def _combine(self, views, denom):
        if len(views) == 1:
            return views[0]
        if self.fusion_method == "concat":
            return jnp.concatenate(views, axis=-1)
        return sum(views) / denom

    @nn.compact
    def __call__(self, roi_views, train: bool, denom=1.0):
        """roi_views: list of per-view ROI stacks [B, P, S, S, C] (a single
        pre-fused stack is also accepted); denom [B,1,1]-broadcastable
        count of kept branches for path-drop-aware mean fusion."""

        if not isinstance(roi_views, (list, tuple)):
            roi_views = [roi_views]
        b, p = roi_views[0].shape[:2]
        views = [v.reshape(b, p, -1).astype(self.dtype) for v in roi_views]

        drop = nn.Dropout(rate=1.0 - self.keep_dropout_prob, deterministic=not train)
        # post-FC combines divide by the BRANCH COUNT, not the path-drop
        # denom: an FC of a zeroed input is not zero (bias), so the kept
        # count no longer describes the terms (matches the reference, whose
        # path-drop also only zeroes the feature-map inputs)
        n_views = float(len(views))
        if self.fusion_type == "late" and len(views) > 1:
            outs = []
            for vi, x in enumerate(views):
                for i, width in enumerate(self.fc_layers):
                    x = nn.relu(
                        nn.Dense(width, dtype=self.dtype, name=f"fc{i + 1}_v{vi}")(x)
                    )
                    x = drop(x)
                outs.append(x)
            x = self._combine(outs, n_views)
        elif self.fusion_type == "deep" and len(views) > 1:
            fused = self._combine(views, denom)
            for i, width in enumerate(self.fc_layers):
                branch = [
                    drop(
                        nn.relu(
                            nn.Dense(
                                width, dtype=self.dtype, name=f"fc{i + 1}_v{vi}"
                            )(fused)
                        )
                    )
                    for vi in range(len(views))
                ]
                fused = self._combine(branch, n_views)
            x = fused
        else:  # early (and the single-view callers)
            x = self._combine(views, denom)
            for i, width in enumerate(self.fc_layers):
                x = nn.relu(nn.Dense(width, dtype=self.dtype, name=f"fc{i + 1}")(x))
                x = drop(x)

        cls_logits = nn.Dense(self.num_classes + 1, dtype=jnp.float32, name="cls")(x)
        box_offsets = nn.Dense(self.box_dim, dtype=jnp.float32, name="box_reg")(x)
        orientation = nn.Dense(2, dtype=jnp.float32, name="orientation")(x)
        flip_logits = (
            nn.Dense(2, dtype=jnp.float32, name="flip")(x)
            if self.flip_head
            else None
        )
        return (
            cls_logits.astype(jnp.float32),
            box_offsets.astype(jnp.float32),
            orientation.astype(jnp.float32),
            flip_logits if flip_logits is None else flip_logits.astype(jnp.float32),
        )


class SparsePoolingDetector(nn.Module):
    """Batch-native two-branch fusion detector."""

    cfg: ModelConfig
    extents: AreaExtents = AreaExtents()

    def setup(self):
        c = self.cfg
        dt = _dtype(c)
        self.bev_extractor = VggPyramidExtractor(
            c.backbone.channels, c.backbone.blocks, c.backbone.out_channels, dt,
            decode_stride=c.backbone.decode_stride,
            space_to_depth=c.backbone.space_to_depth,
            remat=c.backbone.remat,
        )
        self.img_extractor = VggPyramidExtractor(
            c.backbone.channels, c.backbone.blocks, c.backbone.out_channels, dt,
            decode_stride=c.backbone.decode_stride,
            space_to_depth=c.backbone.space_to_depth,
            remat=c.backbone.remat,
        )
        mid_ch = c.backbone.channels[-1]
        pc = c.sparse_pool.pool_channels
        ad = c.sparse_pool.accum_dtype
        self.bev_fusion = SparsePoolFusion(
            mid_ch, dt, pool_channels=pc, accum_dtype=ad
        )
        if c.sparse_pool.bev_to_img:
            self.img_fusion = SparsePoolFusion(
            mid_ch, dt, pool_channels=pc, accum_dtype=ad
        )
        if c.rpn.roi_channels:
            if c.rpn.bev_roi_stride > 1:
                self.bev_roi_proj = nn.Conv(
                    c.rpn.roi_channels, (1, 1), dtype=dt, name="bev_roi_proj"
                )
            if c.rpn.img_roi_stride > 1:
                self.img_roi_proj = nn.Conv(
                    c.rpn.roi_channels, (1, 1), dtype=dt, name="img_roi_proj"
                )
        self.rpn_head = RpnHead(c.rpn.fusion_channels, dt)
        if c.avod.box_rep not in ("box_4c", "box_8c"):
            raise ValueError(f"unknown box_rep '{c.avod.box_rep}'")
        self.stage2_head = Stage2Head(
            c.avod.fc_layers, c.num_classes, c.avod.keep_dropout_prob, dt,
            fusion_type=c.avod.fusion_type, fusion_method=c.avod.fusion_method,
            box_dim=10 if c.avod.box_rep == "box_4c" else 24,
            flip_head=c.avod.explicit_flip_head,
        )

    def __call__(
        self,
        inputs: Dict[str, Any],
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """inputs (leading batch dim B on every array):
          bev_input [B, Hb, Wb, 6] f32   image [B, Hi, Wi, 3] f32
          m_bev, m_fv: DeviceCoo with [B, N] arrays
          p2 [B, 3, 4]                   anchors [B, A, 8] f32
          anchor_valid [B, A] bool       path_keep [B, 2] f32 in {0,1}
        """

        c = self.cfg
        ext = self.extents
        img_hw = (c.image.height, c.image.width)
        bev_keep = inputs["path_keep"][:, 0]  # [B]
        img_keep = inputs["path_keep"][:, 1]

        # ---------------- backbones + SHPL fusion
        # bev_input arrives either full-res [B, Hb, Wb, slices+1] or
        # pre-packed space-to-depth [B, Hb/2, Wb/2, 4*(slices+1)] (the
        # voxelizer scatters straight into the packed layout when the
        # backbone would repack anyway — bev_device.bev_maps_packed_batch).
        # The builder says which explicitly (bev_pre_packed).
        bev_mid, bev_skips = self.bev_extractor.encode(
            inputs["bev_input"], pre_packed=inputs["bev_pre_packed"]
        )
        img_mid, img_skips = self.img_extractor.encode(inputs["image"])

        m_bev: DeviceCoo = inputs["m_bev"]
        m_fv: DeviceCoo = inputs["m_fv"]
        # path-drop: a dropped branch contributes zeros everywhere downstream
        kb = bev_keep[:, None, None, None].astype(bev_mid.dtype)
        ki = img_keep[:, None, None, None].astype(img_mid.dtype)
        bev_mid_k = bev_mid * kb
        img_mid_k = img_mid * ki

        bev_mid_f = self.bev_fusion(bev_mid_k, img_mid_k, m_bev)
        if c.sparse_pool.bev_to_img:
            img_mid_f = self.img_fusion(img_mid_k, bev_mid_k, m_fv)
        else:
            img_mid_f = img_mid_k

        bev_feat = self.bev_extractor.decode(bev_mid_f, bev_skips) * kb
        img_feat = self.img_extractor.decode(img_mid_f, img_skips) * ki

        # ---------------- RPN
        anchors = inputs["anchors"][..., :6]  # [B, A, 6]
        anchor_valid = inputs["anchor_valid"]  # [B, A]
        bev_boxes = projection.project_to_bev(anchors, ext)
        img_boxes = projection.project_to_image_space(anchors, inputs["p2"], img_hw)

        # BEV boxes are normalized over the CONTENT extents (700 rows), but
        # bev_feat carries pad_h zero rows (704): crop at content-pixel
        # coordinates so far-range ROIs never sample into the padding.
        grid_h, grid_w = c.bev.grid_hw(ext)
        bev_px_scale = jnp.array(
            [grid_h - 1.0, grid_w - 1.0, grid_h - 1.0, grid_w - 1.0], jnp.float32
        )

        s = c.rpn.proposal_roi_size

        ds = c.backbone.decode_stride

        # class/rotation variants per FILTER UNIT: the filter keeps units
        # whole (pipeline.build_model_inputs_batch) — a grid position's V
        # variants by default, a QxQ-position block's Q*Q*V when
        # rpn.roi_quad > 1 — so anchors arrive grouped [B, U*n_var, ...]
        # with each unit's variants adjacent, and the grouped crop gathers
        # ONE source patch per UNIT (descriptors / n_var; the gather is
        # descriptor-bound, ROADMAP.md). Quad units add
        # (Q-1)*stride/(voxel*roi_stride) pooled cells of spread; the
        # window auto-grows to keep BEV sampling exact.
        quad = (
            c.rpn.roi_quad
            if not c.rpn.dense_grid
            and anchor_ops.quad_supported(
                c.anchors, c.bev, ext, c.anchors.max_anchors, c.rpn.roi_quad
            )
            else 1
        )
        n_var = len(c.anchors.sizes) * len(c.anchors.rotations) * quad * quad

        def _rpn_patch_rois(feat, boxes_px_full, stride, proj, group=1):
            """avg_pool to the ROI stride -> optional 1x1 channel
            projection -> group-shared patch-einsum crop. ``feat`` is
            already at decode_stride; pooling cell j then covers full-res
            pixels [j*stride, (j+1)*stride), so the full-res px -> pooled
            coord map is (px - (stride-1)/2) / stride regardless of ds.

            ``group`` > 1 (dense-grid BEV only): a GxG block of NEIGHBOR
            grid positions shares one window — positions sit
            anchor_stride/(voxel*stride) pooled cells apart (0.625 for the
            cars lattice), so grouping costs <2 extra window cells while
            cutting the descriptor-bound gather G^2 x. The block reshape
            is purely static (z-major regular grid); the window auto-grows
            to keep every sample inside it.
            """

            k = stride // ds
            src = nn.avg_pool(feat, (k, k), strides=(k, k)) if k > 1 else feat
            if proj is not None and src.shape[-1] > c.rpn.roi_channels:
                src = proj(src)
            boxes_pooled = (boxes_px_full - (stride - 1) / 2) / stride
            bsz, a = boxes_pooled.shape[:2]
            if group > 1:
                import numpy as np

                nz, nx = anchor_ops.grid_shape(c.anchors, ext)
                g = largest_group_divisor(nz, nx, group)
                if g != group:
                    print(
                        f"[detector] bev_roi_group={group} does not divide the "
                        f"{nz}x{nx} anchor grid; using largest divisor {g}"
                    )
                spacing = c.anchors.stride / (c.bev.voxel_size * stride)
                patch = c.rpn.roi_patch + int(np.ceil((g - 1) * spacing))
                nzq, nxq = nz // g, nx // g
                bq = boxes_pooled.reshape(bsz, nzq, g, nxq, g, n_var, 4)
                bq = bq.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
                    bsz, nzq * nxq, g * g * n_var, 4
                )
                rois = crop_and_resize_group_einsum_px(src, bq, (s, s), patch=patch)
                rois = rois.reshape(
                    bsz, nzq, nxq, g, g, n_var, s, s, rois.shape[-1]
                ).transpose(0, 1, 3, 2, 4, 5, 6, 7, 8)
                return rois.reshape(bsz, a, s, s, rois.shape[-1])
            patch = c.rpn.roi_patch
            if quad > 1:
                import numpy as np

                spacing = c.anchors.stride / (c.bev.voxel_size * stride)
                patch += int(np.ceil((quad - 1) * spacing))
            rois = crop_and_resize_group_einsum_px(
                src, boxes_pooled.reshape(bsz, a // n_var, n_var, 4),
                (s, s), patch=patch,
            )
            return rois.reshape(bsz, a, s, s, rois.shape[-1])

        if c.rpn.bev_roi_stride > 1:
            bev_rois = _rpn_patch_rois(
                bev_feat, bev_boxes * bev_px_scale, c.rpn.bev_roi_stride,
                getattr(self, "bev_roi_proj", None),
                group=c.rpn.bev_roi_group if c.rpn.dense_grid else 1,
            )
        else:
            bev_rois = crop_and_resize_px_batch(
                bev_feat, bev_boxes * bev_px_scale, (s, s)
            )
        if c.rpn.img_roi_stride > 1:
            img_px_scale = jnp.array(
                [img_hw[0] - 1.0, img_hw[1] - 1.0, img_hw[0] - 1.0,
                 img_hw[1] - 1.0], jnp.float32,
            )
            img_rois = _rpn_patch_rois(
                img_feat, img_boxes * img_px_scale, c.rpn.img_roi_stride,
                getattr(self, "img_roi_proj", None),
            )
        else:
            img_rois = crop_and_resize_batch(img_feat, img_boxes, (s, s))
        denom = jnp.maximum(bev_keep + img_keep, 1.0)[:, None, None, None, None]
        # mean-fuse in the crop dtype (bf16 on TPU): the f32 form
        # materialized a [B, A, S, S, C] f32 intermediate that the head
        # immediately re-cast to bf16 — a 4.8 ms/batch-48 convert in the
        # trace (trace_hot_ops, 2026-08-19). Rounding moves from after to
        # before the 2-term add (<=1 ulp); CPU/f32 tests are unchanged.
        rois = (bev_rois + img_rois.astype(bev_rois.dtype)) / denom.astype(
            bev_rois.dtype
        )

        objectness, offsets = self.rpn_head(rois)  # [B, A, 2], [B, A, 6]
        proposals_all = encoders.offset_to_anchor(anchors, offsets)
        scores_all = jax.nn.softmax(objectness, axis=-1)[..., 1]
        scores_all = jnp.where(anchor_valid, scores_all, -jnp.inf)

        nms_size = c.rpn.train_nms_size if train else c.rpn.eval_nms_size
        prop_bev_all = projection.project_to_bev(proposals_all, ext)
        sel = top_k_nms_batch(
            prop_bev_all, scores_all, nms_size,
            iou_threshold=c.rpn.nms_iou_thresh, pre_top_k=c.rpn.pre_nms_top_k,
        )
        proposals = jnp.take_along_axis(
            proposals_all, sel.indices[..., None], axis=1
        )  # [B, P, 6]
        proposal_scores = jnp.where(
            sel.valid, jnp.take_along_axis(scores_all, sel.indices, axis=1), 0.0
        )

        # ---------------- stage 2
        if c.avod.stop_gradient_proposals:
            proposals = jax.lax.stop_gradient(proposals)
        prop_bev = projection.project_to_bev(proposals, ext)
        prop_img = projection.project_to_image_space(proposals, inputs["p2"], img_hw)
        s2 = c.avod.roi_size
        # feature maps sit at decode_stride: cell i covers full-res pixels
        # [i*ds, (i+1)*ds) with center i*ds + (ds-1)/2
        to_feat = lambda px: (px - (ds - 1) / 2) / ds
        img_px_scale2 = jnp.array(
            [img_hw[0] - 1.0, img_hw[1] - 1.0, img_hw[0] - 1.0,
             img_hw[1] - 1.0], jnp.float32,
        )

        def _s2_rois(feat, boxes_px_full, stride):
            """Stage-2 crop: exact flattened gather at stride 1 (reference
            semantics), else ONE patch-einsum window per proposal from the
            avg-pooled map (descriptors / s2^2 on the descriptor-bound
            gather; exact while spans fit roi_patch-2 pooled cells)."""

            if stride <= 1:
                return crop_and_resize_px_batch(
                    feat, to_feat(boxes_px_full), (s2, s2)
                )
            k = stride // ds
            src = nn.avg_pool(feat, (k, k), strides=(k, k)) if k > 1 else feat
            boxes_pooled = (boxes_px_full - (stride - 1) / 2) / stride
            return crop_and_resize_patch_einsum_px(
                src, boxes_pooled, (s2, s2), patch=c.avod.roi_patch
            )

        bev_rois2 = _s2_rois(
            bev_feat, prop_bev * bev_px_scale, c.avod.bev_roi_stride
        )
        img_rois2 = _s2_rois(
            img_feat, prop_img * img_px_scale2, c.avod.img_roi_stride
        )
        cls_logits, box_offsets, orientation, flip_logits = self.stage2_head(
            [bev_rois2.astype(jnp.float32), img_rois2.astype(jnp.float32)],
            train,
            denom=denom[..., 0, 0],  # [B, 1, 1] for the [B, P, F] stacks
        )

        extra = {} if flip_logits is None else {"flip_logits": flip_logits}
        return {
            **extra,
            "objectness": objectness,  # [B, A, 2]
            "rpn_offsets": offsets,  # [B, A, 6]
            "anchors": inputs["anchors"],  # [B, A, 8]
            "anchor_valid": anchor_valid,  # [B, A]
            "proposals": proposals,  # [B, P, 6]
            "proposal_scores": proposal_scores,  # [B, P]
            "proposal_valid": sel.valid,  # [B, P]
            "cls_logits": cls_logits,  # [B, P, C+1]
            "box_offsets": box_offsets,  # [B, P, 10 (box_4c) | 24 (box_8c)]
            "orientation": orientation,  # [B, P, 2]
        }


def decode_detections(
    outputs: Dict[str, jnp.ndarray],
    ground_plane: jnp.ndarray,  # [B, 4]
    cfg: ModelConfig,
    extents: AreaExtents = AreaExtents(),
) -> Dict[str, jnp.ndarray]:
    """Stage-2 decode + final per-class BEV NMS (reference avod_model decode).

    Returns fixed-size per-class detections (leading batch dim):
      boxes_3d [B, C, K, 7], scores [B, C, K], valid [B, C, K]
    """

    proposals = outputs["proposals"]  # [B, P, 6]
    plane = jnp.asarray(ground_plane)[:, None, :]  # [B, 1, 4] broadcast over P
    prop_box3d = encoders.anchor_to_box_3d(proposals)
    if cfg.avod.box_rep == "box_8c":
        prop_corners = encoders.box_3d_to_corners(prop_box3d)
        final_corners = encoders.offsets_to_box_8c(
            prop_corners, outputs["box_offsets"]
        )
        boxes_3d = encoders.box_8c_to_box_3d(final_corners)
    else:
        prop_4c = encoders.box_3d_to_box_4c(prop_box3d, plane)
        final_4c = encoders.offsets_to_box_4c(prop_4c, outputs["box_offsets"])
        boxes_3d = encoders.box_4c_to_box_3d(final_4c, plane)

    # orientation resolution. Default (reference semantics): flip the
    # box-decoded ry by pi toward the angle-vector heading. With the
    # explicit flip head: the box regression keeps the fine (mod-pi) angle,
    # the binary logit supplies the side — the round-4 decomposition showed
    # the implicit angle-vector side bit sits at chance at short horizons.
    ry = boxes_3d[..., 6]
    if "flip_logits" in outputs:
        flip = jnp.argmax(outputs["flip_logits"], axis=-1)
        ry = encoders.apply_heading_flip(ry, flip)
    else:
        theta = encoders.vector_to_angle(outputs["orientation"])
        delta = jnp.mod(ry - theta + jnp.pi, 2 * jnp.pi) - jnp.pi
        ry = jnp.where(
            jnp.abs(delta) > jnp.pi / 2, ry - jnp.sign(delta) * jnp.pi, ry
        )
    boxes_3d = boxes_3d.at[..., 6].set(ry)

    probs = jax.nn.softmax(outputs["cls_logits"], axis=-1)  # [B, P, C+1]
    bev_boxes = projection.project_to_bev(
        encoders.box_3d_to_anchor(boxes_3d), extents
    )

    k = cfg.avod.nms_size
    all_boxes, all_scores, all_valid = [], [], []
    for ci in range(cfg.num_classes):
        scores = jnp.where(
            outputs["proposal_valid"], probs[..., ci + 1], -jnp.inf
        )
        res = nms_batch(bev_boxes, scores, k, iou_threshold=cfg.avod.nms_iou_thresh)
        cls_scores = jnp.where(
            res.valid, jnp.take_along_axis(scores, res.indices, axis=1), 0.0
        )
        all_boxes.append(
            jnp.take_along_axis(boxes_3d, res.indices[..., None], axis=1)
        )
        all_scores.append(cls_scores)
        all_valid.append(res.valid & (cls_scores > 0))
    return {
        "boxes_3d": jnp.stack(all_boxes, axis=1),  # [B, C, K, 7]
        "scores": jnp.stack(all_scores, axis=1),  # [B, C, K]
        "valid": jnp.stack(all_valid, axis=1),  # [B, C, K]
    }


def decode_detections_single(
    outputs: Dict[str, jnp.ndarray],  # unbatched (e.g. from forward_single)
    ground_plane: jnp.ndarray,  # [4]
    cfg: ModelConfig,
    extents: AreaExtents = AreaExtents(),
) -> Dict[str, jnp.ndarray]:
    """Unbatched wrapper around ``decode_detections``."""

    out_b = jax.tree.map(lambda x: x[None], dict(outputs))
    det = decode_detections(out_b, ground_plane[None], cfg, extents)
    return jax.tree.map(lambda x: x[0], det)
