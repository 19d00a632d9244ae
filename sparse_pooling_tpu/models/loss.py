"""Detection losses for RPN + stage 2 (single sample, in-graph targets).

Capability parity with the loss construction in the reference's
``rpn_model.loss()`` / ``avod_model.loss()`` + ``mini_batch_utils``:
objectness/cls weighted softmax CE and localization/orientation weighted
smooth-L1 over an in-graph sampled minibatch (see ``ops.target_assign`` for
why sampling moved in-graph).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from sparse_pooling_tpu.configs.config import AreaExtents, ModelConfig
from sparse_pooling_tpu.ops import encoders, projection
from sparse_pooling_tpu.ops.losses import weighted_smooth_l1, weighted_softmax_ce
from sparse_pooling_tpu.ops.target_assign import sample_minibatch


def detector_loss(
    outputs: Dict[str, jnp.ndarray],
    gt_boxes_3d: jnp.ndarray,  # [G, 7] padded
    gt_valid: jnp.ndarray,  # [G] bool
    gt_classes: jnp.ndarray,  # [G] int32 (1..C)
    ground_plane: jnp.ndarray,  # [4]
    rng: jax.Array,
    cfg: ModelConfig,
    extents: AreaExtents = AreaExtents(),
) -> Dict[str, jnp.ndarray]:
    rng_rpn, rng_s2 = jax.random.split(rng)
    gt_anchors = encoders.box_3d_to_anchor(gt_boxes_3d)
    gt_bev = projection.project_to_bev(gt_anchors, extents)

    # ---------------- RPN minibatch + loss
    anchors = outputs["anchors"][:, :6]
    anchor_bev = projection.project_to_bev(anchors, extents)
    mb = sample_minibatch(
        anchor_bev, outputs["anchor_valid"], gt_bev, gt_valid, gt_classes,
        rng_rpn, cfg.mini_batch.rpn_batch_size,
        neg_iou=cfg.mini_batch.rpn_neg_iou, pos_iou=cfg.mini_batch.rpn_pos_iou,
    )
    sel_obj = jnp.take(outputs["objectness"], mb.indices, axis=0)
    obj_onehot = jax.nn.one_hot(mb.is_pos.astype(jnp.int32), 2)
    rpn_obj_loss = weighted_softmax_ce(sel_obj, obj_onehot, mb.weights)

    sel_anchors = jnp.take(anchors, mb.indices, axis=0)
    sel_gt = jnp.take(gt_anchors, mb.gt_idx, axis=0)
    reg_targets = encoders.anchor_to_offset(sel_anchors, sel_gt)
    sel_offsets = jnp.take(outputs["rpn_offsets"], mb.indices, axis=0)
    pos_w = mb.weights * mb.is_pos.astype(jnp.float32)
    rpn_reg_loss = weighted_smooth_l1(sel_offsets, reg_targets, pos_w)

    # ---------------- stage-2 minibatch + loss
    proposals = outputs["proposals"]
    prop_bev = projection.project_to_bev(proposals, extents)
    mb2 = sample_minibatch(
        prop_bev, outputs["proposal_valid"], gt_bev, gt_valid, gt_classes,
        rng_s2, min(cfg.mini_batch.avod_batch_size, prop_bev.shape[0]),
        neg_iou=cfg.mini_batch.avod_neg_iou, pos_iou=cfg.mini_batch.avod_pos_iou,
    )
    sel_cls = jnp.take(outputs["cls_logits"], mb2.indices, axis=0)
    cls_onehot = jax.nn.one_hot(mb2.cls_target, cfg.num_classes + 1)
    s2_cls_loss = weighted_softmax_ce(sel_cls, cls_onehot, mb2.weights)

    sel_prop = jnp.take(proposals, mb2.indices, axis=0)
    prop_box3d = encoders.anchor_to_box_3d(sel_prop)
    sel_gt_3d = jnp.take(gt_boxes_3d, mb2.gt_idx, axis=0)
    if cfg.avod.box_rep == "box_8c":
        prop_corners = encoders.box_3d_to_corners(prop_box3d)
        gt_corners = encoders.box_3d_to_corners(sel_gt_3d)
        reg_targets2 = encoders.box_8c_to_offsets(prop_corners, gt_corners)
        reg_targets2 = reg_targets2.reshape(reg_targets2.shape[0], 24)
    else:
        prop_4c = encoders.box_3d_to_box_4c(prop_box3d, ground_plane)
        gt_4c = encoders.box_3d_to_box_4c(sel_gt_3d, ground_plane)
        reg_targets2 = encoders.box_4c_to_offsets(prop_4c, gt_4c)
    sel_off2 = jnp.take(outputs["box_offsets"], mb2.indices, axis=0)
    pos_w2 = mb2.weights * mb2.is_pos.astype(jnp.float32)
    s2_reg_loss = weighted_smooth_l1(sel_off2, reg_targets2, pos_w2)

    gt_angle_vec = encoders.angle_to_vector(sel_gt_3d[:, 6])
    sel_orient = jnp.take(outputs["orientation"], mb2.indices, axis=0)
    s2_ang_loss = weighted_smooth_l1(sel_orient, gt_angle_vec, pos_w2)

    r = cfg.rpn
    a = cfg.avod
    total = (
        r.loss_objectness_weight * rpn_obj_loss
        + r.loss_regression_weight * rpn_reg_loss
        + a.loss_cls_weight * s2_cls_loss
        + a.loss_reg_weight * s2_reg_loss
        + a.loss_ang_weight * s2_ang_loss
    )
    extra = {}
    if "flip_logits" in outputs:
        sel_flip = jnp.take(outputs["flip_logits"], mb2.indices, axis=0)
        flip_onehot = jax.nn.one_hot(
            encoders.heading_flip_bit(sel_gt_3d[:, 6]), 2
        )
        flip_loss = weighted_softmax_ce(sel_flip, flip_onehot, pos_w2)
        total = total + a.loss_flip_weight * flip_loss
        extra["flip"] = flip_loss
    return {
        **extra,
        "total": total,
        "rpn_objectness": rpn_obj_loss,
        "rpn_regression": rpn_reg_loss,
        "cls": s2_cls_loss,
        "reg": s2_reg_loss,
        "orientation": s2_ang_loss,
        "num_rpn_pos": jnp.sum(mb.is_pos),
        "num_s2_pos": jnp.sum(mb2.is_pos),
    }


def detector_loss_batch(
    outputs: Dict[str, jnp.ndarray],  # batched model outputs [B, ...]
    gt_boxes_3d: jnp.ndarray,  # [B, G, 7]
    gt_valid: jnp.ndarray,  # [B, G]
    gt_classes: jnp.ndarray,  # [B, G]
    ground_plane: jnp.ndarray,  # [B, 4]
    rng: jax.Array,
    cfg: ModelConfig,
    extents: AreaExtents = AreaExtents(),
) -> Dict[str, jnp.ndarray]:
    """Per-sample losses vmapped over the batch, then mean-reduced.

    The per-sample loss ops (IoU target assignment, top_k sampling, gathers)
    all batch efficiently under vmap — unlike the model's hot path, which is
    batch-native (see ``models.detector``).
    """

    b = gt_boxes_3d.shape[0]
    rngs = jax.random.split(rng, b)
    one = functools.partial(detector_loss, cfg=cfg, extents=extents)
    losses = jax.vmap(
        lambda o, g, gv, gc, pl, r: one(o, g, gv, gc, pl, r)
    )(dict(outputs), gt_boxes_3d, gt_valid, gt_classes, ground_plane, rngs)
    return jax.tree.map(jnp.mean, losses)
