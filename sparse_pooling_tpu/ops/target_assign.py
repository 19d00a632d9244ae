"""Anchor/proposal target assignment and minibatch sampling (in-graph).

The reference precomputes per-sample anchor IoU caches OFFLINE
(``scripts/preprocessing/gen_mini_batches.py`` + ``mini_batch_utils.py``,
multiprocessing over the dataset) because host numpy IoU over ~90k anchors
was too slow per step. On TPU the full IoU matrix is a trivial broadcasted
VPU op, so assignment and sampling run INSIDE the training step — no offline
cache, no staleness, and augmentation can move boxes freely. (An offline
cache tool still exists for determinism: ``runtime.preprocess``.)

Sampling semantics (reference ``mini_batch_utils``): anchors whose max GT
IoU falls in the positive band are positives, negative band negatives, the
rest ignored; a fixed-size minibatch is drawn preferring positives, filled
with random negatives. Fixed size + priority-noise top_k keeps shapes
static under jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sparse_pooling_tpu.ops.iou import pairwise_iou


class MiniBatch(NamedTuple):
    indices: jnp.ndarray  # [B] int32 into the anchor/proposal set
    weights: jnp.ndarray  # [B] f32 1.0 for sampled entries, else 0
    is_pos: jnp.ndarray  # [B] bool
    cls_target: jnp.ndarray  # [B] int32, 0 = background, 1..C = class
    gt_idx: jnp.ndarray  # [B] int32 best-matching GT per entry
    max_iou: jnp.ndarray  # [B] f32


@functools.partial(jax.jit, static_argnames=("batch_size",))
def sample_minibatch(
    anchor_bev: jnp.ndarray,  # [A, 4] BEV boxes [y1, x1, y2, x2]
    anchor_valid: jnp.ndarray,  # [A] bool
    gt_bev: jnp.ndarray,  # [G, 4]
    gt_valid: jnp.ndarray,  # [G] bool
    gt_classes: jnp.ndarray,  # [G] int32 (1..C)
    rng: jax.Array,
    batch_size: int,
    neg_iou: tuple = (0.0, 0.3),
    pos_iou: tuple = (0.5, 1.0),
) -> MiniBatch:
    a = anchor_bev.shape[0]
    iou = pairwise_iou(anchor_bev, gt_bev)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    gt_idx = jnp.argmax(iou, axis=1).astype(jnp.int32)
    max_iou = jnp.where(anchor_valid, max_iou, -1.0)

    is_pos = (max_iou >= pos_iou[0]) & (max_iou <= pos_iou[1])
    is_neg = (max_iou >= neg_iou[0]) & (max_iou < neg_iou[1]) & anchor_valid

    noise = jax.random.uniform(rng, (a,))
    priority = jnp.where(is_pos, 2.0, jnp.where(is_neg, 1.0, 0.0)) + noise * 0.5
    _, sel = jax.lax.top_k(priority, batch_size)

    sel_pos = jnp.take(is_pos, sel)
    sel_neg = jnp.take(is_neg, sel)
    weights = (sel_pos | sel_neg).astype(jnp.float32)
    cls = jnp.where(
        sel_pos, jnp.take(gt_classes, jnp.take(gt_idx, sel)), 0
    ).astype(jnp.int32)
    return MiniBatch(
        indices=sel.astype(jnp.int32),
        weights=weights,
        is_pos=sel_pos,
        cls_target=cls,
        gt_idx=jnp.take(gt_idx, sel),
        max_iou=jnp.take(max_iou, sel),
    )
