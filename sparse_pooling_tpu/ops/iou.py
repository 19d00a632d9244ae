"""Axis-aligned 2D IoU (broadcasted).

Capability parity with the reference's ``box_list_ops`` IoU (used for
minibatch target assignment) and the MV3D fork's Cython ``bbox.pyx``
(N4 in SURVEY.md §3.8) — here a single vectorized jnp function that XLA
fuses; no native code needed on TPU.
Boxes are [y1, x1, y2, x2].
"""

from __future__ import annotations

import jax.numpy as jnp


def area(boxes):
    boxes = jnp.asarray(boxes)
    return jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )


def pairwise_intersection(boxes_a, boxes_b):
    """[N, 4] x [M, 4] -> [N, M] intersection areas."""

    a = jnp.asarray(boxes_a)[:, None, :]
    b = jnp.asarray(boxes_b)[None, :, :]
    iy = jnp.maximum(
        jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]), 0
    )
    ix = jnp.maximum(
        jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]), 0
    )
    return iy * ix


def pairwise_iou(boxes_a, boxes_b):
    """[N, 4] x [M, 4] -> [N, M] IoU."""

    inter = pairwise_intersection(boxes_a, boxes_b)
    ar_a = area(boxes_a)[:, None]
    ar_b = area(boxes_b)[None, :]
    union = ar_a + ar_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
