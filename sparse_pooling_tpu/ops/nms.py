"""Fixed-size greedy non-maximum suppression under jit.

TPU-native replacement for ``tf.image.non_max_suppression`` (used by the
reference RPN/AVOD heads), the MV3D fork's Cython CPU NMS and CUDA bitmask
GPU NMS (N2/N3 in SURVEY.md §3.8). Greedy semantics match the classics:
repeatedly take the highest-scoring box, suppress overlaps > threshold.

Static shapes: always returns ``max_outputs`` indices plus a validity mask;
invalid slots point at the last suppressed pick with valid=False. The loop
is a ``lax.fori_loop`` of max_outputs steps over an [N] score/suppression
vector — O(max_outputs * N) VPU work, no host sync, fully fusable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sparse_pooling_tpu.ops.iou import pairwise_iou


class NmsResult(NamedTuple):
    indices: jnp.ndarray  # [max_outputs] int32 into the input boxes
    valid: jnp.ndarray  # [max_outputs] bool


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jnp.ndarray,  # [N, 4] [y1, x1, y2, x2]
    scores: jnp.ndarray,  # [N] f32; pass -inf for invalid boxes
    max_outputs: int,
    iou_threshold: float = 0.5,
) -> NmsResult:
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)  # [N, N]

    def body(i, state):
        live_scores, out_idx, out_valid = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        ok = best_score > -jnp.inf
        out_idx = out_idx.at[i].set(jnp.int32(best))
        out_valid = out_valid.at[i].set(ok)
        # suppress overlaps with the pick (and the pick itself)
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best
        )
        live_scores = jnp.where(ok & suppress, -jnp.inf, live_scores)
        return live_scores, out_idx, out_valid

    init = (
        scores.astype(jnp.float32),
        jnp.zeros((max_outputs,), jnp.int32),
        jnp.zeros((max_outputs,), bool),
    )
    _, out_idx, out_valid = jax.lax.fori_loop(0, max_outputs, body, init)
    return NmsResult(out_idx, out_valid)


@functools.partial(jax.jit, static_argnames=("max_outputs", "pre_top_k"))
def top_k_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    pre_top_k: int = 1024,
) -> NmsResult:
    """Top-k prefilter then NMS — the reference RPN's top-k + NMS pattern.

    Cuts the O(N^2) IoU matrix down to pre_top_k^2. Returned indices are in
    the ORIGINAL box indexing.
    """

    top_scores, top_idx = jax.lax.top_k(scores, pre_top_k)
    sub = nms(jnp.take(boxes, top_idx, axis=0), top_scores, max_outputs, iou_threshold)
    return NmsResult(jnp.take(top_idx, sub.indices), sub.valid)


def nms_numpy(boxes, scores, max_outputs, iou_threshold=0.5):
    """Host oracle twin with identical greedy semantics (for tests/tools)."""

    import numpy as np

    boxes = np.asarray(boxes, dtype=np.float64)
    scores = np.asarray(scores, dtype=np.float64).copy()
    n = len(scores)
    idx_out, valid_out = [], []
    for _ in range(max_outputs):
        best = int(scores.argmax()) if n else 0
        ok = n > 0 and scores[best] > -np.inf
        idx_out.append(best)
        valid_out.append(ok)
        if not ok:
            continue
        y1 = np.maximum(boxes[best, 0], boxes[:, 0])
        x1 = np.maximum(boxes[best, 1], boxes[:, 1])
        y2 = np.minimum(boxes[best, 2], boxes[:, 2])
        x2 = np.minimum(boxes[best, 3], boxes[:, 3])
        inter = np.maximum(y2 - y1, 0) * np.maximum(x2 - x1, 0)
        area = lambda b: np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
        union = area(boxes) + area(boxes[best : best + 1]) - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0)
        scores[(iou > iou_threshold)] = -np.inf
        scores[best] = -np.inf
    import numpy as np

    return np.array(idx_out), np.array(valid_out)
