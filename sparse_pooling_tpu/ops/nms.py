"""Fixed-size greedy non-maximum suppression under jit.

TPU-native replacement for ``tf.image.non_max_suppression`` (used by the
reference RPN/AVOD heads), the MV3D fork's Cython CPU NMS and CUDA bitmask
GPU NMS (N2/N3 in SURVEY.md §3.8). Greedy semantics match the classics:
repeatedly take the highest-scoring box, suppress overlaps > threshold.

TPU-first details:
  * static shapes: always ``max_outputs`` indices + validity mask;
  * the IoU row of the current pick is computed ON THE FLY each iteration
    ([N] VPU work) instead of materializing the [N, N] matrix — smaller and
    faster at RPN scale (4096+ candidates);
  * ``nms_batch`` / ``top_k_nms_batch`` are the batch-native forms: naively
    vmapping the sequential loop lowered to per-sample dynamic slices that
    measured 7x slower per frame on TPU v5e; the batch-native body runs the
    same loop with [B, N] tensor ops. (A custom_vmap bridge was tried and
    rejected: it breaks reverse-mode AD through the surrounding graph.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class NmsResult(NamedTuple):
    indices: jnp.ndarray  # [..., max_outputs] int32 into the input boxes
    valid: jnp.ndarray  # [..., max_outputs] bool


def _nms_batch(boxes, scores, max_outputs: int, iou_threshold: float) -> NmsResult:
    """Batch-native greedy NMS: boxes [B, N, 4], scores [B, N].

    The loop body works on PRE-SPLIT [B, N] coordinate planes, not the
    packed [B, N, 4] array: with the packed form, the body's two
    consumers (the pick row-gather and the IoU broadcast) demand
    different layouts, and XLA re-copies the whole boxes array EVERY
    while iteration — measured 23.6 ms/iter at batch 48 x 4096 x 300
    iterations, 5.9% of total device time (tools/trace_hot_ops.py,
    2026-08-19). Splitting once outside the loop (and hoisting the
    loop-invariant per-box areas) removes the per-iteration copy while
    computing bit-identical IoUs, so the TF-golden selection-order
    parity (tests/test_tf_golden.py) is unchanged.
    """

    b, n, _ = boxes.shape
    arange_n = jnp.arange(n)
    y1, x1, y2, x2 = (boxes[..., k] for k in range(4))  # [B, N] planes
    areas = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)  # [B, N]

    def body(i, state):
        live, out_idx, out_valid = state
        best = jnp.argmax(live, axis=1)  # [B]
        best_score = jnp.take_along_axis(live, best[:, None], axis=1)[:, 0]
        ok = best_score > -jnp.inf
        out_idx = out_idx.at[:, i].set(best.astype(jnp.int32))
        out_valid = out_valid.at[:, i].set(ok)
        bi = best[:, None]
        py1 = jnp.take_along_axis(y1, bi, axis=1)  # [B, 1] each
        px1 = jnp.take_along_axis(x1, bi, axis=1)
        py2 = jnp.take_along_axis(y2, bi, axis=1)
        px2 = jnp.take_along_axis(x2, bi, axis=1)
        inter = jnp.maximum(jnp.minimum(py2, y2) - jnp.maximum(py1, y1), 0) * (
            jnp.maximum(jnp.minimum(px2, x2) - jnp.maximum(px1, x1), 0)
        )
        union = jnp.take_along_axis(areas, bi, axis=1) + areas - inter
        iou_row = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        suppress = (iou_row > iou_threshold) | (arange_n[None, :] == best[:, None])
        live = jnp.where(ok[:, None] & suppress, -jnp.inf, live)
        return live, out_idx, out_valid

    init = (
        scores.astype(jnp.float32),
        jnp.zeros((b, max_outputs), jnp.int32),
        jnp.zeros((b, max_outputs), bool),
    )
    _, out_idx, out_valid = jax.lax.fori_loop(0, max_outputs, body, init)
    return NmsResult(out_idx, out_valid)


def nms_batch(
    boxes: jnp.ndarray,  # [B, N, 4]
    scores: jnp.ndarray,  # [B, N]
    max_outputs: int,
    iou_threshold: float = 0.5,
) -> NmsResult:
    """Batch-native greedy NMS. Use this (not vmap of ``nms``) in batched
    code: the vmapped sequential loop measured 7x slower per frame."""

    return _nms_batch(boxes, scores, max_outputs, iou_threshold)


def nms(
    boxes: jnp.ndarray,  # [N, 4] [y1, x1, y2, x2]
    scores: jnp.ndarray,  # [N] f32; pass -inf for invalid boxes
    max_outputs: int,
    iou_threshold: float = 0.5,
) -> NmsResult:
    res = _nms_batch(boxes[None], scores[None], max_outputs, iou_threshold)
    return NmsResult(res.indices[0], res.valid[0])


def top_k_nms_batch(
    boxes: jnp.ndarray,  # [B, N, 4]
    scores: jnp.ndarray,  # [B, N]
    max_outputs: int,
    iou_threshold: float = 0.5,
    pre_top_k: int = 1024,
) -> NmsResult:
    """Batched top-k prefilter + NMS; indices in ORIGINAL box indexing."""

    top_scores, top_idx = jax.lax.top_k(scores, pre_top_k)
    boxes_k = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    sub = nms_batch(boxes_k, top_scores, max_outputs, iou_threshold)
    return NmsResult(
        jnp.take_along_axis(top_idx, sub.indices, axis=1), sub.valid
    )


def top_k_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_outputs: int,
    iou_threshold: float = 0.5,
    pre_top_k: int = 1024,
) -> NmsResult:
    """Top-k prefilter then NMS — the reference RPN's top-k + NMS pattern."""

    res = top_k_nms_batch(
        boxes[None], scores[None], max_outputs, iou_threshold, pre_top_k
    )
    return NmsResult(res.indices[0], res.valid[0])


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
    return np.array(idx_out), np.array(valid_out)
