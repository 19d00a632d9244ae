"""Bilinear crop-and-resize (TF semantics) as gathers.

TPU-native replacement for ``tf.image.crop_and_resize`` (the reference's ROI
feature extraction in both RPN and AVOD stages) and for the MV3D fork's CUDA
``roi_pooling_op`` (N5 in SURVEY.md §3.8): a pure gather + bilinear blend
that XLA lowers to fast dynamic-slices, batched over boxes with vmap.

Semantics match tf.image.crop_and_resize exactly:
  * boxes are [y1, x1, y2, x2] normalized to [0, 1] over (H-1, W-1)
  * sample grid: y = y1*(H-1) + i * (y2-y1)*(H-1)/(crop_h-1), i in [0, crop)
  * crop size 1 samples the box center
  * bilinear interpolation, out-of-range samples clamp (extrapolation_value
    handling is unnecessary: the detector always feeds in-range boxes)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_grid(boxes, h, w, crop_hw):
    """Per-box bilinear sample coordinates: ys [N, ch], xs [N, cw]."""

    ch, cw = crop_hw
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if ch > 1:
        ys = y1[:, None] * (h - 1) + jnp.arange(ch)[None, :] * (
            (y2 - y1)[:, None] * (h - 1) / (ch - 1)
        )
    else:
        ys = (0.5 * (y1 + y2) * (h - 1))[:, None]
    if cw > 1:
        xs = x1[:, None] * (w - 1) + jnp.arange(cw)[None, :] * (
            (x2 - x1)[:, None] * (w - 1) / (cw - 1)
        )
    else:
        xs = (0.5 * (x1 + x2) * (w - 1))[:, None]
    return jnp.clip(ys, 0.0, h - 1.0), jnp.clip(xs, 0.0, w - 1.0)


@functools.partial(jax.jit, static_argnames=("crop_hw",))
def crop_and_resize(image: jnp.ndarray, boxes: jnp.ndarray, crop_hw) -> jnp.ndarray:
    """[H, W, C] image + [N, 4] normalized boxes -> [N, ch, cw, C].

    PERF: one flat gather per bilinear corner over the flattened [H*W, C]
    image. The naive two-stage fancy-indexing form (`image[y0][:, x0]` under
    vmap) materializes [N, ch, W, C] row slabs — measured 96 ms/frame for
    the RPN's 16384 ROIs at 704x800x32 on TPU v5e; this form is ~1 ms.
    """

    h, w, c = image.shape
    ch, cw = crop_hw
    n = boxes.shape[0]
    ys, xs = _sample_grid(boxes, h, w, crop_hw)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.clip(y0, 0, h - 1)
    x0 = jnp.clip(x0, 0, w - 1)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    dy = (ys - y0).astype(image.dtype)[:, :, None, None]  # [N, ch, 1, 1]
    dx = (xs - x0).astype(image.dtype)[:, None, :, None]  # [N, 1, cw, 1]

    flat = image.reshape(h * w, c)

    def gather(yi, xi):  # [N, ch], [N, cw] -> [N, ch, cw, C]
        idx = yi[:, :, None] * w + xi[:, None, :]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(n, ch, cw, c)

    top = gather(y0, x0) * (1 - dx) + gather(y0, x1i) * dx
    bot = gather(y1i, x0) * (1 - dx) + gather(y1i, x1i) * dx
    return top * (1 - dy) + bot * dy


def crop_and_resize_numpy(image, boxes, crop_hw):
    """Host oracle twin (identical sampling math in float64)."""

    import numpy as np

    image = np.asarray(image, dtype=np.float64)
    h, w, c = image.shape
    ch, cw = crop_hw
    out = np.zeros((len(boxes), ch, cw, c))
    for n, (y1, x1, y2, x2) in enumerate(np.asarray(boxes, dtype=np.float64)):
        ys = (
            y1 * (h - 1) + np.arange(ch) * (y2 - y1) * (h - 1) / (ch - 1)
            if ch > 1
            else np.array([0.5 * (y1 + y2) * (h - 1)])
        )
        xs = (
            x1 * (w - 1) + np.arange(cw) * (x2 - x1) * (w - 1) / (cw - 1)
            if cw > 1
            else np.array([0.5 * (x1 + x2) * (w - 1)])
        )
        ys = np.clip(ys, 0, h - 1)
        xs = np.clip(xs, 0, w - 1)
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1i = np.minimum(y0 + 1, h - 1)
        x1i = np.minimum(x0 + 1, w - 1)
        dy = (ys - y0)[:, None, None]
        dx = (xs - x0)[None, :, None]
        top = image[y0][:, x0] * (1 - dx) + image[y0][:, x1i] * dx
        bot = image[y1i][:, x0] * (1 - dx) + image[y1i][:, x1i] * dx
        out[n] = top * (1 - dy) + bot * dy
    return out
