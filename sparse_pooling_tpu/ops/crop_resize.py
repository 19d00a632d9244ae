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

The ``*_px`` variants take boxes in PIXEL coordinates of the source map.
They exist because the detector's BEV feature maps carry zero-padding rows
(704 vs 700 content rows for stride divisibility): normalizing over the
padded height would smear far-range ROIs into the padding, so the detector
converts extent-normalized boxes to CONTENT-pixel boxes and crops the padded
map at exact pixel positions. The normalized API is a thin scaling wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_grid(boxes_px, h, w, crop_hw):
    """Per-box bilinear sample coordinates from PIXEL boxes: ys [N, ch],
    xs [N, cw]. Same grid as TF once normalized boxes are scaled by (dim-1)."""

    ch, cw = crop_hw
    y1, x1, y2, x2 = boxes_px[:, 0], boxes_px[:, 1], boxes_px[:, 2], boxes_px[:, 3]
    if ch > 1:
        ys = y1[:, None] + jnp.arange(ch)[None, :] * ((y2 - y1)[:, None] / (ch - 1))
    else:
        ys = (0.5 * (y1 + y2))[:, None]
    if cw > 1:
        xs = x1[:, None] + jnp.arange(cw)[None, :] * ((x2 - x1)[:, None] / (cw - 1))
    else:
        xs = (0.5 * (x1 + x2))[:, None]
    return jnp.clip(ys, 0.0, h - 1.0), jnp.clip(xs, 0.0, w - 1.0)


def _coords(boxes_px, h, w, crop_hw):
    """boxes [B, N, 4] px -> clipped sample coords ys [B, N, ch], xs [B, N, cw]."""

    return jax.vmap(lambda bx: _sample_grid(bx, h, w, crop_hw))(boxes_px)


def _norm_to_px(boxes, h, w):
    """TF-normalized boxes -> pixel boxes over (h-1, w-1)."""

    scale = jnp.array([h - 1.0, w - 1.0, h - 1.0, w - 1.0], boxes.dtype)
    return boxes * scale


def _crop_batch_impl(images: jnp.ndarray, boxes: jnp.ndarray, crop_hw) -> jnp.ndarray:
    """[B, H, W, C] + [B, N, 4] -> [B, N, ch, cw, C].

    PERF: one flat gather per bilinear corner over the fully flattened
    [B*H*W, C] array with per-sample index offsets. Two slower forms were
    measured on TPU v5e at RPN scale (16384 ROIs, 704x800x32):
      * two-stage fancy indexing (`image[y0][:, x0]` under vmap): 96 ms —
        materializes [N, ch, W, C] row slabs;
      * per-sample flat gather under vmap: 25 ms/frame at batch 8 — XLA's
        batched-gather lowering is poor;
    this flattened form is ~1-2 ms/frame at batch 8.
    """

    b, h, w, c = images.shape
    ch, cw = crop_hw
    n = boxes.shape[1]
    ys, xs = _coords(boxes, h, w, crop_hw)

    # clamp starts to h-2/w-2 so a 2x2 patch always fits; dy/dx then range
    # [0, 1] and the bilinear blend reproduces the edge rows exactly
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(h - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(w - 2, 0))
    dy = (ys - y0).astype(images.dtype)[:, :, :, None, None]  # [B, N, ch, 1, 1]
    dx = (xs - x0).astype(images.dtype)[:, :, None, :, None]  # [B, N, 1, cw, 1]

    # ONE lax.gather of 2x2xC patches per sample point: 4x fewer gather
    # descriptors and 4x larger contiguous slices than per-corner row
    # gathers (TPU gathers are descriptor-latency-bound at 128-byte rows)
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None], (b, n, ch, cw)
    )
    yg = jnp.broadcast_to(y0[:, :, :, None], (b, n, ch, cw))
    xg = jnp.broadcast_to(x0[:, :, None, :], (b, n, ch, cw))
    starts = jnp.stack([bidx, yg, xg], axis=-1).reshape(-1, 3)
    patches = jax.lax.gather(
        images,
        starts,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, 2 if h > 1 else 1, 2 if w > 1 else 1, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B*N*ch*cw, <=2, <=2, C]
    if h == 1:
        patches = jnp.concatenate([patches, patches], axis=1)
    if w == 1:
        patches = jnp.concatenate([patches, patches], axis=2)
    patches = patches.reshape(b, n, ch, cw, 2, 2, c)

    top = patches[..., 0, 0, :] * (1 - dx) + patches[..., 0, 1, :] * dx
    bot = patches[..., 1, 0, :] * (1 - dx) + patches[..., 1, 1, :] * dx
    return top * (1 - dy) + bot * dy


def _acc_dtype(images):
    """Scatter-accumulator dtype for feature gradients.

    Measured on TPU v5e (tools/profile_segsum_sweep.py): segment_sum cost
    cliffs on ACCUMULATOR size — 803k entries into 563k cells x 32ch cost
    15 ms up to ~36 MB of output but 74 ms at 72 MB (f32); accumulating in
    bf16 stays on the fast side at every feature-map size the detector
    uses. So bf16 feature maps (the production compute dtype) accumulate
    their gradient in bf16 — standard mixed-precision activation-grad
    handling — while f32 maps (parity tests, oracles) keep exact f32.
    """

    return jnp.bfloat16 if images.dtype == jnp.bfloat16 else jnp.float32


# Per-chunk accumulator cap for feature-grad scatters. Measured on TPU v5e
# (tools/probe_segsum_chunk.py, roi_s2 backward shapes — 1.6M entries into a
# 352x400x32 bf16 map): ONE segment_sum pays 163.9 ms at a 72 MB accumulator
# and 398.4 ms at 144 MB, but the same scatter split into frame-range chunks
# runs 8.5-10.9 ms at <= 18 MB per chunk — the cost cliffs on ACCUMULATOR
# size, not entry count. Entries are batch-major in every crop backward, and
# each segment id belongs to exactly one frame, so chunking by frame range
# splits the op without changing any segment's summation set.
_SCATTER_CHUNK_BYTES = 16 * 1024 * 1024

# Frames-per-chunk cap independent of accumulator bytes. Round-4 trace
# (trace_hot_ops --train --remat --batch 32): a bf16[958464,8] feature-grad
# accumulator sits UNDER the byte cap, runs as one scatter, and XLA layout
# assignment under remat flips it to a {0,1} (lane-minor) layout — 98
# ns/entry vs the batch-8 twin's {1,0} at 36 ns/entry, 7.9% of device time.
# Capping chunks at 8 frames makes every big-batch scatter shape-identical
# to the batch-8 twin that gets the fast layout; per-segment sums are
# unchanged (bit-exact, see the forced-chunking test in tests/test_box_ops).
_SCATTER_CHUNK_FRAMES = 8


def _frame_chunked_segment_sum(vals, ids, b, hw, acc):
    """segment_sum of batch-major entries into a [b*hw, C] accumulator,
    split into frame-range chunks that each stay under the measured
    accumulator-size cliff (``_SCATTER_CHUNK_BYTES``) AND the remat-layout
    frame cap (``_SCATTER_CHUNK_FRAMES``).

    ``vals`` [M, C] and ``ids`` [M] (global ids: frame*hw + cell) must be
    batch-major with M divisible by b. Exact same per-segment sums as the
    single big op; only the accumulator is partitioned.
    """

    m, c = vals.shape
    per_frame = hw * c * jnp.dtype(acc).itemsize
    fpc = min(
        max(1, _SCATTER_CHUNK_BYTES // per_frame), _SCATTER_CHUNK_FRAMES
    )
    if fpc >= b:
        return jax.ops.segment_sum(
            vals.astype(acc), ids, num_segments=b * hw
        )
    m_per = m // b
    outs = []
    for s in range(0, b, fpc):
        e = min(b, s + fpc)
        outs.append(
            jax.ops.segment_sum(
                vals[s * m_per : e * m_per].astype(acc),
                ids[s * m_per : e * m_per] - s * hw,
                num_segments=(e - s) * hw,
            )
        )
    return jnp.concatenate(outs, axis=0)


def _bilinear_bwd(images, boxes, g, coords_fn, crop_hw):
    """Shared backward for all bilinear-sampling crops.

    Any crop that bilinearly samples ``images`` at coordinates produced by
    ``coords_fn(boxes) -> (ys, xs)`` has the same VJP: feature grads
    scatter 4 weighted corners per sample (done as ONE segment_sum over
    flattened pixel ids — the fast sort-based lowering), box grads chain
    through the sample-coordinate math with a cheap vjp.
    """

    b, h, w, c = images.shape
    ch, cw = crop_hw
    n = boxes.shape[1]
    g = g.astype(jnp.float32)  # [B, N, ch, cw, C]

    (ys, xs), coords_vjp = jax.vjp(coords_fn, boxes)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(h - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(w - 2, 0))
    dy = (ys - y0)[:, :, :, None, None].astype(jnp.float32)
    dx = (xs - x0)[:, :, None, :, None].astype(jnp.float32)

    # corner weights
    w00 = (1 - dy) * (1 - dx)
    w01 = (1 - dy) * dx
    w10 = dy * (1 - dx)
    w11 = dy * dx

    # ---- feature gradient: one segment_sum over flattened pixel ids
    base = (jnp.arange(b) * (h * w))[:, None, None, None]
    yg = jnp.broadcast_to(y0[:, :, :, None], (b, n, ch, cw))
    xg = jnp.broadcast_to(x0[:, :, None, :], (b, n, ch, cw))
    y1g = jnp.minimum(yg + 1, h - 1)
    x1g = jnp.minimum(xg + 1, w - 1)
    idx00 = (base + yg * w + xg).reshape(-1)
    idx01 = (base + yg * w + x1g).reshape(-1)
    idx10 = (base + y1g * w + xg).reshape(-1)
    idx11 = (base + y1g * w + x1g).reshape(-1)
    m = b * n * ch * cw
    mp = n * ch * cw  # entries per frame per corner
    acc = _acc_dtype(images)
    # interleave the four corner blocks per FRAME (not concatenated whole)
    # so the scatter stays batch-major and can chunk by frame range
    flat_ids = jnp.stack(
        [i.reshape(b, mp) for i in (idx00, idx01, idx10, idx11)], axis=1
    ).reshape(-1)
    flat_grads = jnp.stack(
        [
            (g * w00).reshape(b, mp, c),
            (g * w01).reshape(b, mp, c),
            (g * w10).reshape(b, mp, c),
            (g * w11).reshape(b, mp, c),
        ],
        axis=1,
    ).reshape(-1, c)
    g_images = _frame_chunked_segment_sum(
        flat_grads, flat_ids, b, h * w, acc
    ).reshape(b, h, w, c).astype(images.dtype)

    g_boxes = _box_grad_from_corners(
        images, g, (ys, xs), (dy, dx), (idx00, idx01, idx10, idx11), coords_vjp
    )
    return g_images, g_boxes


def _box_grad_from_corners(images, g, coords, deltas, idxs, coords_vjp):
    """Box gradient: chain through dy/dx -> ys/xs -> boxes.

    Re-gathers the corner values (cheap relative to the scatter the custom
    bwd avoids), then chains the bilinear blend analytically. In training,
    XLA dead-code-eliminates this whole path whenever the boxes do not
    depend on parameters (RPN anchors, stop-gradient'ed proposals).
    """

    b, h, w, c = images.shape
    ys, xs = coords
    dy, dx = deltas
    idx00, idx01, idx10, idx11 = idxs
    n, ch = ys.shape[1], ys.shape[2]
    cw = xs.shape[2]
    flat = images.reshape(b * h * w, c).astype(jnp.float32)
    p00 = jnp.take(flat, idx00, axis=0).reshape(b, n, ch, cw, c)
    p01 = jnp.take(flat, idx01, axis=0).reshape(b, n, ch, cw, c)
    p10 = jnp.take(flat, idx10, axis=0).reshape(b, n, ch, cw, c)
    p11 = jnp.take(flat, idx11, axis=0).reshape(b, n, ch, cw, c)
    top = p00 * (1 - dx) + p01 * dx
    bot = p10 * (1 - dx) + p11 * dx
    g_dy = jnp.sum(g * (bot - top), axis=(3, 4))  # [B, N, ch]
    g_dx = jnp.sum(
        g * ((p01 - p00) * (1 - dy) + (p11 - p10) * dy), axis=(2, 4)
    )  # [B, N, cw]
    (g_boxes,) = coords_vjp((g_dy.astype(ys.dtype), g_dx.astype(xs.dtype)))
    return g_boxes


@functools.cache
def _crop_with_vjp(crop_hw):
    """custom_vjp wrapper: XLA's default transpose of the patch gather is a
    general scatter-add that measured ~2.8 s/batch on TPU v5e (vs 47 ms
    forward); the custom backward is ``_bilinear_bwd``."""

    @jax.custom_vjp
    def crop(images, boxes):
        return _crop_batch_impl(images, boxes, crop_hw)

    def fwd(images, boxes):
        return _crop_batch_impl(images, boxes, crop_hw), (images, boxes)

    def bwd(res, g):
        images, boxes = res
        _, h, w, _ = images.shape
        coords_fn = lambda bx: _coords(bx, h, w, crop_hw)
        return _bilinear_bwd(images, boxes, g, coords_fn, crop_hw)

    crop.defvjp(fwd, bwd)
    return crop


def crop_and_resize_px_batch(
    images: jnp.ndarray, boxes_px: jnp.ndarray, crop_hw
) -> jnp.ndarray:
    """Pixel-box form: [B, H, W, C] + [B, N, 4] px -> [B, N, ch, cw, C].

    Use for padded maps where normalized coords must anchor to the CONTENT
    lattice, not the padded one (see module docstring).
    """

    return _crop_with_vjp((int(crop_hw[0]), int(crop_hw[1])))(images, boxes_px)


def crop_and_resize_batch(
    images: jnp.ndarray, boxes: jnp.ndarray, crop_hw
) -> jnp.ndarray:
    """[B, H, W, C] + [B, N, 4] -> [B, N, ch, cw, C] (see ``_crop_batch_impl``).

    Call this (not vmap of the single-sample form) in batched code paths:
    XLA's batched-gather lowering of the vmapped form is ~15x slower.
    """

    b, h, w, _ = images.shape
    return crop_and_resize_px_batch(images, _norm_to_px(boxes, h, w), crop_hw)


def crop_and_resize(image: jnp.ndarray, boxes: jnp.ndarray, crop_hw) -> jnp.ndarray:
    """[H, W, C] image + [N, 4] normalized boxes -> [N, ch, cw, C]."""

    return crop_and_resize_batch(image[None], boxes[None], crop_hw)[0]


def crop_and_resize_patch_einsum(
    images: jnp.ndarray, boxes: jnp.ndarray, crop_hw, patch: int = 8
) -> jnp.ndarray:
    """Normalized-box wrapper over ``crop_and_resize_patch_einsum_px``."""

    b, h, w, _ = images.shape
    return crop_and_resize_patch_einsum_px(
        images, _norm_to_px(boxes, h, w), crop_hw, patch
    )


def _patch_starts(boxes_px, h, w, crop_hw, patch):
    """Window start rows/cols: centered on the sample span, clipped to fit."""

    ys, xs = _coords(boxes_px, h, w, crop_hw)  # [B, N, ch], [B, N, cw]
    y_mid = 0.5 * (ys[..., 0] + ys[..., -1])
    x_mid = 0.5 * (xs[..., 0] + xs[..., -1])
    y_start = jnp.clip(
        jnp.floor(y_mid - (patch - 2) / 2).astype(jnp.int32), 0, max(h - patch, 0)
    )
    x_start = jnp.clip(
        jnp.floor(x_mid - (patch - 2) / 2).astype(jnp.int32), 0, max(w - patch, 0)
    )
    return ys, xs, y_start, x_start


def _patch_coords(boxes_px, h, w, crop_hw, patch):
    """EFFECTIVE sample coordinates of the patch-einsum crop.

    The patch evaluation equals plain bilinear sampling at these
    window-clamped coordinates, which is what lets ``_bilinear_bwd`` serve
    as its backward too.
    """

    ys, xs, y_start, x_start = _patch_starts(boxes_px, h, w, crop_hw, patch)
    py, px = min(patch, h), min(patch, w)
    ys_eff = y_start[..., None] + jnp.clip(ys - y_start[..., None], 0.0, py - 1.0)
    xs_eff = x_start[..., None] + jnp.clip(xs - x_start[..., None], 0.0, px - 1.0)
    return ys_eff, xs_eff


def _patch_einsum_impl(images, boxes_px, crop_hw, patch):
    b, h, w, c = images.shape
    ch, cw = crop_hw
    n = boxes_px.shape[1]
    ys, xs, y_start, x_start = _patch_starts(boxes_px, h, w, crop_hw, patch)

    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, n))
    starts = jnp.stack([bidx, y_start, x_start], axis=-1).reshape(-1, 3)
    patches = jax.lax.gather(
        images,
        starts,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, min(patch, h), min(patch, w), c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(b, n, min(patch, h), min(patch, w), c)

    # clip to the ACTUAL window extent (min(patch, dim) - 1) so degenerate
    # maps smaller than the patch still blend with unit total weight
    py, px = min(patch, h), min(patch, w)
    rel_y = jnp.clip(ys - y_start[..., None], 0.0, py - 1.0)
    rel_x = jnp.clip(xs - x_start[..., None], 0.0, px - 1.0)
    grid = jnp.arange(py, dtype=rel_y.dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - grid))  # [B,N,ch,P]
    grid_x = jnp.arange(px, dtype=rel_x.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - grid_x))

    # two batched dot_generals instead of a 3-operand einsum: measured 9.5
    # vs 18.5 ms/batch at RPN scale (tools/profile_micro.py) — XLA contracts
    # the flattened (q c) dim on the MXU instead of looping tiny factors
    wy = wy.astype(images.dtype)
    wx = wx.astype(images.dtype)
    t = jax.lax.dot_general(
        wy, patches.reshape(b, n, py, px * c),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=images.dtype,
    ).reshape(b, n, ch, px, c)  # [B,N,ch,px,C]
    return jax.lax.dot_general(
        wx, t,
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=images.dtype,
    ).transpose(0, 1, 3, 2, 4)  # [B,N,cw,ch,C] -> [B,N,ch,cw,C]


@functools.cache
def _patch_with_vjp(crop_hw, patch):
    """custom_vjp for the patch-einsum crop: the default transpose of the
    patch gather scatter-adds whole [patch, patch, C] windows (slow general
    scatter, and dense in window cells the samples never touched); the
    patch crop equals bilinear sampling at ``_patch_coords``, so
    ``_bilinear_bwd`` is its exact, sparse backward."""

    @jax.custom_vjp
    def crop(images, boxes_px):
        return _patch_einsum_impl(images, boxes_px, crop_hw, patch)

    def fwd(images, boxes_px):
        return _patch_einsum_impl(images, boxes_px, crop_hw, patch), (
            images,
            boxes_px,
        )

    def bwd(res, g):
        images, boxes_px = res
        _, h, w, _ = images.shape
        coords_fn = lambda bx: _patch_coords(bx, h, w, crop_hw, patch)
        return _bilinear_bwd(images, boxes_px, g, coords_fn, crop_hw)

    crop.defvjp(fwd, bwd)
    return crop


def crop_and_resize_patch_einsum_px(
    images: jnp.ndarray, boxes_px: jnp.ndarray, crop_hw, patch: int = 8
) -> jnp.ndarray:
    """Patch-einsum crop: ONE gather descriptor per box, bilinear on the MXU.

    Gathers a single [patch, patch, C] window per box (descriptors / ch*cw
    vs ``crop_and_resize_batch``) and evaluates the ch x cw bilinear sample
    grid inside it with separable tent-weight einsums. TPU gathers cost
    ~40 ns/descriptor regardless of slice size (measured, ROADMAP.md), so
    this trades descriptor latency for trivial MXU FLOPs.

    EXACT equality with ``crop_and_resize_px_batch`` whenever every box spans
    <= patch-2 source cells in each axis (window start = floor(mid -
    (patch-2)/2) keeps every bilinear 2-cell footprint strictly inside the
    window for such spans); larger boxes are CENTERED in the window and
    their outer samples clamp to the window edge — a symmetric context
    crop, not a one-sided corner crop (use on coarse lattices where box
    spans fit, e.g. RPN ROIs on a stride-pooled BEV map).
    """

    return _patch_with_vjp((int(crop_hw[0]), int(crop_hw[1])), int(patch))(
        images, boxes_px
    )


def _group_starts(boxes_px, h, w, crop_hw, patch):
    """Shared window starts for GROUPED boxes [B, P, V, 4]: one window per
    (sample, position), centered on the mean of the V variants' midpoints.

    All V variants of a grid anchor position share the box CENTER (the
    rotations/classes only change the span), so in the BEV view the shared
    window equals every variant's own centered window; in the image view the
    projected mids differ by a few px and the shared window is the group
    centroid (samples clamp to the window edge like the ungrouped path).

    MEASURED (cars projection geometry, Q=4 blocks, stride-4 image
    lattice; tests/test_model.py::test_quad_image_view_geometry_*): the
    image-view displacement vs exact bilinear coords is dominated by SPAN
    clamping — near-range boxes span 20-100 pooled cells vs the 8-12-cell
    window — which the per-anchor windowed path has identically (mean
    24.0 vs 23.8 cells at z<10 m); block sharing adds <1 cell of mean
    error in every range band and its larger window is slightly MORE
    accurate beyond 40 m. Exact sampling remains available via
    roi_stride=1 (full crop_and_resize).
    """

    b, p, v, _ = boxes_px.shape
    ys, xs = jax.vmap(
        lambda bx: _sample_grid(bx, h, w, crop_hw)
    )(boxes_px.reshape(b, p * v, 4))
    ys = ys.reshape(b, p, v, -1)
    xs = xs.reshape(b, p, v, -1)
    y_mid = 0.5 * (ys[..., 0] + ys[..., -1]).mean(axis=-1)  # [B, P]
    x_mid = 0.5 * (xs[..., 0] + xs[..., -1]).mean(axis=-1)
    y_start = jnp.clip(
        jnp.floor(y_mid - (patch - 2) / 2).astype(jnp.int32), 0, max(h - patch, 0)
    )
    x_start = jnp.clip(
        jnp.floor(x_mid - (patch - 2) / 2).astype(jnp.int32), 0, max(w - patch, 0)
    )
    return ys, xs, y_start, x_start


def _group_coords(boxes_grouped, h, w, crop_hw, patch):
    """Effective (window-clamped) sample coords of the grouped patch crop,
    FLATTENED to [B, P*V, ch|cw] so ``_bilinear_bwd`` can serve as its
    backward (the grouped crop equals bilinear sampling at these coords)."""

    b, p, v, _ = boxes_grouped.shape
    ys, xs, y_start, x_start = _group_starts(boxes_grouped, h, w, crop_hw, patch)
    py, px = min(patch, h), min(patch, w)
    ys_eff = y_start[..., None, None] + jnp.clip(
        ys - y_start[..., None, None], 0.0, py - 1.0
    )
    xs_eff = x_start[..., None, None] + jnp.clip(
        xs - x_start[..., None, None], 0.0, px - 1.0
    )
    return ys_eff.reshape(b, p * v, -1), xs_eff.reshape(b, p * v, -1)


def _group_einsum_impl(images, boxes_grouped, crop_hw, patch):
    b, h, w, c = images.shape
    _, p, v, _ = boxes_grouped.shape
    ch, cw = crop_hw
    ys, xs, y_start, x_start = _group_starts(boxes_grouped, h, w, crop_hw, patch)

    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, p))
    starts = jnp.stack([bidx, y_start, x_start], axis=-1).reshape(-1, 3)
    py, px = min(patch, h), min(patch, w)
    patches = jax.lax.gather(
        images,
        starts,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, py, px, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(b, p, py, px, c)

    rel_y = jnp.clip(ys - y_start[..., None, None], 0.0, py - 1.0)  # [B,P,V,ch]
    rel_x = jnp.clip(xs - x_start[..., None, None], 0.0, px - 1.0)
    grid = jnp.arange(py, dtype=rel_y.dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - grid))  # [B,P,V,ch,py]
    grid_x = jnp.arange(px, dtype=rel_x.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - grid_x))  # [B,P,V,cw,px]

    wy = wy.astype(images.dtype).reshape(b, p, v * ch, py)
    wx = wx.astype(images.dtype)
    # contract the patch rows once per position for ALL variants (the MXU
    # work grows by V but stays trivial; the descriptor-bound gather above
    # is 1/V of the ungrouped path's)
    t = jax.lax.dot_general(
        wy, patches.reshape(b, p, py, px * c),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=images.dtype,
    ).reshape(b, p, v, ch, px, c)
    out = jax.lax.dot_general(
        wx, t,
        (((4,), (4,)), ((0, 1, 2), (0, 1, 2))),
        preferred_element_type=images.dtype,
    )  # [B,P,V,cw,ch,C]
    return out.transpose(0, 1, 2, 4, 3, 5)  # -> [B,P,V,ch,cw,C]


def _group_flat_impl(images, boxes_grouped, crop_hw, patch):
    """Layout-friendly form of ``_group_einsum_impl`` (identical math).

    MEASURED AND REJECTED as the production default (TPU v5e, 2026-08-18,
    tools/profile_group_crop.py + full-graph bench/train sweeps):

      * isolated op (cars shapes, bf16): fwd 7.46 vs 8.40 ms @ batch 8
        (flat wins), 28.94 vs 25.82 @ 32 (6D wins); fwd+bwd within 4%
        everywhere and BOTH forms share the same superlinear bwd jump past
        batch 8 (18.4 -> 67.5 ms at 16), so the padding was never the bwd
        scaling problem;
      * full training step: 419 ms @ batch 8 / 954 @ 16 vs the 6D form's
        416 / 951 — unchanged; batch 32 still OOMs, but the memory dump's
        top entries become plain conv activations (275/240/234 MB conv3_2
        temps), i.e. this form DID eliminate the 3.0 GB padded copies and
        the remaining OOM is legitimate activation memory;
      * full inference bench: 102.5 / 89.0 / 79.6 fps at batch 32/8/64 vs
        the 6D form's 111.0 / 92.7 / 85.6 — an ~8% regression (the extra
        repeat/concat traffic costs more than the padding it saves once
        XLA schedules the full graph).

    Kept as a parity-tested option: it is the memory-lean form if a future
    config ever needs the grouped crop inside a tighter HBM budget.

    The original's middle tensor ``t`` is 6D [B,P,V,ch,px,c] whose trailing
    (px, c) dims tile-pad 10.7-21.3x on TPU ((8,128)/(16,128) tiles vs
    px=12, c=8 at cars shapes) — 3.0 GB for 288 MB of payload at batch 32.
    This form keeps every materialized intermediate 4D with >=96-lane minor
    dims:

      * the window gather reads a CHANNEL-FLATTENED [B, H, W*C] source, so
        one window is a (py, px*C) slab — the (px, c) pair never exists as
        trailing dims (source relayout is one cheap copy of the small
        pooled map);
      * the y-contraction produces t as [B, P, V*ch, px*C] directly;
      * the x-contraction multiplies t by c-repeated tent weights and
        contracts the (px c) lanes with a STATIC ones(px) (x) I_c matrix on
        the MXU, one cw column at a time (cw static, = 3);
      * the [B,P,V*ch, cw*C] result reshapes to the public 6D output in
        exactly (v, ch, cw, c) order — consumers flatten it right back, so
        XLA keeps the (V*ch, cw*C)-tiled buffer.
    """

    b, h, w, c = images.shape
    _, p, v, _ = boxes_grouped.shape
    ch, cw = crop_hw
    ys, xs, y_start, x_start = _group_starts(boxes_grouped, h, w, crop_hw, patch)
    py, px = min(patch, h), min(patch, w)

    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, p))
    starts = jnp.stack([bidx, y_start, x_start * c], axis=-1).reshape(-1, 3)
    patches = jax.lax.gather(
        images.reshape(b, h, w * c),
        starts,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, py, px * c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(b, p, py, px * c)

    rel_y = jnp.clip(ys - y_start[..., None, None], 0.0, py - 1.0)  # [B,P,V,ch]
    rel_x = jnp.clip(xs - x_start[..., None, None], 0.0, px - 1.0)
    grid = jnp.arange(py, dtype=rel_y.dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - grid))
    grid_x = jnp.arange(px, dtype=rel_x.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - grid_x))
    wy = wy.astype(images.dtype).reshape(b, p, v * ch, py)
    wx = wx.astype(images.dtype)  # [B,P,V,cw,px]

    t = jax.lax.dot_general(
        wy, patches,
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=images.dtype,
    )  # [B, P, V*ch, px*C]

    # ones(px) (x) I_c: contracts the px blocks of the (px c) lanes, keeps c
    s_mat = jnp.kron(
        jnp.ones((px, 1), images.dtype), jnp.eye(c, dtype=images.dtype)
    )  # [px*C, C]
    outs = []
    for i in range(cw):
        wxe = jnp.repeat(wx[:, :, :, i, :], c, axis=-1)  # [B,P,V,px*C]
        wxe = jnp.repeat(wxe, ch, axis=2)  # [B,P,V*ch,px*C] (v-major rows)
        outs.append(
            jax.lax.dot_general(
                t * wxe, s_mat,
                (((3,), (0,)), ((), ())),
                preferred_element_type=images.dtype,
            )
        )  # [B,P,V*ch,C]
    out = jnp.concatenate(outs, axis=-1)  # [B,P,V*ch,cw*C]
    # rows are (v, ch) v-major, lanes are (cw, c) — flattening rows then
    # lanes is exactly (v, ch, cw, c) order
    return out.reshape(b, p, v, ch, cw, c)


def _group_flat_feature_grad(images, boxes_grouped, g, crop_hw, patch):
    """Exact transpose of ``_group_flat_impl`` in the same flat layouts."""

    b, h, w, c = images.shape
    _, p, v, _ = boxes_grouped.shape
    ch, cw = crop_hw
    ys, xs, y_start, x_start = _group_starts(boxes_grouped, h, w, crop_hw, patch)
    py, px = min(patch, h), min(patch, w)
    rel_y = jnp.clip(ys - y_start[..., None, None], 0.0, py - 1.0)
    rel_x = jnp.clip(xs - x_start[..., None, None], 0.0, px - 1.0)
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(rel_y[..., None] - jnp.arange(py, dtype=rel_y.dtype))
    ).astype(jnp.float32).reshape(b, p, v * ch, py)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(rel_x[..., None] - jnp.arange(px, dtype=rel_x.dtype))
    ).astype(jnp.float32)

    gf = g.astype(jnp.float32).reshape(b, p, v * ch, cw * c)
    s_t = jnp.kron(jnp.ones((1, px), jnp.float32), jnp.eye(c, dtype=jnp.float32))
    g_t = None
    for i in range(cw):
        gp = jax.lax.dot_general(
            gf[..., i * c : (i + 1) * c], s_t,
            (((3,), (0,)), ((), ())),
        )  # [B,P,V*ch,px*C]
        wxe = jnp.repeat(wx[:, :, :, i, :], c, axis=-1)
        wxe = jnp.repeat(wxe, ch, axis=2)
        g_t = gp * wxe if g_t is None else g_t + gp * wxe

    g_patches = jax.lax.dot_general(
        wy, g_t,
        (((2,), (2,)), ((0, 1), (0, 1))),
    )  # [B,P,py,px*C]

    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    oy = jnp.arange(py, dtype=jnp.int32)[None, None, :, None]
    ox = jnp.arange(px, dtype=jnp.int32)[None, None, None, :]
    fid = (
        (bi[..., None, None] * h + y_start[..., None, None] + oy) * w
        + x_start[..., None, None] + ox
    )  # [B,P,py,px]
    acc = _acc_dtype(images)
    return _frame_chunked_segment_sum(
        g_patches.reshape(-1, c), fid.reshape(-1), b, h * w, acc
    ).reshape(b, h, w, c).astype(images.dtype)


@functools.cache
def _group_flat_with_vjp(crop_hw, patch):
    """custom_vjp for the flat grouped crop (same cotangents as
    ``_group_with_vjp``: window-transpose feature grad in flat layouts, box
    grad through the flattened effective coords)."""

    @jax.custom_vjp
    def crop(images, boxes_grouped):
        return _group_flat_impl(images, boxes_grouped, crop_hw, patch)

    def fwd(images, boxes_grouped):
        return _group_flat_impl(images, boxes_grouped, crop_hw, patch), (
            images,
            boxes_grouped,
        )

    def bwd(res, g):
        images, boxes_grouped = res
        b, p, v, _ = boxes_grouped.shape
        _, h, w, _ = images.shape
        ch, cw = crop_hw
        g_images = _group_flat_feature_grad(
            images, boxes_grouped, g, crop_hw, patch
        )
        coords_fn = lambda bx: _group_coords(
            bx.reshape(b, p, v, 4), h, w, crop_hw, patch
        )
        g_boxes = _box_grad(
            images,
            boxes_grouped.reshape(b, p * v, 4),
            g.reshape(b, p * v, ch, cw, -1).astype(jnp.float32),
            coords_fn,
        )
        return g_images, g_boxes.reshape(b, p, v, 4)

    crop.defvjp(fwd, bwd)
    return crop


def _box_grad(images, boxes, g, coords_fn):
    """Box gradient alone (corner geometry + ``_box_grad_from_corners``)."""

    b, h, w, _ = images.shape
    (ys, xs), coords_vjp = jax.vjp(coords_fn, boxes)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, max(h - 2, 0))
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, max(w - 2, 0))
    dy = (ys - y0)[:, :, :, None, None].astype(jnp.float32)
    dx = (xs - x0)[:, :, None, :, None].astype(jnp.float32)
    n, ch = ys.shape[1], ys.shape[2]
    cw = xs.shape[2]
    base = (jnp.arange(b) * (h * w))[:, None, None, None]
    yg = jnp.broadcast_to(y0[:, :, :, None], (b, n, ch, cw))
    xg = jnp.broadcast_to(x0[:, :, None, :], (b, n, ch, cw))
    y1g = jnp.minimum(yg + 1, h - 1)
    x1g = jnp.minimum(xg + 1, w - 1)
    idxs = (
        (base + yg * w + xg).reshape(-1),
        (base + yg * w + x1g).reshape(-1),
        (base + y1g * w + xg).reshape(-1),
        (base + y1g * w + x1g).reshape(-1),
    )
    return _box_grad_from_corners(
        images, g, (ys, xs), (dy, dx), idxs, coords_vjp
    )


def _group_feature_grad(images, boxes_grouped, g, crop_hw, patch):
    """Feature gradient of the grouped patch crop by WINDOW transpose.

    The forward is (gather windows) ∘ (tent-weight einsums); its exact
    transpose is (einsum transposes on the MXU) ∘ (scatter windows). The
    window scatter has py*px entries per POSITION — measured 2.2x fewer
    entries than the corner scatter at RPN scale (V=4 variants, 3x3 crops:
    1.05M vs 2.36M) and the einsums are trivial MXU work, vs the corner
    path's 4x elementwise mul+concat entry build.
    """

    b, h, w, c = images.shape
    _, p, v, _ = boxes_grouped.shape
    ch, cw = crop_hw
    ys, xs, y_start, x_start = _group_starts(boxes_grouped, h, w, crop_hw, patch)
    py, px = min(patch, h), min(patch, w)
    rel_y = jnp.clip(ys - y_start[..., None, None], 0.0, py - 1.0)  # [B,P,V,ch]
    rel_x = jnp.clip(xs - x_start[..., None, None], 0.0, px - 1.0)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y[..., None] - jnp.arange(py, dtype=rel_y.dtype)))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x[..., None] - jnp.arange(px, dtype=rel_x.dtype)))

    g = g.astype(jnp.float32)  # [B,P,V,ch,cw,C]
    # transpose of: out[b,p,v,cw,ch,c] = sum_px wx[...cw,px] t[...ch,px,c]
    g_out = g.transpose(0, 1, 2, 4, 3, 5)  # [B,P,V,cw,ch,C]
    g_t = jax.lax.dot_general(
        wx.astype(jnp.float32), g_out,
        (((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
    )  # [B,P,V,px,ch,C]
    # transpose of: t[b,p,(v ch),(px c)] = wy[b,p,(v ch),py] @ patches[b,p,py,(px c)]
    g_t = g_t.transpose(0, 1, 2, 4, 3, 5).reshape(b, p, v * ch, px * c)
    g_patches = jax.lax.dot_general(
        wy.astype(jnp.float32).reshape(b, p, v * ch, py), g_t,
        (((2,), (2,)), ((0, 1), (0, 1))),
    )  # [B,P,py,px*C]

    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    oy = jnp.arange(py, dtype=jnp.int32)[None, None, :, None]
    ox = jnp.arange(px, dtype=jnp.int32)[None, None, None, :]
    fid = (
        (bi[..., None, None] * h + y_start[..., None, None] + oy) * w
        + x_start[..., None, None] + ox
    )  # [B,P,py,px]
    acc = _acc_dtype(images)
    return _frame_chunked_segment_sum(
        g_patches.reshape(-1, c), fid.reshape(-1), b, h * w, acc
    ).reshape(b, h, w, c).astype(images.dtype)


@functools.cache
def _group_with_vjp(crop_hw, patch):
    """custom_vjp for the grouped patch crop: feature grad by window
    transpose (``_group_feature_grad``), box grad through the flattened
    effective coords (``_box_grad``; dead-code-eliminated in training where
    RPN anchor boxes don't depend on parameters)."""

    @jax.custom_vjp
    def crop(images, boxes_grouped):
        return _group_einsum_impl(images, boxes_grouped, crop_hw, patch)

    def fwd(images, boxes_grouped):
        return _group_einsum_impl(images, boxes_grouped, crop_hw, patch), (
            images,
            boxes_grouped,
        )

    def bwd(res, g):
        images, boxes_grouped = res
        b, p, v, _ = boxes_grouped.shape
        _, h, w, _ = images.shape
        ch, cw = crop_hw
        g_images = _group_feature_grad(images, boxes_grouped, g, crop_hw, patch)
        coords_fn = lambda bx: _group_coords(
            bx.reshape(b, p, v, 4), h, w, crop_hw, patch
        )
        g_boxes = _box_grad(
            images,
            boxes_grouped.reshape(b, p * v, 4),
            g.reshape(b, p * v, ch, cw, -1).astype(jnp.float32),
            coords_fn,
        )
        return g_images, g_boxes.reshape(b, p, v, 4)

    crop.defvjp(fwd, bwd)
    return crop


def crop_and_resize_group_einsum_px(
    images: jnp.ndarray, boxes_grouped: jnp.ndarray, crop_hw, patch: int = 8
) -> jnp.ndarray:
    """Group-shared patch crop: ONE gather descriptor per anchor POSITION.

    ``boxes_grouped`` is [B, P, V, 4] pixel boxes where the V variants of a
    position (class/rotation pairs of a grid anchor) share their center.
    Gathers a single [patch, patch, C] window per position and evaluates
    every variant's ch x cw bilinear grid inside it — descriptors / V vs
    ``crop_and_resize_patch_einsum_px`` (the gather is descriptor-bound, so
    this is ~V x cheaper at equal exactness for span <= patch-2 boxes whose
    variants share mids; see ``_group_starts`` for the image-view caveat).
    Returns [B, P, V, ch, cw, C].
    """

    return _group_with_vjp((int(crop_hw[0]), int(crop_hw[1])), int(patch))(
        images, boxes_grouped
    )


def crop_and_resize_group_flat_px(
    images: jnp.ndarray, boxes_grouped: jnp.ndarray, crop_hw, patch: int = 8
) -> jnp.ndarray:
    """``crop_and_resize_group_einsum_px`` with layout-friendly internals.

    Identical math and signature; see ``_group_flat_impl`` for why the
    intermediates stay 4D (the 6D form's (px, c) trailing dims tile-pad
    10.7-21.3x and OOM training at batch >= 16).
    """

    return _group_flat_with_vjp((int(crop_hw[0]), int(crop_hw[1])), int(patch))(
        images, boxes_grouped
    )


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
