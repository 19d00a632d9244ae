"""Per-frame compiled pipeline assembly.

Composes the full per-frame graph the north-star demands — voxelize ->
project/fuse -> backbone -> heads -> NMS — as ONE jittable function from raw
device inputs (padded points, uint8 image, calibration, plane) to model
outputs. The reference splits this across host numpy (BEV maps, sparse
matrices: ``kitti_utils``) and the TF graph; here everything after file IO
runs on device (SURVEY.md §4.1 hot-loop redesign).

The model is batch-native (see ``models.detector``) and so are the input
builders: the voxelizer and COO builder flatten the batch into single
segment ops and the anchor filter gathers its integral-image corners with
one flat take (vmapped scatters/gathers lower poorly on TPU).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sparse_pooling_tpu.configs.config import AreaExtents, ModelConfig
from sparse_pooling_tpu.models.detector import SparsePoolingDetector
from sparse_pooling_tpu.ops import anchors as anchor_ops
from sparse_pooling_tpu.ops import bev_device, sparse_build


class RawSample(NamedTuple):
    """Per-frame device inputs (all static shapes; batch adds a lead axis)."""

    points: jnp.ndarray  # [P, 3] f32 cam-frame, zero-padded
    points_mask: jnp.ndarray  # [P] bool
    image: jnp.ndarray  # [Hi, Wi, 3] uint8 canvas (resized, or padded raw
    # when image_scale is set and ImageConfig.device_resize is on)
    p2: jnp.ndarray  # [3, 4] f32 canvas-scaled
    ground_plane: jnp.ndarray  # [4] f32
    gt_boxes_3d: jnp.ndarray  # [G, 7] f32 padded
    gt_valid: jnp.ndarray  # [G] bool
    gt_classes: jnp.ndarray  # [G] int32
    # [2] f32 (sy, sx) = canvas/raw for the in-graph resize; None (legacy
    # constructors) means the image is already canvas-resized
    image_scale: Any = None


def static_anchor_grid(cfg: ModelConfig, extents: AreaExtents) -> np.ndarray:
    """Compile-time anchor constant [N, 8] with y=0 (filled per frame)."""

    if cfg.architecture == "rcnn":
        from sparse_pooling_tpu.models.fusion_rcnn import rcnn_anchor_grid

        return rcnn_anchor_grid(cfg, extents)
    plane0 = np.array([0.0, -1.0, 0.0, 0.0])
    return anchor_ops.generate_anchors_np(cfg.anchors, extents, plane0).astype(
        np.float32
    )


def anchor_variants(cfg: ModelConfig) -> int:
    """Class/rotation variants per grid position (the anchor-group width)."""

    return len(cfg.anchors.sizes) * len(cfg.anchors.rotations)


def anchors_with_ground_y(anchors_static: jnp.ndarray, plane: jnp.ndarray):
    """Set each anchor's y from the frame's ground plane (device)."""

    a, b, c, d = plane[0], plane[1], plane[2], plane[3]
    x, z = anchors_static[:, 0], anchors_static[:, 2]
    y = -(a * x + c * z + d) / b
    return anchors_static.at[:, 1].set(y)


def make_model(cfg: ModelConfig, extents: AreaExtents = AreaExtents()):
    expected_stride = 2 ** (len(cfg.backbone.channels) - 1)
    if cfg.sparse_pool.fusion_stride != expected_stride:
        raise ValueError(
            "sparse_pool.fusion_stride must equal the encoder's final stride "
            f"2^(stages-1) = {expected_stride}, got {cfg.sparse_pool.fusion_stride}"
        )
    bh, bw = cfg.bev.padded_hw(extents)
    s = cfg.sparse_pool.fusion_stride
    for name, (h, w) in {"bev": (bh, bw), "image": (cfg.image.height, cfg.image.width)}.items():
        if h % s or w % s:
            raise ValueError(f"{name} lattice {h}x{w} not divisible by stride {s}")
    ds = cfg.backbone.decode_stride
    if ds < 1 or (ds & (ds - 1)):
        raise ValueError(f"backbone.decode_stride must be a power of 2, got {ds}")
    if ds >= cfg.sparse_pool.fusion_stride:
        raise ValueError(
            f"backbone.decode_stride {ds} must be below the encoder's final "
            f"stride {cfg.sparse_pool.fusion_stride}"
        )
    for name, st in (
        ("bev_roi_stride", cfg.rpn.bev_roi_stride),
        ("img_roi_stride", cfg.rpn.img_roi_stride),
    ):
        if st % ds:
            raise ValueError(
                f"rpn.{name}={st} must be a multiple of backbone."
                f"decode_stride={ds} (the ROI source pools the decoded map)"
            )
    if cfg.rpn.roi_channels and (
        (cfg.rpn.bev_roi_stride > 1) != (cfg.rpn.img_roi_stride > 1)
    ):
        raise ValueError(
            "rpn.roi_channels projects the strided view to "
            f"{cfg.rpn.roi_channels} channels; with only one view strided "
            "the RPN mean-fuse would mix mismatched widths — stride both "
            "views, neither, or set roi_channels=0"
        )
    if cfg.anchors.max_anchors % (
        len(cfg.anchors.sizes) * len(cfg.anchors.rotations)
    ):
        raise ValueError(
            f"anchors.max_anchors={cfg.anchors.max_anchors} must be divisible "
            "by the class x rotation variant count (position-granular filter)"
        )
    if cfg.architecture == "rcnn":
        from sparse_pooling_tpu.models.fusion_rcnn import FusionRcnn

        return FusionRcnn(cfg=cfg, extents=extents)
    if cfg.architecture != "avod":
        raise ValueError(f"unknown architecture '{cfg.architecture}'")
    return SparsePoolingDetector(cfg=cfg, extents=extents)


def build_model_inputs_batch(
    batch: RawSample,  # leading batch dim on every field
    anchors_static: jnp.ndarray,
    path_keep: jnp.ndarray,  # [B, 2]
    cfg: ModelConfig,
    extents: AreaExtents,
) -> Dict[str, Any]:
    """Batch-native input construction.

    The voxelizer and COO builder flatten the batch into one segment op
    each, and the anchor filter does its integral-image corner lookups as
    one flat gather (the vmapped forms lower to XLA's slow batched
    scatters/gathers — measured 3-4x slower at batch 8,
    tools/profile_micro.py).
    """

    h, w = cfg.bev.grid_hw(extents)
    hp, _ = cfg.bev.padded_hw(extents)
    # Scatter straight into space-to-depth layout when the backbone packs
    # anyway: the full-res [B, H+pad, W, 6] raster then never exists
    # (~15 ms/iter of layout copies at batch 48 — see
    # bev_device.bev_maps_packed_batch). Bit-identical model inputs.
    # NOTE: the odd-dim fallback below serves s2d-OFF configs only; with
    # space_to_depth=True an odd padded lattice fails fast in
    # VggPyramidExtractor.encode with a config hint (round-3 advisor #2 —
    # the unpacked builder cannot make odd dims s2d-packable either).
    use_packed = cfg.backbone.space_to_depth and hp % 2 == 0 and w % 2 == 0
    if use_packed:
        bev_input, bev_counts_s2d = bev_device.bev_maps_packed_batch(
            batch.points, batch.points_mask, batch.ground_plane, extents,
            cfg.bev,
        )
    else:
        bev_input = bev_device.bev_maps_from_points_batch(
            batch.points, batch.points_mask, batch.ground_plane, extents,
            cfg.bev,
        )
    if cfg.image.device_resize and batch.image_scale is not None:
        from sparse_pooling_tpu.ops import image_resize

        image = image_resize.resize_bilinear_batch(
            batch.image, batch.image_scale
        )
    else:
        image = batch.image.astype(jnp.float32) / 255.0
    m_bev, m_fv = sparse_build.build_coo_device(
        batch.points, batch.points_mask, batch.p2, extents, cfg.bev,
        cfg.image, cfg.sparse_pool,
    )

    if use_packed:
        # per-cell counts ride the packed builder. Preserve the EXACT
        # raster semantics of the unpacked path: 0/1 indicator for
        # threshold <= 1 (the tier ranking sums this raster — switching
        # to raw counts would change the kept set under cap overflow),
        # raw counts above (matching bev_counts_from_points).
        raster = bev_counts_s2d
        if cfg.anchors.density_threshold <= 1:
            raster = (raster > 0).astype(jnp.float32)
        occupancy = bev_device.unpack_s2d_raster(raster, h)
    elif cfg.anchors.density_threshold <= 1:
        occupancy = (bev_input[:, :h, :, cfg.bev.height_slices] > 0).astype(
            jnp.float32
        )
    else:
        occupancy = jax.vmap(
            lambda p, m: bev_device.bev_counts_from_points(
                p, m, extents, cfg.bev.voxel_size
            )
        )(batch.points, batch.points_mask)

    anchors_frame = jax.vmap(
        lambda g: anchors_with_ground_y(anchors_static, g)
    )(batch.ground_plane)
    if cfg.architecture == "rcnn":
        valid = jnp.ones(anchors_frame.shape[:2], bool)
        filtered_anchors, filtered_valid = anchors_frame, valid
    elif cfg.rpn.dense_grid:
        # dense-grid RPN: score EVERY grid anchor, occupancy as a mask —
        # no cap, no truncation, no compaction gathers (the reference
        # scores all nonempty anchors; this is its static-shape twin).
        # Occupancy counts come from strided slices (zero descriptors).
        counts = anchor_ops.grid_occupancy_counts(
            occupancy, extents, cfg.bev, cfg.anchors
        )
        valid = (counts >= cfg.anchors.density_threshold).reshape(
            counts.shape[0], -1
        )
        filtered_anchors, filtered_valid = anchors_frame, valid
    elif anchor_ops.quad_supported(
        cfg.anchors, cfg.bev, extents, cfg.anchors.max_anchors, cfg.rpn.roi_quad
    ):
        # capped path, QUAD-granular: whole QxQ-position blocks kept
        # together so the ROI crops share one window per block
        filtered = anchor_ops.filter_anchor_quads_grid(
            anchors_frame, occupancy, extents, cfg.bev, cfg.anchors,
            max_anchors=cfg.anchors.max_anchors, quad=cfg.rpn.roi_quad,
            density_threshold=cfg.anchors.density_threshold,
        )
        filtered_anchors, filtered_valid = filtered.anchors, filtered.valid
    else:
        # capped path: position-granular compaction — kept anchors stay
        # grouped by grid position (all class/rotation variants adjacent),
        # which lets the RPN ROI crops share ONE gathered patch per
        # position (detector.py); the grid form does the occupancy query
        # with strided slices and falls back to the gather path for
        # non-integer stride/voxel ratios
        filtered = anchor_ops.filter_anchor_positions_grid(
            anchors_frame, occupancy, extents, cfg.bev, cfg.anchors,
            max_anchors=cfg.anchors.max_anchors,
            density_threshold=cfg.anchors.density_threshold,
        )
        filtered_anchors, filtered_valid = filtered.anchors, filtered.valid

    return {
        "bev_input": bev_input,
        # explicit static flag, NOT inferable from the channel count: a
        # future bev_input variant with extra channels (e.g. intensity)
        # would fool any shape-sniffing consumer (round-3 advisor #1)
        "bev_pre_packed": use_packed,
        "image": image,
        "m_bev": m_bev,
        "m_fv": m_fv,
        "anchors": filtered_anchors,
        "anchor_valid": filtered_valid,
        "p2": batch.p2,
        "path_keep": path_keep,
    }


def build_model_inputs(
    raw: RawSample,
    anchors_static: jnp.ndarray,
    path_keep: jnp.ndarray,  # [2]
    cfg: ModelConfig,
    extents: AreaExtents,
) -> Dict[str, Any]:
    """Single-sample form (batch of 1) — kept for init and tooling."""

    batch = jax.tree.map(lambda x: x[None], raw)
    return build_model_inputs_batch(
        batch, anchors_static, path_keep[None], cfg, extents
    )


def sample_path_keep(rng: jax.Array, cfg: ModelConfig) -> jnp.ndarray:
    """Path-drop flags (reference rpn_model path-drop): keep each branch with
    its configured probability, but never drop both. Returns [2]."""

    if not cfg.path_drop.enabled:
        return jnp.ones((2,), jnp.float32)
    r1, r2, r3 = jax.random.split(rng, 3)
    bev = jax.random.uniform(r1) < cfg.path_drop.bev_keep_prob
    img = jax.random.uniform(r2) < cfg.path_drop.img_keep_prob
    neither = ~(bev | img)
    revive_bev = jax.random.uniform(r3) < 0.5
    bev = bev | (neither & revive_bev)
    img = img | (neither & ~revive_bev)
    return jnp.stack([bev, img]).astype(jnp.float32)


def forward_batch_fn(
    model: SparsePoolingDetector,
    params,
    batch: RawSample,  # leading batch dim
    anchors_static: jnp.ndarray,
    cfg: ModelConfig,
    extents: AreaExtents,
    train: bool = False,
    rng: jax.Array = None,
):
    """Batched end-to-end forward: raw inputs -> model outputs (jittable)."""

    b = batch.points.shape[0]
    if train:
        rng_path, rng_drop = jax.random.split(rng)
        path_keep = jax.vmap(lambda k: sample_path_keep(k, cfg))(
            jax.random.split(rng_path, b)
        )
        rngs = {"dropout": rng_drop}
    else:
        path_keep = jnp.ones((b, 2), jnp.float32)
        rngs = {}
    inputs = build_model_inputs_batch(batch, anchors_static, path_keep, cfg, extents)
    return model.apply(params, inputs, train=train, rngs=rngs)


def forward_single(
    model: SparsePoolingDetector,
    params,
    raw: RawSample,
    anchors_static: jnp.ndarray,
    cfg: ModelConfig,
    extents: AreaExtents,
    train: bool = False,
    rng: jax.Array = None,
):
    """One sample end-to-end (batch of 1; outputs keep the batch dim of 1
    stripped for tooling convenience)."""

    batch = jax.tree.map(lambda x: x[None], raw)
    out = forward_batch_fn(
        model, params, batch, anchors_static, cfg, extents, train, rng
    )
    return jax.tree.map(lambda x: x[0], out)


@functools.partial(
    jax.jit, static_argnames=("model", "cfg", "extents", "train")
)
def forward_batch(
    model: SparsePoolingDetector,
    params,
    batch: RawSample,
    anchors_static: jnp.ndarray,
    cfg: ModelConfig,
    extents: AreaExtents,
    train: bool = False,
    rng: jax.Array = None,
):
    """jit-wrapped ``forward_batch_fn``."""

    return forward_batch_fn(
        model, params, batch, anchors_static, cfg, extents, train, rng
    )


def loss_batch(outputs, batch: RawSample, rng, cfg: ModelConfig, extents: AreaExtents):
    """Architecture-dispatched batched loss."""

    if cfg.architecture == "rcnn":
        from sparse_pooling_tpu.models.fusion_rcnn import rcnn_loss

        return rcnn_loss(
            outputs, batch.gt_boxes_3d, batch.gt_valid, batch.gt_classes,
            rng, cfg, extents, ground_plane=batch.ground_plane,
        )
    from sparse_pooling_tpu.models.loss import detector_loss_batch

    return detector_loss_batch(
        outputs, batch.gt_boxes_3d, batch.gt_valid, batch.gt_classes,
        batch.ground_plane, rng, cfg, extents,
    )


def decode_batch(outputs, ground_plane, cfg: ModelConfig, extents: AreaExtents):
    """Architecture-dispatched batched decode."""

    if cfg.architecture == "rcnn":
        from sparse_pooling_tpu.models.fusion_rcnn import decode_rcnn_detections

        return decode_rcnn_detections(
            outputs, cfg, extents, ground_plane=ground_plane
        )
    from sparse_pooling_tpu.models.detector import decode_detections

    return decode_detections(outputs, ground_plane, cfg, extents)
