"""3D grid anchor generation and empty-anchor filtering.

Capability parity with the reference's
``avod/core/anchor_generators/grid_anchor_3d_generator.py`` and
``avod/core/anchor_filter.py``: anchors are tiled at a fixed stride on the
ground plane with per-class sizes (from clustered GT dimensions) and two yaw
bins, then anchors whose BEV footprint contains no LiDAR points are dropped
via an integral-image occupancy query.

TPU-first structure: the (x, z) grid and sizes are STATIC per config, so the
anchor array is a compile-time constant; only the ground-plane height (y)
and the occupancy filter are computed on device per frame. Filtering under
jit keeps static shapes by selecting up to ``max_anchors`` non-empty anchors
with ``lax.top_k`` over the occupancy count and carrying a validity mask.

Anchor format (the reference's 'anchor' encoding): [x, y, z, dim_x, dim_y,
dim_z] — axis-aligned; a box_3d with ry=0 maps (l, w, h) -> (dim_x, dim_z,
dim_y)... see ``ops.encoders``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparse_pooling_tpu.configs.config import AnchorConfig, AreaExtents, BevConfig


def grid_anchor_centers_xz(extents: AreaExtents, stride: float) -> np.ndarray:
    """(Nx*Nz, 2) anchor centers tiled at ``stride`` over the BEV area.

    Centers are offset half a stride from the extent edges (reference tiles
    inclusive of the extent interior).
    """

    xs = np.arange(extents.x_min + stride / 2, extents.x_max, stride)
    zs = np.arange(extents.z_min + stride / 2, extents.z_max, stride)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    return np.stack([gx.reshape(-1), gz.reshape(-1)], axis=1)


def generate_anchors_np(
    cfg: AnchorConfig, extents: AreaExtents, ground_plane: np.ndarray
) -> np.ndarray:
    """All grid anchors for one frame -> (N, 7) [x, y, z, dim_x, dim_y, dim_z, class_idx... ]

    Returns (N, 8): [x, y, z, dim_x, dim_y, dim_z, rot_idx, class_idx] where
    rot encodes the yaw bin (sizes are swapped for the 90-degree bin, the
    reference's trick to keep anchors axis-aligned). y is the ground height
    at (x, z) so the anchor bottom sits on the road.
    """

    centers = grid_anchor_centers_xz(extents, cfg.stride)
    a, b, c, d = ground_plane
    out = []
    for cls_idx, (l, w, h) in enumerate(cfg.sizes):
        for rot_idx, _ in enumerate(cfg.rotations):
            dim_x, dim_z = (l, w) if rot_idx % 2 == 0 else (w, l)
            n = centers.shape[0]
            x = centers[:, 0]
            z = centers[:, 1]
            # ground plane: a x + b y + c z + d = 0 -> y = -(a x + c z + d)/b
            y = -(a * x + c * z + d) / b
            arr = np.stack(
                [
                    x, y, z,
                    np.full(n, dim_x), np.full(n, h), np.full(n, dim_z),
                    np.full(n, rot_idx, dtype=np.float64),
                    np.full(n, cls_idx, dtype=np.float64),
                ],
                axis=1,
            )
            out.append(arr)
    return np.concatenate(out, axis=0)


class FilteredAnchors(NamedTuple):
    """Static-shape filtered anchor set."""

    anchors: jnp.ndarray  # [max_anchors, 8] (see generate_anchors_np)
    valid: jnp.ndarray  # [max_anchors] bool


def _integral_image_2d(grid: jnp.ndarray) -> jnp.ndarray:
    ii = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


@functools.partial(
    jax.jit, static_argnames=("extents", "bev_cfg", "max_anchors", "density_threshold")
)
def filter_anchors_device(
    anchors: jnp.ndarray,  # [N, 8] f32 (static constant per config)
    occupancy: jnp.ndarray,  # [H, W] point-count raster (BEV cells)
    extents: AreaExtents,
    bev_cfg: BevConfig,
    max_anchors: int,
    density_threshold: int = 1,
) -> FilteredAnchors:
    """Keep up to ``max_anchors`` anchors whose footprint holds points.

    Reference: ``anchor_filter.get_empty_anchor_filter`` (integral-image
    occupancy query over the anchor's BEV footprint). Selection is by
    occupancy count via top_k, which keeps every non-empty anchor whenever
    fewer than ``max_anchors`` are non-empty (the common case, matching the
    reference's keep-all behavior).
    """

    ii = _integral_image_2d(occupancy.astype(jnp.float32))
    h, w = occupancy.shape

    x, z = anchors[:, 0], anchors[:, 2]
    dim_x, dim_z = anchors[:, 3], anchors[:, 5]
    vs = bev_cfg.voxel_size
    c0 = jnp.clip(jnp.floor((x - dim_x / 2 - extents.x_min) / vs), 0, w).astype(jnp.int32)
    c1 = jnp.clip(jnp.ceil((x + dim_x / 2 - extents.x_min) / vs), 0, w).astype(jnp.int32)
    r0 = jnp.clip(jnp.floor((z - dim_z / 2 - extents.z_min) / vs), 0, h).astype(jnp.int32)
    r1 = jnp.clip(jnp.ceil((z + dim_z / 2 - extents.z_min) / vs), 0, h).astype(jnp.int32)

    counts = ii[r1, c1] - ii[r0, c1] - ii[r1, c0] + ii[r0, c0]
    nonempty = counts >= density_threshold

    score = jnp.where(nonempty, counts, -1.0)
    top_scores, top_idx = jax.lax.top_k(score, max_anchors)
    return FilteredAnchors(
        anchors=jnp.take(anchors, top_idx, axis=0),
        valid=top_scores >= density_threshold,
    )


def filter_anchors_batch(
    anchors: jnp.ndarray,  # [B, N, 8]
    occupancy: jnp.ndarray,  # [B, H, W]
    extents: AreaExtents,
    bev_cfg: BevConfig,
    max_anchors: int,
    density_threshold: int = 1,
) -> FilteredAnchors:
    """Batch-native anchor filter: the four integral-image corner lookups
    become ONE flat gather with per-sample offsets (the vmapped form lowers
    to XLA's batched gather — measured ~6 ms/batch at batch 8)."""

    b, n, _ = anchors.shape
    ii = _integral_image_2d_batch(occupancy.astype(jnp.float32))  # [B,H+1,W+1]
    h1, w1 = ii.shape[1], ii.shape[2]
    h, w = h1 - 1, w1 - 1

    x, z = anchors[..., 0], anchors[..., 2]
    dim_x, dim_z = anchors[..., 3], anchors[..., 5]
    vs = bev_cfg.voxel_size
    c0 = jnp.clip(jnp.floor((x - dim_x / 2 - extents.x_min) / vs), 0, w).astype(jnp.int32)
    c1 = jnp.clip(jnp.ceil((x + dim_x / 2 - extents.x_min) / vs), 0, w).astype(jnp.int32)
    r0 = jnp.clip(jnp.floor((z - dim_z / 2 - extents.z_min) / vs), 0, h).astype(jnp.int32)
    r1 = jnp.clip(jnp.ceil((z + dim_z / 2 - extents.z_min) / vs), 0, h).astype(jnp.int32)

    flat = ii.reshape(b * h1 * w1)
    boff = (jnp.arange(b, dtype=jnp.int32) * (h1 * w1))[:, None]
    take = lambda r, c: jnp.take(flat, (boff + r * w1 + c).reshape(-1)).reshape(b, n)
    counts = take(r1, c1) - take(r0, c1) - take(r1, c0) + take(r0, c0)
    nonempty = counts >= density_threshold

    score = jnp.where(nonempty, counts, -1.0)
    top_scores, top_idx = jax.lax.top_k(score, max_anchors)  # batched
    return FilteredAnchors(
        anchors=jnp.take_along_axis(anchors, top_idx[..., None], axis=1),
        valid=top_scores >= density_threshold,
    )


def _integral_image_2d_batch(grid: jnp.ndarray) -> jnp.ndarray:
    ii = jnp.cumsum(jnp.cumsum(grid, axis=1), axis=2)
    return jnp.pad(ii, ((0, 0), (1, 0), (1, 0)))


def anchors_per_frame(cfg: AnchorConfig, extents: AreaExtents) -> int:
    """Total grid anchors before filtering (static)."""

    centers = grid_anchor_centers_xz(extents, cfg.stride)
    return centers.shape[0] * len(cfg.sizes) * len(cfg.rotations)
