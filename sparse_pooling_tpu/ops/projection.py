"""Anchor/box projection into BEV and image space.

Capability parity with ``avod/core/anchor_projector.py`` (numpy + tf twins
collapse to one jnp implementation): axis-aligned 3D anchors project to
normalized BEV boxes for NMS/crop-resize, and to image-plane boxes via the
calibration for the camera-branch ROI crops.

Rank-polymorphic: anchors may be [..., N, 6]; ``p2`` may carry matching
leading batch dims ([..., 3, 4]).
"""

from __future__ import annotations

import jax.numpy as jnp

from sparse_pooling_tpu.configs.config import AreaExtents


def project_to_bev(anchors, extents: AreaExtents, normalize: bool = True):
    """[..., 6] anchors -> [..., 4] BEV boxes [y1, x1, y2, x2].

    BEV raster convention matches the BEV input tensor: row ~ z (row 0 at
    z_min), col ~ x (col 0 at x_min). Normalized coords divide by the area
    extents so they can feed crop_and_resize directly.
    """

    anchors = jnp.asarray(anchors)
    x, z = anchors[..., 0], anchors[..., 2]
    half_x, half_z = anchors[..., 3] / 2, anchors[..., 5] / 2
    bx1 = x - half_x - extents.x_min
    bx2 = x + half_x - extents.x_min
    bz1 = z - half_z - extents.z_min
    bz2 = z + half_z - extents.z_min
    if normalize:
        w = extents.x_max - extents.x_min
        h = extents.z_max - extents.z_min
        bx1, bx2 = bx1 / w, bx2 / w
        bz1, bz2 = bz1 / h, bz2 / h
    return jnp.stack([bz1, bx1, bz2, bx2], axis=-1)


def project_to_image_space(anchors, p2, image_hw, normalize: bool = True):
    """[..., N, 6] anchors -> [..., N, 4] image boxes [y1, x1, y2, x2].

    Projects the 8 corners of each axis-aligned anchor through P2 and takes
    the bounding rectangle (the reference's tf_project_to_image_space).
    ``p2`` must be scaled to the target canvas; with batched anchors pass a
    batched p2 [..., 3, 4]. Elementwise math (no matmul) for fp32 precision
    — see ``ops.sparse_build``.
    """

    anchors = jnp.asarray(anchors)
    p2 = jnp.asarray(p2)
    x, y, z = anchors[..., 0], anchors[..., 1], anchors[..., 2]
    hx, hy, hz = anchors[..., 3] / 2, anchors[..., 4], anchors[..., 5] / 2

    # 8 corners: x +- hx, y and y - dim_y, z +- hz
    sx = jnp.array([1, 1, 1, 1, -1, -1, -1, -1], dtype=anchors.dtype)
    sy = jnp.array([0, 0, 1, 1, 0, 0, 1, 1], dtype=anchors.dtype)
    sz = jnp.array([1, -1, 1, -1, 1, -1, 1, -1], dtype=anchors.dtype)
    cx = x[..., None] + sx * hx[..., None]
    cy = y[..., None] - sy * hy[..., None]
    cz = z[..., None] + sz * hz[..., None]

    # p2 entries broadcast over [..., N, 8]: [..., 3, 4] -> [..., 1, 1] each
    def p(i, j):
        return p2[..., i, j][..., None, None]

    u_n = p(0, 0) * cx + p(0, 1) * cy + p(0, 2) * cz + p(0, 3)
    v_n = p(1, 0) * cx + p(1, 1) * cy + p(1, 2) * cz + p(1, 3)
    depth = p(2, 0) * cx + p(2, 1) * cy + p(2, 2) * cz + p(2, 3)
    depth = jnp.maximum(depth, 1e-3)
    u = u_n / depth
    v = v_n / depth

    h_img, w_img = image_hw
    x1 = jnp.clip(jnp.min(u, axis=-1), 0.0, w_img - 1.0)
    x2 = jnp.clip(jnp.max(u, axis=-1), 0.0, w_img - 1.0)
    y1 = jnp.clip(jnp.min(v, axis=-1), 0.0, h_img - 1.0)
    y2 = jnp.clip(jnp.max(v, axis=-1), 0.0, h_img - 1.0)
    if normalize:
        x1, x2 = x1 / (w_img - 1.0), x2 / (w_img - 1.0)
        y1, y2 = y1 / (h_img - 1.0), y2 / (h_img - 1.0)
    return jnp.stack([y1, x1, y2, x2], axis=-1)
