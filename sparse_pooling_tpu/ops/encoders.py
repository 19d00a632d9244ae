"""Box and anchor encodings.

Capability parity with the reference's encoder family —
``avod/core/anchor_encoder.py``, ``box_3d_encoder.py``, ``box_4c_encoder.py``,
``box_8c_encoder.py``, ``orientation_encoder.py``. The reference keeps numpy
and TF twins of each function; in JAX a single ``jnp`` implementation serves
both eager-numpy and traced use (tests assert hand-built numpy golden
values, SURVEY.md §5). All functions are rank-polymorphic: they accept
[..., N, D] stacks, so the batched detector uses them directly.

Encodings:
  box_3d   [x, y, z, l, w, h, ry]  — KITTI-style, y = bottom-center,
           l along heading, ry = rotation about y.
  anchor   [x, y, z, dim_x, dim_y, dim_z] — axis-aligned; a box_3d maps with
           (l, w) -> (dim_x, dim_z) for ry ~ 0 and swapped for ry ~ +-pi/2.
  offsets  [(dx)/dim_x, (dy)/dim_y, (dz)/dim_z, dlog dims] — RPN regression.
  box_4c   [x1..x4, z1..z4, h1, h2] — 4 ground-plane corners (anchor-local
           ordering) + 2 heights above ground; the 10-d stage-2 target.
  box_8c   (..., 8, 3) corners — for visualization/IoU tools.
  angle    ry <-> [cos ry, sin ry] unit vector.
"""

from __future__ import annotations

import jax.numpy as jnp


# ---------------------------------------------------------------- box_3d <-> anchor

def box_3d_to_anchor(boxes_3d):
    """[..., 7] box_3d -> [..., 6] axis-aligned anchors.

    Follows the reference: the footprint keeps (l, w) projected onto the
    grid axes by the nearest 90-degree yaw bin.
    """

    boxes_3d = jnp.asarray(boxes_3d)
    x, y, z, l, w, h, ry = [boxes_3d[..., i] for i in range(7)]
    keep = jnp.abs(jnp.cos(ry)) >= jnp.abs(jnp.sin(ry))
    dim_x = jnp.where(keep, l, w)
    dim_z = jnp.where(keep, w, l)
    return jnp.stack([x, y, z, dim_x, h, dim_z], axis=-1)


def anchor_to_box_3d(anchors, ry=None):
    """[..., 6] anchors (+optional [...] ry) -> [..., 7] box_3d."""

    anchors = jnp.asarray(anchors)
    x, y, z, dim_x, dim_y, dim_z = [anchors[..., i] for i in range(6)]
    if ry is None:
        ry = jnp.zeros_like(x)
    keep = jnp.abs(jnp.cos(ry)) >= jnp.abs(jnp.sin(ry))
    l = jnp.where(keep, dim_x, dim_z)
    w = jnp.where(keep, dim_z, dim_x)
    return jnp.stack([x, y, z, l, w, dim_y, ry], axis=-1)


# ---------------------------------------------------------------- anchor offsets

def anchor_to_offset(anchors, gt_anchors):
    """Regression targets: [..., 6] offsets of gt from anchor.

    Reference ``anchor_encoder.anchor_to_offset``: translation normalized by
    anchor dims, dimension offsets as log ratios.
    """

    anchors = jnp.asarray(anchors)
    gt = jnp.asarray(gt_anchors)
    t_xyz = (gt[..., :3] - anchors[..., :3]) / anchors[..., 3:6]
    t_dim = jnp.log(gt[..., 3:6] / anchors[..., 3:6])
    return jnp.concatenate([t_xyz, t_dim], axis=-1)


def offset_to_anchor(anchors, offsets):
    """Inverse of ``anchor_to_offset``."""

    anchors = jnp.asarray(anchors)
    offsets = jnp.asarray(offsets)
    xyz = anchors[..., :3] + offsets[..., :3] * anchors[..., 3:6]
    dims = anchors[..., 3:6] * jnp.exp(offsets[..., 3:6])
    return jnp.concatenate([xyz, dims], axis=-1)


# ---------------------------------------------------------------- orientation

def angle_to_vector(ry):
    """ry [...] -> [..., 2] (cos, sin) (reference orientation_encoder)."""

    ry = jnp.asarray(ry)
    return jnp.stack([jnp.cos(ry), jnp.sin(ry)], axis=-1)


def vector_to_angle(vec):
    """[..., 2] -> ry [...] via atan2."""

    vec = jnp.asarray(vec)
    return jnp.arctan2(vec[..., 1], vec[..., 0])


def heading_flip_bit(ry):
    """1 where ry (any range) lies OUTSIDE the canonical band [-pi/2, pi/2).

    The binary pi-disambiguation target for the explicit flip head
    (``AvodStage2Config.explicit_flip_head``): a heading equals its
    canonical (mod-pi) reduction plus ``flip_bit * pi``.
    """

    w = jnp.mod(jnp.asarray(ry) + jnp.pi / 2, 2 * jnp.pi)  # 0 == -pi/2
    return (w >= jnp.pi).astype(jnp.int32)


def canonical_heading(ry):
    """Wrap ry into the canonical band [-pi/2, pi/2) (mod pi)."""

    return jnp.mod(jnp.asarray(ry) + jnp.pi / 2, jnp.pi) - jnp.pi / 2


def apply_heading_flip(ry, flip):
    """Canonicalize ry (mod pi) then add pi where flip == 1, in (-pi, pi].

    Inverse of (``canonical_heading``, ``heading_flip_bit``):
    ``apply_heading_flip(ry, heading_flip_bit(ry))`` == wrap(ry) exactly for
    any heading. At decode the fine angle comes from the (pi-ambiguous) box
    regression and the side bit from the flip head.
    """

    out = canonical_heading(ry) + jnp.asarray(flip, jnp.float32) * jnp.pi
    return jnp.where(out > jnp.pi, out - 2 * jnp.pi, out)


# ---------------------------------------------------------------- box_8c

def box_3d_to_corners(boxes_3d):
    """[..., 7] box_3d -> [..., 8, 3] corners (cam frame).

    Corner order: bottom face (x+l/2 first) counter-clockwise viewed from
    above, then the top face in the same order.
    """

    boxes_3d = jnp.asarray(boxes_3d)
    x, y, z, l, w, h, ry = [boxes_3d[..., i] for i in range(7)]
    lx = jnp.stack([l / 2, l / 2, -l / 2, -l / 2], axis=-1)
    lz = jnp.stack([w / 2, -w / 2, -w / 2, w / 2], axis=-1)
    c, s = jnp.cos(ry)[..., None], jnp.sin(ry)[..., None]
    gx = c * lx + s * lz + x[..., None]
    gz = -s * lx + c * lz + z[..., None]
    gy = jnp.broadcast_to(y[..., None], gx.shape)
    bottom = jnp.stack([gx, gy, gz], axis=-1)  # [..., 4, 3]
    top = bottom.at[..., 1].add(-jnp.broadcast_to(h[..., None], gx.shape))
    return jnp.concatenate([bottom, top], axis=-2)


def box_8c_to_offsets(prop_corners, gt_corners):
    """Stage-2 box_8c regression target (reference box_8c_encoder):
    per-corner differences normalized by the proposal's AABB diagonal.

    prop/gt corners: [..., 8, 3] from ``box_3d_to_corners``.
    """

    prop_corners = jnp.asarray(prop_corners)
    gt_corners = jnp.asarray(gt_corners)
    ext = prop_corners.max(axis=-2) - prop_corners.min(axis=-2)  # [..., 3]
    diag = jnp.sqrt(jnp.sum(ext**2, axis=-1))[..., None, None]
    return (gt_corners - prop_corners) / jnp.maximum(diag, 1e-6)


def offsets_to_box_8c(prop_corners, offsets):
    """Inverse of ``box_8c_to_offsets``; offsets may be [..., 24] flat."""

    prop_corners = jnp.asarray(prop_corners)
    offsets = jnp.asarray(offsets)
    if offsets.shape[-1] == 24:
        offsets = offsets.reshape(*offsets.shape[:-1], 8, 3)
    ext = prop_corners.max(axis=-2) - prop_corners.min(axis=-2)
    diag = jnp.sqrt(jnp.sum(ext**2, axis=-1))[..., None, None]
    return prop_corners + offsets * jnp.maximum(diag, 1e-6)


def box_8c_to_box_3d(corners):
    """[..., 8, 3] corners -> [..., 7] box_3d (least-squares-style fit).

    Decoded corner sets are only approximately box-shaped; the fit follows
    the reference box_8c decode: centroid for x/z, mean face heights for
    y/h, mean edge vectors for l/w/ry (corner order of
    ``box_3d_to_corners``).
    """

    corners = jnp.asarray(corners)
    bottom = corners[..., :4, :]
    top = corners[..., 4:, :]
    xc = jnp.mean(corners[..., 0], axis=-1)
    zc = jnp.mean(corners[..., 2], axis=-1)
    y_bottom = jnp.mean(bottom[..., 1], axis=-1)
    y_top = jnp.mean(top[..., 1], axis=-1)
    h = jnp.abs(y_bottom - y_top)

    # bottom order: [l/2,w/2], [l/2,-w/2], [-l/2,-w/2], [-l/2,w/2] rotated
    mid = lambda a, b: (bottom[..., a, :] + bottom[..., b, :]) / 2
    lvec = mid(0, 1) - mid(2, 3)  # along +l
    wvec = mid(0, 3) - mid(1, 2)  # along +w
    l = jnp.sqrt(lvec[..., 0] ** 2 + lvec[..., 2] ** 2)
    w = jnp.sqrt(wvec[..., 0] ** 2 + wvec[..., 2] ** 2)
    ry = jnp.arctan2(-lvec[..., 2], lvec[..., 0])
    ry = jnp.where(ry > jnp.pi / 2, ry - jnp.pi, ry)
    ry = jnp.where(ry <= -jnp.pi / 2, ry + jnp.pi, ry)
    return jnp.stack([xc, y_bottom, zc, l, w, h, ry], axis=-1)


# ---------------------------------------------------------------- box_4c

def _unit_plane(ground_plane):
    """Normalize [..., 4] plane coefficients to a unit normal.

    h1/h2 are SIGNED DISTANCES to the plane; with an unnormalized plane the
    encode would scale heights by ||n|| (and decode would shrink them back
    inconsistently). The data loader normalizes planes.txt on read, this
    guards direct callers.
    """

    ground_plane = jnp.asarray(ground_plane)
    norm = jnp.sqrt(jnp.sum(ground_plane[..., :3] ** 2, axis=-1, keepdims=True))
    return ground_plane / jnp.maximum(norm, 1e-12)


def box_3d_to_box_4c(boxes_3d, ground_plane):
    """[..., 7] box_3d -> [..., 10] box_4c (reference box_4c_encoder).

    The 4 ground corners are the box footprint corners ordered to start from
    the corner with the largest (x + z) in the midpoint-local frame (a fixed
    deterministic ordering so regression targets are consistent), plus the
    two heights of bottom/top faces above the ground plane.

    ``ground_plane`` is [4] or broadcastable [..., 4] (per-sample planes).
    """

    boxes_3d = jnp.asarray(boxes_3d)
    ground_plane = _unit_plane(ground_plane)
    corners = box_3d_to_corners(boxes_3d)  # [..., 8, 3]
    ground = corners[..., :4, :]  # bottom face
    a = ground_plane[..., 0]
    b = ground_plane[..., 1]
    c = ground_plane[..., 2]
    d = ground_plane[..., 3]
    y_bottom = boxes_3d[..., 1]
    y_top = boxes_3d[..., 1] - boxes_3d[..., 5]
    x0, z0 = boxes_3d[..., 0], boxes_3d[..., 2]
    h1 = a * x0 + b * y_bottom + c * z0 + d
    h2 = a * x0 + b * y_top + c * z0 + d

    rel = ground[..., 0] - x0[..., None] + ground[..., 2] - z0[..., None]
    start = jnp.argmax(rel, axis=-1)  # [...]
    idx = (start[..., None] + jnp.arange(4)) % 4
    ordered = jnp.take_along_axis(ground, idx[..., None], axis=-2)
    xs = ordered[..., 0]
    zs = ordered[..., 2]
    return jnp.concatenate([xs, zs, h1[..., None], h2[..., None]], axis=-1)


def box_4c_to_box_3d(box_4c, ground_plane):
    """[..., 10] box_4c -> [..., 7] box_3d (best-fit rectangle decode)."""

    box_4c = jnp.asarray(box_4c)
    ground_plane = _unit_plane(ground_plane)
    xs, zs = box_4c[..., :4], box_4c[..., 4:8]
    h1, h2 = box_4c[..., 8], box_4c[..., 9]
    xc = jnp.mean(xs, axis=-1)
    zc = jnp.mean(zs, axis=-1)

    ex = (xs[..., 1] - xs[..., 0] + xs[..., 2] - xs[..., 3]) / 2
    ez = (zs[..., 1] - zs[..., 0] + zs[..., 2] - zs[..., 3]) / 2
    fx = (xs[..., 3] - xs[..., 0] + xs[..., 2] - xs[..., 1]) / 2
    fz = (zs[..., 3] - zs[..., 0] + zs[..., 2] - zs[..., 1]) / 2
    len_e = jnp.sqrt(ex**2 + ez**2)
    len_f = jnp.sqrt(fx**2 + fz**2)
    e_longer = len_e >= len_f
    l = jnp.where(e_longer, len_e, len_f)
    w = jnp.where(e_longer, len_f, len_e)
    ry = jnp.where(e_longer, jnp.arctan2(-ez, ex), jnp.arctan2(-fz, fx))
    ry = jnp.where(ry > jnp.pi / 2, ry - jnp.pi, ry)
    ry = jnp.where(ry <= -jnp.pi / 2, ry + jnp.pi, ry)

    a = ground_plane[..., 0]
    b = ground_plane[..., 1]
    c = ground_plane[..., 2]
    d = ground_plane[..., 3]
    y = (h1 - a * xc - c * zc - d) / b
    h = jnp.abs(h2 - h1)
    return jnp.stack([xc, y, zc, l, w, h, ry], axis=-1)


def box_4c_to_offsets(box_4c, gt_box_4c):
    """Stage-2 regression target: plain difference (reference semantics)."""

    return jnp.asarray(gt_box_4c) - jnp.asarray(box_4c)


def offsets_to_box_4c(box_4c, offsets):
    return jnp.asarray(box_4c) + jnp.asarray(offsets)
