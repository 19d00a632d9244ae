"""Box ops: anchors, encoders, projection, IoU, NMS, crop-resize, losses.

Hand-built numpy golden values in the reference's unit-test style.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_pooling_tpu.configs.config import AnchorConfig, AreaExtents, BevConfig
from sparse_pooling_tpu.ops import anchors as anch
from sparse_pooling_tpu.ops import crop_resize, encoders, iou, losses, nms, projection, target_assign

PLANE = np.array([0.0, -1.0, 0.0, 1.65])


# ---------------------------------------------------------------- anchors

def test_grid_anchor_generation():
    cfg = AnchorConfig(sizes=((3.9, 1.6, 1.5),), stride=8.0)
    ext = AreaExtents()
    a = anch.generate_anchors_np(cfg, ext, PLANE)
    n_centers = 10 * 9  # 80/8 x 70/8 (ceil interior tiling)
    assert a.shape == (n_centers * 2, 8)
    # y on the ground plane
    np.testing.assert_allclose(a[:, 1], 1.65)
    # rotation bin 1 swaps footprint dims
    rot0 = a[a[:, 6] == 0]
    rot1 = a[a[:, 6] == 1]
    np.testing.assert_allclose(rot0[:, 3], 3.9)
    np.testing.assert_allclose(rot0[:, 5], 1.6)
    np.testing.assert_allclose(rot1[:, 3], 1.6)
    np.testing.assert_allclose(rot1[:, 5], 3.9)


def test_anchor_filter_device():
    cfg = AnchorConfig(sizes=((4.0, 2.0, 1.5),), stride=10.0)
    ext = AreaExtents()
    bev_cfg = BevConfig(voxel_size=0.5)
    a = anch.generate_anchors_np(cfg, ext, PLANE)
    h, w = bev_cfg.grid_hw(ext)
    occupancy = np.zeros((h, w), np.float32)
    # one occupied cell at x=-35+5=... place points under exactly one anchor:
    # anchor centers are at x = -35, -25, ... z = 5, 15, ...
    r = int((5.0 - ext.z_min) / 0.5)
    c = int((-35.0 - ext.x_min) / 0.5)
    occupancy[r, c] = 3
    res = anch.filter_anchors_device(
        jnp.array(a, jnp.float32), jnp.array(occupancy), ext, bev_cfg, max_anchors=16
    )
    got = np.asarray(res.anchors)[np.asarray(res.valid)]
    assert got.shape[0] == 2  # both rotations of the anchor over the points
    np.testing.assert_allclose(got[:, 0], -35.0)
    np.testing.assert_allclose(got[:, 2], 5.0)


# ---------------------------------------------------------------- encoders

def test_box3d_anchor_round_trip():
    boxes = jnp.array([[1.0, 1.65, 20.0, 3.9, 1.6, 1.5, 0.0],
                       [-2.0, 1.65, 30.0, 3.9, 1.6, 1.5, np.pi / 2]])
    a = encoders.box_3d_to_anchor(boxes)
    np.testing.assert_allclose(np.asarray(a[0]), [1.0, 1.65, 20.0, 3.9, 1.5, 1.6], atol=1e-6)
    # 90-degree yaw swaps the footprint
    np.testing.assert_allclose(np.asarray(a[1]), [-2.0, 1.65, 30.0, 1.6, 1.5, 3.9], atol=1e-6)
    back = encoders.anchor_to_box_3d(a, ry=jnp.array([0.0, np.pi / 2]))
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-6)


def test_offset_round_trip(rng):
    anchors = jnp.array(np.abs(rng.randn(10, 6)) + 1.0)
    gt = jnp.array(np.abs(rng.randn(10, 6)) + 1.0)
    off = encoders.anchor_to_offset(anchors, gt)
    rec = encoders.offset_to_anchor(anchors, off)
    # fp32 log/exp round trip: ~1e-6 relative noise, amplified by /dim * dim
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), rtol=1e-4, atol=1e-5)


def test_offset_zero_for_identical():
    a = jnp.array([[0.0, 1.0, 10.0, 4.0, 1.5, 2.0]])
    off = encoders.anchor_to_offset(a, a)
    np.testing.assert_allclose(np.asarray(off), 0.0, atol=1e-7)


def test_orientation_round_trip():
    ry = jnp.array([0.0, 0.5, -np.pi / 2, 3.0])
    vec = encoders.angle_to_vector(ry)
    back = encoders.vector_to_angle(vec)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ry), atol=1e-6)


def test_heading_flip_bit_round_trip():
    """apply_heading_flip(ry, heading_flip_bit(ry)) reconstructs any heading.

    The explicit pi-disambiguation decomposition (config
    ``explicit_flip_head``): heading == canonical (mod-pi) angle + flip*pi.
    """

    ry = jnp.array(
        [0.0, 0.3, -0.3, np.pi / 2, -np.pi / 2, np.pi - 0.1, -np.pi + 0.1,
         np.pi, 2.5, -2.5, 5.8, -5.8]
    )
    flip = encoders.heading_flip_bit(ry)
    canon = encoders.canonical_heading(ry)
    # canonical band is [-pi/2, pi/2)
    c = np.asarray(canon)
    assert (c >= -np.pi / 2 - 1e-6).all() and (c < np.pi / 2 + 1e-6).all()
    back = encoders.apply_heading_flip(ry, flip)
    # equality mod 2pi
    d = np.mod(np.asarray(back - ry) + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0.0, atol=1e-5)
    # known side bits: 0 inside the band, 1 outside
    np.testing.assert_array_equal(
        np.asarray(encoders.heading_flip_bit(jnp.array([0.0, np.pi, -np.pi / 2, np.pi / 2]))),
        [0, 1, 0, 1],
    )


def test_apply_heading_flip_forces_side():
    """flip=1 moves any heading to the non-canonical side by exactly pi."""

    ry = jnp.array([0.2, -1.0, 2.8])
    flipped = encoders.apply_heading_flip(ry, jnp.ones(3, jnp.int32))
    unflipped = encoders.apply_heading_flip(ry, jnp.zeros(3, jnp.int32))
    d = np.mod(np.asarray(flipped - unflipped) + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(np.abs(d), np.pi, atol=1e-5)
    assert np.asarray(encoders.heading_flip_bit(flipped)).tolist() == [1, 1, 1]
    assert np.asarray(encoders.heading_flip_bit(unflipped)).tolist() == [0, 0, 0]


def test_corners_axis_aligned():
    box = jnp.array([[0.0, 1.65, 10.0, 4.0, 2.0, 1.5, 0.0]])
    c = np.asarray(encoders.box_3d_to_corners(box))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 5))), [-2.0, 2.0])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 5))), [-1.0 + 10, 1.0 + 10])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 5))), [1.65 - 1.5, 1.65])


def test_box_4c_round_trip():
    plane = jnp.array(PLANE)
    boxes = jnp.array(
        [
            [1.0, 1.65, 20.0, 3.9, 1.6, 1.5, 0.3],
            [-3.0, 1.65, 35.0, 4.2, 1.7, 1.4, -1.2],
            [0.0, 1.65, 10.0, 3.5, 1.5, 1.6, 0.0],
        ]
    )
    b4c = encoders.box_3d_to_box_4c(boxes, plane)
    assert b4c.shape == (3, 10)
    # bottom face on the ground -> h1 = 0, h2 = box height
    np.testing.assert_allclose(np.asarray(b4c[:, 8]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b4c[:, 9]), np.asarray(boxes[:, 5]), atol=1e-6)
    back = np.asarray(encoders.box_4c_to_box_3d(b4c, plane))
    want = np.asarray(boxes)
    # yaw is recovered modulo pi (box symmetry)
    dry = np.abs(((back[:, 6] - want[:, 6]) + np.pi / 2) % np.pi - np.pi / 2)
    np.testing.assert_allclose(back[:, :6], want[:, :6], atol=1e-5)
    assert dry.max() < 1e-5


def test_box_8c_offsets_round_trip():
    """box_8c encode/decode: zero offsets reproduce the proposal; encoding
    a GT against a proposal and decoding recovers the GT box."""

    prop = jnp.array([[1.0, 1.65, 20.0, 3.8, 1.6, 1.5, 0.2]])
    gt = jnp.array([[1.4, 1.60, 20.6, 3.9, 1.7, 1.6, 0.35]])
    pc = encoders.box_3d_to_corners(prop)
    gc = encoders.box_3d_to_corners(gt)

    zero = encoders.box_8c_to_offsets(pc, pc)
    np.testing.assert_allclose(np.asarray(zero), 0.0, atol=1e-7)
    back_prop = np.asarray(encoders.box_8c_to_box_3d(pc))
    np.testing.assert_allclose(back_prop, np.asarray(prop), atol=1e-5)

    off = encoders.box_8c_to_offsets(pc, gc)
    dec_corners = encoders.offsets_to_box_8c(pc, off)
    np.testing.assert_allclose(np.asarray(dec_corners), np.asarray(gc), atol=1e-5)
    back_gt = np.asarray(encoders.box_8c_to_box_3d(dec_corners))
    np.testing.assert_allclose(back_gt[:, :6], np.asarray(gt)[:, :6], atol=1e-5)
    dry = abs(((back_gt[0, 6] - 0.35) + np.pi / 2) % np.pi - np.pi / 2)
    assert dry < 1e-5
    # flat 24-d offsets (the head's output layout) decode identically
    dec_flat = encoders.offsets_to_box_8c(pc, off.reshape(1, 24))
    np.testing.assert_allclose(np.asarray(dec_flat), np.asarray(gc), atol=1e-5)


def test_box_4c_invariant_to_plane_scale():
    """An unnormalized planes.txt entry must not scale decoded heights: the
    encoders normalize the plane to a unit normal internally."""

    plane = jnp.array(PLANE)
    scaled = plane * 3.7
    boxes = jnp.array([[1.0, 1.65, 20.0, 3.9, 1.6, 1.5, 0.3]])
    b4c_unit = np.asarray(encoders.box_3d_to_box_4c(boxes, plane))
    b4c_scaled = np.asarray(encoders.box_3d_to_box_4c(boxes, scaled))
    np.testing.assert_allclose(b4c_scaled, b4c_unit, atol=1e-5)
    back = np.asarray(encoders.box_4c_to_box_3d(jnp.array(b4c_scaled), scaled))
    np.testing.assert_allclose(back[:, :6], np.asarray(boxes)[:, :6], atol=1e-5)


# ---------------------------------------------------------------- projection

def test_project_to_bev():
    ext = AreaExtents()
    a = jnp.array([[0.0, 1.65, 35.0, 4.0, 1.5, 2.0]])
    bev = np.asarray(projection.project_to_bev(a, ext, normalize=False))[0]
    np.testing.assert_allclose(bev, [34.0, 38.0, 36.0, 42.0])  # [z1, x1+40, z2, x2+40]
    bevn = np.asarray(projection.project_to_bev(a, ext, normalize=True))[0]
    np.testing.assert_allclose(bevn, [34 / 70, 38 / 80, 36 / 70, 42 / 80])


def test_project_to_image_space():
    p2 = jnp.array([[100.0, 0.0, 200.0, 0.0], [0.0, 100.0, 100.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    a = jnp.array([[0.0, 1.0, 20.0, 2.0, 1.0, 2.0]])
    box = np.asarray(projection.project_to_image_space(a, p2, (200, 400), normalize=False))[0]
    # nearest face at z=19: u extremes = 200 +- 100/19; v: y in [0,1] -> v in [100, 100+100/19]
    assert box[1] < 200 - 100 / 21 + 1e-3
    assert box[3] > 200 + 100 / 21 - 1e-3
    assert 100 <= box[0] < box[2] <= 100 + 100 / 19 + 1e-3


# ---------------------------------------------------------------- iou / nms

def test_pairwise_iou_golden():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0], [5.0, 5.0, 6.0, 6.0]])
    got = np.asarray(iou.pairwise_iou(a, b))[0]
    np.testing.assert_allclose(got, [1 / 7, 1.0, 0.0], atol=1e-6)


def test_nms_matches_numpy_oracle(rng):
    n = 200
    boxes = np.abs(rng.rand(n, 4)) * 10
    boxes = np.stack(
        [boxes[:, 0], boxes[:, 1], boxes[:, 0] + 1 + boxes[:, 2], boxes[:, 1] + 1 + boxes[:, 3]],
        axis=1,
    ).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    got = nms.nms(jnp.array(boxes), jnp.array(scores), max_outputs=32, iou_threshold=0.5)
    want_idx, want_valid = nms.nms_numpy(boxes, scores, 32, 0.5)
    np.testing.assert_array_equal(np.asarray(got.valid), want_valid)
    np.testing.assert_array_equal(np.asarray(got.indices)[want_valid], want_idx[want_valid])


def test_nms_suppresses_duplicates():
    boxes = jnp.array([[0, 0, 2, 2], [0, 0, 2, 2.1], [5, 5, 7, 7]], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    res = nms.nms(boxes, scores, max_outputs=3, iou_threshold=0.5)
    assert np.asarray(res.valid).tolist() == [True, True, False]
    assert np.asarray(res.indices)[:2].tolist() == [0, 2]


def test_top_k_nms_original_indexing(rng):
    boxes = jnp.array(np.array([[0, 0, 1, 1], [10, 10, 11, 11], [20, 20, 21, 21], [0, 0, 1, 1.05]]), jnp.float32)
    scores = jnp.array([0.1, 0.9, 0.8, 0.2])
    res = nms.top_k_nms(boxes, scores, max_outputs=2, iou_threshold=0.5, pre_top_k=3)
    assert np.asarray(res.indices).tolist() == [1, 2]


# ---------------------------------------------------------------- crop & resize

def test_crop_resize_matches_numpy(rng):
    img = rng.rand(24, 32, 3).astype(np.float32)
    boxes = np.array(
        [[0.0, 0.0, 1.0, 1.0], [0.25, 0.25, 0.75, 0.5], [0.1, 0.9, 0.2, 1.0]],
        np.float32,
    )
    got = np.asarray(crop_resize.crop_and_resize(jnp.array(img), jnp.array(boxes), (7, 7)))
    want = crop_resize.crop_and_resize_numpy(img, boxes, (7, 7))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_crop_resize_identity():
    """Full-image box at the image's own resolution reproduces the image."""

    img = np.arange(5 * 4 * 1, dtype=np.float32).reshape(5, 4, 1)
    got = np.asarray(
        crop_resize.crop_and_resize(jnp.array(img), jnp.array([[0.0, 0.0, 1.0, 1.0]]), (5, 4))
    )[0]
    np.testing.assert_allclose(got, img, atol=1e-5)


def test_crop_resize_center_sample():
    img = np.zeros((3, 3, 1), np.float32)
    img[1, 1, 0] = 9.0
    got = np.asarray(
        crop_resize.crop_and_resize(jnp.array(img), jnp.array([[0.0, 0.0, 1.0, 1.0]]), (1, 1))
    )
    np.testing.assert_allclose(got[0, 0, 0, 0], 9.0)


def test_crop_px_padded_map_matches_unpadded(rng):
    """Cropping a zero-padded map at CONTENT-pixel coords must equal cropping
    the unpadded map with TF-normalized coords (the BEV alignment fix: the
    detector's bev maps carry pad rows that normalized coords would smear
    far-range ROIs into)."""

    content = rng.rand(1, 20, 16, 3).astype(np.float32)
    padded = np.concatenate([content, np.zeros((1, 4, 16, 3), np.float32)], axis=1)
    boxes = np.array(
        [[[0.0, 0.0, 1.0, 1.0], [0.7, 0.2, 1.0, 0.9], [0.95, 0.0, 1.0, 0.3]]],
        np.float32,
    )
    want = np.asarray(
        crop_resize.crop_and_resize_batch(jnp.array(content), jnp.array(boxes), (3, 3))
    )
    h, w = content.shape[1:3]
    px = boxes * np.array([h - 1, w - 1, h - 1, w - 1], np.float32)
    got = np.asarray(
        crop_resize.crop_and_resize_px_batch(jnp.array(padded), jnp.array(px), (3, 3))
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_patch_einsum_exact_when_span_fits(rng):
    """Patch-einsum crops equal the gather path for spans <= patch-2 cells."""

    img = rng.rand(2, 40, 48, 8).astype(np.float32)
    b = np.zeros((2, 16, 4), np.float32)
    r = np.random.RandomState(7)
    y1 = r.rand(2, 16) * 30
    x1 = r.rand(2, 16) * 38
    b[..., 0], b[..., 1] = y1, x1
    b[..., 2] = y1 + r.rand(2, 16) * 6.0  # span <= patch-2 = 6
    b[..., 3] = x1 + r.rand(2, 16) * 6.0
    want = np.asarray(
        crop_resize.crop_and_resize_px_batch(jnp.array(img), jnp.array(b), (3, 3))
    )
    got = np.asarray(
        crop_resize.crop_and_resize_patch_einsum_px(
            jnp.array(img), jnp.array(b), (3, 3), patch=8
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_patch_einsum_grads_match_gather_crop(rng):
    """The patch crop's custom VJP must produce the same image and box
    gradients as the gather crop's (they are the same function for fitting
    spans, computed through different code paths)."""

    img = rng.rand(1, 24, 24, 4).astype(np.float32)
    b = np.array([[[3.2, 4.1, 8.9, 9.7], [10.0, 2.0, 15.5, 7.25]]], np.float32)

    def loss_patch(i, bx):
        out = crop_resize.crop_and_resize_patch_einsum_px(i, bx, (3, 3), patch=8)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_gather(i, bx):
        out = crop_resize.crop_and_resize_px_batch(i, bx, (3, 3))
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gi_p, gb_p = jax.grad(loss_patch, argnums=(0, 1))(jnp.array(img), jnp.array(b))
    gi_g, gb_g = jax.grad(loss_gather, argnums=(0, 1))(jnp.array(img), jnp.array(b))
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_g), atol=1e-4)


def test_patch_einsum_oversized_box_centered():
    """An oversized box samples a centered window: the center sample is
    exact and the outer samples clamp symmetrically."""

    img = jnp.arange(64, dtype=jnp.float32).reshape(1, 8, 8, 1)
    # a box spanning the whole 8-px map with a 4-px patch
    b = jnp.array([[[0.0, 3.0, 7.0, 3.0]]])
    got = np.asarray(
        crop_resize.crop_and_resize_patch_einsum_px(img, b, (3, 3), patch=4)
    )[0, 0, :, :, 0]
    want_center = np.asarray(
        crop_resize.crop_and_resize_px_batch(img, b, (3, 3))
    )[0, 0, 1, 1, 0]
    np.testing.assert_allclose(got[1, 1], want_center, atol=1e-5)
    # outer samples clamp within [start, start+patch-1] rows = rows 2..5
    assert got.min() >= float(img[0, 2, 0, 0]) - 1e-5
    assert got.max() <= float(img[0, 5, 7, 0]) + 1e-5


@pytest.mark.parametrize(
    "group_crop",
    [
        crop_resize.crop_and_resize_group_einsum_px,
        crop_resize.crop_and_resize_group_flat_px,
    ],
    ids=["einsum6d", "flat"],
)
def test_group_einsum_matches_per_anchor_crops(rng, group_crop):
    """The group-shared patch crop equals the per-anchor gather crop when
    the group's variants share centers and spans fit patch-2 (the BEV RPN
    case: rotation/class variants of one grid position). Both layouts of
    the grouped crop (6D-einsum and flat, see crop_resize.py) are the same
    math and must both match."""

    img = rng.rand(2, 40, 48, 8).astype(np.float32)
    p, v = 12, 2
    r = np.random.RandomState(3)
    cy = 4 + r.rand(2, p) * 30
    cx = 4 + r.rand(2, p) * 38
    spans_y = r.rand(2, p, v) * 6.0  # span <= patch-2 = 6
    spans_x = r.rand(2, p, v) * 6.0
    b = np.zeros((2, p, v, 4), np.float32)
    b[..., 0] = cy[..., None] - spans_y / 2
    b[..., 1] = cx[..., None] - spans_x / 2
    b[..., 2] = cy[..., None] + spans_y / 2
    b[..., 3] = cx[..., None] + spans_x / 2
    want = np.asarray(
        crop_resize.crop_and_resize_px_batch(
            jnp.array(img), jnp.array(b.reshape(2, p * v, 4)), (3, 3)
        )
    ).reshape(2, p, v, 3, 3, 8)
    got = np.asarray(
        group_crop(jnp.array(img), jnp.array(b), (3, 3), patch=8)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize(
    "group_crop",
    [
        crop_resize.crop_and_resize_group_einsum_px,
        crop_resize.crop_and_resize_group_flat_px,
    ],
    ids=["einsum6d", "flat"],
)
def test_group_einsum_grads_match_gather_crop(rng, group_crop):
    """Group-crop custom VJP == gather-crop grads for fitting shared-center
    groups (same function, different code path)."""

    img = rng.rand(1, 24, 24, 4).astype(np.float32)
    b = np.array(
        [[[[3.2, 4.1, 8.9, 9.7], [4.3, 5.2, 7.8, 8.6]]]], np.float32
    )  # [1, 1, 2, 4], both boxes centered ~(6.05, 6.9)

    def loss_group(i, bx):
        out = group_crop(i, bx, (3, 3), patch=12)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_gather(i, bx):
        out = crop_resize.crop_and_resize_px_batch(
            i, bx.reshape(1, 2, 4), (3, 3)
        ).reshape(1, 1, 2, 3, 3, 4)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gi_p, gb_p = jax.grad(loss_group, argnums=(0, 1))(jnp.array(img), jnp.array(b))
    gi_g, gb_g = jax.grad(loss_gather, argnums=(0, 1))(jnp.array(img), jnp.array(b))
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_g), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_g), atol=1e-4)


def test_position_filter_keeps_variant_groups(rng):
    """Position-granular filter: kept positions carry every variant, the
    per-anchor valid mask matches each variant's own footprint occupancy,
    and the VALID anchor set equals the per-anchor filter's (no overflow)."""

    cfg = AnchorConfig(sizes=((4.0, 2.0, 1.5),), stride=4.0)
    ext = AreaExtents()
    bev_cfg = BevConfig(voxel_size=0.8)
    grid = anch.generate_anchors_np(cfg, ext, PLANE).astype(np.float32)
    n = grid.shape[0]
    h, w = bev_cfg.grid_hw(ext)
    occ = (rng.rand(2, h, w) > 0.995).astype(np.float32)
    anchors_b = jnp.array(np.tile(grid[None], (2, 1, 1)))

    got = anch.filter_anchor_positions_batch(
        anchors_b, jnp.array(occ), ext, bev_cfg, max_anchors=n, variants=2
    )
    ref = anch.filter_anchors_batch(
        anchors_b, jnp.array(occ), ext, bev_cfg, max_anchors=n
    )
    key = lambda a: {tuple(np.round(row, 3)) for row in a}
    for i in range(2):
        got_valid = np.asarray(got.anchors[i])[np.asarray(got.valid[i])]
        ref_valid = np.asarray(ref.anchors[i])[np.asarray(ref.valid[i])]
        assert key(got_valid) == key(ref_valid)
        # groups whole: for every valid anchor its position partner is
        # present in the kept array (valid or not)
        kept = key(np.asarray(got.anchors[i]))
        for row in got_valid:
            partner = row.copy()
            partner[3], partner[5] = row[5], row[3]  # rotation partner
            partner[6] = 1.0 - row[6]
            assert tuple(np.round(partner, 3)) in kept


def test_anchor_filter_overflow_keeps_dense_positions():
    """Cap overflow must drop sparse bare-ground anchors before dense
    object anchors, regardless of range: a FAR position with a dense
    footprint survives a cap that cannot hold every nonempty position
    (regression: range-ordered first-k truncation silently dropped far
    objects — the 2-frame overfit check plateaued at AP 0.818 with the far
    car's anchors filtered out)."""

    cfg = AnchorConfig(sizes=((4.0, 2.0, 1.5),), stride=2.0)
    ext = AreaExtents()
    bev_cfg = BevConfig(voxel_size=0.5)
    grid = anch.generate_anchors_np(cfg, ext, PLANE).astype(np.float32)
    h, w = bev_cfg.grid_hw(ext)
    rng = np.random.RandomState(0)
    # sparse ground occupancy everywhere + a DENSE far object at z=60
    occ = (rng.rand(h, w) > 0.9).astype(np.float32)
    r, c = int(60.0 / 0.5), int((10.0 - ext.x_min) / 0.5)
    occ[r - 2 : r + 3, c - 2 : c + 3] = 1.0

    cap = 64  # far smaller than the nonempty count -> guaranteed overflow
    res = anch.filter_anchor_positions_batch(
        jnp.array(grid)[None], jnp.array(occ)[None], ext, bev_cfg,
        max_anchors=cap, variants=2,
    )
    kept = np.asarray(res.anchors[0])[np.asarray(res.valid[0])]
    assert len(kept) == cap  # overflow: cap fully used
    near_obj = (np.abs(kept[:, 2] - 60.0) < 2.0) & (np.abs(kept[:, 0] - 10.0) < 2.0)
    assert near_obj.any(), "far dense object lost to cap overflow"

    # no-overflow case: kept SET identical to the plain nonempty set
    res_all = anch.filter_anchor_positions_batch(
        jnp.array(grid)[None], jnp.array(occ)[None], ext, bev_cfg,
        max_anchors=grid.shape[0], variants=2,
    )
    ref_all = anch.filter_anchors_batch(
        jnp.array(grid)[None], jnp.array(occ)[None], ext, bev_cfg,
        max_anchors=grid.shape[0],
    )
    key = lambda a: {tuple(np.round(row, 3)) for row in a}
    assert key(np.asarray(res_all.anchors[0])[np.asarray(res_all.valid[0])]) == key(
        np.asarray(ref_all.anchors[0])[np.asarray(ref_all.valid[0])]
    )


# ---------------------------------------------------------------- losses

def test_smooth_l1_golden():
    pred = jnp.array([[0.0, 2.0]])
    tgt = jnp.array([[0.5, 0.0]])
    per = np.asarray(losses.smooth_l1(pred, tgt))
    np.testing.assert_allclose(per, [[0.125, 1.5]])


def test_weighted_losses_ignore_masked():
    pred = jnp.array([[1.0, 0.0], [100.0, -100.0]])
    tgt = jnp.zeros((2, 2))
    w = jnp.array([1.0, 0.0])
    out = float(losses.weighted_smooth_l1(pred, tgt, w))
    np.testing.assert_allclose(out, 0.5)

    logits = jnp.array([[10.0, 0.0], [0.0, 50.0]])
    onehot = jnp.array([[1.0, 0.0], [1.0, 0.0]])
    ce = float(losses.weighted_softmax_ce(logits, onehot, w))
    assert ce < 1e-3  # only the correct, unmasked row counts


# ---------------------------------------------------------------- target assignment

def test_minibatch_sampling():
    key = jax.random.PRNGKey(0)
    # 100 anchors along a line; 1 GT overlapping anchors 0/1
    ys = np.arange(100, dtype=np.float32)
    anchor_bev = np.stack([ys, np.zeros(100), ys + 1.0, np.ones(100)], axis=1)
    gt_bev = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    mb = target_assign.sample_minibatch(
        jnp.array(anchor_bev), jnp.ones(100, bool), gt_bev, jnp.ones(1, bool),
        jnp.array([1], jnp.int32), key, batch_size=16,
        neg_iou=(0.0, 0.3), pos_iou=(0.5, 1.0),
    )
    sel_pos = np.asarray(mb.indices)[np.asarray(mb.is_pos)]
    assert sel_pos.tolist() == [0]  # anchor 0 is the only IoU=1 match
    assert np.asarray(mb.cls_target)[np.asarray(mb.is_pos)].tolist() == [1]
    # negatives fill the rest, all weighted
    assert np.asarray(mb.weights).sum() == 16


def test_minibatch_no_gt():
    key = jax.random.PRNGKey(1)
    anchor_bev = jnp.array([[0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 3.0, 3.0]])
    mb = target_assign.sample_minibatch(
        anchor_bev, jnp.ones(2, bool), jnp.zeros((1, 4)), jnp.zeros(1, bool),
        jnp.zeros(1, jnp.int32), key, batch_size=2,
    )
    assert not np.asarray(mb.is_pos).any()
    assert np.asarray(mb.cls_target).tolist() == [0, 0]


def test_grid_filter_matches_gather_filter(rng):
    """The strided-slice occupancy query (filter_anchor_positions_grid)
    must keep exactly the gather path's positions/validity — same counts,
    same tiers, same compaction — including clipped edge footprints."""

    cfg = AnchorConfig(sizes=((3.9, 1.6, 1.56), (0.8, 0.6, 1.7)), stride=2.0)
    ext = AreaExtents()
    bev_cfg = BevConfig(voxel_size=0.5)
    grid = anch.generate_anchors_np(cfg, ext, PLANE).astype(np.float32)
    h, w = bev_cfg.grid_hw(ext)
    occ = (rng.rand(2, h, w) > 0.97).astype(np.float32)
    anchors_b = jnp.array(np.tile(grid[None], (2, 1, 1)))
    v = 4  # 2 sizes x 2 rotations

    for cap in (64, 512, grid.shape[0]):
        cap -= cap % v
        got = anch.filter_anchor_positions_grid(
            anchors_b, jnp.array(occ), ext, bev_cfg, cfg, max_anchors=cap
        )
        ref = anch.filter_anchor_positions_batch(
            anchors_b, jnp.array(occ), ext, bev_cfg, max_anchors=cap, variants=v
        )
        np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
        np.testing.assert_allclose(
            np.asarray(got.anchors), np.asarray(ref.anchors), atol=1e-6
        )

    # non-integer stride/voxel ratio falls back to the gather path
    odd = BevConfig(voxel_size=0.3)
    got = anch.filter_anchor_positions_grid(
        anchors_b, jnp.array(occ[:, : odd.grid_hw(ext)[0], : odd.grid_hw(ext)[1]]),
        ext, odd, cfg, max_anchors=256,
    )
    assert got.anchors.shape[1] == 256


def test_frame_chunked_scatter_grads_match_unchunked(monkeypatch):
    """Forcing the feature-grad scatter into frame chunks (the TPU
    accumulator-cliff fix) must not change any gradient: each segment id
    belongs to exactly one frame, so the per-segment summation sets are
    identical. Covers all three backward paths (corner scatter, grouped
    window transpose, flat grouped)."""

    rng = np.random.RandomState(0)
    b, h, w, c = 4, 16, 20, 8
    images = jnp.array(rng.rand(b, h, w, c).astype(np.float32))

    n = 6
    y1 = rng.uniform(0, h - 5, (b, n))
    x1 = rng.uniform(0, w - 5, (b, n))
    boxes = jnp.array(
        np.stack([y1, x1, y1 + rng.uniform(1, 4, (b, n)),
                  x1 + rng.uniform(1, 4, (b, n))], -1).astype(np.float32)
    )
    p, v = 3, 2
    gboxes = jnp.array(
        np.stack([y1[:, : p * v], x1[:, : p * v], y1[:, : p * v] + 2.5,
                  x1[:, : p * v] + 2.5], -1)
        .reshape(b, p, v, 4).astype(np.float32)
    )

    cases = [
        lambda im: jnp.sum(
            crop_resize.crop_and_resize_px_batch(im, boxes, (3, 3)) ** 2
        ),
        lambda im: jnp.sum(
            crop_resize.crop_and_resize_group_einsum_px(
                im, gboxes, (3, 3), patch=8
            ) ** 2
        ),
    ]
    for loss in cases:
        g_ref = jax.grad(loss)(images)
        with monkeypatch.context() as m:
            m.setattr(crop_resize, "_SCATTER_CHUNK_BYTES", 1)
            g_chunk = jax.grad(loss)(images)
        np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_chunk))
