"""Device twins vs numpy oracles: BEV voxelizer and SHPL sparse pooling.

This is the BASELINE config-1/2 parity bar: <=1e-3 deviation (we assert much
tighter since both paths are fp32 here).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from sparse_pooling_tpu.configs.config import AreaExtents, BevConfig, ImageConfig, SparsePoolConfig
from sparse_pooling_tpu.data import bev as bev_np
from sparse_pooling_tpu.data import calib as C
from sparse_pooling_tpu.data import labels as L
from sparse_pooling_tpu.data import pointcloud as P
from sparse_pooling_tpu.data import sparse_matrix as SM
from sparse_pooling_tpu.ops import bev_device
from sparse_pooling_tpu.ops.pallas_sparse_pool import sparse_pool_ell_pallas
from sparse_pooling_tpu.ops.sparse_pool import (
    fuse_pooled,
    sparse_pool_coo,
    sparse_pool_ell,
    sparse_pool_ell_batch,
)


def _load_frame(kitti_root, sid="000000"):
    cal = C.read_calibration(os.path.join(kitti_root, f"training/calib/{sid}.txt"))
    plane = L.read_ground_plane(os.path.join(kitti_root, f"training/planes/{sid}.txt"))
    pts = P.get_lidar_point_cloud(
        os.path.join(kitti_root, f"training/velodyne/{sid}.bin"), cal, (375, 1242)
    )
    return cal, plane, P.filter_to_area_extents(pts, AreaExtents())


# Coarse lattice for CPU-jit speed: the full 700x800 grid's segment ops
# compile slowly on the CPU backend; the full-size path runs on TPU in bench.
_TEST_BEV = BevConfig(voxel_size=0.4, pad_h=1)


def test_bev_device_matches_numpy_oracle(kitti_root):
    cal, plane, pts = _load_frame(kitti_root)
    ext, cfg = AreaExtents(), _TEST_BEV
    want = bev_np.generate_bev_maps(pts, plane, ext, cfg)

    padded, mask = P.pad_or_subsample(pts.astype(np.float32), 16384)
    got = np.asarray(
        bev_device.bev_maps_from_points(
            jnp.array(padded), jnp.array(mask), jnp.array(plane, dtype=jnp.float32),
            ext, cfg,
        )
    )
    assert got.shape == want.shape == (176, 200, 6)
    # fp32 log on device vs fp64 oracle: ~2e-5 noise on the density channel;
    # the BASELINE parity bar is 1e-3.
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bev_device_masks_padding(kitti_root):
    """Padding rows (zeros at the origin cell) must not pollute cell (0, 0)."""

    _, plane, _ = _load_frame(kitti_root)
    ext, cfg = AreaExtents(), _TEST_BEV
    pts = np.zeros((64, 3), np.float32)
    pts[0] = [-39.95, 1.0, 0.05]  # one real point in cell (0,0)
    mask = np.zeros((64,), bool)
    mask[0] = True
    got = np.asarray(
        bev_device.bev_maps_from_points(
            jnp.array(pts), jnp.array(mask), jnp.array(plane, dtype=jnp.float32), ext, cfg
        )
    )
    # density from exactly ONE point, not 64
    np.testing.assert_allclose(got[0, 0, 5], np.log(2) / np.log(16), atol=1e-6)


def test_bev_device_batch(kitti_root):
    _, plane, pts = _load_frame(kitti_root)
    ext, cfg = AreaExtents(), _TEST_BEV
    padded, mask = P.pad_or_subsample(pts.astype(np.float32), 8192)
    batch = bev_device.bev_maps_batch(
        jnp.stack([jnp.array(padded)] * 2),
        jnp.stack([jnp.array(mask)] * 2),
        jnp.stack([jnp.array(plane, dtype=jnp.float32)] * 2),
        ext, cfg,
    )
    assert batch.shape == (2, 176, 200, 6)
    np.testing.assert_allclose(np.asarray(batch[0]), np.asarray(batch[1]))


def test_bev_packed_matches_unpacked_plus_s2d(kitti_root):
    """bev_maps_packed_batch must equal the unpacked builder followed by
    the backbone's space-to-depth reshape, bit-for-bit, and its counts
    raster must unpack to the per-cell point counts."""

    _, plane, pts = _load_frame(kitti_root)
    ext, cfg = AreaExtents(), _TEST_BEV
    h, w = cfg.grid_hw(ext)
    hp = h + cfg.pad_h
    assert hp % 2 == 0 and w % 2 == 0
    padded, mask = P.pad_or_subsample(pts.astype(np.float32), 8192)
    pts_b = jnp.stack([jnp.array(padded)] * 2)
    # give the two frames different masks to catch batch-mixing bugs
    mask2 = np.array(mask)
    mask2[: len(mask2) // 2] = False
    mask_b = jnp.stack([jnp.array(mask), jnp.array(mask2)])
    plane_b = jnp.stack([jnp.array(plane, dtype=jnp.float32)] * 2)

    unpacked = np.asarray(
        bev_device.bev_maps_from_points_batch(pts_b, mask_b, plane_b, ext, cfg)
    )
    b0 = unpacked.shape[0]
    nch = cfg.height_slices + 1
    want = (
        unpacked.reshape(b0, hp // 2, 2, w // 2, 2, nch)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b0, hp // 2, w // 2, 4 * nch)
    )
    packed, counts = bev_device.bev_maps_packed_batch(
        pts_b, mask_b, plane_b, ext, cfg
    )
    np.testing.assert_array_equal(np.asarray(packed), want)

    # counts unpack to the full-res raster; density channel agrees
    occ = np.asarray(bev_device.unpack_s2d_raster(counts, h))
    assert occ.shape == (b0, h, w)
    dens = unpacked[:, :h, :, cfg.height_slices]
    np.testing.assert_allclose(
        np.minimum(1.0, np.log(occ + 1.0) / np.log(cfg.density_log_norm)),
        dens,
        atol=1e-6,
    )


def test_sparse_pool_coo_vs_dense_matmul(rng):
    s, c, t, nnz = 64, 8, 48, 256
    x = rng.randn(s, c).astype(np.float32)
    rows = rng.randint(0, t, nnz).astype(np.int32)
    cols = rng.randint(0, s, nnz).astype(np.int32)
    vals = rng.rand(nnz).astype(np.float32)
    dense = np.zeros((t, s), np.float32)
    np.add.at(dense, (rows, cols), vals)
    want = dense @ x
    got = np.asarray(sparse_pool_coo(jnp.array(x), jnp.array(rows), jnp.array(cols), jnp.array(vals), t))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sparse_pool_ell_matches_coo_real_frame(kitti_root):
    """COO (exact, production) vs ELL (top-K approx) on a real frame.

    Non-truncated rows must agree exactly; truncated rows are a documented
    approximation and must still be row-normalized averages (bounded output).
    """

    cal, _, pts = _load_frame(kitti_root)
    ext = AreaExtents()
    sp = SparsePoolConfig(ell_k=16)
    m_bev, m_fv = SM.build_sparse_pooling_input(
        pts, cal.p2, ext, BevConfig(), ImageConfig(), sp
    )
    rng = np.random.RandomState(0)
    for corr in (m_bev, m_fv):
        s = corr.source_hw[0] * corr.source_hw[1]
        t = corr.target_hw[0] * corr.target_hw[1]
        x = rng.randn(s, 8).astype(np.float32)
        want = np.asarray(
            sparse_pool_coo(jnp.array(x), jnp.array(corr.rows), jnp.array(corr.cols), jnp.array(corr.vals), t)
        )
        got = np.asarray(sparse_pool_ell(jnp.array(x), jnp.array(corr.ell_src), jnp.array(corr.ell_w)))
        nnz_per_row = np.bincount(corr.rows[: corr.nnz], minlength=t)
        exact_rows = nnz_per_row <= sp.ell_k
        assert exact_rows.sum() > t * 0.9  # most rows are not truncated
        np.testing.assert_allclose(got[exact_rows], want[exact_rows], atol=2e-4)
        # truncated rows: normalized average of a weight-subset -> bounded by
        # the max |source feature| (sanity bound on the approximation)
        trunc = ~exact_rows
        if trunc.any():
            assert np.abs(got[trunc]).max() <= np.abs(x).max() + 1e-4


def test_sparse_pool_coo_rows_sorted_invariant(kitti_root):
    """The HOST builder may be pooled with indices_are_sorted=True, so it
    must emit ascending rows including the padding tail. (The device builder
    emits point-order rows and must use the default unsorted path.)"""

    cal, _, pts = _load_frame(kitti_root)
    m_bev, m_fv = SM.build_sparse_pooling_input(
        pts, cal.p2, AreaExtents(), BevConfig(), ImageConfig(), SparsePoolConfig()
    )
    for corr in (m_bev, m_fv):
        assert (np.diff(corr.rows.astype(np.int64)) >= 0).all()
        assert (corr.vals[corr.nnz :] == 0).all()


def test_batch_native_builders_match_per_sample(kitti_root):
    """The batch-flattened voxelizer / COO builder must reproduce the
    per-sample builders exactly (they are the parity-tested oracles)."""

    from sparse_pooling_tpu.ops.bev_device import (
        bev_maps_from_points,
        bev_maps_from_points_batch,
    )
    from sparse_pooling_tpu.ops.sparse_build import build_coo_device

    ext, bev_cfg = AreaExtents(), BevConfig()
    img_cfg, sp_cfg = ImageConfig(), SparsePoolConfig(max_points=2048)
    r = np.random.RandomState(0)
    b, p = 3, 2048
    pts = np.zeros((b, p, 3), np.float32)
    msk = np.zeros((b, p), bool)
    for i in range(b):
        n = 1200 + 100 * i
        pts[i, :n, 0] = r.uniform(-30, 30, n)
        pts[i, :n, 1] = r.uniform(0.5, 1.8, n)
        pts[i, :n, 2] = r.uniform(1, 68, n)
        msk[i, :n] = True
    planes = np.tile(np.array([0.0, -1.0, 0.0, 1.65], np.float32), (b, 1))
    planes[1, 3] = 1.55
    p2 = np.tile(
        np.array(
            [[700.0, 0, 620, 40], [0, 700.0, 190, 2], [0, 0, 1, 0]], np.float32
        ),
        (b, 1, 1),
    )
    p2[2, 0, 2] = 600.0

    got = np.asarray(
        bev_maps_from_points_batch(
            jnp.array(pts), jnp.array(msk), jnp.array(planes), ext, bev_cfg
        )
    )
    for i in range(b):
        want = np.asarray(
            bev_maps_from_points(
                jnp.array(pts[i]), jnp.array(msk[i]), jnp.array(planes[i]),
                ext, bev_cfg,
            )
        )
        np.testing.assert_allclose(got[i], want, atol=1e-6)

    mb_b, mf_b = build_coo_device(
        jnp.array(pts), jnp.array(msk), jnp.array(p2), ext, bev_cfg, img_cfg, sp_cfg
    )
    for i in range(b):
        mb, mf = build_coo_device(
            jnp.array(pts[i]), jnp.array(msk[i]), jnp.array(p2[i]),
            ext, bev_cfg, img_cfg, sp_cfg,
        )
        for batched, single in ((mb_b, mb), (mf_b, mf)):
            np.testing.assert_array_equal(np.asarray(batched.rows[i]), np.asarray(single.rows))
            np.testing.assert_array_equal(np.asarray(batched.cols[i]), np.asarray(single.cols))
            np.testing.assert_allclose(np.asarray(batched.vals[i]), np.asarray(single.vals), atol=1e-6)


def test_anchor_filter_batch_matches_per_sample(rng):
    from sparse_pooling_tpu.ops import anchors as anchor_ops

    ext, bev_cfg = AreaExtents(), BevConfig(voxel_size=0.8)
    h, w = bev_cfg.grid_hw(ext)
    from sparse_pooling_tpu.configs.config import AnchorConfig

    grid = anchor_ops.generate_anchors_np(
        AnchorConfig(stride=4.0, max_anchors=64),
        ext, np.array([0.0, -1.0, 0.0, 1.65]),
    ).astype(np.float32)
    occ = (rng.rand(3, h, w) > 0.97).astype(np.float32)
    anchors_b = jnp.array(np.tile(grid[None], (3, 1, 1)))
    got = anchor_ops.filter_anchors_batch(
        anchors_b, jnp.array(occ), ext, bev_cfg, max_anchors=64
    )
    for i in range(3):
        want = anchor_ops.filter_anchors_device(
            jnp.array(grid), jnp.array(occ[i]), ext, bev_cfg, max_anchors=64
        )
        np.testing.assert_array_equal(np.asarray(got.valid[i]), np.asarray(want.valid))
        np.testing.assert_allclose(
            np.asarray(got.anchors[i]), np.asarray(want.anchors), atol=1e-6
        )


def test_sparse_pool_pallas_interpret_matches_ell(rng):
    s, c, t, k = 640, 16, 520, 4
    x = rng.randn(s, c).astype(np.float32)
    ell_src = rng.randint(0, s, (t, k)).astype(np.int32)
    ell_w = rng.rand(t, k).astype(np.float32)
    want = np.asarray(sparse_pool_ell(jnp.array(x), jnp.array(ell_src), jnp.array(ell_w)))
    got = np.asarray(
        sparse_pool_ell_pallas(jnp.array(x), jnp.array(ell_src), jnp.array(ell_w), tile_t=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sparse_pool_batch_and_fuse(rng):
    b, s, c, t, k = 2, 64, 4, 6 * 8, 3
    x = rng.randn(b, s, c).astype(np.float32)
    ell_src = rng.randint(0, s, (b, t, k)).astype(np.int32)
    ell_w = rng.rand(b, t, k).astype(np.float32)
    out = sparse_pool_ell_batch(jnp.array(x), jnp.array(ell_src), jnp.array(ell_w))
    assert out.shape == (b, t, c)
    native = jnp.array(rng.randn(6, 8, 5).astype(np.float32))
    fused = fuse_pooled(native, out[0])
    assert fused.shape == (6, 8, 5 + c)
    np.testing.assert_allclose(np.asarray(fused[..., :5]), np.asarray(native))


def test_sparse_pool_grads_flow():
    """The pooling op must be differentiable (it sits mid-backbone)."""

    s, c, t, k = 32, 4, 16, 2
    x = jnp.ones((s, c))
    ell_src = jnp.zeros((t, k), jnp.int32)
    ell_w = jnp.full((t, k), 0.5)
    g = jax.grad(lambda xx: sparse_pool_ell(xx, ell_src, ell_w).sum())(x)
    # every target row pulls 2 * 0.5 from source row 0
    assert float(g[0, 0]) == t * k * 0.5
    assert float(g[1:].sum()) == 0.0


def test_device_coo_builder_matches_host_oracle(kitti_root):
    """On-device COO construction == host numpy builder, compared through
    the pooled output (the BASELINE <=1e-3 parity bar).

    Uses the canvas-scaled P2 and points pre-filtered to the canvas frustum
    so host and device see identical valid sets (edge conventions at the
    canvas border may differ by one pixel otherwise).
    """

    from sparse_pooling_tpu.ops import sparse_build

    cal, _, pts = _load_frame(kitti_root)
    ext = AreaExtents()
    bev_cfg, img_cfg = BevConfig(), ImageConfig(height=96, width=312)
    sp = SparsePoolConfig(max_points=8192)
    # canvas scale: raw 375x1242 -> 96x312 canvas
    sy, sx = 96 / 375.0, 312 / 1242.0
    p2c = sparse_build.scale_p2_to_canvas(cal.p2, sy, sx)

    # host oracle works in canvas pixels when given the scaled P2
    import numpy as np

    uv = (np.concatenate([pts, np.ones((len(pts), 1))], 1) @ p2c.T)
    uv = uv[:, :2] / uv[:, 2:3]
    inside = (
        (uv[:, 0] >= 0) & (uv[:, 0] <= 312 - sp.fusion_stride)
        & (uv[:, 1] >= 0) & (uv[:, 1] <= 96 - sp.fusion_stride)
    )
    pts_in = pts[inside][: sp.max_points]

    m_bev_h, m_fv_h = SM.build_sparse_pooling_input(
        pts_in, p2c, ext, bev_cfg, img_cfg, sp
    )
    padded, mask = P.pad_or_subsample(pts_in.astype(np.float32), sp.max_points)
    m_bev_d, m_fv_d = sparse_build.build_coo_device(
        jnp.array(padded), jnp.array(mask), jnp.array(p2c), ext, bev_cfg, img_cfg, sp
    )

    rng_ = np.random.RandomState(1)
    for host, dev in ((m_bev_h, m_bev_d), (m_fv_h, m_fv_d)):
        assert host.target_hw == dev.target_hw
        assert host.source_hw == dev.source_hw
        t = host.target_hw[0] * host.target_hw[1]
        s = host.source_hw[0] * host.source_hw[1]
        x = rng_.randn(s, 8).astype(np.float32)
        want = np.asarray(
            sparse_pool_coo(jnp.array(x), jnp.array(host.rows), jnp.array(host.cols), jnp.array(host.vals), t)
        )
        # the device COO defers row normalization into the pooling
        # (DeviceCoo.defer_row_norm): the flag-honoring pooling must match
        # the host oracle's eagerly-normalized pooling
        from sparse_pooling_tpu.ops.sparse_pool import (
            pool_device_coo,
            sparse_pool_point_major,
        )

        assert dev.defer_row_norm
        got = np.asarray(pool_device_coo(jnp.array(x), dev, t))
        np.testing.assert_allclose(got, want, atol=1e-3)
        # point-major raw pooling must agree with the flat()-expanded form
        r4, c4, v4 = dev.flat()
        got_flat_raw = np.asarray(sparse_pool_coo(jnp.array(x), r4, c4, v4, t))
        got_pm_raw = np.asarray(
            sparse_pool_point_major(jnp.array(x), dev.rows, dev.cols, dev.vals, t)
        )
        np.testing.assert_allclose(got_pm_raw, got_flat_raw, rtol=1e-5, atol=1e-4)  # raw weights accumulate large rows; scatter-order fp noise is relative


def test_patch_pooling_matches_point_major():
    """sparse_pool_patch_major_batch (one 2x2-window gather per point) must
    equal sparse_pool_point_major_batch on device-built corner layouts,
    including clamped edge windows and zero-weight padding points."""

    import numpy as np

    from sparse_pooling_tpu.ops import sparse_pool as sp

    rng = np.random.RandomState(0)
    b, hs, ws, c, p, nt = 2, 6, 9, 5, 40, 12
    src = jnp.array(rng.rand(b, hs, ws, c), jnp.float32)
    v0 = rng.randint(0, hs - 1, (b, p))
    u0 = rng.randint(0, ws - 1, (b, p))
    c00 = v0 * ws + u0
    cols = np.stack([c00, c00 + 1, c00 + ws, c00 + ws + 1], axis=-1)
    vals = rng.rand(b, p, 4).astype(np.float32)
    vals[:, -5:] = 0.0  # padding points
    rows = rng.randint(0, nt, (b, p))

    for norm in (False, True):  # raw + deferred-row-norm (production) forms
        got = sp.sparse_pool_patch_major_batch(
            src, jnp.array(rows, jnp.int32), jnp.array(cols, jnp.int32),
            jnp.array(vals), num_targets=nt, divide_by_weight_sum=norm,
        )
        want = sp.sparse_pool_point_major_batch(
            src.reshape(b, hs * ws, c), jnp.array(rows, jnp.int32),
            jnp.array(cols, jnp.int32), jnp.array(vals), num_targets=nt,
            divide_by_weight_sum=norm,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_patch_pooling_grads_match_point_major():
    """The patch pooling's custom VJP must match the flat path's autodiff
    gradients for both the source features and the weights."""

    import numpy as np

    from sparse_pooling_tpu.ops import sparse_pool as sp

    rng = np.random.RandomState(1)
    b, hs, ws, c, p, nt = 2, 5, 7, 3, 20, 8
    src = jnp.array(rng.rand(b, hs, ws, c), jnp.float32)
    v0 = rng.randint(0, hs - 1, (b, p))
    u0 = rng.randint(0, ws - 1, (b, p))
    c00 = v0 * ws + u0
    cols = jnp.array(
        np.stack([c00, c00 + 1, c00 + ws, c00 + ws + 1], axis=-1), jnp.int32
    )
    vals = jnp.array(rng.rand(b, p, 4), jnp.float32)
    rows = jnp.array(rng.randint(0, nt, (b, p)), jnp.int32)
    cost = jnp.array(rng.rand(b, nt, c), jnp.float32)

    for norm in (False, True):  # raw + deferred-row-norm (production) forms

        def loss_patch(s, v):
            return jnp.sum(
                sp.sparse_pool_patch_major_batch(
                    s, rows, cols, v, nt, divide_by_weight_sum=norm
                ) * cost
            )

        def loss_flat(s, v):
            return jnp.sum(
                sp.sparse_pool_point_major_batch(
                    s.reshape(b, hs * ws, c), rows, cols, v, nt,
                    divide_by_weight_sum=norm,
                ) * cost
            )

        gs_p, gv_p = jax.grad(loss_patch, argnums=(0, 1))(src, vals)
        gs_f, gv_f = jax.grad(loss_flat, argnums=(0, 1))(src, vals)
        np.testing.assert_allclose(
            np.asarray(gs_p), np.asarray(gs_f).reshape(b, hs, ws, c), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(gv_p), np.asarray(gv_f), atol=1e-6)


def test_bf16_crop_gradient_accumulation_bounded():
    """Round-2 advisor (low): bf16 feature maps accumulate their ROI-crop
    gradient in bf16 (ops.crop_resize._acc_dtype). Bound the bf16-vs-f32
    error at REALISTIC entry density: 2048 boxes x 3x3 samples x 4 corners
    ~ 74k entries into an 88x100 map (the production RPN per-frame scale;
    entries-per-cell matches the bench geometry)."""

    import jax
    import jax.numpy as jnp

    from sparse_pooling_tpu.ops.crop_resize import crop_and_resize_px_batch

    rng = np.random.RandomState(0)
    h, w, c = 88, 100, 8
    n = 2048
    img_f32 = jnp.array(rng.rand(1, h, w, c), jnp.float32)
    y1 = rng.rand(1, n) * (h - 8)
    x1 = rng.rand(1, n) * (w - 8)
    s = 2 + rng.rand(1, n) * 5
    boxes = jnp.array(np.stack([y1, x1, y1 + s, x1 + s], -1), jnp.float32)

    def loss(img):
        out = crop_and_resize_px_batch(img, boxes, (3, 3))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g32 = np.asarray(jax.grad(loss)(img_f32), np.float64)
    g16 = np.asarray(
        jax.grad(loss)(img_f32.astype(jnp.bfloat16)).astype(jnp.float32),
        np.float64,
    )
    denom = np.linalg.norm(g32)
    rel_l2 = np.linalg.norm(g16 - g32) / denom
    # bf16 carries ~3 significant decimal digits; per-cell accumulation
    # depth at this density is O(10), so a few percent is the expected
    # band — this pins the ceiling (fails loudly if accumulation depth
    # or dtype handling regresses)
    assert rel_l2 < 0.05, rel_l2
    # and the error must not concentrate: worst cell bounded vs its own scale
    scale = np.abs(g32).max()
    assert np.abs(g16 - g32).max() / scale < 0.1
