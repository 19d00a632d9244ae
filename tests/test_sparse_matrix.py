"""SHPL sparse correspondence builder tests (the novel op, host side)."""

import numpy as np
import pytest

from sparse_pooling_tpu.configs.config import AreaExtents, BevConfig, ImageConfig, SparsePoolConfig
from sparse_pooling_tpu.data import sparse_matrix as sm


def _coo_to_dense(corr):
    t = corr.target_hw[0] * corr.target_hw[1]
    s = corr.source_hw[0] * corr.source_hw[1]
    m = np.zeros((t, s))
    np.add.at(m, (corr.rows[: corr.nnz], corr.cols[: corr.nnz]), corr.vals[: corr.nnz])
    return m


def test_bilinear_pairs_exact_center():
    # source coord exactly on a pixel -> single weight 1 (others 0)
    rows, cols, vals = sm._bilinear_pairs(
        np.array([7]), np.array([[3.0, 2.0]]), (5, 6)
    )
    assert rows.shape == (4,)
    d = {}
    for c, v in zip(cols, vals):
        d[c] = d.get(c, 0) + v
    assert pytest.approx(d[2 * 6 + 3]) == 1.0
    assert pytest.approx(sum(d.values())) == 1.0


def test_bilinear_pairs_quarter():
    rows, cols, vals = sm._bilinear_pairs(
        np.array([0]), np.array([[0.25, 0.5]]), (4, 4)
    )
    w = dict(zip(cols, vals))
    np.testing.assert_allclose(w[0], 0.75 * 0.5)  # (v0,u0)
    np.testing.assert_allclose(w[1], 0.25 * 0.5)  # (v0,u1)
    np.testing.assert_allclose(w[4], 0.75 * 0.5)  # (v1,u0)
    np.testing.assert_allclose(w[5], 0.25 * 0.5)  # (v1,u1)


def test_row_normalization_two_points_one_cell():
    # two points in the same target cell -> row sums to 1 (average pooling)
    t = np.array([5, 5])
    uv = np.array([[1.0, 1.0], [3.0, 2.0]])
    corr = sm.build_correspondence(t, uv, (2, 4), (4, 6), ell_k=8, coo_cap=64)
    dense = _coo_to_dense(corr)
    np.testing.assert_allclose(dense[5].sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(dense[5, 1 * 6 + 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(dense[5, 2 * 6 + 3], 0.5, atol=1e-6)


def test_ell_matches_coo_when_under_capacity():
    rng = np.random.RandomState(0)
    n = 50
    t = rng.randint(0, 12, size=n)
    uv = np.stack([rng.uniform(0, 7, n), rng.uniform(0, 5, n)], axis=1)
    corr = sm.build_correspondence(t, uv, (3, 4), (6, 8), ell_k=64, coo_cap=1024)
    dense = _coo_to_dense(corr)
    ell_dense = np.zeros_like(dense)
    for r in range(ell_dense.shape[0]):
        np.add.at(ell_dense[r], corr.ell_src[r][corr.ell_w[r] > 0], corr.ell_w[r][corr.ell_w[r] > 0])
    np.testing.assert_allclose(ell_dense, dense, atol=1e-6)


def test_ell_topk_truncation_renormalizes():
    # 3 points, one cell, k=2 -> keeps 2 largest-weight sources, row sum 1
    t = np.array([0, 0, 0])
    uv = np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]])
    corr = sm.build_correspondence(t, uv, (1, 1), (5, 5), ell_k=2, coo_cap=64)
    assert (corr.ell_w[0] > 0).sum() == 2
    np.testing.assert_allclose(corr.ell_w[0].sum(), 1.0, atol=1e-6)


def test_full_frame_correspondence(kitti_root):
    import os

    from sparse_pooling_tpu.data import calib as C, pointcloud as P

    cal = C.read_calibration(os.path.join(kitti_root, "training/calib/000000.txt"))
    pts = P.get_lidar_point_cloud(
        os.path.join(kitti_root, "training/velodyne/000000.bin"), cal, (375, 1242)
    )
    ext = AreaExtents()
    pts = P.filter_to_area_extents(pts, ext)
    m_bev, m_fv = sm.build_sparse_pooling_input(
        pts, cal.p2, ext, BevConfig(), ImageConfig(), SparsePoolConfig()
    )
    assert m_bev.target_hw == (88, 100)
    assert m_bev.source_hw == (48, 156)
    assert m_fv.target_hw == (48, 156)
    # every occupied row is normalized
    for corr in (m_bev, m_fv):
        row_sums = corr.ell_w.sum(axis=1)
        occ = row_sums > 0
        assert occ.sum() > 100
        np.testing.assert_allclose(row_sums[occ], 1.0, atol=1e-4)
        # all source indices in range
        assert corr.ell_src.max() < corr.source_hw[0] * corr.source_hw[1]
        assert corr.ell_src.min() >= 0


def test_empty_point_cloud():
    m_bev, m_fv = sm.build_sparse_pooling_input(
        np.zeros((0, 3)), np.eye(3, 4), AreaExtents(), BevConfig(), ImageConfig(), SparsePoolConfig()
    )
    assert m_bev.nnz == 0 and m_fv.nnz == 0
    assert m_bev.ell_w.sum() == 0


def test_patch_pool_bf16_accumulation():
    """accum_dtype='bfloat16' (SparsePoolConfig knob): forward within bf16
    tolerance of the f32 path, and grads BIT-IDENTICAL (the custom-VJP
    backward never touches the forward accumulator)."""

    import jax
    import jax.numpy as jnp

    from sparse_pooling_tpu.ops.sparse_pool import sparse_pool_patch_major_batch

    rng = np.random.RandomState(7)
    b, hs, ws, c, p, t = 2, 8, 10, 6, 64, 40
    src = jnp.array(rng.randn(b, hs, ws, c), jnp.float32)
    rows = jnp.array(rng.randint(0, t, (b, p)), jnp.int32)
    base = rng.randint(0, (hs - 1) * ws - 1, (b, p))
    cols = jnp.array(
        np.stack([base, base + 1, base + ws, base + ws + 1], axis=-1), jnp.int32
    )
    vals = jnp.array(rng.rand(b, p, 4), jnp.float32)

    def run(accum):
        return sparse_pool_patch_major_batch(
            src, rows, cols, vals, num_targets=t,
            divide_by_weight_sum=True, accum_dtype=accum,
        )

    f32 = np.asarray(run("float32"))
    bf16 = np.asarray(run("bfloat16"))
    np.testing.assert_allclose(bf16, f32, rtol=0.05, atol=0.05)
    assert not np.array_equal(bf16, f32)  # it genuinely ran in bf16

    def loss(accum):
        def f(s, v):
            return jnp.sum(run_with(s, v, accum) ** 2)

        def run_with(s, v, a):
            return sparse_pool_patch_major_batch(
                s, rows, cols, v, num_targets=t,
                divide_by_weight_sum=True, accum_dtype=a,
            )

        return jax.grad(f, argnums=(0, 1))(src, vals)

    g32 = loss("float32")
    g16 = loss("bfloat16")
    # the quotient wrapper differentiates through the (dtype-dependent)
    # forward, so exact equality is not expected — but the custom-VJP core
    # keeps them extremely close
    for a, b_ in zip(g32, g16):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=0.05, atol=0.05
        )
