"""Host data core tests: calib, labels, voxel grid, BEV maps, integral image.

Mirrors the reference's numpy-golden-value unit-test style (SURVEY.md §5):
tiny hand-built fixtures with exact expectations.
"""

import os

import numpy as np
import pytest

from sparse_pooling_tpu.configs.config import AreaExtents, BevConfig
from sparse_pooling_tpu.data import augmentation as aug
from sparse_pooling_tpu.data import bev, calib, integral_image, labels, pointcloud, voxel_grid


def test_read_calibration(kitti_root):
    c = calib.read_calibration(os.path.join(kitti_root, "training/calib/000000.txt"))
    assert c.p2.shape == (3, 4)
    assert c.r0_rect.shape == (3, 3)
    assert c.tr_velo_to_cam.shape == (3, 4)
    np.testing.assert_allclose(c.p2[0, 0], 721.5377, rtol=1e-6)


def test_velo_to_cam_round_trip(kitti_root):
    c = calib.read_calibration(os.path.join(kitti_root, "training/calib/000000.txt"))
    # velodyne x-forward becomes camera z-forward
    pts_velo = np.array([[10.0, 0.0, 0.0, 1.0]])
    cam = calib.lidar_to_cam_frame(pts_velo, c)
    assert cam[0, 2] > 9.0
    assert abs(cam[0, 0]) < 1.0


def test_project_to_image_center():
    p2 = np.array([[700.0, 0.0, 600.0, 0.0], [0.0, 700.0, 180.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    # a point straight ahead projects onto the principal point
    uv = calib.project_to_image(np.array([[0.0, 0.0, 10.0]]), p2)
    np.testing.assert_allclose(uv, [[600.0, 180.0]])
    # x offset moves u by fx * x / z
    uv = calib.project_to_image(np.array([[1.0, 0.0, 10.0]]), p2)
    np.testing.assert_allclose(uv, [[670.0, 180.0]])


def test_read_labels(kitti_root):
    lbs = labels.read_labels(os.path.join(kitti_root, "training/label_2/000000.txt"))
    assert len(lbs) >= 2
    assert all(ob.type in ("Car", "Pedestrian") for ob in lbs)
    cars = labels.filter_labels_by_class(lbs, ["Car"])
    assert all(ob.type == "Car" for ob in cars)
    arr = labels.labels_to_box3d_array(cars)
    assert arr.shape == (len(cars), 7)


def test_ground_plane(kitti_root):
    plane = labels.read_ground_plane(os.path.join(kitti_root, "training/planes/000000.txt"))
    # normal points up (-y), road 1.65m below camera
    assert plane[1] < 0
    d = pointcloud.distance_to_plane(np.array([[0.0, 1.65, 10.0]]), plane)
    np.testing.assert_allclose(d, [0.0], atol=1e-6)
    d = pointcloud.distance_to_plane(np.array([[0.0, 0.65, 10.0]]), plane)
    np.testing.assert_allclose(d, [1.0], atol=1e-6)


def test_voxelize_2d_hand_case():
    ext = AreaExtents()
    # two points in the same cell, one in another
    pts = np.array(
        [
            [-40.0 + 0.05, 1.0, 0.05],  # cell (0, 0)
            [-40.0 + 0.08, 1.5, 0.01],  # cell (0, 0)
            [0.0, 1.2, 35.0],  # cell (350, 400)
        ]
    )
    vg = voxel_grid.voxelize_2d(pts, ext, 0.1)
    assert vg.grid_hw == (700, 800)
    assert vg.cell_rc.shape == (2, 2)
    np.testing.assert_array_equal(vg.cell_rc[0], [0, 0])
    np.testing.assert_array_equal(vg.cell_rc[1], [350, 400])
    np.testing.assert_array_equal(vg.counts, [2, 1])
    np.testing.assert_allclose(vg.min_y, [1.0, 1.2])
    np.testing.assert_allclose(vg.max_y, [1.5, 1.2])


def test_voxelize_2d_empty():
    vg = voxel_grid.voxelize_2d(np.zeros((0, 3)), AreaExtents(), 0.1)
    assert vg.cell_rc.shape == (0, 2)
    assert vg.occupancy().sum() == 0


def test_bev_maps_hand_case():
    ext = AreaExtents()
    cfg = BevConfig()
    plane = labels.default_ground_plane()
    slice_h = (cfg.height_hi - cfg.height_lo) / cfg.height_slices  # 0.5
    # one point 0.3m above ground -> slice 1 (heights shifted by height_lo=-0.2)
    pts = np.array([[0.0, 1.65 - 0.3, 35.0]])
    maps = bev.generate_bev_maps(pts, plane, ext, cfg)
    assert maps.shape == (704, 800, 6)
    r, c = 350, 400
    height_rel = (0.3 - cfg.height_lo) % slice_h
    sl = int((0.3 - cfg.height_lo) // slice_h)
    assert sl == 1
    np.testing.assert_allclose(maps[r, c, sl], height_rel / slice_h, rtol=1e-5)
    assert maps[r, c, 0] == 0.0
    # density: one point -> log(2)/log(16)
    np.testing.assert_allclose(maps[r, c, 5], np.log(2) / np.log(16), rtol=1e-5)
    # all other cells empty
    maps[r, c, :] = 0
    assert maps.sum() == 0.0


def test_bev_maps_density_saturation():
    ext = AreaExtents()
    cfg = BevConfig()
    plane = labels.default_ground_plane()
    pts = np.repeat(np.array([[0.0, 1.0, 35.0]]), 100, axis=0)
    maps = bev.generate_bev_maps(pts, plane, ext, cfg)
    assert maps[350, 400, 5] == 1.0  # min(1, log(101)/log(16)) saturates


def test_integral_image_2d(rng):
    grid = (rng.rand(20, 30) > 0.5).astype(np.int32)
    ii = integral_image.integral_image_2d(grid)
    boxes = np.array([[0, 0, 20, 30], [3, 4, 10, 12], [5, 5, 5, 9]])
    got = integral_image.query_boxes_2d(ii, boxes)
    assert got[0] == grid.sum()
    assert got[1] == grid[3:10, 4:12].sum()
    assert got[2] == 0  # empty box


def test_integral_image_3d(rng):
    grid = (rng.rand(8, 9, 10) > 0.5).astype(np.int32)
    ii = integral_image.integral_image_3d(grid)
    boxes = np.array([[0, 0, 0, 8, 9, 10], [2, 3, 4, 5, 6, 9]])
    got = integral_image.query_boxes_3d(ii, boxes)
    assert got[0] == grid.sum()
    assert got[1] == grid[2:5, 3:6, 4:9].sum()


def test_flip_consistency(kitti_root):
    """Flipped points projected through the flipped calib land on the
    mirrored pixel — the invariant kitti_aug must preserve."""

    c = calib.read_calibration(os.path.join(kitti_root, "training/calib/000000.txt"))
    img = np.zeros((375, 1242, 3), dtype=np.uint8)
    pts = np.array([[2.0, 1.0, 20.0], [-3.0, 0.5, 15.0]])
    uv = calib.project_to_image(pts, c.p2)
    _, pts_f, calib_f, _ = aug.flip_sample(img, pts, c, [])
    uv_f = calib.project_to_image(pts_f, calib_f.p2)
    np.testing.assert_allclose(uv_f[:, 0], (img.shape[1] - 1.0) - uv[:, 0], atol=1e-6)
    np.testing.assert_allclose(uv_f[:, 1], uv[:, 1], atol=1e-6)


def test_flip_label_round_trip():
    ob = labels.ObjectLabel(
        type="Car", truncation=0.0, occlusion=0, alpha=0.1,
        x1=100, y1=50, x2=200, y2=120, h=1.5, w=1.6, l=3.9,
        t=(2.0, 1.65, 20.0), ry=0.3,
    )
    back = aug.flip_label(aug.flip_label(ob, 1242), 1242)
    np.testing.assert_allclose(back.t, ob.t)
    np.testing.assert_allclose(back.ry, ob.ry, atol=1e-9)
    np.testing.assert_allclose([back.x1, back.x2], [ob.x1, ob.x2])


def test_pad_or_subsample():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    out, mask = pointcloud.pad_or_subsample(pts, 16)
    assert out.shape == (16, 3) and mask.sum() == 10
    np.testing.assert_array_equal(out[:10], pts)
    out, mask = pointcloud.pad_or_subsample(pts, 4, seed=1)
    assert out.shape == (4, 3) and mask.all()
    # subsample preserves order and draws from the original rows
    assert all(any((row == pts[i]).all() for i in range(10)) for row in out)


# ---------------------------------------------------------------- buckets
def test_sparse_pool_buckets_property():
    from sparse_pooling_tpu.configs.config import SparsePoolConfig

    sp = SparsePoolConfig(max_points=32768, point_buckets=(8192, 16384))
    assert sp.buckets == (8192, 16384, 32768)
    # buckets >= max_points are ignored (small-cap configs unaffected)
    sp_small = SparsePoolConfig(max_points=1024, point_buckets=(8192, 16384))
    assert sp_small.buckets == (1024,)
    # disabled
    assert SparsePoolConfig(max_points=4096, point_buckets=()).buckets == (4096,)


def test_trim_points_to_bucket_boundaries():
    buckets = (8, 16, 32)
    pts = np.arange(2 * 32 * 3, dtype=np.float32).reshape(2, 32, 3)
    mask = np.zeros((2, 32), bool)
    mask[0, :5] = True
    mask[1, :7] = True  # batch max 7 -> bucket 8
    p, m = pointcloud.trim_points_to_bucket(pts, mask, buckets)
    assert p.shape == (2, 8, 3) and m.shape == (2, 8)
    np.testing.assert_array_equal(p, pts[:, :8])

    mask[1, :9] = True  # batch max 9 -> bucket 16
    p, m = pointcloud.trim_points_to_bucket(pts, mask, buckets)
    assert p.shape == (2, 16, 3)

    mask[1, :] = True  # full -> cap
    p, m = pointcloud.trim_points_to_bucket(pts, mask, buckets)
    assert p.shape == (2, 32, 3)
    # boundary: exactly the bucket size stays in that bucket
    mask[:] = False
    mask[0, :16] = True
    p, m = pointcloud.trim_points_to_bucket(pts, mask, buckets)
    assert p.shape == (2, 16, 3)
    assert m[0].sum() == 16


def test_bucketed_batch_device_parity():
    """Voxelizer + SHPL pooling must give IDENTICAL results for a frame
    padded to a bucket vs the full cap (the padding carries weight 0)."""

    import jax.numpy as jnp

    from sparse_pooling_tpu.configs.config import (
        BevConfig as BC,
        ImageConfig,
        SparsePoolConfig,
    )
    from sparse_pooling_tpu.ops import bev_device, sparse_build
    from sparse_pooling_tpu.ops.sparse_pool import sparse_pool_point_major_batch

    ext = AreaExtents()
    bev_cfg = BC(voxel_size=0.8, pad_h=0)
    img_cfg = ImageConfig(height=48, width=160)
    sp = SparsePoolConfig(fusion_stride=2, max_points=64, point_buckets=(16,))

    rng = np.random.RandomState(0)
    n_valid = 12
    pts = np.zeros((1, 64, 3), np.float32)
    pts[0, :n_valid] = np.stack(
        [
            rng.uniform(-20, 20, n_valid),
            rng.uniform(0.5, 2.0, n_valid),
            rng.uniform(5, 50, n_valid),
        ],
        axis=-1,
    )
    mask = np.zeros((1, 64), bool)
    mask[0, :n_valid] = True
    p2 = np.array(
        [[100.0, 0, 80.0, 0], [0, 100.0, 24.0, 0], [0, 0, 1, 0]], np.float32
    )[None]
    plane = np.array([[0.0, -1.0, 0.0, 1.65]], np.float32)

    pts_b, mask_b = pointcloud.trim_points_to_bucket(pts, mask, sp.buckets)
    assert pts_b.shape[1] == 16

    outs = []
    for p_, m_ in ((pts, mask), (pts_b, mask_b)):
        bev_maps = bev_device.bev_maps_from_points_batch(
            jnp.array(p_), jnp.array(m_), jnp.array(plane), ext, bev_cfg
        )
        m_bev, m_fv = sparse_build.build_coo_device(
            jnp.array(p_), jnp.array(m_), jnp.array(p2), ext, bev_cfg,
            img_cfg, sp,
        )
        src = jnp.array(
            rng.rand(1, (img_cfg.height // 2) * (img_cfg.width // 2), 4),
            jnp.float32,
        ) * 0 + 1.0  # deterministic source features
        pooled = sparse_pool_point_major_batch(
            src, m_bev.rows, m_bev.cols, m_bev.vals,
            num_targets=m_bev.target_hw[0] * m_bev.target_hw[1],
            divide_by_weight_sum=m_bev.defer_row_norm,
        )
        outs.append((np.asarray(bev_maps), np.asarray(pooled)))

    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


# ------------------------------------------------------- hard synthetic scenes

def test_object_points_are_heading_asymmetric():
    """The oracle must make the pi-flip bit OBSERVABLE (round-5 finding:
    the legacy symmetric box makes heading-side statistically independent
    of the points, so AOS beyond chance was untestable for ANY model).

    For a car at ry=0 the roof band (top 40% heights) must sit toward the
    REAR (-x); flipping ry by pi must flip that signed offset. The legacy
    untyped box must remain symmetric (geometry tests depend on it).
    """

    import numpy as np

    from sparse_pooling_tpu.data.synthetic import _box_points

    def roof_offset(ry, obj_type, seed=3):
        rng = np.random.RandomState(seed)
        p = _box_points(
            rng, 0.0, 1.65, 20.0, 3.9, 1.6, 1.5, ry, 4000, obj_type=obj_type
        )
        rel_y = 1.65 - p[:, 1]  # height above ground
        roof = p[rel_y > 0.9 * 1.5]
        return float(np.mean(roof[:, 0]))  # signed x offset (cam frame)

    car0 = roof_offset(0.0, "Car")
    car_pi = roof_offset(np.pi, "Car")
    assert car0 < -0.3, car0  # roof toward the rear at ry=0
    assert car_pi > 0.3, car_pi  # and flips with the heading
    sym0 = roof_offset(0.0, None)
    assert abs(sym0) < 0.15, sym0  # legacy box stays symmetric

    # cyclists carry the cue too; pedestrians a weak but nonzero one
    assert roof_offset(0.0, "Cyclist", seed=5) < -0.15
    ped = roof_offset(0.0, "Pedestrian", seed=7)
    assert ped < -0.02


def test_hard_scene_populates_difficulty_bands(tmp_path):
    """The sharpened quality oracle (round-3 verdict item 1) needs synthetic
    scenes whose GT spreads over easy/moderate/hard: occlusion levels 1-2,
    truncation > 0.15, and sub-40 px boxes must all actually occur."""

    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.runtime.metrics import DIFFICULTIES

    root = tmp_path / "hard"
    synthetic.write_kitti_tree(
        str(root), num_frames=6, n_ground=4096, n_obj=1024,
        val_frames=(4, 5), scene="cars_hard",
    )
    strict = {k: 0 for k in DIFFICULTIES}
    occs, truncs, heights = [], [], []
    for i in range(6):
        lbs = labels.read_labels(
            str(root / "training" / "label_2" / f"{i:06d}.txt")
        )
        assert len(lbs) >= 6  # busy scenes
        for lb in lbs:
            if lb.type != "Car":
                continue
            occs.append(lb.occlusion)
            truncs.append(lb.truncation)
            heights.append(lb.y2 - lb.y1)
            for name, (mh, mo, mt) in DIFFICULTIES.items():
                if (lb.y2 - lb.y1) >= mh and lb.occlusion <= mo and lb.truncation <= mt:
                    strict[name] += 1
    assert strict["easy"] >= 3
    assert strict["moderate"] > strict["easy"]  # mod-only objects exist
    assert strict["hard"] > strict["moderate"]  # hard-only objects exist
    assert max(occs) == 2 and 1 in occs
    assert max(truncs) > 0.15
    assert min(heights) < 40.0


def test_hard_scene_occluded_objects_lose_points():
    """Shadowing must actually remove LiDAR returns: an occluded object's
    point count should be well below an unoccluded twin at the same range."""

    from sparse_pooling_tpu.data import synthetic

    velo, lbs, _ = synthetic.make_frame(
        3, n_ground=4096, n_obj=2048, scene="cars_hard"
    )
    assert velo.shape[1] == 4
    assert len(velo) > 4096  # objects contributed points
    # frame is deterministic
    velo2, lbs2, _ = synthetic.make_frame(
        3, n_ground=4096, n_obj=2048, scene="cars_hard"
    )
    np.testing.assert_array_equal(velo, velo2)
    assert lbs == lbs2


def test_hard_scene_dataset_loads(tmp_path):
    """The full KittiDataset pipeline consumes a hard tree end to end."""

    from sparse_pooling_tpu.configs.presets import preset as preset_fn
    import dataclasses

    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.data.dataset import KittiDataset

    root = tmp_path / "hardds"
    synthetic.write_kitti_tree(
        str(root), num_frames=2, n_ground=2048, n_obj=256,
        val_frames=(1,), scene="people_hard",
    )
    cfg = preset_fn("unittest")
    ds_cfg = dataclasses.replace(cfg.dataset, root=str(root), split="train")
    ds = KittiDataset(ds_cfg, cfg.model)
    s = ds.load_sample(ds.sample_ids[0])
    assert s.points.shape[1] == 3
    assert int(s.gt_valid.sum()) >= 1


def test_decoded_image_cache_round_trip(tmp_path):
    """dataset.image_cache_dir: first load decodes + persists, second load
    mmap-copies — both must produce identical HostSamples (incl. the
    zero-copy image_out canvas path the eval sweep uses)."""

    import dataclasses

    from sparse_pooling_tpu.configs.presets import preset as preset_fn
    from sparse_pooling_tpu.data import synthetic
    from sparse_pooling_tpu.data.dataset import KittiDataset

    root = tmp_path / "ds"
    synthetic.write_kitti_tree(
        str(root), num_frames=2, n_ground=1024, n_obj=128, val_frames=(1,)
    )
    cfg = preset_fn("unittest")
    cache = tmp_path / "imgcache"
    ds_plain = KittiDataset(
        dataclasses.replace(cfg.dataset, root=str(root), split="train"),
        cfg.model,
    )
    ds_cached = KittiDataset(
        dataclasses.replace(
            cfg.dataset, root=str(root), split="train",
            image_cache_dir=str(cache),
        ),
        cfg.model,
    )
    sid = ds_plain.sample_ids[0]
    want = ds_plain.load_sample(sid)
    got_first = ds_cached.load_sample(sid)  # decode + write-back
    assert (cache / f"{sid}.npy").exists()
    got_cached = ds_cached.load_sample(sid)  # mmap hit
    np.testing.assert_array_equal(got_first.image, want.image)
    np.testing.assert_array_equal(got_cached.image, want.image)
    np.testing.assert_array_equal(got_cached.points, want.points)

    # zero-copy canvas path (eval sweep): image_out is filled in place
    h, w = cfg.model.image.height, cfg.model.image.width
    out = np.zeros((h, w, 3), np.uint8)
    got_canvas = ds_cached.load_sample(sid, image_out=out)
    assert got_canvas.image is out
    np.testing.assert_array_equal(out, want.image)
