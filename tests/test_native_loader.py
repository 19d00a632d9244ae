"""Native sample loader (native/sample_loader) vs its numpy/PIL twins.

The two host-hot loader loops (PNG -> canvas decode, fused point
transform/filter) have C++ implementations used automatically by
``KittiDataset.load_sample`` when the shared library builds; these tests
pin BIT-equality against the pure-Python twins on both the eval and the
augmented path, so the native path can never be a behavior change.
"""

import dataclasses
import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from sparse_pooling_tpu.configs import cars_pyramid_config
from sparse_pooling_tpu.configs.config import AreaExtents
from sparse_pooling_tpu.data import calib as calib_mod
from sparse_pooling_tpu.data import pointcloud, synthetic
from sparse_pooling_tpu.data.dataset import KittiDataset
from sparse_pooling_tpu.native import sample_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason="native sample_loader not built"
)


@pytest.fixture(scope="module")
def tree():
    with tempfile.TemporaryDirectory() as root:
        synthetic.write_kitti_tree(
            root, num_frames=2, n_ground=4096, n_obj=512, val_frames=(1,)
        )
        yield root


def _paths(tree, sid):
    base = os.path.join(tree, "training")
    return (
        os.path.join(base, "image_2", sid + ".png"),
        os.path.join(base, "velodyne", sid + ".bin"),
        os.path.join(base, "calib", sid + ".txt"),
    )


def test_png_decode_matches_pil(tree):
    png, _, _ = _paths(tree, "000000")
    canvas, raw_hw = nl.decode_png_canvas(png, 384, 1248)
    pil = np.asarray(Image.open(png).convert("RGB"))
    assert raw_hw == pil.shape[:2]
    assert np.array_equal(canvas[: raw_hw[0], : raw_hw[1]], pil)
    assert canvas[raw_hw[0]:].max() == 0 and canvas[:, raw_hw[1]:].max() == 0


def test_png_decode_rejects_oversize(tree):
    png, _, _ = _paths(tree, "000000")
    assert nl.decode_png_canvas(png, 48, 160) is None  # raw 375x1242


def test_points_match_numpy_twin(tree):
    png, velo, cal_path = _paths(tree, "000000")
    cal = calib_mod.read_calibration(cal_path)
    raw_hw = np.asarray(Image.open(png)).shape[:2]
    ext = AreaExtents()
    ref = pointcloud.load_points_filtered(velo, cal, raw_hw, ext)
    nat = nl.load_points(velo, cal.velo_to_rect(), cal.p2, raw_hw, ext)
    assert nat.shape == ref.shape
    assert np.array_equal(nat, ref)


def test_load_sample_bit_equal_both_paths(tree):
    cfg = cars_pyramid_config()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(
            cfg.dataset, root=tree, split="val",
            aug_flip=True, aug_pca_jitter=True,
        ),
    )
    ds = KittiDataset(cfg.dataset, cfg.model, AreaExtents())
    for seed in (None, 7, 12345):  # eval path + two augmented draws
        s_nat = ds.load_sample("000000", augment_seed=seed)
        nl._lib, nl._load_failed = None, True
        try:
            s_py = ds.load_sample("000000", augment_seed=seed)
        finally:
            nl._load_failed = False
        for f in ("points", "points_mask", "image", "p2", "ground_plane",
                  "gt_boxes_3d", "gt_valid", "gt_classes", "image_scale"):
            assert np.array_equal(getattr(s_nat, f), getattr(s_py, f)), (
                f, seed
            )
