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


def test_load_sample_image_out_bit_equal(tree):
    """image_out (batch-canvas view) loading == fresh-canvas loading, and
    stack_samples with the caller-owned canvas == the naive np.stack."""

    cfg = cars_pyramid_config()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(
            cfg.dataset, root=tree, split="trainval",
            aug_flip=True, aug_pca_jitter=True,
        ),
    )
    ds = KittiDataset(cfg.dataset, cfg.model, AreaExtents())
    for seed in (None, 7):  # eval path + an augmented draw
        canvas_b = ds.alloc_image_batch(2)
        samples_out = [
            ds.load_sample(sid, augment_seed=seed, image_out=canvas_b[j])
            for j, sid in enumerate(("000000", "000001"))
        ]
        samples_ref = [
            ds.load_sample(sid, augment_seed=seed)
            for sid in ("000000", "000001")
        ]
        for s_o, s_r in zip(samples_out, samples_ref):
            for f in ("points", "points_mask", "image", "p2", "image_scale"):
                assert np.array_equal(getattr(s_o, f), getattr(s_r, f)), (f, seed)
        # the returned image IS the canvas row (no copy was made)
        assert samples_out[0].image.base is canvas_b
        stacked_fast = ds.stack_samples(samples_out, image_batch=canvas_b)
        stacked_ref = ds.stack_samples(samples_ref)
        for a, b in zip(stacked_fast, stacked_ref):
            assert np.array_equal(a, b)


def test_load_sample_image_out_pil_fallback(tree):
    """With the native decoder force-disabled the PIL path must honor
    image_out identically (incl. restoring the zero pad region)."""

    cfg = cars_pyramid_config()
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, root=tree, split="val")
    )
    ds = KittiDataset(cfg.dataset, cfg.model, AreaExtents())
    canvas_b = ds.alloc_image_batch(1)
    canvas_b[0, -1, -1] = 255  # dirt in the pad region must be re-zeroed
    nl._lib, nl._load_failed = None, True
    try:
        s_out = ds.load_sample("000001", augment_seed=None, image_out=canvas_b[0])
        s_ref = ds.load_sample("000001", augment_seed=None)
    finally:
        nl._load_failed = False
    assert np.array_equal(s_out.image, s_ref.image)
    assert s_out.image.base is canvas_b
