"""In-graph bilinear image resize (ops.image_resize) vs the PIL host path.

The reference feeds variable-size images straight into TF1 placeholders;
the rebuild's static canvas originally PIL-resized on the host. The
device-resize path must (1) match PIL BILINEAR on the KITTI upscale case,
(2) be the exact identity at scale 1 (canvas-sized inputs), and (3) flow
through ``KittiDataset.load_sample`` with a correctly scaled P2.
"""

import dataclasses
import os
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from sparse_pooling_tpu.configs import cars_pyramid_config, unittest_config
from sparse_pooling_tpu.configs.config import AreaExtents
from sparse_pooling_tpu.data import synthetic
from sparse_pooling_tpu.data.dataset import HostSample, KittiDataset
from sparse_pooling_tpu.ops.image_resize import resize_bilinear_batch


def test_matches_pil_on_kitti_upscale():
    # raw KITTI geometry (375x1242) -> production canvas (384x1248): an
    # upscale in both dims, where PIL BILINEAR == plain bilinear (PIL only
    # antialiases when downscaling)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (375, 1242, 3), np.uint8)
    canvas = np.zeros((384, 1248, 3), np.uint8)
    canvas[:375, :1242] = raw
    scale = np.array([[384 / 375, 1248 / 1242]], np.float32)
    out = np.asarray(
        resize_bilinear_batch(jnp.array(canvas[None]), jnp.array(scale))
    )[0]
    pil = (
        np.asarray(
            Image.fromarray(raw).resize((1248, 384), Image.BILINEAR)
        ).astype(np.float32)
        / 255.0
    )
    # PIL uses 8-bit fixed-point filter coefficients; on TPU the einsums
    # accumulate in bf16 (~0.5% of value) — both within ~3 LSB of uint8
    assert np.abs(out - pil).max() <= 3.0 / 255.0


def test_identity_at_unit_scale():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (2, 64, 96, 3), np.uint8)
    out = np.asarray(
        resize_bilinear_batch(jnp.array(img), jnp.ones((2, 2), np.float32))
    )
    # exact on CPU f32; the tolerance covers TPU bf16 accumulation
    assert np.abs(out - img.astype(np.float32) / 255.0).max() <= 2.0 / 255.0


def test_zero_padding_gets_zero_weight():
    # bottom/right canvas padding beyond the raw extent must not bleed in:
    # make the raw content all-255 and the padding all-0 — every output
    # pixel must stay 1.0
    canvas = np.zeros((1, 64, 96, 3), np.uint8)
    canvas[:, :50, :80] = 255
    scale = np.array([[64 / 50, 96 / 80]], np.float32)
    out = np.asarray(resize_bilinear_batch(jnp.array(canvas), jnp.array(scale)))
    assert out.min() >= 1.0 - 2.0 / 255.0


def test_per_frame_scales_differ():
    # two frames with different raw extents resize independently
    rng = np.random.RandomState(2)
    canvas = np.zeros((2, 32, 48, 3), np.uint8)
    a = rng.randint(0, 256, (16, 24, 3), np.uint8)
    b = rng.randint(0, 256, (32, 48, 3), np.uint8)
    canvas[0, :16, :24] = a
    canvas[1] = b
    scale = np.array([[2.0, 2.0], [1.0, 1.0]], np.float32)
    out = np.asarray(resize_bilinear_batch(jnp.array(canvas), jnp.array(scale)))
    pil_a = (
        np.asarray(Image.fromarray(a).resize((48, 32), Image.BILINEAR)).astype(
            np.float32
        )
        / 255.0
    )
    assert np.abs(out[0] - pil_a).max() <= 3.0 / 255.0
    assert np.abs(out[1] - b.astype(np.float32) / 255.0).max() <= 2.0 / 255.0


@pytest.fixture(scope="module")
def kitti_tree():
    with tempfile.TemporaryDirectory() as root:
        synthetic.write_kitti_tree(
            root, num_frames=2, n_ground=512, n_obj=64, val_frames=(1,)
        )
        yield root


def test_load_sample_device_resize_path(kitti_tree):
    # production cars canvas (384x1248) >= synthetic raw (375x1242):
    # load_sample must take the padded-raw path and record the scale
    cfg = cars_pyramid_config()
    ds = KittiDataset(
        dataclasses.replace(cfg.dataset, root=kitti_tree, split="val"),
        cfg.model,
        AreaExtents(),
    )
    s = ds.load_sample(ds.sample_ids[0])
    assert s.image.shape == (384, 1248, 3)
    assert np.allclose(s.image_scale, [384 / 375, 1248 / 1242])
    # raw content top-left, zero padding beyond
    assert s.image[375:].max() == 0 and s.image[:, 1242:].max() == 0
    assert s.image[:375, :1242].max() > 0
    # P2 is canvas-scaled exactly as the host-resize path scales it
    raw = np.asarray(
        Image.open(
            os.path.join(kitti_tree, "object", "training", "image_2",
                         ds.sample_ids[0] + ".png")
        )
        if os.path.exists(os.path.join(kitti_tree, "object"))
        else Image.open(
            os.path.join(kitti_tree, "training", "image_2",
                         ds.sample_ids[0] + ".png")
        )
    )
    assert raw.shape[:2] == (375, 1242)
    # device resize of the loaded sample matches PIL resize of the raw
    out = np.asarray(
        resize_bilinear_batch(
            jnp.array(s.image[None]), jnp.array(s.image_scale[None])
        )
    )[0]
    pil = (
        np.asarray(
            Image.fromarray(raw).resize((1248, 384), Image.BILINEAR)
        ).astype(np.float32)
        / 255.0
    )
    assert np.abs(out - pil).max() <= 3.0 / 255.0


def test_load_sample_fallback_when_raw_exceeds_canvas(kitti_tree):
    # unittest canvas (48x160) < raw (375x1242): host-resize fallback with
    # identity scale — the graph's resize then passes the image through
    cfg = unittest_config(dataset_root=kitti_tree)
    ds = KittiDataset(
        dataclasses.replace(cfg.dataset, split="val"), cfg.model, AreaExtents()
    )
    s = ds.load_sample(ds.sample_ids[0])
    assert s.image.shape == (48, 160, 3)
    assert np.allclose(s.image_scale, [1.0, 1.0])
    assert len(s.as_arrays()) == HostSample.NUM_ARRAYS
