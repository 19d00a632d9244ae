"""Golden tests against TensorFlow's actual ops.

The reference consumes ``tf.image.crop_and_resize`` and
``tf.image.non_max_suppression`` directly (rpn_model/avod_model, SURVEY.md
§3.5); our TPU-native replacements claim TF semantics. These tests anchor
that claim to the REAL TF kernels (TF 2.21 CPU is installed in this
environment) instead of to our own numpy oracles.

Documented deliberate divergence: for boxes that leave [0, 1], TF fills
out-of-range samples with ``extrapolation_value`` (0) while we CLAMP to the
edge; the detector always clips projected boxes into range before cropping,
so only in-range boxes are asserted here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from sparse_pooling_tpu.ops import crop_resize, nms


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _random_boxes(r, n):
    """In-range normalized [y1, x1, y2, x2] with y1<=y2, x1<=x2."""

    lo = r.rand(n, 2) * 0.8
    hi = lo + r.rand(n, 2) * (1.0 - lo)
    return np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], axis=1).astype(
        np.float32
    )


@pytest.mark.parametrize("crop_hw", [(3, 3), (7, 7), (1, 1), (2, 5)])
def test_crop_and_resize_matches_tf(rng, crop_hw):
    img = rng.rand(18, 26, 4).astype(np.float32)
    boxes = _random_boxes(rng, 32)
    want = tf.image.crop_and_resize(
        img[None], boxes, np.zeros(len(boxes), np.int32), crop_hw
    ).numpy()
    got = np.asarray(
        crop_resize.crop_and_resize(jnp.array(img), jnp.array(boxes), crop_hw)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_crop_and_resize_batch_matches_tf(rng):
    imgs = rng.rand(3, 12, 20, 2).astype(np.float32)
    boxes = np.stack([_random_boxes(rng, 16) for _ in range(3)])
    want = tf.image.crop_and_resize(
        imgs,
        boxes.reshape(-1, 4),
        np.repeat(np.arange(3, dtype=np.int32), 16),
        (5, 5),
    ).numpy().reshape(3, 16, 5, 5, 2)
    got = np.asarray(
        crop_resize.crop_and_resize_batch(jnp.array(imgs), jnp.array(boxes), (5, 5))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_selection_matches_tf(rng):
    """Greedy selection ORDER must match tf.image.non_max_suppression."""

    for trial in range(5):
        r = np.random.RandomState(100 + trial)
        n = 64
        centers = r.rand(n, 2) * 10
        sizes = 0.5 + r.rand(n, 2) * 3
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1)
        boxes = boxes[:, [0, 1, 2, 3]].astype(np.float32)
        # distinct scores so tie-breaking conventions can't differ
        scores = r.permutation(n).astype(np.float32) / n
        for thresh in (0.3, 0.5, 0.8):
            want = tf.image.non_max_suppression(
                boxes, scores, max_output_size=16, iou_threshold=thresh
            ).numpy()
            res = nms.nms(jnp.array(boxes), jnp.array(scores), 16, thresh)
            got = np.asarray(res.indices)[np.asarray(res.valid)]
            np.testing.assert_array_equal(got, want)


def test_nms_iou_boundary_matches_tf():
    """Boxes at exactly the IoU threshold: TF suppresses only iou > thresh
    (strict), same as ours."""

    # two unit boxes with IoU exactly 1/3
    boxes = np.array([[0, 0, 1, 1], [0, 0.5, 1, 1.5]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    want = tf.image.non_max_suppression(
        boxes, scores, max_output_size=2, iou_threshold=1.0 / 3.0
    ).numpy()
    res = nms.nms(jnp.array(boxes), jnp.array(scores), 2, 1.0 / 3.0)
    got = np.asarray(res.indices)[np.asarray(res.valid)]
    np.testing.assert_array_equal(got, want)
