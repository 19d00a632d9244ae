"""Native C++ KITTI AP evaluator: bit-parity with the numpy oracle."""

import os
import subprocess

import numpy as np
import pytest

from sparse_pooling_tpu.data.labels import ObjectLabel, write_labels
from sparse_pooling_tpu.native import kitti_eval as K
from sparse_pooling_tpu.runtime import metrics as M

pytestmark = pytest.mark.skipif(
    not K.available(), reason="C++ toolchain / libkitti_eval.so unavailable"
)


@pytest.fixture(scope="module")
def label_dirs(tmp_path_factory):
    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp("apdirs")
    gt_dir = d / "gt"
    det_dir = d / "det"
    gt_dir.mkdir()
    det_dir.mkdir()
    classes = ["Car", "Pedestrian", "Cyclist", "Van", "DontCare"]
    for i in range(15):
        gts, dets = [], []
        for _ in range(rng.randint(0, 8)):
            cls = classes[rng.randint(0, len(classes))]
            x, z = rng.uniform(-20, 20), rng.uniform(5, 60)
            l, w, h = rng.uniform(1, 4.5), rng.uniform(0.5, 2), rng.uniform(1, 2)
            ry = rng.uniform(-np.pi, np.pi)
            y1 = rng.uniform(80, 200)
            y2 = y1 + rng.uniform(15, 120)
            x1 = rng.uniform(0, 1000)
            x2 = x1 + rng.uniform(20, 200)
            alpha = float(rng.uniform(-np.pi, np.pi))
            gts.append(
                ObjectLabel(
                    cls, float(rng.uniform(0, 0.6)), int(rng.randint(0, 3)),
                    alpha, x1, y1, x2, y2, h, w, l, (x, 1.65, z), ry,
                )
            )
            if rng.rand() < 0.8:
                n = rng.normal(0, 0.3, 3)
                det_cls = (
                    "Car" if cls in ("Car", "Van")
                    else "Pedestrian" if cls in ("Pedestrian", "Person_sitting")
                    else "Cyclist"
                )
                dets.append(
                    ObjectLabel(
                        det_cls, 0, 0, alpha + float(rng.normal(0, 0.5)),
                        x1 + rng.normal(0, 5), y1 + rng.normal(0, 5),
                        x2 + rng.normal(0, 5), y2 + rng.normal(0, 5),
                        h + n[0] * 0.1, w + n[1] * 0.1, l + n[2] * 0.1,
                        (x + n[0], 1.65, z + n[2]), ry + rng.normal(0, 0.1),
                        score=float(rng.rand()),
                    )
                )
        sid = f"{i:06d}"
        write_labels(str(gt_dir / f"{sid}.txt"), gts)
        write_labels(str(det_dir / f"{sid}.txt"), dets)
    return str(gt_dir), str(det_dir)


@pytest.mark.parametrize("n_points", [11, 40])
def test_cpp_matches_numpy_oracle(label_dirs, n_points):
    gt_dir, det_dir = label_dirs
    classes = ["Car", "Pedestrian", "Cyclist"]
    py = M.evaluate_dirs(gt_dir, det_dir, classes, n_points)
    cc = K.evaluate_dirs(gt_dir, det_dir, classes, n_points)
    for cls in classes:
        for metric in ("2d", "bev", "3d", "aos"):
            for diff in ("easy", "moderate", "hard"):
                assert cc[cls][metric][diff] == pytest.approx(
                    py[cls][metric][diff], abs=1e-12
                ), (cls, metric, diff)
            # AOS is similarity-weighted 2D AP, so it can never exceed it
            assert cc[cls]["aos"][diff] <= cc[cls]["2d"][diff] + 1e-12


def test_cli_binary(label_dirs):
    gt_dir, det_dir = label_dirs
    binary = os.path.join(
        os.path.dirname(K.__file__), "kitti_eval", "evaluate_object_3d"
    )
    out = subprocess.run(
        [binary, gt_dir, det_dir, "Car"], capture_output=True, text=True
    )
    assert out.returncode == 0
    assert "Car AP_3d:" in out.stdout
    assert "Car AP_aos:" in out.stdout
    assert "evaluated 15 frames" in out.stdout
