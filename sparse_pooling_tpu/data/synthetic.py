"""Deterministic synthetic mini-KITTI fixture generator.

The reference vendors a handful of real KITTI frames
(``avod/tests/datasets/Kitti/object/``) so dataset/pipeline tests run
hermetically. No KITTI data exists in this environment, so this module
*generates* a miniature KITTI object tree — ``calib/ velodyne/ image_2/
label_2/ planes/`` plus split files — with fully deterministic scenes:
a ground plane of LiDAR points plus box-shaped car/pedestrian point clusters
that project consistently into a synthetic camera. The same generator feeds
the unit tests and ``bench.py``.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np

# Canonical KITTI left-color camera intrinsics/extrinsics (typical values).
KITTI_IMAGE_HW = (375, 1242)
_P2 = np.array(
    [
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ]
)
_R0 = np.eye(3)
# velodyne frame: x forward, y left, z up  ->  cam frame: x right, y down, z forward
_TR_VELO = np.array(
    [
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, -1.0, -0.08],
        [1.0, 0.0, 0.0, -0.27],
    ]
)
_PLANE = (0.0, -1.0, 0.0, 1.65)  # flat road 1.65 m below the camera


def _box_points(rng, x, y, z, l, w, h, ry, n):
    """Sample LiDAR-ish points on the visible surfaces of a 3D box (cam frame).

    (x, y, z) is the bottom-center (KITTI convention); returns (n, 3).
    """

    face = rng.randint(0, 3, size=n)
    u = rng.uniform(-0.5, 0.5, size=n)
    v = rng.uniform(-0.5, 0.5, size=n)
    px = np.where(face == 0, np.sign(u) * 0.5, u) * l
    pz = np.where(face == 1, np.sign(v) * 0.5, v) * w
    py = np.where(face == 2, -rng.uniform(0.6, 1.0, size=n), -rng.uniform(0.0, 1.0, size=n)) * h
    c, s = np.cos(ry), np.sin(ry)
    rx = c * px + s * pz
    rz = -s * px + c * pz
    return np.stack([x + rx, y + py, z + rz], axis=1)


def _cam_to_velo(points_cam: np.ndarray) -> np.ndarray:
    tr = np.eye(4)
    tr[:3] = _TR_VELO
    inv = np.linalg.inv(tr)
    xyz1 = np.concatenate([points_cam, np.ones((points_cam.shape[0], 1))], axis=1)
    return (xyz1 @ inv.T)[:, :3]


def _project(points_cam: np.ndarray) -> np.ndarray:
    xyz1 = np.concatenate([points_cam, np.ones((points_cam.shape[0], 1))], axis=1)
    uvw = xyz1 @ _P2.T
    return uvw[:, :2] / uvw[:, 2:3]


def _scene_objects(rng, idx: int, scene: str = "cars") -> List[dict]:
    objs = []
    if scene == "people":
        # pedestrian/cyclist street scene (for the people-preset proof):
        # small objects, nearer ranges (they carry few LiDAR points far out)
        for _ in range(2 + idx % 3):
            z = rng.uniform(5.0, 30.0)
            x_max = max(0.5, min(8.0, 0.4 * z - 1.0))
            objs.append(
                dict(
                    type="Pedestrian",
                    l=rng.uniform(0.6, 1.0), w=rng.uniform(0.5, 0.8),
                    h=rng.uniform(1.6, 1.9),
                    x=rng.uniform(-x_max, x_max), z=z,
                    ry=rng.uniform(-np.pi, np.pi),
                )
            )
        for _ in range(1 + idx % 2):
            z = rng.uniform(6.0, 35.0)
            x_max = max(0.5, min(10.0, 0.4 * z - 1.5))
            objs.append(
                dict(
                    type="Cyclist",
                    l=rng.uniform(1.5, 2.0), w=rng.uniform(0.4, 0.8),
                    h=rng.uniform(1.6, 1.8),
                    x=rng.uniform(-x_max, x_max), z=z,
                    ry=rng.uniform(-np.pi, np.pi),
                )
            )
        return objs
    n_cars = 2 + idx % 3
    for _ in range(n_cars):
        z = rng.uniform(8.0, 45.0)
        # keep the whole object inside the camera frustum (half-FOV ~ 0.4 z)
        x_max = min(12.0, 0.4 * z - 2.5)
        objs.append(
            dict(
                type="Car",
                l=rng.uniform(3.4, 4.4), w=rng.uniform(1.5, 1.8), h=rng.uniform(1.4, 1.7),
                x=rng.uniform(-x_max, x_max), z=z,
                ry=rng.uniform(-np.pi, np.pi),
            )
        )
    if idx % 2 == 0:
        z = rng.uniform(6.0, 25.0)
        x_max = min(8.0, 0.4 * z - 1.0)
        objs.append(
            dict(
                type="Pedestrian",
                l=rng.uniform(0.6, 1.0), w=rng.uniform(0.5, 0.8), h=rng.uniform(1.6, 1.9),
                x=rng.uniform(-x_max, x_max), z=z,
                ry=rng.uniform(-np.pi, np.pi),
            )
        )
    return objs


def make_frame(idx: int, n_ground: int = 16384, n_obj: int = 1024, scene: str = "cars"):
    """Deterministic scene -> (velo (N,4) f32, labels list, image (H,W,3) u8)."""

    rng = np.random.RandomState(1000 + idx)
    # ground: uniform over the camera-visible road
    gx = rng.uniform(-30.0, 30.0, size=n_ground)
    gz = rng.uniform(2.0, 68.0, size=n_ground)
    gy = np.full_like(gx, 1.65) + rng.normal(0, 0.02, size=n_ground)
    pts = [np.stack([gx, gy, gz], axis=1)]

    labels = []
    for ob in _scene_objects(rng, idx, scene):
        y = 1.65  # on the road
        pts.append(_box_points(rng, ob["x"], y, ob["z"], ob["l"], ob["w"], ob["h"], ob["ry"], n_obj))
        corners_uv = _project(
            _box_points(np.random.RandomState(0), ob["x"], y, ob["z"], ob["l"], ob["w"], ob["h"], ob["ry"], 64)
        )
        u1, v1 = corners_uv.min(axis=0)
        u2, v2 = corners_uv.max(axis=0)
        h_img, w_img = KITTI_IMAGE_HW
        u1, u2 = np.clip([u1, u2], 0, w_img - 1)
        v1, v2 = np.clip([v1, v2], 0, h_img - 1)
        alpha = ob["ry"] - np.arctan2(ob["x"], ob["z"])
        labels.append(
            (ob["type"], 0.0, 0, alpha, u1, v1, u2, v2, ob["h"], ob["w"], ob["l"], ob["x"], y, ob["z"], ob["ry"])
        )

    pts_cam = np.concatenate(pts, axis=0)
    # keep only camera-visible points (KITTI lidar covers the front)
    vis = pts_cam[:, 2] > 1.0
    pts_cam = pts_cam[vis]
    velo = np.concatenate(
        [_cam_to_velo(pts_cam), rng.uniform(0, 1, size=(pts_cam.shape[0], 1))], axis=1
    ).astype(np.float32)

    # image: smooth gradient + per-object bright rectangles (content is
    # irrelevant to the geometry tests; it just exercises the image branch)
    h_img, w_img = KITTI_IMAGE_HW
    yy, xx = np.mgrid[0:h_img, 0:w_img]
    img = np.stack(
        [
            (xx * 255 // w_img),
            (yy * 255 // h_img),
            ((xx + yy) * 255 // (w_img + h_img)),
        ],
        axis=-1,
    ).astype(np.uint8)
    for lb in labels:
        u1, v1, u2, v2 = (int(lb[4]), int(lb[5]), int(lb[6]), int(lb[7]))
        img[v1 : v2 + 1, u1 : u2 + 1] = (200, 80, 40)
    return velo, labels, img


def write_kitti_tree(root: str, num_frames: int = 4, n_ground: int = 16384, n_obj: int = 1024, val_frames: Sequence[int] = (2, 3), scene: str = "cars") -> None:
    """Write a mini KITTI object tree under ``root`` (training/ layout).

    ``scene``: 'cars' (default; car scenes with the odd pedestrian) or
    'people' (pedestrian + cyclist street scenes for the people preset).
    """

    from PIL import Image

    base = os.path.join(root, "training")
    for d in ("calib", "velodyne", "image_2", "label_2", "planes"):
        os.makedirs(os.path.join(base, d), exist_ok=True)

    calib_txt = (
        "P0: " + " ".join(f"{v:.12e}" for v in _P2.reshape(-1)) + "\n"
        "P1: " + " ".join(f"{v:.12e}" for v in _P2.reshape(-1)) + "\n"
        "P2: " + " ".join(f"{v:.12e}" for v in _P2.reshape(-1)) + "\n"
        "P3: " + " ".join(f"{v:.12e}" for v in _P2.reshape(-1)) + "\n"
        "R0_rect: " + " ".join(f"{v:.12e}" for v in _R0.reshape(-1)) + "\n"
        "Tr_velo_to_cam: " + " ".join(f"{v:.12e}" for v in _TR_VELO.reshape(-1)) + "\n"
        "Tr_imu_to_velo: " + " ".join(f"{v:.12e}" for v in _TR_VELO.reshape(-1)) + "\n"
    )
    plane_txt = "# Plane\nWidth 4\nHeight 1\n" + " ".join(f"{v:.6e}" for v in _PLANE) + "\n"

    ids = []
    for i in range(num_frames):
        sid = f"{i:06d}"
        ids.append(sid)
        velo, labels, img = make_frame(i, n_ground=n_ground, n_obj=n_obj, scene=scene)
        velo.tofile(os.path.join(base, "velodyne", sid + ".bin"))
        with open(os.path.join(base, "calib", sid + ".txt"), "w") as f:
            f.write(calib_txt)
        with open(os.path.join(base, "planes", sid + ".txt"), "w") as f:
            f.write(plane_txt)
        with open(os.path.join(base, "label_2", sid + ".txt"), "w") as f:
            for lb in labels:
                f.write(
                    f"{lb[0]} {lb[1]:.2f} {lb[2]} " + " ".join(f"{v:.6f}" for v in lb[3:]) + "\n"
                )
        Image.fromarray(img).save(os.path.join(base, "image_2", sid + ".png"))

    train_ids = [s for i, s in enumerate(ids) if i not in val_frames]
    val_ids = [s for i, s in enumerate(ids) if i in val_frames]
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(train_ids) + "\n")
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(val_ids) + "\n")
    with open(os.path.join(root, "trainval.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
