"""Visualization utilities (host, PIL).

Capability parity with ``wavedata/tools/visualization/vis_utils.py`` and the
drawing helpers behind ``demos/show_predictions_2d.py``: draw 2D bounding
boxes and projected 3D wireframes on camera images, and render BEV maps with
box footprints. PIL-based (matplotlib-free) so it runs headless.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from sparse_pooling_tpu.configs.config import AreaExtents
from sparse_pooling_tpu.data.calib import project_to_image
from sparse_pooling_tpu.data.labels import ObjectLabel
from sparse_pooling_tpu.ops import encoders

CLASS_COLORS = {
    "Car": (60, 200, 90),
    "Pedestrian": (250, 180, 50),
    "Cyclist": (90, 130, 250),
    "gt": (240, 70, 70),
}
# 3D wireframe edges over the box_3d_to_corners ordering (bottom 0-3, top 4-7)
_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def draw_boxes_2d(image: np.ndarray, labels: Sequence[ObjectLabel], color_key: Optional[str] = None, width: int = 2) -> np.ndarray:
    """Draw axis-aligned 2D boxes (+score text) on a uint8 image copy."""

    from PIL import Image, ImageDraw

    img = Image.fromarray(image.copy())
    draw = ImageDraw.Draw(img)
    for ob in labels:
        color = CLASS_COLORS.get(color_key or ob.type, (255, 255, 255))
        draw.rectangle([ob.x1, ob.y1, ob.x2, ob.y2], outline=color, width=width)
        if ob.score < 1.0:
            draw.text((ob.x1 + 2, max(ob.y1 - 12, 0)), f"{ob.score:.2f}", fill=color)
    return np.asarray(img)


def draw_boxes_3d(
    image: np.ndarray,
    labels: Sequence[ObjectLabel],
    p2: np.ndarray,
    color_key: Optional[str] = None,
    width: int = 2,
) -> np.ndarray:
    """Draw projected 3D wireframes on a uint8 image copy."""

    from PIL import Image, ImageDraw

    img = Image.fromarray(image.copy())
    draw = ImageDraw.Draw(img)
    h_img, w_img = image.shape[:2]
    for ob in labels:
        color = CLASS_COLORS.get(color_key or ob.type, (255, 255, 255))
        corners = np.asarray(encoders.box_3d_to_corners(ob.box_3d()[None]))[0]
        if (corners[:, 2] <= 0.1).any():
            continue
        uv = project_to_image(corners, p2)
        if not np.isfinite(uv).all():
            continue
        for a, b in _BOX_EDGES:
            draw.line(
                [tuple(uv[a]), tuple(uv[b])], fill=color, width=width
            )
    return np.asarray(img)


def render_bev(
    bev_maps: np.ndarray,
    boxes_3d: Optional[np.ndarray] = None,
    gt_boxes_3d: Optional[np.ndarray] = None,
    extents: AreaExtents = AreaExtents(),
    voxel_size: float = 0.1,
) -> np.ndarray:
    """Render the BEV density channel with box footprints -> uint8 RGB.

    Row 0 (z_min) is drawn at the BOTTOM (ego at the bottom of the image).
    """

    from PIL import Image, ImageDraw

    density = bev_maps[..., -1]
    h, w = density.shape
    base = (np.clip(density, 0, 1) * 255).astype(np.uint8)
    img = Image.fromarray(np.stack([base] * 3, axis=-1))
    draw = ImageDraw.Draw(img)

    def footprint_px(box):
        corners = np.asarray(encoders.box_3d_to_corners(np.asarray(box)[None]))[0][:4]
        cols = (corners[:, 0] - extents.x_min) / voxel_size
        rows = (corners[:, 2] - extents.z_min) / voxel_size
        return list(zip(cols.tolist(), rows.tolist()))

    if gt_boxes_3d is not None:
        for box in np.asarray(gt_boxes_3d):
            draw.polygon(footprint_px(box), outline=CLASS_COLORS["gt"])
    if boxes_3d is not None:
        for box in np.asarray(boxes_3d):
            draw.polygon(footprint_px(box), outline=CLASS_COLORS["Car"])
    return np.asarray(img)[::-1]  # flip so z grows upward
