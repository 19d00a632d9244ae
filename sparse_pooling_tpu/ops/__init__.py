from sparse_pooling_tpu.ops import (
    anchors,
    bev_device,
    crop_resize,
    encoders,
    iou,
    losses,
    nms,
    pallas_sparse_pool,
    projection,
    sparse_build,
    sparse_pool,
    target_assign,
)

__all__ = [
    "anchors",
    "bev_device",
    "crop_resize",
    "encoders",
    "iou",
    "losses",
    "nms",
    "pallas_sparse_pool",
    "projection",
    "sparse_build",
    "sparse_pool",
    "target_assign",
]
