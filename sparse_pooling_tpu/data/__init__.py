from sparse_pooling_tpu.data import (
    augmentation,
    bev,
    calib,
    integral_image,
    labels,
    pointcloud,
    sparse_matrix,
    synthetic,
    voxel_grid,
)

__all__ = [
    "augmentation",
    "bev",
    "calib",
    "integral_image",
    "labels",
    "pointcloud",
    "sparse_matrix",
    "synthetic",
    "voxel_grid",
]
