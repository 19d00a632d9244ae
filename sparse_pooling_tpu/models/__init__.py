from sparse_pooling_tpu.models import backbone, detector, fusion, fusion_rcnn, loss, pipeline
from sparse_pooling_tpu.models.detector import (
    SparsePoolingDetector,
    decode_detections,
    decode_detections_single,
)
from sparse_pooling_tpu.models.pipeline import RawSample, forward_batch, make_model

__all__ = [
    "backbone",
    "fusion_rcnn",
    "detector",
    "fusion",
    "loss",
    "pipeline",
    "SparsePoolingDetector",
    "decode_detections",
    "RawSample",
    "forward_batch",
    "make_model",
]
