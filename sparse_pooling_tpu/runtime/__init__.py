from sparse_pooling_tpu.runtime import (
    checkpoint,
    evaluator,
    metrics,
    predictions,
    preprocess,
    profiling,
    summary,
    trainer,
)

__all__ = [
    "checkpoint",
    "evaluator",
    "metrics",
    "predictions",
    "preprocess",
    "profiling",
    "summary",
    "trainer",
]
