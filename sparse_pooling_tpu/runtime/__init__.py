from sparse_pooling_tpu.runtime import checkpoint, evaluator, metrics, predictions, summary, trainer

__all__ = ["checkpoint", "evaluator", "metrics", "predictions", "summary", "trainer"]
