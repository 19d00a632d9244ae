from sparse_pooling_tpu.demos import vis_utils

__all__ = ["vis_utils"]
