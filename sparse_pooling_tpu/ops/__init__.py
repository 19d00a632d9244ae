from sparse_pooling_tpu.ops import bev_device, pallas_sparse_pool, sparse_pool

__all__ = ["bev_device", "pallas_sparse_pool", "sparse_pool"]
