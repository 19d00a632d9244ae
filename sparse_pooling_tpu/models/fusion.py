"""SHPL fusion layer (graph side) — the novel op wired into the backbone.

Capability parity with the reference's fusion feature extractor (fork code,
``feature_extractors/fusion_vgg_pyramid.py``-style): sparse-pool the other
branch's mid features onto this branch's lattice, concatenate with the
native features, and mix with a 1x1 conv + ReLU
(``tf.sparse_tensor_dense_matmul`` -> concat -> conv in the reference,
SURVEY.md §4.5).

Batch-native: operates on [B, H, W, C] maps with batched COO (the pooling
flattens the batch into one segment-sum — see
``ops.sparse_pool.sparse_pool_coo_batch``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sparse_pooling_tpu.ops.sparse_build import DeviceCoo
from sparse_pooling_tpu.ops.sparse_pool import sparse_pool_patch_major_batch


class SparsePoolFusion(nn.Module):
    """Fuse source-view features into the target view's lattice.

    ``pool_channels`` > 0 bottlenecks the source features with a learned
    1x1 conv before pooling: the pooling cost is linear in channel width
    (gather + scatter of every nonzero), and a 256->64 projection keeps
    the fusion information flowing at 1/4 the HBM traffic. 0 pools the
    full source width (the reference's semantics).
    """

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    pool_channels: int = 0
    accum_dtype: str = "float32"  # SparsePoolConfig.accum_dtype

    @nn.compact
    def __call__(self, native: jnp.ndarray, source: jnp.ndarray, coo: DeviceCoo):
        """native [B, Ht, Wt, C], source [B, Hs, Ws, C], coo point-major
        ([B, P] rows, [B, P, 4] cols/vals) -> fused [B, Ht, Wt, out].

        The bilinear weights stay fp32 and the tap-combine accumulates
        fp32 (bf16 weights lose too much); features are gathered in the
        compute dtype to halve the pooling's HBM traffic.
        """

        b = native.shape[0]
        ht, wt = coo.target_hw
        hs, ws = coo.source_hw
        src = source.astype(self.dtype)
        if self.pool_channels and source.shape[-1] > self.pool_channels:
            src = nn.Conv(
                self.pool_channels, (1, 1), dtype=self.dtype, name="pool_proj"
            )(src)
        # 2x2-window patch-gather pooling (one gather descriptor per point
        # instead of 4). Was NEUTRAL at the 32k point cap (18.35 vs 18.17
        # ms/batch-8, entry-bound); after round-3 point bucketing dropped
        # bench batches to the 16k bucket the balance flipped — 4.80 vs
        # 6.12 ms/batch (tools/profile_shpl_variants.py). Valid because
        # the device builder emits corner order [v0u0, v0u1, v1u0, v1u1];
        # the flat point-major form stays available for generic COO.
        pooled = sparse_pool_patch_major_batch(
            src, coo.rows, coo.cols, coo.vals, num_targets=ht * wt,
            divide_by_weight_sum=coo.defer_row_norm,
            accum_dtype=self.accum_dtype,
        )
        pooled_map = pooled.reshape(b, ht, wt, -1).astype(self.dtype)
        x = jnp.concatenate([native.astype(self.dtype), pooled_map], axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="mix1x1")(x)
        return nn.relu(x)
