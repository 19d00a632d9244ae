"""Device-side SHPL sparse-correspondence construction.

The reference builds its per-frame ``tf.SparseTensor`` on the HOST in numpy
(fork code in ``kitti_utils`` / ``sparse_pool_utils``) and uploads it through
``feed_dict`` every step — one of the reasons it is host-bound. Measurement
on this TPU (tunneled transport, ~0.3 GB/s host->device) makes that design
untenable: the padded COO pair alone is ~3 MB/frame (~10 ms of transfer).

TPU-first redesign: the correspondence is built INSIDE the compiled graph
from the raw inputs the device needs anyway — padded points [P, 3], the
calibration row block P2 [3, 4], and static lattice geometry. Per-frame
host->device traffic drops to points + image (~1 MB), and the projection /
bilinear math rides the VPU. The host builder
(``data.sparse_matrix.build_sparse_pooling_input``) remains the parity
oracle; tests compare pooled outputs to <=1e-3.

Unlike the host builder, no dedup/sort is performed (duplicate (t, s)
entries sum identically in segment-sum; sortedness is not assumed here), and
row normalization is DEFERRED into the pooling op itself (the pooled output
is divided by the pooled weight sum — exact by linearity; see
``DeviceCoo.defer_row_norm``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from sparse_pooling_tpu.configs.config import (
    AreaExtents,
    BevConfig,
    ImageConfig,
    SparsePoolConfig,
)


@flax.struct.dataclass
class DeviceCoo:
    """One pooling direction on device, POINT-MAJOR: each point carries its
    4 bilinear source taps inline. Invalid points carry weight 0.

    Point-major (vs a flat 4P-entry COO) lets the pooling pre-combine the
    4 taps per point before the scatter — 4x less segment-sum traffic
    (measured 16.6 vs 26.1 ms/batch at production shapes,
    tools/profile_micro.py). ``flat()`` expands to the flat COO layout for
    generic consumers/tests. The lattice shapes are static metadata (pytree
    aux data), so they stay concrete Python ints under jit/vmap.
    """

    rows: jnp.ndarray  # [..., P] int32 target linear index per point
    cols: jnp.ndarray  # [..., P, 4] int32 source linear indices
    vals: jnp.ndarray  # [..., P, 4] f32 weights (see defer_row_norm)
    target_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    source_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    # True: vals are RAW bilinear weights and the consumer must divide the
    # pooled output by the pooled weight sum (division is linear in the
    # row, so deferring it into the pooling's own segment-sum as an extra
    # ones-like channel is exact — and removes the builder's normalize
    # segment-sums + 262k-descriptor denominator gathers from the hot
    # path). False: vals are final (pre-normalized, or normalization off).
    defer_row_norm: bool = flax.struct.field(pytree_node=False, default=False)

    def flat(self):
        """Expand to flat COO (rows4 [..., 4P], cols4, vals4)."""

        k = self.cols.shape[-1]
        lead = self.cols.shape[:-2]
        rows = jnp.repeat(self.rows, k, axis=-1)
        return (
            rows,
            self.cols.reshape(*lead, -1),
            self.vals.reshape(*lead, -1),
        )


def _bilinear_expand(target_idx, src_u, src_v, valid, source_hw):
    """Each (target, continuous source) pair -> 4 POINT-MAJOR taps:
    rows [..., P], cols [..., P, 4], weights [..., P, 4]."""

    sh, sw = source_hw
    u = jnp.clip(src_u, 0.0, sw - 1.0)
    v = jnp.clip(src_v, 0.0, sh - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, max(sw - 2, 0))
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, max(sh - 2, 0))
    du = u - u0
    dv = v - v0
    u1 = jnp.minimum(u0 + 1, sw - 1)
    v1 = jnp.minimum(v0 + 1, sh - 1)

    cols = jnp.stack(
        [v0 * sw + u0, v0 * sw + u1, v1 * sw + u0, v1 * sw + u1], axis=-1
    )
    w = jnp.stack(
        [(1 - dv) * (1 - du), (1 - dv) * du, dv * (1 - du), dv * du], axis=-1
    )
    w = jnp.where(valid[..., None], w, 0.0)
    return target_idx, cols, w.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("extents", "bev_cfg", "img_cfg", "sp_cfg")
)
def build_coo_device(
    points: jnp.ndarray,  # [..., P, 3] f32 camera-frame, zero-padded
    mask: jnp.ndarray,  # [..., P] bool
    p2: jnp.ndarray,  # [..., 3, 4] f32 projection matrix (canvas scaled)
    extents: AreaExtents,
    bev_cfg: BevConfig,
    img_cfg: ImageConfig,
    sp_cfg: SparsePoolConfig,
) -> Tuple[DeviceCoo, DeviceCoo]:
    """Per-frame SHPL correspondence, both directions, fully on device.

    ``p2`` must already map onto the fixed network canvas (the host dataset
    scales the raw calibration by the image resize factors).
    Semantics match ``data.sparse_matrix.build_sparse_pooling_input``.

    Rank-polymorphic: leading batch dims flow through elementwise; there is
    no scatter here at all — row normalization rides the pooling op's own
    segment-sum (``DeviceCoo.defer_row_norm``).
    """

    s = float(sp_cfg.fusion_stride)
    bh_f = (bev_cfg.padded_hw(extents)[0]) // sp_cfg.fusion_stride
    bw_f = (bev_cfg.padded_hw(extents)[1]) // sp_cfg.fusion_stride
    ih_f = img_cfg.height // sp_cfg.fusion_stride
    iw_f = img_cfg.width // sp_cfg.fusion_stride

    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    valid = (
        mask
        & (x >= extents.x_min) & (x < extents.x_max)
        & (y >= extents.y_min) & (y < extents.y_max)
        & (z >= extents.z_min) & (z < extents.z_max)
    )

    # continuous BEV fusion-lattice coords
    bev_c = (x - extents.x_min) / bev_cfg.voxel_size / s
    bev_r = (z - extents.z_min) / bev_cfg.voxel_size / s

    # continuous FV fusion-lattice coords via P2 (guard the divide).
    # NB: expanded elementwise, NOT via matmul — JAX's default matmul
    # precision on TPU is bf16-accumulate, which costs ~0.01 px here and
    # breaks the <=1e-3 parity bar. Elementwise ops stay true fp32 on the VPU.
    def pij(i, j):
        return p2[..., i, j][..., None]  # broadcast over [..., P]

    u_n = pij(0, 0) * x + pij(0, 1) * y + pij(0, 2) * z + pij(0, 3)
    v_n = pij(1, 0) * x + pij(1, 1) * y + pij(1, 2) * z + pij(1, 3)
    depth = pij(2, 0) * x + pij(2, 1) * y + pij(2, 2) * z + pij(2, 3)
    valid = valid & (depth > 1e-3)
    safe_depth = jnp.where(depth > 1e-3, depth, 1.0)
    fv_u = u_n / safe_depth / s
    fv_v = v_n / safe_depth / s
    # points must land on the canvas (frustum filter, device side)
    valid = valid & (fv_u >= 0) & (fv_u <= iw_f - 1) & (fv_v >= 0) & (fv_v <= ih_f - 1)

    t_bev = (
        jnp.clip(bev_r.astype(jnp.int32), 0, bh_f - 1) * bw_f
        + jnp.clip(bev_c.astype(jnp.int32), 0, bw_f - 1)
    )
    t_fv = (
        jnp.clip(fv_v.astype(jnp.int32), 0, ih_f - 1) * iw_f
        + jnp.clip(fv_u.astype(jnp.int32), 0, iw_f - 1)
    )

    rows_b, cols_b, w_b = _bilinear_expand(t_bev, fv_u, fv_v, valid, (ih_f, iw_f))
    rows_f, cols_f, w_f = _bilinear_expand(t_fv, bev_c, bev_r, valid, (bh_f, bw_f))

    # normalization is DEFERRED into the pooling op (defer_row_norm): the
    # eager form (_normalize_rows) cost two segment-sums plus two
    # 262k-descriptor denominator gathers per frame pair
    defer = bool(sp_cfg.normalize)
    m_bev = DeviceCoo(
        rows_b, cols_b, w_b, (bh_f, bw_f), (ih_f, iw_f), defer_row_norm=defer
    )
    m_fv = DeviceCoo(
        rows_f, cols_f, w_f, (ih_f, iw_f), (bh_f, bw_f), defer_row_norm=defer
    )
    return m_bev, m_fv


def scale_p2_to_canvas(p2, scale_y: float, scale_x: float):
    """Host helper: rescale P2 rows for a resized image canvas."""

    import numpy as np

    out = np.array(p2, dtype=np.float32).copy()
    out[0] *= scale_x
    out[1] *= scale_y
    return out
