"""SHPL sparse cross-view pooling — device side.

The reference performs ``tf.sparse_tensor_dense_matmul(M, reshape(src, [S, C]))``
(a CUDA sparse-matmul inside the TF graph). TPU-first redesign:

* ``sparse_pool_coo`` — the PRODUCTION path and semantic twin of the
  reference op: gather source rows by COO column, scale by weight,
  sorted-segment-sum into target rows. Exact, and measured ~30 us/frame on
  TPU v5e at the production shapes (NNZ cap 131072) — dispatch-bound, not
  bandwidth-bound.
* ``sparse_pool_ell`` — optional approximation: the host compiles the
  correspondence to a fixed-K ELL table (``data.sparse_matrix``), so the op
  becomes a dense gather + weighted reduction whose host->device transfer is
  ~10x smaller than COO. Rows with more than K contributing sources are
  truncated to the K largest weights and renormalized.
* a Pallas fused kernel lives in ``ops.pallas_sparse_pool``.

All functions take [S, C] source features and return [T, C]; use
``jax.vmap`` for batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def sparse_pool_coo(
    src_feat: jnp.ndarray,  # [S, C]
    rows: jnp.ndarray,  # [N] int32 target row per entry (padding -> weight 0)
    cols: jnp.ndarray,  # [N] int32 source row per entry
    vals: jnp.ndarray,  # [N] f32 weights (0 on padding)
    num_targets: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """COO sparse-dense matmul: out[t] = sum_i vals[i] * src[cols[i]] for rows[i]==t.

    Pass ``indices_are_sorted=True`` ONLY for row-sorted COO (the host
    builder ``data.sparse_matrix`` emits sorted rows with padding at the
    end); the device builder ``ops.sparse_build`` emits rows in point order,
    and lying to XLA about sortedness is implementation-defined on the TPU
    sorted-scatter lowering. Default is the safe unsorted path.
    """

    g = jnp.take(src_feat, cols, axis=0) * vals[:, None]
    return jax.ops.segment_sum(
        g, rows, num_segments=num_targets, indices_are_sorted=indices_are_sorted
    )


def sparse_pool_point_major(
    src_feat: jnp.ndarray,  # [S, C]
    rows: jnp.ndarray,  # [P] int32 target row per point
    cols: jnp.ndarray,  # [P, K] int32 source rows (K bilinear taps)
    vals: jnp.ndarray,  # [P, K] f32 weights (0 on padding)
    num_targets: int,
    indices_are_sorted: bool = False,
    divide_by_weight_sum: bool = False,
) -> jnp.ndarray:
    """Point-major sparse pooling: the K taps of each point are gathered,
    weight-combined on the VPU (fp32), and scattered ONCE — K x less
    segment-sum traffic than the flat COO form (measured 16.6 vs 26.1
    ms/batch at production shapes, tools/profile_micro.py). Gathers run in
    the feature dtype (bf16 in production); the combine accumulates fp32.

    ``divide_by_weight_sum`` performs the deferred row normalization of a
    ``DeviceCoo(defer_row_norm=True)``: the per-point weight sum rides the
    SAME segment-sum as one extra channel and the pooled rows are divided
    by it (exact by linearity; rows with no weight stay 0).
    """

    p, k = cols.shape
    g = jnp.take(src_feat, cols.reshape(-1), axis=0).reshape(p, k, -1)
    g = jnp.sum(g.astype(jnp.float32) * vals[..., None], axis=1)
    if divide_by_weight_sum:
        g = jnp.concatenate([g, vals.sum(axis=-1, keepdims=True)], axis=-1)
    out = jax.ops.segment_sum(
        g, rows, num_segments=num_targets, indices_are_sorted=indices_are_sorted
    )
    if divide_by_weight_sum:
        denom = out[:, -1:]
        out = jnp.where(denom > 1e-12, out[:, :-1] / jnp.maximum(denom, 1e-12), 0.0)
    return out


def sparse_pool_point_major_batch(
    src_feat: jnp.ndarray,  # [B, S, C]
    rows: jnp.ndarray,  # [B, P]
    cols: jnp.ndarray,  # [B, P, K]
    vals: jnp.ndarray,  # [B, P, K]
    num_targets: int,
    divide_by_weight_sum: bool = False,
) -> jnp.ndarray:
    """Batch-native point-major pooling -> [B, T, C] (flat index offsets,
    one gather + one segment-sum — see ``sparse_pool_coo_batch``)."""

    b, s, c = src_feat.shape
    p, k = cols.shape[1:]
    row_off = (jnp.arange(b, dtype=rows.dtype) * num_targets)[:, None]
    col_off = (jnp.arange(b, dtype=cols.dtype) * s)[:, None, None]
    flat = sparse_pool_point_major(
        src_feat.reshape(b * s, c),
        (rows + row_off).reshape(-1),
        (cols + col_off).reshape(-1, k),
        vals.reshape(-1, k),
        num_targets=b * num_targets,
        divide_by_weight_sum=divide_by_weight_sum,
    )
    return flat.reshape(b, num_targets, c)


def pool_device_coo(src_feat: jnp.ndarray, coo, num_targets: int = None):
    """Pool a single-sample ``DeviceCoo`` honoring deferred normalization."""

    t = num_targets or coo.target_hw[0] * coo.target_hw[1]
    return sparse_pool_point_major(
        src_feat, coo.rows, coo.cols, coo.vals, t,
        divide_by_weight_sum=coo.defer_row_norm,
    )


def _gather_point_patches(src_map, cols):
    """[B, Hs, Ws, C] + corner indices [B, P, 4] -> corner values [B, P, 4, C]
    via ONE 2x2-window gather descriptor per point."""

    b, hs, ws, c = src_map.shape
    p = cols.shape[1]
    c00 = cols[..., 0]
    v0 = c00 // ws
    u0 = c00 % ws
    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, p))
    starts = jnp.stack([bidx, v0, u0], axis=-1).reshape(-1, 3)
    patches = jax.lax.gather(
        src_map,
        starts,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, 2 if hs > 1 else 1, 2 if ws > 1 else 1, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )
    if hs == 1:
        patches = jnp.concatenate([patches, patches], axis=1)
    if ws == 1:
        patches = jnp.concatenate([patches, patches], axis=2)
    return patches.reshape(b, p, 4, c)


@functools.cache
def _patch_pool_denom_with_vjp(num_targets: int, accum_dtype: str = "float32"):
    """Patch pooling that ALSO returns the per-target weight sum, fused
    into the SAME segment_sum as channel C+1.

    The deferred-row-norm denominator used to be a separate 1-lane
    segment_sum — but segment scatters are ENTRY-bound, not lane-bound
    (the [B*T, C] accumulator tiles to 128 lanes whether C is 1 or 33),
    so the "cheap" denominator measured ~half the feature scatter: 5.3-5.6
    vs 9.8-10.8 ms/batch-48/direction in the TPU trace (trace_hot_ops,
    2026-08-19). Appending the weight as one extra entry channel makes it
    ride the feature scatter for free. custom_vjp for the same reason as
    ``_patch_pool_with_vjp`` (see below); d/dvals gains the denominator
    cotangent term.
    """

    # accum_dtype "bfloat16" halves the segment-sum accumulator traffic
    # (the [B*T, C+1] scatter accumulator is the pooling's dominant byte
    # stream); per-cell entry counts are small (<= a few dozen points), so
    # the bf16 accumulation error stays ~1e-2 relative — gate via
    # SparsePoolConfig.accum_dtype and certify AP before adopting.
    acc = jnp.dtype(accum_dtype)

    def impl(src_map, rows, cols, vals):
        b, _, _, c = src_map.shape
        patches = _gather_point_patches(src_map, cols)
        g = jnp.sum(patches.astype(acc) * vals[..., None].astype(acc), axis=2)
        wsum = jnp.sum(vals, axis=-1, keepdims=True).astype(acc)
        e = jnp.concatenate([g, wsum], axis=-1)  # [B, P, C+1]
        row_off = (jnp.arange(b, dtype=rows.dtype) * num_targets)[:, None]
        flat = jax.ops.segment_sum(
            e.reshape(-1, c + 1), (rows + row_off).reshape(-1),
            num_segments=b * num_targets,
        ).reshape(b, num_targets, c + 1)
        return flat[..., :c], flat[..., c]

    @jax.custom_vjp
    def pool(src_map, rows, cols, vals):
        return impl(src_map, rows, cols, vals)

    def fwd(src_map, rows, cols, vals):
        return impl(src_map, rows, cols, vals), (src_map, rows, cols, vals)

    def bwd(res, cts):
        import numpy as np

        g, g_den = cts
        src_map, rows, cols, vals = res
        b, hs, ws, c = src_map.shape
        p = rows.shape[1]
        row_off = (jnp.arange(b, dtype=rows.dtype) * num_targets)[:, None]
        rflat = (rows + row_off).reshape(-1)
        gp = jnp.take(
            g.astype(jnp.float32).reshape(b * num_targets, c), rflat, axis=0
        ).reshape(b, p, c)
        gd = jnp.take(
            g_den.astype(jnp.float32).reshape(-1), rflat, axis=0
        ).reshape(b, p, 1)
        entries = (vals[..., None] * gp[:, :, None, :]).reshape(-1, c)
        coff = (jnp.arange(b, dtype=cols.dtype) * (hs * ws))[:, None, None]
        g_src = jax.ops.segment_sum(
            entries, (cols + coff).reshape(-1), num_segments=b * hs * ws
        ).reshape(src_map.shape).astype(src_map.dtype)
        patches = _gather_point_patches(src_map, cols).astype(jnp.float32)
        g_vals = (
            jnp.sum(patches * gp[:, :, None, :], axis=-1) + gd
        ).astype(vals.dtype)
        zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return g_src, zero(rows), zero(cols), g_vals

    pool.defvjp(fwd, bwd)
    return pool


@functools.cache
def _patch_pool_with_vjp(num_targets: int):
    """custom_vjp: XLA's default transpose of the 2x2-window gather is a
    window scatter-add, which the TPU backend SERIALIZES (840+ ms measured,
    tools/profile_bwd_parts.py); the hand-written backward scatters corner
    entries through one segment_sum like the flat path's autodiff did."""

    def impl(src_map, rows, cols, vals):
        b, _, _, c = src_map.shape
        patches = _gather_point_patches(src_map, cols)
        g = jnp.sum(patches.astype(jnp.float32) * vals[..., None], axis=2)
        row_off = (jnp.arange(b, dtype=rows.dtype) * num_targets)[:, None]
        flat = jax.ops.segment_sum(
            g.reshape(-1, c), (rows + row_off).reshape(-1),
            num_segments=b * num_targets,
        )
        return flat.reshape(b, num_targets, c)

    @jax.custom_vjp
    def pool(src_map, rows, cols, vals):
        return impl(src_map, rows, cols, vals)

    def fwd(src_map, rows, cols, vals):
        return impl(src_map, rows, cols, vals), (src_map, rows, cols, vals)

    def bwd(res, g):
        import numpy as np

        src_map, rows, cols, vals = res
        b, hs, ws, c = src_map.shape
        p = rows.shape[1]
        row_off = (jnp.arange(b, dtype=rows.dtype) * num_targets)[:, None]
        gp = jnp.take(
            g.astype(jnp.float32).reshape(b * num_targets, c),
            (rows + row_off).reshape(-1),
            axis=0,
        ).reshape(b, p, c)
        # src grad: corner entries -> one segment_sum over source cells
        entries = (vals[..., None] * gp[:, :, None, :]).reshape(-1, c)
        coff = (jnp.arange(b, dtype=cols.dtype) * (hs * ws))[:, None, None]
        g_src = jax.ops.segment_sum(
            entries, (cols + coff).reshape(-1), num_segments=b * hs * ws
        ).reshape(src_map.shape).astype(src_map.dtype)
        # vals grad: re-gather the corners (cheap) and contract channels
        patches = _gather_point_patches(src_map, cols).astype(jnp.float32)
        g_vals = jnp.sum(patches * gp[:, :, None, :], axis=-1).astype(vals.dtype)
        zero = lambda x: np.zeros(x.shape, jax.dtypes.float0)
        return g_src, zero(rows), zero(cols), g_vals

    pool.defvjp(fwd, bwd)
    return pool


def sparse_pool_patch_major_batch(
    src_map: jnp.ndarray,  # [B, Hs, Ws, C] source feature MAP
    rows: jnp.ndarray,  # [B, P] int32 target row per point
    cols: jnp.ndarray,  # [B, P, 4] int32 bilinear-corner linear indices
    vals: jnp.ndarray,  # [B, P, 4] f32 weights (0 on padding)
    num_targets: int,
    divide_by_weight_sum: bool = False,
    accum_dtype: str = "float32",
) -> jnp.ndarray:
    """Point-major pooling with ONE 2x2-window gather descriptor per point.

    The 4 bilinear taps of a point are the corners of a 2x2 window
    (``ops.sparse_build._bilinear_expand`` emits them clamped so the window
    always fits), and TPU gathers are descriptor-latency-bound — so
    gathering [2, 2, C] windows instead of 4 flat rows cuts the pooling's
    gather descriptors 4x, the same trick as the ROI crops
    (``ops.crop_resize``). Only valid for DEVICE-BUILT point-major COO
    whose corner order is [v0u0, v0u1, v1u0, v1u1]; generic/host COO goes
    through ``sparse_pool_point_major_batch``. Carries a custom VJP (see
    ``_patch_pool_with_vjp``).

    ``divide_by_weight_sum`` applies a ``DeviceCoo(defer_row_norm=True)``'s
    deferred row normalization with the per-target weight sum FUSED into the
    feature segment-sum as channel C+1 (``_patch_pool_denom_with_vjp``):
    segment scatters are entry-bound, not lane-bound, so the former separate
    1-lane denominator scatter cost ~half the feature scatter (5.3-5.6 vs
    9.8-10.8 ms/batch-48/direction in the TPU trace, trace_hot_ops
    2026-08-19). The quotient stays outside the custom VJP so autodiff
    handles it.

    History: measured NEUTRAL at the 32k point cap (18.35 vs 18.17
    ms/batch-8, both fusion directions — the pooling was segment-sum
    ENTRY-bound at B*max_points entries). After round-3 point-count
    bucketing dropped bench batches to the 16k bucket, the balance
    flipped: 4.80 vs 6.12 ms/batch (tools/profile_shpl_variants.py), so
    the production fusion layer now uses this form for device-built COO
    (models/fusion.py).
    """

    if divide_by_weight_sum:
        out, den = _patch_pool_denom_with_vjp(int(num_targets), accum_dtype)(
            src_map, rows, cols, vals
        )
        # quotient in f32 regardless of the accumulator dtype
        denom = den[..., None].astype(jnp.float32)
        out = out.astype(jnp.float32)
        return jnp.where(denom > 1e-12, out / jnp.maximum(denom, 1e-12), 0.0)
    return _patch_pool_with_vjp(int(num_targets))(src_map, rows, cols, vals)


def sparse_pool_ell(
    src_feat: jnp.ndarray,  # [S, C]
    ell_src: jnp.ndarray,  # [T, K] int32
    ell_w: jnp.ndarray,  # [T, K] f32 (0 on padding)
) -> jnp.ndarray:
    """ELL sparse-dense matmul: out[t] = sum_k w[t,k] * src[idx[t,k]]."""

    t, k = ell_src.shape
    g = jnp.take(src_feat, ell_src.reshape(-1), axis=0).reshape(t, k, -1)
    return jnp.einsum("tkc,tk->tc", g, ell_w, preferred_element_type=src_feat.dtype)


def sparse_pool_coo_batch(
    src_feat: jnp.ndarray,  # [B, S, C]
    rows: jnp.ndarray,  # [B, N] int32
    cols: jnp.ndarray,  # [B, N] int32
    vals: jnp.ndarray,  # [B, N] f32
    num_targets: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Batch-native COO pooling -> [B, T, C].

    Flattens the batch into the row/col index spaces (rows + b*T,
    cols + b*S) so the whole batch is ONE gather + ONE segment-sum — the
    fast unbatched lowering — instead of vmap's slow batched scatter.
    ``indices_are_sorted`` refers to per-sample row order (the monotone
    batch offsets preserve it); the device-built COO is NOT sorted.
    """

    b, s, c = src_feat.shape
    n = rows.shape[1]
    row_off = (jnp.arange(b, dtype=rows.dtype) * num_targets)[:, None]
    col_off = (jnp.arange(b, dtype=cols.dtype) * s)[:, None]
    flat = sparse_pool_coo(
        src_feat.reshape(b * s, c),
        (rows + row_off).reshape(-1),
        (cols + col_off).reshape(-1),
        vals.reshape(-1),
        num_targets=b * num_targets,
        indices_are_sorted=indices_are_sorted,
    )
    return flat.reshape(b, num_targets, c)


def sparse_pool_ell_batch(src_feat, ell_src, ell_w):
    """[B, S, C] x [B, T, K] -> [B, T, C]."""

    return jax.vmap(sparse_pool_ell)(src_feat, ell_src, ell_w)


def fuse_pooled(
    native: jnp.ndarray,  # [H, W, C_native] target-view features
    pooled: jnp.ndarray,  # [H*W, C_pooled] pooled cross-view features
) -> jnp.ndarray:
    """Reshape pooled features onto the target lattice and concat with native.

    The reference's SHPL layer concatenates the sparse-pooled source-view
    features with the native branch and mixes with a 1x1 conv; the conv lives
    in ``models.fusion`` (it has parameters), this is the data-path part.
    """

    h, w, _ = native.shape
    pooled_map = pooled.reshape(h, w, -1).astype(native.dtype)
    return jnp.concatenate([native, pooled_map], axis=-1)
