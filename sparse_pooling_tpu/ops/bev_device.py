"""Device-side BEV map generation (jitted segment ops).

TPU-native replacement for the reference's host-side numpy pipeline
(``VoxelGrid2D.voxelize_2d`` + ``bev_slices.generate_bev``): the per-frame
point cloud is shipped to the device once as a fixed-capacity padded array
and voxelization runs inside the compiled step as segment-max (height
slices) / segment-sum (density) scatters — no host hot loop, static shapes
throughout. Parity with ``sparse_pooling_tpu.data.bev.generate_bev_maps`` is
asserted to <=1e-5 in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sparse_pooling_tpu.configs.config import AreaExtents, BevConfig


@functools.partial(jax.jit, static_argnames=("extents", "cfg"))
def bev_maps_from_points(
    points: jnp.ndarray,  # [P, 3] f32 camera-frame, zero-padded
    mask: jnp.ndarray,  # [P] bool, True for real points
    ground_plane: jnp.ndarray,  # [4] f32
    extents: AreaExtents,
    cfg: BevConfig,
) -> jnp.ndarray:
    """Padded points -> BEV input tensor [H+pad, W, slices+1] f32.

    Points outside the area extents are masked on-device, so callers may pass
    the frustum-filtered cloud without pre-filtering to extents.
    """

    h, w = cfg.grid_hw(extents)
    n_slices = cfg.height_slices
    x, y, z = points[:, 0], points[:, 1], points[:, 2]

    valid = (
        mask
        & (x >= extents.x_min) & (x < extents.x_max)
        & (y >= extents.y_min) & (y < extents.y_max)
        & (z >= extents.z_min) & (z < extents.z_max)
    )

    col = jnp.floor((x - extents.x_min) / cfg.voxel_size).astype(jnp.int32)
    row = jnp.floor((z - extents.z_min) / cfg.voxel_size).astype(jnp.int32)
    col = jnp.clip(col, 0, w - 1)
    row = jnp.clip(row, 0, h - 1)
    lin = row * w + col

    # density over all valid points in the column
    num_cells = h * w
    dens_idx = jnp.where(valid, lin, num_cells)
    counts = jax.ops.segment_sum(
        jnp.ones_like(lin, dtype=jnp.float32), dens_idx, num_segments=num_cells + 1
    )[:num_cells]
    density = jnp.minimum(
        1.0, jnp.log(counts + 1.0) / jnp.log(cfg.density_log_norm)
    ).reshape(h, w)

    # height slices: per-cell max of (height - slice bottom), normalized.
    # Elementwise (not matvec) to stay true fp32 — see ops.sparse_build note.
    heights = (
        x * ground_plane[0] + y * ground_plane[1] + z * ground_plane[2]
        + ground_plane[3] - cfg.height_lo
    )
    slice_h = (cfg.height_hi - cfg.height_lo) / n_slices
    s_idx = jnp.floor(heights / slice_h).astype(jnp.int32)
    s_valid = valid & (s_idx >= 0) & (s_idx < n_slices)
    rel_h = heights - s_idx.astype(heights.dtype) * slice_h
    num_slice_cells = num_cells * n_slices
    slice_lin = jnp.where(s_valid, lin * n_slices + s_idx, num_slice_cells)
    slice_max = jax.ops.segment_max(
        jnp.where(s_valid, rel_h, 0.0).astype(jnp.float32),
        slice_lin,
        num_segments=num_slice_cells + 1,
    )[:num_slice_cells]
    # segment_max fills empty segments with the dtype min; clamp to 0
    slice_maps = jnp.maximum(slice_max, 0.0).reshape(h, w, n_slices) / slice_h

    out = jnp.concatenate([slice_maps, density[..., None]], axis=-1)
    return jnp.pad(out, ((0, cfg.pad_h), (0, 0), (0, 0)))


@functools.partial(jax.jit, static_argnames=("extents", "voxel_size"))
def bev_counts_from_points(
    points: jnp.ndarray,  # [P, 3]
    mask: jnp.ndarray,  # [P]
    extents: AreaExtents,
    voxel_size: float,
) -> jnp.ndarray:
    """Per-cell point counts [H, W] (the anchor filter's occupancy raster)."""

    h = int(round((extents.z_max - extents.z_min) / voxel_size))
    w = int(round((extents.x_max - extents.x_min) / voxel_size))
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    valid = (
        mask
        & (x >= extents.x_min) & (x < extents.x_max)
        & (y >= extents.y_min) & (y < extents.y_max)
        & (z >= extents.z_min) & (z < extents.z_max)
    )
    col = jnp.clip(jnp.floor((x - extents.x_min) / voxel_size).astype(jnp.int32), 0, w - 1)
    row = jnp.clip(jnp.floor((z - extents.z_min) / voxel_size).astype(jnp.int32), 0, h - 1)
    lin = jnp.where(valid, row * w + col, h * w)
    counts = jax.ops.segment_sum(
        jnp.ones_like(lin, jnp.float32), lin, num_segments=h * w + 1
    )[: h * w]
    return counts.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("extents", "cfg"))
def bev_maps_from_points_batch(
    points: jnp.ndarray,  # [B, P, 3]
    mask: jnp.ndarray,  # [B, P]
    ground_plane: jnp.ndarray,  # [B, 4]
    extents: AreaExtents,
    cfg: BevConfig,
) -> jnp.ndarray:
    """Batch-native voxelizer: [B, P, 3] -> [B, H+pad, W, C].

    Flattens the batch into the segment-index space (one segment_sum /
    segment_max over B*(cells+1) segments) instead of vmapping the
    per-sample builder — vmap lowers the scatters to XLA's slow batched
    form (measured 18 ms/batch vs ~6 for the flat form at batch 8,
    tools/profile_micro.py). Semantics identical to
    ``bev_maps_from_points`` per sample (parity-tested).
    """

    bsz = points.shape[0]
    h, w = cfg.grid_hw(extents)
    n_slices = cfg.height_slices
    x, y, z = points[..., 0], points[..., 1], points[..., 2]  # [B, P]

    valid = (
        mask
        & (x >= extents.x_min) & (x < extents.x_max)
        & (y >= extents.y_min) & (y < extents.y_max)
        & (z >= extents.z_min) & (z < extents.z_max)
    )

    col = jnp.clip(
        jnp.floor((x - extents.x_min) / cfg.voxel_size).astype(jnp.int32), 0, w - 1
    )
    row = jnp.clip(
        jnp.floor((z - extents.z_min) / cfg.voxel_size).astype(jnp.int32), 0, h - 1
    )
    lin = row * w + col

    # BATCH-MINOR segment space: idx = cell*B + b, so the flat scatter
    # output is a [cells+1, B] matrix and ONE 2D transpose hands XLA the
    # batch-major consumer layout. The batch-MAJOR form (per-sample
    # stride, idx = b*seg + cell) made XLA convert the 537 MB flat
    # {0:T(1024)} output to the tiled consumer layout through a while
    # loop of 48 dynamic-update-slices at ~77 GB/s — 29.5 ms/batch-48,
    # the single largest non-conv item in the trace (trace_hot_ops,
    # 2026-08-19) — whereas its tiled 2D transpose runs near bandwidth.
    # Measured on the full voxelizer + conv consumer, batch 48
    # (tools/probe_voxel_relayout.py): batch-major 46.7 ms, batch-minor
    # 30.0 ms, tile-aligned reshape 34.1, bf16-cast-early 50.9; outputs
    # bit-identical (same entries per segment, scatter order immaterial
    # for sum/max). Lane-aligned per-sample strides had already measured
    # NEUTRAL — the cost was the 1D->tiled conversion itself.
    num_cells = h * w
    b_ids = jnp.broadcast_to(
        jnp.arange(bsz, dtype=jnp.int32)[:, None], (bsz, points.shape[1])
    )
    dens_idx = (jnp.where(valid, lin, num_cells) * bsz + b_ids).reshape(-1)
    counts = jax.ops.segment_sum(
        jnp.ones((bsz * points.shape[1],), jnp.float32),
        dens_idx,
        num_segments=(num_cells + 1) * bsz,
    ).reshape(num_cells + 1, bsz)[:num_cells]
    density = jnp.minimum(
        1.0, jnp.log(counts.T + 1.0) / jnp.log(cfg.density_log_norm)
    ).reshape(bsz, h, w)

    gp = ground_plane[:, :, None]  # [B, 4, 1]
    heights = (
        x * gp[:, 0] + y * gp[:, 1] + z * gp[:, 2] + gp[:, 3] - cfg.height_lo
    )
    slice_h = (cfg.height_hi - cfg.height_lo) / n_slices
    s_idx = jnp.floor(heights / slice_h).astype(jnp.int32)
    s_valid = valid & (s_idx >= 0) & (s_idx < n_slices)
    rel_h = heights - s_idx.astype(heights.dtype) * slice_h
    num_slice_cells = num_cells * n_slices
    slice_lin = (  # batch-minor, see density note above
        jnp.where(s_valid, lin * n_slices + s_idx, num_slice_cells) * bsz + b_ids
    ).reshape(-1)
    slice_max = jax.ops.segment_max(
        jnp.where(s_valid, rel_h, 0.0).astype(jnp.float32).reshape(-1),
        slice_lin,
        num_segments=(num_slice_cells + 1) * bsz,
    ).reshape(num_slice_cells + 1, bsz)[:num_slice_cells]
    slice_maps = (
        jnp.maximum(slice_max.T, 0.0).reshape(bsz, h, w, n_slices) / slice_h
    )

    out = jnp.concatenate([slice_maps, density[..., None]], axis=-1)
    return jnp.pad(out, ((0, 0), (0, cfg.pad_h), (0, 0), (0, 0)))


def bev_maps_batch(points, mask, ground_plane, extents, cfg):
    """Batch variant: [B, P, 3], [B, P], [B, 4] -> [B, H+pad, W, C]."""

    return bev_maps_from_points_batch(points, mask, ground_plane, extents, cfg)


@functools.partial(jax.jit, static_argnames=("extents", "cfg"))
def bev_maps_packed_batch(
    points: jnp.ndarray,  # [B, P, 3]
    mask: jnp.ndarray,  # [B, P]
    ground_plane: jnp.ndarray,  # [B, 4]
    extents: AreaExtents,
    cfg: BevConfig,
):
    """Voxelize DIRECTLY into space-to-depth layout.

    Returns ``(packed, counts)`` where ``packed`` is
    [B, (H+pad)/2, W/2, 4*(slices+1)] — bit-identical to
    ``bev_maps_from_points_batch`` followed by the backbone's
    space-to-depth reshape (channel c_out = sub*(slices+1) + c with
    sub = (row%2)*2 + col%2) — and ``counts`` is the per-ORIGINAL-cell
    point count in the same packed geometry, [B, (H+pad)/2, W/2, 4] f32
    (the anchor filter's occupancy raster before unpacking).

    Why: with ``backbone.space_to_depth`` the full-res [B, H+pad, W, 6]
    raster exists ONLY to be repacked — the batch-48 trace
    (tools/trace_hot_ops.py, 2026-08-20) billed ~15 ms/iter of layout
    copies to that chain (the [48,700,800,5] slice-map copy, the concat/
    pad copy, and the [48,352,400,2,2,6]->[48,352,400,24] packing
    copies). Keying the segment space by (cell2, sub) makes the scatter
    output a reshape of the packed tensor and the full-res raster never
    exists. Measured (tools/probe_voxel_s2d.py, TPU v5e, batch 48, 16384
    pts, conv consumer): 41.16 -> 33.08 ms/batch, consumer output
    bit-identical. Requires even (H+pad) and W; callers fall back to the
    unpacked builder otherwise (``pipeline.build_model_inputs_batch``).
    """

    bsz, npts = points.shape[0], points.shape[1]
    h, w = cfg.grid_hw(extents)
    hp = h + cfg.pad_h
    if hp % 2 or w % 2:
        raise ValueError(f"packed voxelizer needs even dims, got {hp}x{w}")
    h2, w2 = hp // 2, w // 2
    ns = cfg.height_slices
    nch = ns + 1
    x, y, z = points[..., 0], points[..., 1], points[..., 2]

    valid = (
        mask
        & (x >= extents.x_min) & (x < extents.x_max)
        & (y >= extents.y_min) & (y < extents.y_max)
        & (z >= extents.z_min) & (z < extents.z_max)
    )
    col = jnp.clip(
        jnp.floor((x - extents.x_min) / cfg.voxel_size).astype(jnp.int32), 0, w - 1
    )
    row = jnp.clip(
        jnp.floor((z - extents.z_min) / cfg.voxel_size).astype(jnp.int32), 0, h - 1
    )
    cell2 = (row // 2) * w2 + col // 2
    sub = (row % 2) * 2 + col % 2
    kd = cell2 * 4 + sub  # packed-cell key; rows >= h never occur (clip)
    nkd = h2 * w2 * 4
    b_ids = jnp.broadcast_to(
        jnp.arange(bsz, dtype=jnp.int32)[:, None], (bsz, npts)
    )

    # density per (cell2, sub) == per original cell; batch-minor segment
    # space (see bev_maps_from_points_batch layout note)
    dens_idx = (jnp.where(valid, kd, nkd) * bsz + b_ids).reshape(-1)
    counts = jax.ops.segment_sum(
        jnp.ones((bsz * npts,), jnp.float32),
        dens_idx,
        num_segments=(nkd + 1) * bsz,
    ).reshape(nkd + 1, bsz)[:nkd]
    counts_b = counts.T.reshape(bsz, h2, w2, 4)
    density = jnp.minimum(
        1.0, jnp.log(counts_b + 1.0) / jnp.log(cfg.density_log_norm)
    )[..., None]  # [B, h2, w2, 4, 1]

    gp = ground_plane[:, :, None]
    heights = (
        x * gp[:, 0] + y * gp[:, 1] + z * gp[:, 2] + gp[:, 3] - cfg.height_lo
    )
    slice_h = (cfg.height_hi - cfg.height_lo) / ns
    s_idx = jnp.floor(heights / slice_h).astype(jnp.int32)
    s_valid = valid & (s_idx >= 0) & (s_idx < ns)
    rel_h = heights - s_idx.astype(heights.dtype) * slice_h
    nks = nkd * ns
    slice_lin = (
        jnp.where(s_valid, kd * ns + s_idx, nks) * bsz + b_ids
    ).reshape(-1)
    slice_max = jax.ops.segment_max(
        jnp.where(s_valid, rel_h, 0.0).astype(jnp.float32).reshape(-1),
        slice_lin,
        num_segments=(nks + 1) * bsz,
    ).reshape(nks + 1, bsz)[:nks]
    slice_maps = (
        jnp.maximum(slice_max.T, 0.0).reshape(bsz, h2, w2, 4, ns) / slice_h
    )

    packed = jnp.concatenate([slice_maps, density], axis=-1).reshape(
        bsz, h2, w2, 4 * nch
    )
    return packed, counts_b


def unpack_s2d_raster(grid: jnp.ndarray, content_h: int) -> jnp.ndarray:
    """[B, H2, W2, 4] packed per-cell raster -> [B, content_h, W] full-res
    (inverse of the (row%2)*2+col%2 sub-cell keying; pad rows sliced off)."""

    b, h2, w2, _ = grid.shape
    full = grid.reshape(b, h2, w2, 2, 2).transpose(0, 1, 3, 2, 4).reshape(
        b, h2 * 2, w2 * 2
    )
    return full[:, :content_h]
