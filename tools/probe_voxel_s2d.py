"""Probe: scatter the voxelizer output DIRECTLY in space-to-depth layout.

The 136.2-fps batch-48 trace (tools/trace_hot_ops.py, 2026-08-20) shows
~15 ms/iter of data-formatting copies in the BEV input chain between the
voxelizer scatters and the first conv: the [48,700,800,5] slice-map copy
(5.4 ms), the [48,700,800,6] concat/pad copy (3.0), and the
space-to-depth packing copies [48,352,400,2,2,6]->[48,352,400,24]
(2.6+2.8), plus the 1.6 ms batch-minor transpose. All of them exist only
to rearrange scatter output into the packed layout stage 1 consumes.

Idea: make the SCATTER address space space-to-depth-native — segment key
(cell2, sub, ch) with cell2 = (row//2)*W2 + col//2 and
sub = (row%2)*2 + col%2 — so the segment output IS (a reshape of) the
packed [B, 352, 400, 24] tensor and the intermediate full-res raster
never exists. Channel interleave c_out = sub*6 + (slice 0..4 | density 5)
matches ``VggEncoder.space_to_depth`` exactly, so the downstream conv is
bit-compatible.

Variants (both end in the SAME packed 3x3/s1 bf16 conv + scalar readback):

  prod    production form: batch-minor full-res scatters -> [B,704,800,6]
          -> reshape/transpose s2d pack (backbone.py) -> conv
  s2d     fused form: batch-minor scatters keyed by (cell2, sub) ->
          [B,352,400,4,6] -> merge minor dims -> conv

Usage: python tools/probe_voxel_s2d.py [--batch 48] [--iters 10]

MEASURED (TPU v5e, batch 48, 16384 pts, 10 iters, 2026-08-20): see
bottom-of-file RESULT note after running.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--points", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_pooling_tpu.configs import AreaExtents
    from sparse_pooling_tpu.configs.presets import preset

    ext = AreaExtents()
    cfg = preset("cars").model.bev
    bsz, npts = args.batch, args.points
    h, w = cfg.grid_hw(ext)  # 700, 800
    hp = h + cfg.pad_h  # 704
    h2, w2 = hp // 2, w // 2  # 352, 400
    ns = cfg.height_slices  # 5
    nch = ns + 1  # 6
    num_cells = h * w
    slice_h = (cfg.height_hi - cfg.height_lo) / ns

    rng = np.random.default_rng(0)
    pts = np.stack(
        [
            rng.uniform(ext.x_min, ext.x_max, (bsz, npts)),
            rng.uniform(ext.y_min, ext.y_max, (bsz, npts)),
            rng.uniform(ext.z_min, ext.z_max, (bsz, npts)),
        ],
        axis=-1,
    ).astype(np.float32)
    mask = np.ones((bsz, npts), bool)
    plane = np.tile(np.array([0.0, -1.0, 0.0, 1.65], np.float32), (bsz, 1))
    kern = rng.normal(0, 0.1, (3, 3, 4 * nch, 16)).astype(np.float32)

    def common(points, pmask, gp):
        x, y, z = points[..., 0], points[..., 1], points[..., 2]
        valid = (
            pmask
            & (x >= ext.x_min) & (x < ext.x_max)
            & (y >= ext.y_min) & (y < ext.y_max)
            & (z >= ext.z_min) & (z < ext.z_max)
        )
        col = jnp.clip(
            jnp.floor((x - ext.x_min) / cfg.voxel_size).astype(jnp.int32), 0, w - 1
        )
        row = jnp.clip(
            jnp.floor((z - ext.z_min) / cfg.voxel_size).astype(jnp.int32), 0, h - 1
        )
        gpp = gp[:, :, None]
        heights = (
            x * gpp[:, 0] + y * gpp[:, 1] + z * gpp[:, 2] + gpp[:, 3]
            - cfg.height_lo
        )
        s_idx = jnp.floor(heights / slice_h).astype(jnp.int32)
        s_valid = valid & (s_idx >= 0) & (s_idx < ns)
        rel_h = (heights - s_idx.astype(heights.dtype) * slice_h).astype(
            jnp.float32
        )
        rel_h = jnp.where(s_valid, rel_h, 0.0)
        b_ids = jnp.broadcast_to(
            jnp.arange(bsz, dtype=jnp.int32)[:, None], (bsz, npts)
        )
        return valid, col, row, s_idx, s_valid, rel_h, b_ids

    def consume(packed):
        y = jax.lax.conv_general_dilated(
            packed.astype(jnp.bfloat16),
            jnp.asarray(kern, jnp.bfloat16),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y.astype(jnp.float32))

    def v_prod(points, pmask, gp):
        valid, col, row, s_idx, s_valid, rel_h, b_ids = common(points, pmask, gp)
        lin = row * w + col
        # density, batch-minor
        dens_idx = (jnp.where(valid, lin, num_cells) * bsz + b_ids).reshape(-1)
        counts = jax.ops.segment_sum(
            jnp.ones((bsz * npts,), jnp.float32),
            dens_idx,
            num_segments=(num_cells + 1) * bsz,
        ).reshape(num_cells + 1, bsz)[:num_cells]
        density = jnp.minimum(
            1.0, jnp.log(counts.T + 1.0) / jnp.log(cfg.density_log_norm)
        ).reshape(bsz, h, w)
        num_sc = num_cells * ns
        sidx = (
            jnp.where(s_valid, lin * ns + s_idx, num_sc) * bsz + b_ids
        ).reshape(-1)
        sm = jax.ops.segment_max(
            rel_h.reshape(-1), sidx, num_segments=(num_sc + 1) * bsz
        ).reshape(num_sc + 1, bsz)[:num_sc]
        maps = jnp.maximum(sm.T, 0.0).reshape(bsz, h, w, ns) / slice_h
        out = jnp.concatenate([maps, density[..., None]], axis=-1)
        out = jnp.pad(out, ((0, 0), (0, cfg.pad_h), (0, 0), (0, 0)))
        # backbone.py space_to_depth pack
        packed = out.reshape(bsz, h2, 2, w2, 2, nch).transpose(
            0, 1, 3, 2, 4, 5
        ).reshape(bsz, h2, w2, 4 * nch)
        return consume(packed)

    def v_s2d(points, pmask, gp):
        valid, col, row, s_idx, s_valid, rel_h, b_ids = common(points, pmask, gp)
        cell2 = (row // 2) * w2 + col // 2
        sub = (row % 2) * 2 + col % 2
        # density per (cell2, sub) == per original cell; key = cell2*4+sub
        kd = cell2 * 4 + sub
        nkd = h2 * w2 * 4
        dens_idx = (jnp.where(valid, kd, nkd) * bsz + b_ids).reshape(-1)
        counts = jax.ops.segment_sum(
            jnp.ones((bsz * npts,), jnp.float32),
            dens_idx,
            num_segments=(nkd + 1) * bsz,
        ).reshape(nkd + 1, bsz)[:nkd]
        density = jnp.minimum(
            1.0, jnp.log(counts.T + 1.0) / jnp.log(cfg.density_log_norm)
        ).reshape(bsz, h2, w2, 4, 1)
        # slices per (cell2, sub, s): key = (cell2*4+sub)*ns + s
        nks = nkd * ns
        sidx = (jnp.where(s_valid, kd * ns + s_idx, nks) * bsz + b_ids).reshape(
            -1
        )
        sm = jax.ops.segment_max(
            rel_h.reshape(-1), sidx, num_segments=(nks + 1) * bsz
        ).reshape(nks + 1, bsz)[:nks]
        maps = (
            jnp.maximum(sm.T, 0.0).reshape(bsz, h2, w2, 4, ns) / slice_h
        )
        packed = jnp.concatenate([maps, density], axis=-1).reshape(
            bsz, h2, w2, 4 * nch
        )
        return consume(packed)

    variants = {"prod": v_prod, "s2d": v_s2d}

    pts_d = jnp.asarray(pts)
    mask_d = jnp.asarray(mask)
    plane_d = jnp.asarray(plane)
    n_it = args.iters

    ref = None
    for name, fn in variants.items():

        @jax.jit
        def rep(dep0, points, pmask, gp, fn=fn):
            def body(i, dep):
                return dep * 0.0 + fn(points + dep, pmask, gp) * 1e-20

            return jax.lax.fori_loop(0, n_it, body, dep0)

        val = float(jax.jit(fn)(pts_d, mask_d, plane_d))
        if ref is None:
            ref = val
        float(rep(jnp.float32(0), pts_d, mask_d, plane_d))  # compile+warm
        t0 = time.perf_counter()
        float(rep(jnp.float32(0), pts_d, mask_d, plane_d))
        dt = (time.perf_counter() - t0) / n_it * 1e3
        drift = abs(val - ref) / (abs(ref) + 1e-9)
        print(
            f"{name:6s} {dt:8.2f} ms/batch  {dt / bsz:6.3f} ms/frame  "
            f"consumer-sum rel drift vs prod: {drift:.2e}"
        )


if __name__ == "__main__":
    main()
