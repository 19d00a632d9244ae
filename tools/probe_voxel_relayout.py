"""Probe: can anything beat XLA's flat->tiled relayout of the voxelizer output?

The batch-48 trace (tools/trace_hot_ops.py, 2026-08-19) shows the single
largest non-conv item is a while-loop + 48x dynamic-update-slice relayout
of the height-slice scatter output: f32[48*2800128] {0:T(1024)} ->
[1,48,2800128] {T(8,128)}, 29.5 ms/iter = 0.61 ms/frame at ~77 GB/s —
~22x off HBM speed-of-light for a 537 MB copy. The bev_device.py note
accepted it after trying row alignment (neutral) and vmapped scatters
(3x slower); this probe prices the remaining formulations:

  base      current production: batch-major segment space, one flat
            segment_max, reshape(bsz, seg)[: , :num] -> [B,H,W,S]
  bminor    batch-MINOR segment space (idx = cell*B + b): the flat output
            is [cells, B]; a single 2D transpose (which XLA tiles well)
            replaces the 1D->tiled conversion loop
  split     batch-major, but reshape through a tile-aligned 3D view
            [B, seg/128, 128] before the slice, giving XLA a layout-
            compatible intermediate
  bf16cast  batch-major, cast the flat scatter output to bf16 BEFORE the
            reshape (halves relayout bytes; NOT parity-preserving: bf16
            rounds the [0,1] maps at ~2e-3 — priced for information only)

Every variant runs the FULL voxelizer (density + height slices) feeding
the same bf16 3x3/s2 conv consumer + scalar readback, N iters inside one
jitted fori_loop (measurement discipline per ROADMAP.md).

Usage: python tools/probe_voxel_relayout.py [--batch 48] [--iters 10]
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
    h, w = cfg.grid_hw(ext)
    ns = cfg.height_slices
    num_cells = h * w
    num_sc = num_cells * ns
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

    kern = rng.normal(0, 0.1, (3, 3, ns + 1, 16)).astype(np.float32)

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
        lin = row * w + col
        gpp = gp[:, :, None]
        heights = x * gpp[:, 0] + y * gpp[:, 1] + z * gpp[:, 2] + gpp[:, 3] - cfg.height_lo
        s_idx = jnp.floor(heights / slice_h).astype(jnp.int32)
        s_valid = valid & (s_idx >= 0) & (s_idx < ns)
        rel_h = (heights - s_idx.astype(heights.dtype) * slice_h).astype(jnp.float32)
        rel_h = jnp.where(s_valid, rel_h, 0.0)
        sc = lin * ns + s_idx  # slice-cell index in [0, num_sc)
        # density (identical across variants, batch-major)
        seg = -(-(num_cells + 1) // 128) * 128
        boff = (jnp.arange(bsz, dtype=jnp.int32) * seg)[:, None]
        dens_idx = (jnp.where(valid, lin, num_cells) + boff).reshape(-1)
        counts = jax.ops.segment_sum(
            jnp.ones((bsz * npts,), jnp.float32), dens_idx, num_segments=bsz * seg
        ).reshape(bsz, seg)[:, :num_cells]
        density = jnp.minimum(
            1.0, jnp.log(counts + 1.0) / jnp.log(cfg.density_log_norm)
        ).reshape(bsz, h, w)
        return sc, s_valid, rel_h, density

    def consume(slice_maps, density):
        out = jnp.concatenate([slice_maps, density[..., None]], axis=-1)
        out = jnp.pad(out, ((0, 0), (0, cfg.pad_h), (0, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            out.astype(jnp.bfloat16),
            jnp.asarray(kern, jnp.bfloat16),
            window_strides=(2, 2),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y.astype(jnp.float32))

    def v_base(points, pmask, gp):
        sc, s_valid, rel_h, density = common(points, pmask, gp)
        seg_s = -(-(num_sc + 1) // 128) * 128
        soff = (jnp.arange(bsz, dtype=jnp.int32) * seg_s)[:, None]
        idx = (jnp.where(s_valid, sc, num_sc) + soff).reshape(-1)
        sm = jax.ops.segment_max(
            rel_h.reshape(-1), idx, num_segments=bsz * seg_s
        ).reshape(bsz, seg_s)[:, :num_sc]
        maps = jnp.maximum(sm, 0.0).reshape(bsz, h, w, ns) / slice_h
        return consume(maps, density)

    def v_bminor(points, pmask, gp):
        sc, s_valid, rel_h, density = common(points, pmask, gp)
        # batch-minor: idx = cell*B + b; flat output viewed [cells+1, B]
        b_ids = jnp.broadcast_to(
            jnp.arange(bsz, dtype=jnp.int32)[:, None], (bsz, npts)
        )
        idx = (jnp.where(s_valid, sc, num_sc) * bsz + b_ids).reshape(-1)
        sm = jax.ops.segment_max(
            rel_h.reshape(-1), idx, num_segments=(num_sc + 1) * bsz
        ).reshape(num_sc + 1, bsz)[:num_sc]
        maps = (
            jnp.maximum(sm.T, 0.0).reshape(bsz, h, w, ns) / slice_h
        )
        return consume(maps, density)

    def v_split(points, pmask, gp):
        sc, s_valid, rel_h, density = common(points, pmask, gp)
        seg_s = -(-(num_sc + 1) // 128) * 128
        soff = (jnp.arange(bsz, dtype=jnp.int32) * seg_s)[:, None]
        idx = (jnp.where(s_valid, sc, num_sc) + soff).reshape(-1)
        flat = jax.ops.segment_max(
            rel_h.reshape(-1), idx, num_segments=bsz * seg_s
        )
        k = num_sc // 128  # 2800000 = 21875 * 128 exactly for cars
        assert k * 128 == num_sc, num_sc
        sm = flat.reshape(bsz, seg_s // 128, 128)[:, :k, :].reshape(bsz, num_sc)
        maps = jnp.maximum(sm, 0.0).reshape(bsz, h, w, ns) / slice_h
        return consume(maps, density)

    def v_bf16cast(points, pmask, gp):
        sc, s_valid, rel_h, density = common(points, pmask, gp)
        seg_s = -(-(num_sc + 1) // 128) * 128
        soff = (jnp.arange(bsz, dtype=jnp.int32) * seg_s)[:, None]
        idx = (jnp.where(s_valid, sc, num_sc) + soff).reshape(-1)
        flat = jax.ops.segment_max(
            rel_h.reshape(-1), idx, num_segments=bsz * seg_s
        ).astype(jnp.bfloat16)
        sm = flat.reshape(bsz, seg_s)[:, :num_sc].astype(jnp.float32)
        maps = jnp.maximum(sm, 0.0).reshape(bsz, h, w, ns) / slice_h
        return consume(maps, density)

    variants = {
        "base": v_base,
        "bminor": v_bminor,
        "split": v_split,
        "bf16cast": v_bf16cast,
    }

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
            f"{name:10s} {dt:8.2f} ms/batch  {dt / bsz:6.3f} ms/frame  "
            f"consumer-sum rel drift vs base: {drift:.2e}"
        )


if __name__ == "__main__":
    main()
