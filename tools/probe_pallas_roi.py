"""Probe: Pallas dynamic-window gather formulations for the RPN ROI stage.

The round-2 verdict's top item: the RPN ROI crop is descriptor-bound on
XLA's window gather; the untried standard Mosaic answer to data-dependent
addressing is scalar-prefetched indices (pltpu.PrefetchScalarGridSpec)
driving dynamic slices from a VMEM-resident source map (the pooled ROI
source maps are tiny: BEV 88x100x8 bf16 = 140 KB, image 96x312x8 = 479 KB
— both fit in VMEM whole).

Variants probed (each: does it LOWER in Mosaic? what does it cost?):
  A. per-window 2D dynamic slice [pl.ds(y, py), pl.ds(x, px)] from VMEM
  B. row-slab slice [pl.ds(y, py), :] (sublane-only dynamic) + in-kernel
     x-windowing via tent-weight matmul over the full width
  C. fused: B + both tent contractions in-kernel (MXU), emitting the
     final [V, ch, cw, C] ROI features per unit

Run on TPU:  python tools/probe_pallas_roi.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n=20):
    @jax.jit
    def repeat(dep0, *a):
        def body(_, dep):
            out = fn(*jax.tree.map(
                lambda x: x + (dep * 0).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            leaves = [l for l in jax.tree.leaves(out)
                      if jnp.issubdtype(l.dtype, jnp.floating)]
            return dep * 0.0 + sum(
                jnp.sum(l.reshape(-1)[:1].astype(jnp.float32)) for l in leaves
            ) * 1e-20
        return jax.lax.fori_loop(0, n, body, dep0)

    float(repeat(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n


# ---------------------------------------------------------------- variant A
def make_window_slice_kernel(h, w, c, py, px, tile_u):
    def kernel(ys_ref, xs_ref, src_ref, out_ref):
        i = pl.program_id(0)
        for j in range(tile_u):  # static unroll
            y = ys_ref[i * tile_u + j]
            x = xs_ref[i * tile_u + j]
            out_ref[j] = src_ref[pl.ds(y, py), pl.ds(x, px), :]

    def run(src, ys, xs, n_units):
        grid = (n_units // tile_u,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (tile_u, py, px, c), lambda i, ys, xs: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((n_units, py, px, c), src.dtype),
        )(ys, xs, src)

    return run


# ---------------------------------------------------------------- variant B
def make_rowslab_kernel(h, w, c, py, tile_u):
    """Row slab (sublane-dynamic only) -> x-window via full-width matmul."""

    def kernel(ys_ref, xs_ref, src_ref, out_ref):
        # src_ref is [H, W*C]; out [tile_u, cw=pyx?]... emit the row slab
        i = pl.program_id(0)
        for j in range(tile_u):
            y = ys_ref[i * tile_u + j]
            out_ref[j] = src_ref[pl.ds(y, py), :]

    def run(src2d, ys, xs, n_units):
        grid = (n_units // tile_u,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (tile_u, py, src2d.shape[1]),
                    lambda i, ys, xs: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_units, py, src2d.shape[1]), src2d.dtype
            ),
        )(ys, xs, src2d)

    return run


# ---------------------------------------------------------------- variant C
def make_fused_kernel(h, w, c, py, v, s, tile_u):
    """Fused grouped ROI: row slab + BOTH tent contractions in-kernel.

    Emits [tile_u, v, s, s, c] per grid step. wy [U, v*s, py] (weights
    relative to the row slab), wx [U, v*s, W] (full-width tent weights, the
    x-window selection rides the matmul).
    """

    def kernel(ys_ref, src_ref, wy_ref, wx_ref, out_ref):
        for j in range(tile_u):
            y = ys_ref[pl.program_id(0) * tile_u + j]
            rows = src_ref[pl.ds(y, py), :]  # [py, W*C]
            t = jnp.dot(
                wy_ref[j], rows, preferred_element_type=jnp.float32
            )  # [v*s, W*C]
            t = t.reshape(v * s, w, c)
            # x contraction: [v*s(ch), W, C] x [v*s(cw), W] -> need per-v
            # pairing; do it as one dot over W after interleaving:
            # out[vi, yi, xi, c] = sum_w wx[vi*s+xi, w] * t[vi*s+yi, w, c]
            for vi in range(v):  # static small loop
                tv = t[vi * s:(vi + 1) * s]  # [s(ch), W, C]
                wxv = wx_ref[j, vi * s:(vi + 1) * s]  # [s(cw), W]
                o = jax.lax.dot_general(
                    wxv, tv.reshape(s * w, c).reshape(s, w, c).transpose(1, 0, 2).reshape(w, s * c),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [s(cw), s(ch)*C]
                out_ref[j, vi] = (
                    o.reshape(s, s, c).transpose(1, 0, 2).astype(out_ref.dtype)
                )

    def run(src2d, ys, wy, wx, n_units):
        grid = (n_units // tile_u,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (tile_u, v * s, py), lambda i, ys: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (tile_u, v * s, w), lambda i, ys: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (tile_u, v, s, s, c), lambda i, ys: (i, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((n_units, v, s, s, c), jnp.float32),
        )(ys, src2d, wy, wx)

    return run


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)

    # BEV ROI shapes (cars preset, Q=4): src 88x100x8 bf16, 512 units/frame
    h, w, c = 88, 100, 8
    py = px = 12
    b = 8
    u_per = 512
    n_units = b * u_per  # flatten batch: per-sample maps probed separately
    v, s = 32, 3

    src = jnp.array(rng.rand(h, w, c), jnp.bfloat16)
    src2d = src.reshape(h, w * c)
    ys = jnp.array(rng.randint(0, h - py, (n_units,)), jnp.int32)
    xs = jnp.array(rng.randint(0, w - px, (n_units,)), jnp.int32)

    # XLA reference gather (the current production form, single map)
    def xla_gather(src, ys, xs):
        starts = jnp.stack([ys, xs, jnp.zeros_like(ys)], -1)
        return jax.lax.gather(
            src, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1, 2),
            ),
            slice_sizes=(py, px, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    dt = timed(xla_gather, src, ys, xs)
    print(f"XLA window gather      {n_units} win: {dt*1e3:7.3f} ms")

    for tile_u in (8, 32, 128):
        try:
            run = make_window_slice_kernel(h, w, c, py, px, tile_u)
            f = functools.partial(run, n_units=n_units)
            dt = timed(f, src, ys, xs)
            print(f"A window-slice tile={tile_u:3d}: {dt*1e3:7.3f} ms")
        except Exception as e:
            print(f"A window-slice tile={tile_u}: FAILED {type(e).__name__}: {str(e)[:200]}")

    for tile_u in (8, 32, 128):
        try:
            run = make_rowslab_kernel(h, w, c, py, tile_u)
            f = functools.partial(run, n_units=n_units)
            dt = timed(f, src2d, ys, xs)
            print(f"B row-slab     tile={tile_u:3d}: {dt*1e3:7.3f} ms")
        except Exception as e:
            print(f"B row-slab tile={tile_u}: FAILED {type(e).__name__}: {str(e)[:200]}")

    wy = jnp.array(rng.rand(n_units, v * s, py), jnp.bfloat16)
    wx = jnp.array(rng.rand(n_units, v * s, w), jnp.bfloat16)
    for tile_u in (8, 32):
        try:
            run = make_fused_kernel(h, w, c, py, v, s, tile_u)
            f = functools.partial(run, n_units=n_units)
            dt = timed(f, src2d, ys, wy, wx)
            print(f"C fused        tile={tile_u:3d}: {dt*1e3:7.3f} ms")
        except Exception as e:
            print(f"C fused tile={tile_u}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
