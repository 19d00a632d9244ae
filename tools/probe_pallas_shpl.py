"""Probe: scalar-prefetch Pallas formulations of the SHPL ELL sparse pool.

Round-2 verdict item #5 (N7 closure): the one untried Mosaic route for the
SHPL pooling was scalar-prefetched indices (the round-3 ROI bisect proved
``pltpu.PrefetchScalarGridSpec`` + sublane dynamic slices LOWER and run in
f32 on this stack).  This probe prices that route at production shapes
(S=7488 source rows, C=32, T=8800 target rows, K=8 taps) against the XLA
lowering of ``ops.sparse_pool.sparse_pool_ell`` (measured ~33 us/frame
single, ~15 us/frame vmapped batch-8 — dispatch-bound).

The structural problem it measures: an ELL pool needs T*K data-dependent
ROW reads (70k/frame).  A Mosaic kernel can only express those as per-row
dynamic slices from VMEM (vector gathers don't lower); the ROI probe
measured ~0.55-0.64 us per dynamic-slice issue, predicting ~40 ms/frame —
three orders of magnitude over the XLA path.  Variants:

  ell_ds   — scalar-prefetched ELL indices, per-(row,tap) dynamic slice,
             f32, K statically unrolled, tile_t rows per grid step
  ell_ds_small — same at T/8 to separate fixed grid cost from per-slice

Run on TPU:  python tools/probe_pallas_shpl.py
Record the outcome in ops/pallas_sparse_pool.py's module doc (FINAL).
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

from sparse_pooling_tpu.ops.sparse_pool import sparse_pool_ell


def timed(fn, *args, n=5):
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


def make_ell_ds_kernel(s, c, k, tile_t):
    """Scalar-prefetched ELL pool: out[t] = sum_k w[t,k] * x[idx[t,k]]."""

    def kernel(idx_ref, w_ref, src_ref, out_ref):
        base = pl.program_id(0) * tile_t
        for j in range(tile_t):
            acc = jnp.zeros((1, c), jnp.float32)
            for kk in range(k):
                row = idx_ref[base + j, kk]
                acc = acc + src_ref[pl.ds(row, 1), :] * w_ref[base + j, kk]
            out_ref[pl.ds(j, 1), :] = acc

    def run(src, idx, w, n_t):
        grid = (n_t // tile_t,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(
                    (tile_t, c), lambda i, idx, w: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((n_t, c), jnp.float32),
        )(idx, w, src)

    return run


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)

    s, c, t, k = 7488, 32, 8832, 8  # t divisible by tile_t=48
    src = jnp.array(rng.rand(s, c), jnp.float32)
    idx = jnp.array(rng.randint(0, s, (t, k)), jnp.int32)
    w = jnp.array(rng.rand(t, k), jnp.float32)

    dt = timed(sparse_pool_ell, src, idx, w, n=50)
    print(f"XLA sparse_pool_ell   T={t}: {dt*1e3:8.3f} ms/frame")

    for (n_t, tile_t, label) in ((t // 8, 48, "ell_ds_small"), (t, 48, "ell_ds")):
        try:
            run = make_ell_ds_kernel(s, c, k, tile_t)
            f = functools.partial(run, n_t=n_t)
            dtk = timed(f, src, idx[:n_t], w[:n_t], n=3)
            per = dtk / (n_t * k) * 1e6
            print(f"{label:14s} T={n_t}: {dtk*1e3:8.3f} ms/frame "
                  f"({per:.3f} us/slice)")
        except Exception as e:
            print(f"{label} T={n_t}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
