"""Pallas TPU kernel for the SHPL ELL sparse pooling op.

Fuses the gather + weighted reduction of ``ops.sparse_pool.sparse_pool_ell``
into one VMEM-resident kernel: the source feature map (~1 MB at the fusion
stride) is pinned in VMEM, each grid step produces a tile of target rows by K
dynamic row-gathers and a weighted sum on the VPU — no [T*K, C] intermediate
in HBM. Kernel-level counterpart of the reference's CUDA-backed
``tf.sparse_tensor_dense_matmul`` (SHPL layer) and the MV3D fork's custom
CUDA ops (N3/N5/N7 in SURVEY.md §3.8).

MEASURED DESIGN DECISION — **FINAL, round 3** (TPU v5e, jax 0.9.0; closes
SURVEY.md §3.8 N7). Every Mosaic formulation of the data-dependent row
reads was built and priced; the XLA lowering wins by orders of magnitude
and IS the TPU-native design for this op:

  * XLA ``sparse_pool_ell`` (gather + einsum): 0.78 ms/frame at S=7488,
    C=32, T=8832, K=8 (tools/probe_pallas_shpl.py round 3; the earlier
    ~33 us figure was the COO production path at its own shapes) —
    dispatch/entry-bound, gather fully fused (intermediates never touch
    HBM). The production COO forms: point-major 6.12, 2x2-window
    patch-major 4.80 ms/batch-8 at the 16k bucket
    (tools/profile_shpl_variants.py).
  * In-kernel vector gathers (``jnp.take`` along sublanes or lanes):
    assert in Mosaic lowering. Kernel below compiles interpreter-only.
  * One-hot MXU formulation: compiles, numerically fine (~3e-3 rel), ~650
    us — 20x slower, VPU-bound building the one-hot.
  * Scalar-prefetched indices + per-row dynamic slices
    (``pltpu.PrefetchScalarGridSpec``, the standard Mosaic route, probed
    round 3 in tools/probe_pallas_shpl.py): passes Pallas lowering
    constraints but crashes this environment's remote Mosaic compiler
    (HTTP 500, same failure class as bf16 window kernels in
    tools/probe_pallas_roi.py). Even compiling, the ROI probe's measured
    ~0.55-0.64 us per dynamic-slice issue prices the required T*K = 70k
    row reads at ~40 ms/frame — 50x the XLA path, structurally.
  * Sorting evidence: a sorted-CSR kernel would amortize NOTHING — sorted
    segment-sum measures 6.30 (sort included) / 6.14 (presorted) vs 6.12
    ms/batch unsorted (tools/profile_shpl_variants.py).

Production code therefore calls ``sparse_pool_fused`` below, which uses
the XLA path on TPU; the kernel stays as the interpreter-mode reference
and the ``pallas_gather_supported()`` probe auto-adopts it if a future
Mosaic lowers dynamic gathers AND beats these numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_pooling_tpu.ops.sparse_pool import sparse_pool_ell


def _ell_kernel(x_ref, idx_ref, w_ref, o_ref, *, k: int):
    """One tile of target rows: out = sum_k w[:, k] * x[idx[:, k]]."""

    x = x_ref[:]  # [S, C] resident in VMEM
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for j in range(k):  # static K, unrolled
        rows = idx_ref[:, j]  # [TILE_T]
        gathered = jnp.take(x, rows, axis=0)  # dynamic row gather in VMEM
        acc = acc + gathered.astype(jnp.float32) * w_ref[:, j][:, None]
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_t", "interpret"))
def sparse_pool_ell_pallas(
    src_feat: jnp.ndarray,  # [S, C]
    ell_src: jnp.ndarray,  # [T, K] int32
    ell_w: jnp.ndarray,  # [T, K] f32
    tile_t: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ELL sparse pooling. Output matches ``sparse_pool_ell``."""

    t, k = ell_src.shape
    s, c = src_feat.shape
    pad_t = (-t) % tile_t
    if pad_t:
        ell_src = jnp.pad(ell_src, ((0, pad_t), (0, 0)))
        ell_w = jnp.pad(ell_w, ((0, pad_t), (0, 0)))
    t_padded = t + pad_t

    grid = (t_padded // tile_t,)
    out = pl.pallas_call(
        functools.partial(_ell_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_padded, c), src_feat.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t_padded * k * c,
            bytes_accessed=(s * c + 2 * t_padded * k + t_padded * c) * 4,
            transcendentals=0,
        ),
    )(src_feat, ell_src, ell_w)
    return out[:t]


@functools.cache
def pallas_gather_supported() -> bool:
    """Probe: can the current backend lower the dynamic-gather kernel?"""

    if jax.default_backend() != "tpu":
        return False
    try:
        x = jnp.zeros((8, 128), jnp.float32)
        idx = jnp.zeros((8, 2), jnp.int32)
        w = jnp.zeros((8, 2), jnp.float32)
        jax.jit(
            functools.partial(sparse_pool_ell_pallas, tile_t=8)
        ).lower(x, idx, w).compile()
        return True
    except Exception:
        return False


def sparse_pool_fused(src_feat, ell_src, ell_w):
    """Best available implementation of the ELL sparse pool (see module doc)."""

    if pallas_gather_supported():
        return sparse_pool_ell_pallas(src_feat, ell_src, ell_w)
    return sparse_pool_ell(src_feat, ell_src, ell_w)
