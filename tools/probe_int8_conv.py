"""Probe: int8 vs bf16 convolution throughput at production backbone shapes.

The encode (3.69 ms/frame) + decode (1.52) conv stages are ~58% of the
~9 ms/frame end-to-end inference cost (ROADMAP.md stage table), and the
equal-FLOPs layout sweep (tools/profile_encode_variants.py) closed the
bf16 axis: the base config is the floor. The remaining hardware axis is
precision — TPU v5e's MXU runs int8 at 2x the bf16 MACs/cycle — which the
reference stack (TF1 GPU, fp32) never had. This probe prices a
post-training-quantized (PTQ) serving path BEFORE building it:

  conv_bf16   — the production encoder stage shapes, bf16 in/out
  conv_int8   — same shapes, int8 inputs + int8 weights,
                preferred_element_type=int32, then the realistic PTQ glue:
                per-layer rescale (int32 * f32 scale), relu, requantize to
                int8 (round + clip + cast) — all VPU work that any real
                PTQ deployment pays between layers
  conv_int8_bare — int8 convs with NO requant glue (upper bound: isolates
                the MXU win from the VPU requant cost)

If conv_int8 does not clearly beat conv_bf16 here, a quantized serving
path is not worth its AP risk on this stack and the result gets recorded
as a rejected lever in models/backbone.py.

Run on TPU: python tools/probe_int8_conv.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Cars-preset BEV encoder stage shapes at batch 8 after space-to-depth
# (704x800x6 -> 352x400x24); channels (32,64,128,256), blocks (2,2,3,3).
B = 8
STAGES = [
    ((B, 352, 400, 24), 32, 2),
    ((B, 176, 200, 32), 64, 2),
    ((B, 88, 100, 64), 128, 3),
    ((B, 44, 50, 128), 256, 3),
]
DN = ("NHWC", "HWIO", "NHWC")


def conv(x, k, prefer=None):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=prefer,
    )


def encoder_bf16(x, kernels):
    for (shape, ch, nb), ks in zip(STAGES, kernels):
        if shape[1] != x.shape[1]:
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        for k in ks:
            x = jnp.maximum(conv(x, k), 0)
    return x


def encoder_int8(x, kernels, scales, requant=True):
    for (shape, ch, nb), ks, ss in zip(STAGES, kernels, scales):
        if shape[1] != x.shape[1]:
            x = lax.reduce_window(
                x, jnp.int8(jnp.iinfo(jnp.int8).min),
                lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
        for k, s in zip(ks, ss):
            acc = conv(x, k, prefer=jnp.int32)  # int8 x int8 -> int32
            if requant:
                y = jnp.maximum(acc.astype(jnp.float32) * s, 0.0)
                x = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
            else:
                x = jnp.clip(acc, -127, 127).astype(jnp.int8)
    return x


def timed(fn, *args, n=20):
    @jax.jit
    def repeat(dep0, *a):
        def body(_, dep):
            bump = (dep * 0).astype(a[0].dtype)
            out = fn(a[0] + bump, *a[1:])
            return dep * 0.0 + out.reshape(-1)[:1].astype(jnp.float32)[0] * 1e-20
        return lax.fori_loop(0, n, body, dep0)

    float(repeat(jnp.float32(0), *args))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0), *args))
    dt = time.perf_counter() - t0
    return dt / n * 1e3  # ms/iter


def main():
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(STAGES[0][0], dtype=np.float32)

    kernels_bf16, kernels_i8, scales = [], [], []
    cin = STAGES[0][0][-1]
    for shape, ch, nb in STAGES:
        ks_b, ks_i, ss = [], [], []
        for _ in range(nb):
            k = rng.standard_normal((3, 3, cin, ch), dtype=np.float32) * 0.05
            ks_b.append(jnp.asarray(k, jnp.bfloat16))
            ks_i.append(jnp.asarray(
                np.clip(np.round(k / 0.01), -127, 127), jnp.int8))
            ss.append(jnp.float32(0.01))
            cin = ch
        kernels_bf16.append(ks_b)
        kernels_i8.append(ks_i)
        scales.append(ss)

    xb = jnp.asarray(x0, jnp.bfloat16)
    xi = jnp.asarray(np.clip(np.round(x0 / 0.05), -127, 127), jnp.int8)

    ms_b = timed(lambda x: encoder_bf16(x, kernels_bf16), xb)
    print(f"conv_bf16      {ms_b:8.3f} ms/batch-{B}  ({ms_b / B:6.3f} ms/frame)")

    try:
        ms_i = timed(lambda x: encoder_int8(x, kernels_i8, scales), xi)
        print(f"conv_int8      {ms_i:8.3f} ms/batch-{B}  ({ms_i / B:6.3f} ms/frame)")
    except Exception as e:  # noqa: BLE001
        print(f"conv_int8      FAILED: {type(e).__name__}: {e}")

    try:
        ms_i0 = timed(
            lambda x: encoder_int8(x, kernels_i8, scales, requant=False), xi)
        print(f"conv_int8_bare {ms_i0:8.3f} ms/batch-{B}  ({ms_i0 / B:6.3f} ms/frame)")
    except Exception as e:  # noqa: BLE001
        print(f"conv_int8_bare FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
