"""Probe: contraction order of the grouped RPN ROI einsum.

trace_hot_ops (2026-08-19, batch 48) bills the grouped ROI crop's two
dot_generals 27.2 ms/batch plus ~21.7 ms of operand layout copies
(crop_resize.py:555/547: XLA relayouts wx/wy/t before each dot). The
current form contracts y first over reshaped-flat operands and ends
with a transpose; an alternative contracts x FIRST with dot_general
keeping (py, c) as free rhs dims — no patches reshape, and the second
dot lands directly in [b,p,v,ch,cw,c] with no final transpose. Fewer
forced data movements in the lowering, same math (bf16 sum order
differs; parity checked in f32).

Shapes from the production trace: b=48, p=512 units, v=32 variants,
3x3 crop, 12x12 windows, 8 channels (BEV view; image view uses 10x10).

RESULT (2026-08-19, TPU v5e) — REJECTED for production:
  isolated stage: xfirst WINS 12% (22.0 vs 25.4 ms/batch-48; parity at
  bf16-rounding scale), and standalone profile_stages confirmed
  (roi_rpn 0.81/0.84 -> 0.72/0.75 ms/frame at batch 32)...
  ...but the FULL GRAPH regressed 126.7 -> 124.7/124.8 fps (two runs,
  outside the 126.26-126.69 same-binary band). In context, the y-first
  form's final transpose fuses into its consumers while xfirst's output
  layout forces costlier copies elsewhere. Classic lesson: stage-local
  layout wins don't compose — only the e2e number decides. y-first
  stays in ops/crop_resize.py.

Run on TPU: python tools/probe_group_einsum_order.py
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

B, P, V, CH, PY, C = 48, 512, 32, 3, 12, 8


def current(wy, wx, patches):
    # wy [B,P,V,CH,PY], wx [B,P,V,CH,PX], patches [B,P,PY,PX,C]
    b, p, v, ch, py = wy.shape
    px = wx.shape[-1]
    c = patches.shape[-1]
    t = lax.dot_general(
        wy.reshape(b, p, v * ch, py), patches.reshape(b, p, py, px * c),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=wy.dtype,
    ).reshape(b, p, v, ch, px, c)
    out = lax.dot_general(
        wx, t,
        (((4,), (4,)), ((0, 1, 2), (0, 1, 2))),
        preferred_element_type=wy.dtype,
    )
    return out.transpose(0, 1, 2, 4, 3, 5)  # [B,P,V,ch,cw,C]


def xfirst(wy, wx, patches):
    b, p, v, cw, px = wx.shape
    # contract px: [B,P,V*cw,px] x [B,P,py,px,C] -> [B,P,V*cw,py,C]
    t = lax.dot_general(
        wx.reshape(b, p, v * cw, px), patches,
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=wx.dtype,
    ).reshape(b, p, v, cw, PY, C)
    # contract py: [B,P,V,ch,py] x [B,P,V,cw,py,C] -> [B,P,V,ch,cw,C]
    return lax.dot_general(
        wy, t,
        (((4,), (4,)), ((0, 1, 2), (0, 1, 2))),
        preferred_element_type=wy.dtype,
    )


def timed(fn, args, n=20):
    @jax.jit
    def repeat(dep0, *a):
        def body(_, dep):
            out = fn(a[0] + (dep * 0).astype(a[0].dtype), *a[1:])
            return dep * 0.0 + out.reshape(-1)[:1].astype(jnp.float32)[0] * 1e-20
        return lax.fori_loop(0, n, body, dep0)

    float(repeat(jnp.float32(0), *args))
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0), *args))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    for px in (12, 10):
        wy = rng.random((B, P, V, CH, PY), np.float32)
        wx = rng.random((B, P, V, CH, px), np.float32)
        patches = rng.random((B, P, PY, px, C), np.float32)
        # f32 parity of the two orders
        a = np.asarray(current(jnp.array(wy), jnp.array(wx), jnp.array(patches)))
        bb = np.asarray(xfirst(jnp.array(wy), jnp.array(wx), jnp.array(patches)))
        err = np.abs(a - bb).max()
        args_b = tuple(jnp.asarray(x, jnp.bfloat16) for x in (wy, wx, patches))
        ms_cur = timed(current, args_b)
        ms_new = timed(xfirst, args_b)
        print(
            f"window {PY}x{px}: current {ms_cur:7.2f} ms/batch | "
            f"xfirst {ms_new:7.2f} ms/batch | f32 parity {err:.2e}"
        )


if __name__ == "__main__":
    main()
