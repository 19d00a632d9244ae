"""Microbenchmark the pieces of the ROI-crop backward (TPU).

The fwd+bwd table (tools/profile_train.py) says the ROI crops dominate the
backward pass. Their custom VJP (ops/crop_resize.py::_bilinear_bwd) has two
parts — a corner-entry segment_sum into the feature map (feature grad) and a
re-gather + chain (box grad) — and an alternative exists for the patch
crops: transpose the tent-weight einsum to WINDOW grads (MXU) and
segment-sum whole windows (4x fewer, larger entries). This tool times each
variant standalone so the backward choice is measured, not guessed.

Usage: python tools/profile_bwd_parts.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import sparse_pooling_tpu as _spt

_spt.enable_compile_cache()
from profile_stages import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    b = 4

    cases = {
        # stage-2 BEV: 1024 train proposals, 7x7 crop, map 352x400x32
        "s2": dict(n=1024, ch=7, cw=7, h=352, w=400, c=32),
        # RPN grouped: 16384 anchors flat, 3x3 crop, pooled map 88x100x16
        "rpn": dict(n=16384, ch=3, cw=3, h=88, w=100, c=16),
    }

    for name, k in cases.items():
        n, ch, cw, h, w, c = (k[x] for x in ("n", "ch", "cw", "h", "w", "c"))
        m = b * n * ch * cw
        ids = jnp.array(rng.randint(0, b * h * w, (4 * m,)), jnp.int32)
        grads = jnp.array(rng.rand(4 * m, c), jnp.float32)
        g = jnp.array(rng.rand(b, n, ch, cw, c), jnp.float32)
        wgt = jnp.array(rng.rand(b, n, ch, cw), jnp.float32)
        flat = jnp.array(rng.rand(b * h * w, c), jnp.float32)
        idx = jnp.array(rng.randint(0, b * h * w, (m,)), jnp.int32)

        # 1. the corner segment_sum as the current bwd does it
        t = timed(
            lambda gr, i: jax.ops.segment_sum(gr, i, num_segments=b * h * w),
            (grads, ids),
        )
        print(f"{name}: corner segsum 4m={4*m:>8d} -> {b*h*w:>7d} segs  {t*1e3:7.2f} ms")

        # 2. same entries, sorted ids (is the sort the cost?)
        ids_sorted = jnp.sort(ids)
        t = timed(
            lambda gr, i: jax.ops.segment_sum(
                gr, i, num_segments=b * h * w, indices_are_sorted=True
            ),
            (grads, ids_sorted),
        )
        print(f"{name}: corner segsum (pre-sorted hint)        {t*1e3:7.2f} ms")

        # 3. the 4x (g * w).reshape + concat feeding it
        def build(gx, wx):
            mm = gx.shape[0] * gx.shape[1] * gx.shape[2] * gx.shape[3]
            return jnp.concatenate([
                (gx * wx[..., None]).reshape(mm, c) for _ in range(4)
            ])

        t = timed(build, (g, wgt))
        print(f"{name}: grad-entry build (4x mul+concat)       {t*1e3:7.2f} ms")

        # 4. box-grad re-gather: 4 takes of [m, C]
        t = timed(
            lambda f, i: tuple(jnp.take(f, i + j, axis=0) for j in range(4)),
            (flat, idx),
        )
        print(f"{name}: box-grad re-gather 4x[m,C]             {t*1e3:7.2f} ms")

    # 5. window scatter alternative at RPN scale: P windows of 8x8xC
    for p, pc in ((4096, 16), (2048, 16), (4096, 32)):
        wins = jnp.array(rng.rand(b * p, 8, 8, pc), jnp.float32)
        h, w = 88, 100
        starts = jnp.array(
            np.stack([
                rng.randint(0, b, b * p),
                rng.randint(0, h - 8, b * p),
                rng.randint(0, w - 8, b * p),
            ], -1), jnp.int32,
        )

        def win_scatter(wn, st):
            # flatten windows to entries over the padded flat image
            bi, yi, xi = st[:, 0], st[:, 1], st[:, 2]
            oy = jnp.arange(8)[None, :, None]
            ox = jnp.arange(8)[None, None, :]
            fid = ((bi[:, None, None] * h + yi[:, None, None] + oy) * w
                   + xi[:, None, None] + ox)  # [BP, 8, 8]
            return jax.ops.segment_sum(
                wn.reshape(-1, pc), fid.reshape(-1), num_segments=b * h * w
            )

        t = timed(win_scatter, (wins, starts))
        print(f"win[{p}x8x8x{pc}]: window segsum {b*p*64:>8d} entries    {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()


def scatter_windows():
    """Window-granular lax.scatter_add vs corner segment_sum (part 2).

    One descriptor per SAMPLE (2x2xC window) or per POSITION (8x8xC window)
    instead of per corner — if the scatter is descriptor-bound like the
    gathers (ROADMAP.md), this is the backward rewrite's win.
    """

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    b = 4

    def win_scatter_add(image_shape, upd, starts):
        h, w, c = image_shape[1:]
        wy, wx = upd.shape[1], upd.shape[2]
        op = jnp.zeros((image_shape[0] * h, w, c), jnp.float32)
        # starts: [M, 2] (flat row incl. batch, col)
        return jax.lax.scatter_add(
            op, starts, upd,
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1, 2, 3),
                inserted_window_dims=(),
                scatter_dims_to_operand_dims=(0, 1),
            ),
            indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    # s2 shapes: m=200704 samples, 2x2x32 windows into 4x352x400x32
    m = b * 1024 * 49
    upd = jnp.array(rng.rand(m, 2, 2, 32), jnp.float32)
    starts = jnp.array(
        np.stack([rng.randint(0, 4 * 352 - 1, m), rng.randint(0, 399, m)], -1),
        jnp.int32,
    )
    t = timed(lambda u, s: win_scatter_add((4, 352, 400, 32), u, s), (upd, starts))
    print(f"s2: scatter_add {m} 2x2x32 windows           {t*1e3:7.2f} ms")

    # rpn grouped: P=4096 positions/sample, 8x8x16 windows into 4x88x100x16
    m = b * 4096
    upd = jnp.array(rng.rand(m, 8, 8, 16), jnp.float32)
    starts = jnp.array(
        np.stack([rng.randint(0, 4 * 88 - 8, m), rng.randint(0, 92, m)], -1),
        jnp.int32,
    )
    t = timed(lambda u, s: win_scatter_add((4, 88, 100, 16), u, s), (upd, starts))
    print(f"rpn: scatter_add {m} 8x8x16 windows          {t*1e3:7.2f} ms")

    # sample-granular for rpn too (3x3 crop -> 2x2 windows, m=590k)
    m = b * 16384 * 9
    upd = jnp.array(rng.rand(m, 2, 2, 16), jnp.float32)
    starts = jnp.array(
        np.stack([rng.randint(0, 4 * 88 - 1, m), rng.randint(0, 99, m)], -1),
        jnp.int32,
    )
    t = timed(lambda u, s: win_scatter_add((4, 88, 100, 16), u, s), (upd, starts))
    print(f"rpn: scatter_add {m} 2x2x16 windows          {t*1e3:7.2f} ms")


if __name__ == "__main__":
    import sys as _s
    if "--windows" in _s.argv:
        scatter_windows()
