"""Probe: does chunking a batch-major segment_sum by FRAME dodge the
accumulator-size cliff?

Context: every ROI-crop feature gradient ends in one
``segment_sum(entries, ids, num_segments=B*H*W)`` (ops/crop_resize.py).
tools/profile_segsum_sweep.py measured the cost cliffing on ACCUMULATOR
size (~15 ms below ~36 MB, 74 ms at 72 MB f32), and the training
batch-knee sweep shows the crop backwards scaling superlinearly past
batch 8 — consistent with the [B*H*W, C] accumulator crossing the cliff
as B doubles. Entries are batch-major in every crop backward, so the
scatter can be split into K independent segment_sums over frame ranges
(static slices, each with a B/K-sized accumulator) and concatenated.

This probe times the single big scatter vs 2/4/8-way frame-chunked forms
at the exact roi_s2_bev backward shapes (1024 proposals x 7x7 crop x 4
corners into a 352x400x32 bf16 map).

Usage: python tools/probe_segsum_chunk.py [--batches 8,16] [--iters 5]
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
    ap.add_argument("--batches", default="8,16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--entries_per_frame", type=int, default=4 * 1024 * 7 * 7)
    ap.add_argument("--hw", type=int, default=352 * 400)
    ap.add_argument("--channels", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    hw, c, m_per = args.hw, args.channels, args.entries_per_frame
    rng = np.random.RandomState(0)

    def run(b, chunks):
        ids_np = (
            rng.randint(0, hw, size=(b, m_per))
            + (np.arange(b) * hw)[:, None]
        ).astype(np.int32)
        ids = jnp.array(ids_np.reshape(-1))
        vals = jnp.array(
            rng.rand(b * m_per, c).astype(np.float32), jnp.bfloat16
        )

        fpc = b // chunks

        @jax.jit
        def scatter(vals, ids):
            if chunks == 1:
                return jax.ops.segment_sum(vals, ids, num_segments=b * hw)
            outs = []
            for k in range(chunks):
                s = k * fpc * m_per
                e = (k + 1) * fpc * m_per
                outs.append(
                    jax.ops.segment_sum(
                        vals[s:e],
                        ids[s:e] - k * fpc * hw,
                        num_segments=fpc * hw,
                    )
                )
            return jnp.concatenate(outs, axis=0)

        @jax.jit
        def repeat(dep, vals, ids):
            def body(i, d):
                out = scatter(vals + d.astype(jnp.bfloat16), ids)
                return d * 0.0 + out[0, 0].astype(jnp.float32) * 1e-20
            return jax.lax.fori_loop(0, args.iters, body, dep)

        float(repeat(jnp.float32(0), vals, ids))
        t0 = time.perf_counter()
        float(repeat(jnp.float32(0), vals, ids))
        dt = (time.perf_counter() - t0) / args.iters
        acc_mb = b * hw * c * 2 / 1e6
        print(
            f"b={b:3d} chunks={chunks:2d} total_acc={acc_mb:7.1f}MB "
            f"per_chunk={acc_mb / chunks:7.1f}MB  {dt * 1e3:8.2f} ms"
        )
        return dt

    for b in [int(x) for x in args.batches.split(",") if x]:
        for chunks in (1, 2, 4, 8):
            if b % chunks:
                continue
            run(b, chunks)


if __name__ == "__main__":
    main()
