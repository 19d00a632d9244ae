"""Voxelizer scatter-layout variants (TPU).

The batch voxelizer (ops/bev_device.py::bev_maps_from_points_batch) costs
~2.4 ms/frame at batch 8 in two segment ops: a density segment_sum into
B*(cells+1) segments and a slice segment_max into B*(cells*5+1). This tool
times layout alternatives against it so the production choice is measured:

  a. current: scalar segment_max over B*cells*5 interleaved segments
  b. lane-payload: segment_max of [P, 5] lane vectors over B*cells segments
     (each point carries rel_h in its slice lane, -1 elsewhere)
  c. counts in the same lane op: segment_sum of [P, 6] (5 one-hot rel_h
     lanes unused; density lane = 1.0) — single op but sum!=max for slices,
     so this one only measures the op-count effect, not a usable kernel
  d. density segment_sum alone (the second op's standalone cost)

Usage: python tools/profile_voxel_variants.py
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

    from sparse_pooling_tpu.configs import AreaExtents, cars_pyramid_config

    cfg = cars_pyramid_config().model.bev
    ext = AreaExtents()
    h, w = cfg.grid_hw(ext)
    n_slices = cfg.height_slices
    cells = h * w
    b, p = 8, 16384
    rng = np.random.RandomState(0)

    lin = jnp.array(rng.randint(0, cells, (b, p)), jnp.int32)
    s_idx = jnp.array(rng.randint(0, n_slices, (b, p)), jnp.int32)
    rel_h = jnp.array(rng.rand(b, p), jnp.float32)

    # a. current interleaved scalar segment_max
    def cur(lin_, s_, r_):
        seg_s = cells * n_slices + 1
        soff = (jnp.arange(b, dtype=jnp.int32) * seg_s)[:, None]
        sl = (lin_ * n_slices + s_ + soff).reshape(-1)
        return jax.ops.segment_max(
            r_.reshape(-1), sl, num_segments=b * seg_s
        )

    print(f"a. scalar segmax {b*(cells*n_slices+1)} segs: "
          f"{timed(cur, (lin, s_idx, rel_h))*1e3:7.2f} ms")

    # b. lane-payload segment_max over B*cells segments
    def lanes(lin_, s_, r_):
        seg = cells + 1
        boff = (jnp.arange(b, dtype=jnp.int32) * seg)[:, None]
        ids = (lin_ + boff).reshape(-1)
        payload = jnp.where(
            jax.nn.one_hot(s_, n_slices, dtype=jnp.bool_),
            r_[..., None], -1.0,
        ).reshape(-1, n_slices)
        return jax.ops.segment_max(payload, ids, num_segments=b * seg)

    print(f"b. lane segmax [P,{n_slices}] {b*(cells+1)} segs: "
          f"{timed(lanes, (lin, s_idx, rel_h))*1e3:7.2f} ms")

    # d. density segment_sum alone
    def dens(lin_):
        seg = cells + 1
        boff = (jnp.arange(b, dtype=jnp.int32) * seg)[:, None]
        ids = (lin_ + boff).reshape(-1)
        return jax.ops.segment_sum(
            jnp.ones((b * p,), jnp.float32), ids, num_segments=b * seg
        )

    print(f"d. density segsum {b*(cells+1)} segs: "
          f"{timed(dens, (lin,))*1e3:7.2f} ms")

    # e. lane segmax with density folded in as a 6th SUM lane is impossible
    # in one op; instead: lane segmax + scalar segsum (b+d) is the candidate
    # production pair. For reference also try the one_hot entry build alone.
    def build(s_, r_):
        return jnp.where(
            jax.nn.one_hot(s_, n_slices, dtype=jnp.bool_),
            r_[..., None], -1.0,
        )

    print(f"   (lane entry build alone: {timed(build, (s_idx, rel_h))*1e3:7.2f} ms)")


if __name__ == "__main__":
    main()
