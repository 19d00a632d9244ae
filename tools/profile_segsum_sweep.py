"""segment_sum cost surface: entries fixed, sweep num_segments / payload.

Informs the ROI-crop backward design (which knob actually moves the
scatter cost: output size, payload width, dtype, batch splitting)."""

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
    m = 802816  # s2 corner entries at batch 4

    for segs in (35200, 70400, 140800, 281600, 563200):
        for c, dt in ((32, jnp.float32), (16, jnp.float32), (32, jnp.bfloat16)):
            ids = jnp.array(rng.randint(0, segs, (m,)), jnp.int32)
            vals = jnp.array(rng.rand(m, c), jnp.float32).astype(dt)
            t = timed(
                lambda v, i: jax.ops.segment_sum(v, i, num_segments=segs),
                (vals, ids),
            )
            print(f"segs={segs:>6d} C={c:>2d} {dt.__name__:>8s}: {t*1e3:7.2f} ms")

    # batch-split: 4 independent scatters of m/4 -> segs/4 via vmap
    segs = 563200
    ids = jnp.array(rng.randint(0, segs // 4, (4, m // 4)), jnp.int32)
    vals = jnp.array(rng.rand(4, m // 4, 32), jnp.float32)
    t = timed(
        lambda v, i: jax.vmap(
            lambda vv, ii: jax.ops.segment_sum(vv, ii, num_segments=segs // 4)
        )(v, i),
        (vals, ids),
    )
    print(f"vmap 4x(m/4 -> {segs//4}) C=32 f32: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
