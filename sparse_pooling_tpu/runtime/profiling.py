"""Profiling / tracing support.

The reference has essentially no tracing harness (TensorBoard scalars only,
SURVEY.md §6); the TPU-native equivalent is ``jax.profiler`` traces viewable
in Perfetto/TensorBoard. This module wraps trace capture plus the
dependency-chained device timer this environment requires (naive
block_until_ready loops misreport through the remote runtime — see
bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a block (Perfetto/TB viewable)."""

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_device_loop(body: Callable[[jnp.ndarray], object], n: int = 10) -> float:
    """True device seconds/iteration of ``body(dep) -> pytree``.

    Runs n iterations inside one jitted fori_loop with forced data
    dependencies and a scalar readback, defeating dispatch pipelining.
    """

    @jax.jit
    def repeat(dep0):
        def loop(_, dep):
            out = body(dep)
            s = jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32))
            return dep * 0.0 + s * 1e-20
        return jax.lax.fori_loop(0, n, loop, dep0)

    float(repeat(jnp.float32(0)))  # compile + warm
    t0 = time.perf_counter()
    float(repeat(jnp.float32(0)))
    return (time.perf_counter() - t0) / n
