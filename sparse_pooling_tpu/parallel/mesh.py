"""Device mesh and sharding layout.

The reference is single-process single-GPU (SURVEY.md §3.9: no DP/TP/PP/SP,
no NCCL/MPI). The TPU-native scaling answer is ``jax.sharding`` over an ICI
mesh:

  * **data axis** — batch sharding (the only parallelism this VGG-scale
    workload needs; gradients all-reduce over ICI via the compiler).
  * **model axis** — optional tensor parallelism for the stage-2 FC stack
    (the one place wide matmuls make TP worthwhile); kept dimension-1 by
    default but fully wired so multi-chip topologies can enable it.

No custom collectives: XLA inserts psum/all-gather from the shardings.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    grid = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def auto_mesh(
    batch_size: int,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Optional[Mesh]:
    """Production mesh choice for the Trainer: the largest data-axis size
    that divides the global batch (so every shard gets equal work), times
    the configured model axis. Returns None when only one device would be
    used — the caller then runs the plain single-device path.
    """

    devices = list(devices if devices is not None else jax.devices())
    avail = max(len(devices) // max(n_model, 1), 1)
    n_data = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    if n_data * n_model < len(devices):
        # never silently idle chips: an indivisible batch (e.g. batch 4 on
        # an 8-chip host) strands the remainder with zero work
        good = sorted(
            b for b in (avail * k for k in range(1, 5)) if b >= batch_size
        )
        suggestion = (
            f"; use batch_size {good[0]} (or any multiple of {avail}) to "
            f"fill the mesh" if good else ""
        )
        warnings.warn(
            f"auto_mesh uses {n_data * n_model} of {len(devices)} devices: "
            f"batch_size {batch_size} has no larger divisor <= {avail} "
            f"(model_parallel={n_model}){suggestion}",
            stacklevel=2,
        )
    if n_data * n_model <= 1:
        return None
    return make_mesh(n_data, n_model, devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every input over the data axis."""

    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(path: str, shape) -> P:
    """Tensor-parallel layout: stage-2 FC kernels split on the output
    feature dim, matching biases split likewise; everything else replicated.

    With mesh model-dim 1 these specs are no-ops; on a (data, model) mesh
    XLA shards the 2048-wide FC matmuls and all-gathers at the head outputs.
    """

    if "stage2_head" in path and "/fc" in path:
        if path.endswith("kernel"):
            return P(None, MODEL_AXIS)
        if path.endswith("bias"):
            return P(MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """Apply ``param_sharding_rules`` across a flax param pytree."""

    def place(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_tuple)
        spec = param_sharding_rules(path, leaf.shape)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_opt_state(opt_state, mesh: Mesh):
    """Put every opt-state leaf on the mesh.

    ``tx.init(sharded_params)`` gives the moments the params' shardings via
    ``zeros_like``, but step counters are fresh scalars on the default
    device; once orbax restore COMMITS them there, jit refuses to mix them
    with mesh-placed params. Leaves already on this mesh are left alone,
    everything else is replicated.
    """

    def place(leaf):
        s = getattr(leaf, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return leaf
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree.map(place, opt_state)
