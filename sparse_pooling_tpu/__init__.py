"""sparse_pooling_tpu — TPU-native Sparse Non-homogeneous Pooling (SHPL) fusion detector.

A brand-new JAX / XLA / Pallas framework with the capabilities of the reference
``YeungLy/Sparse_Pooling`` codebase (SHPL LiDAR+camera fusion grafted onto an
AVOD-style two-stage 3D detector for KITTI), re-designed TPU-first:

- KITTI point-cloud voxelization to BEV height/density maps runs as jitted
  segment-max/segment-sum device ops (reference: host numpy
  ``wavedata/tools/core/voxel_grid_2d.py`` + ``avod/core/bev_generators/bev_slices.py``).
- The calibration-derived sparse BEV<->front-view projection (reference:
  ``tf.sparse_tensor_dense_matmul`` fed by per-frame COO built in
  ``avod/datasets/kitti/kitti_utils.py``) becomes a fixed-capacity ELL
  gather/weighted-sum op with a Pallas kernel variant.
- VGG-pyramid backbones, RPN and AVOD-style second stage (reference:
  ``avod/core/models/{rpn_model,avod_model}.py``) lower to XLA as one compiled
  per-frame graph with device-side crop-and-resize and fixed-size masked NMS.
- Training/eval (reference: ``avod/core/{trainer,evaluator}.py``) uses optax +
  orbax, a double-buffered host pipeline, and data-parallel ``jax.sharding``
  over a TPU mesh.
"""

__version__ = "0.1.0"


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache (verified to work with
    this environment's remote-TPU backend: full-model compiles are 5-25
    MINUTES through the remote compiler, and the cache removes them for
    every process after the first). Called by the experiment CLIs and
    perf tools; honors an explicit JAX_COMPILATION_CACHE_DIR.

    The default lives under the user cache dir, NOT /tmp: /tmp is wiped
    across machine restarts, which silently re-pays the multi-minute
    cold compile once per session."""

    import os

    import jax

    if path is None:
        path = os.path.join(
            os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
            "spt_tpu_cache",
        )
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
