"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so pjit/mesh sharding tests work
without TPU hardware (SURVEY.md §5: the rebuild's analog of distributed
tests). Must set flags before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# This image's sitecustomize registers a remote-tunneled TPU backend and
# forces jax_platforms="axon,cpu" at interpreter start, silently routing
# "CPU" tests through a ~0.3 GB/s tunnel. Override AFTER importing jax so
# tests really run on the local CPU backend (with 8 virtual devices for
# sharding tests).
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the full-model grad graph compiles
# slowly; cached re-runs take seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/spt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

from sparse_pooling_tpu.data import synthetic


@pytest.fixture(scope="session")
def kitti_root(tmp_path_factory):
    """Session-scoped mini-KITTI tree (reference: vendored mini-KITTI fixture)."""

    root = tmp_path_factory.mktemp("kitti")
    synthetic.write_kitti_tree(str(root), num_frames=4, n_ground=8192, n_obj=512)
    return str(root)


@pytest.fixture()
def rng():
    return np.random.RandomState(42)
