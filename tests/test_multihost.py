"""Two-process DCN smoke test (SURVEY.md §3.9 comm-backend row).

Spawns two REAL OS processes, each a jax CPU backend with 2 virtual
devices, joined through ``parallel.multihost.initialize`` — then builds a
GLOBAL 4-device mesh, shards a global array over it, and psums across the
process boundary. This makes the rebuild's multi-host answer executable
rather than documented (round-2 verdict item #8).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")

from sparse_pooling_tpu.parallel import multihost

multihost.initialize()
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
print(multihost.process_info(), flush=True)

mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "model"))
sharding = NamedSharding(mesh, P("data"))

# global array [4, 8]: each process contributes its 2 local shards
pid = jax.process_index()
local = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
# global row r lives on global device r; this process owns rows
# [2*pid, 2*pid+2) (device ids are NOT 0-based on non-zero processes)
arrs = [
    jax.device_put(local[2 * pid + i : 2 * pid + i + 1], d)
    for i, d in enumerate(jax.local_devices())
]
global_arr = jax.make_array_from_single_device_arrays(
    (4, 8), sharding, arrs
)

out = jax.jit(
    lambda x: jnp.sum(x, axis=0), out_shardings=NamedSharding(mesh, P())
)(global_arr)
expect = local.sum(axis=0)
np.testing.assert_allclose(np.asarray(out), expect)
print(f"PSUM_OK process {pid}", flush=True)

# the production host pipeline on a GLOBAL mesh: every process iterates
# the same deterministic batches; DevicePrefetcher contributes only this
# process's shards (run_training --multihost uses exactly this path)
from sparse_pooling_tpu.data.prefetch import DevicePrefetcher

def gen():
    for i in range(3):
        yield np.full((4, 8), float(i), np.float32), i

with DevicePrefetcher(gen(), depth=2, sharding=sharding) as pf:
    for arr, meta in pf:
        assert arr.shape == (4, 8)
        assert len(arr.addressable_shards) == 2  # this process's 2 devices
        total = jax.jit(
            jnp.sum, out_shardings=NamedSharding(mesh, P())
        )(arr)
        np.testing.assert_allclose(float(total), meta * 32.0)
print(f"PREFETCH_OK process {pid}", flush=True)
"""


def test_two_process_dcn_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"PSUM_OK process {pid}" in out, out
        assert f"PREFETCH_OK process {pid}" in out, out
        assert "2 local of 4 global devices" in out, out
