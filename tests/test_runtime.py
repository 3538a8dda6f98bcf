"""Multi-host runtime + sharding helpers on the 8-virtual-device CPU mesh.

The reference has no distributed runtime (SURVEY.md §5 "Distributed
communication backend: none"); these helpers are the BASELINE-mandated
TPU-native equivalent. Tests validate them on the virtual mesh the same way
`__graft_entry__.dryrun_multichip` does.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from diffopt_tpu.parallel import runtime, sharding


def test_initialize_multihost_single_process_noop():
    # single-process: must not raise, must not try to reach a coordinator
    runtime.initialize_multihost(num_processes=1)
    runtime.initialize_multihost(num_processes=None)  # auto-detect path: no-op/swallow


def test_global_mesh_covers_all_devices():
    mesh = runtime.global_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == ("batch",)
    mesh2d = runtime.global_mesh(axis_names=("dp", "mp"), shape=(4, 2))
    assert mesh2d.shape == {"dp": 4, "mp": 2}


def test_shard_batch_and_pad_roundtrip():
    mesh = sharding.make_mesh()
    x = {"a": jnp.arange(24.0).reshape(6, 4), "s": jnp.float64(3.0)}
    padded = sharding.batch_pad(x, 8)
    assert padded["a"].shape == (8, 4)
    # pad repeats the first row (keeps padded instances well-posed)
    np.testing.assert_array_equal(padded["a"][6], padded["a"][0])
    placed = sharding.shard_batch(padded, mesh)
    assert placed["a"].sharding.spec == jax.sharding.PartitionSpec(
        "batch", None
    )
    # a jitted reduction over the sharded batch matches the unsharded value
    tot = jax.jit(lambda t: jnp.sum(t["a"]))(placed)
    np.testing.assert_allclose(
        float(tot), float(jnp.sum(padded["a"])), rtol=1e-12
    )


def test_profile_trace_writes_trace(tmp_path):
    log_dir = str(tmp_path / "jax-trace")
    with runtime.profile_trace(log_dir):
        y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 8)))
        jax.block_until_ready(y)
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(log_dir)
        for f in fs
    ]
    assert files, "profiler trace directory is empty"
