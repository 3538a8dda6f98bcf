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


def test_hybrid_mesh_single_process_layout():
    # single-process fallback: dcn granules are contiguous device groups
    mesh = runtime.hybrid_mesh(dcn=2)
    assert mesh.shape == {"dcn": 2, "ici": 4}
    flat = mesh.devices.reshape(-1)
    assert [d.id for d in flat] == [d.id for d in jax.devices()]
    sh = runtime.scenario_sharding(mesh, ndim=2)
    x = jax.device_put(jnp.arange(16.0).reshape(8, 2), sh)
    # a global jitted reduction over the 2-axis-sharded batch is exact
    np.testing.assert_allclose(float(jax.jit(jnp.sum)(x)), 120.0)
    with np.testing.assert_raises(ValueError):
        runtime.hybrid_mesh(dcn=3)


def test_two_process_distributed():
    """Two real OS processes x 2 virtual CPU devices: jax.distributed init
    against a local coordinator, shared hybrid DCN x ICI mesh, and a jitted
    cross-process reduction (gloo collectives) agreeing in both processes —
    the multi-host runtime path that virtual-device tests cannot cover."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.update(
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
        JAX_ENABLE_X64="0",
        PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
    )
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MPOK {i}" in out, f"worker {i} output:\n{out}"
    # both processes computed the same global value
    v0 = outs[0].split("MPOK 0 ")[1].split()[0]
    v1 = outs[1].split("MPOK 1 ")[1].split()[0]
    assert v0 == v1, (v0, v1)


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
