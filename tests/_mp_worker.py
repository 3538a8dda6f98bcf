"""Worker process for the 2-process jax.distributed runtime test.

Launched by ``tests/test_runtime.py::test_two_process_distributed`` as a real
OS process: initializes the JAX distributed runtime against a local
coordinator (gloo CPU collectives), builds the shared DCN x ICI hybrid mesh,
and runs a jitted global reduction over an array sharded across both
processes. Prints ``MPOK <pid> <value>`` on success.
"""

import sys


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from diffopt_tpu.parallel import runtime

    runtime.initialize_multihost(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = runtime.hybrid_mesh()
    assert mesh.shape == {"dcn": 2, "ici": jax.local_device_count()}, mesh

    n = len(jax.devices())
    data = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    sharding = runtime.scenario_sharding(mesh, ndim=2)
    arr = jax.make_array_from_callback(
        data.shape, sharding, lambda idx: data[idx]
    )
    # cross-process psum through gloo: sum over the dcn-sharded axis
    out = jax.jit(
        lambda a: jnp.sum(a * 2.0),
        out_shardings=NamedSharding(mesh, P()),
    )(arr)
    expect = float(data.sum() * 2.0)
    got = float(out)
    assert abs(got - expect) < 1e-4 * (1 + abs(expect)), (got, expect)
    print(f"MPOK {pid} {got}", flush=True)


if __name__ == "__main__":
    main()
