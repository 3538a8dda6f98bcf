"""Multi-host runtime helpers.

The reference has no distributed runtime (SURVEY.md §5); on TPU pods the
framework scales with standard JAX multi-controller execution: every host
calls :func:`initialize_multihost` once, builds the same global mesh, and
shards scenario batches with `jax.sharding`/`shard_map` — DP over DCN across
hosts/slices, batch over ICI within a slice (:func:`hybrid_mesh`). XLA
inserts all collectives; there is no custom wire protocol (BASELINE.json
north star).

Validated end-to-end by ``tests/test_runtime.py::test_two_process_distributed``:
two real OS processes initialize the JAX distributed runtime over a local
coordinator (gloo CPU collectives), build the same :func:`hybrid_mesh`, and
run a jitted cross-process reduction whose value every process must agree on.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX distributed. On Cloud TPU the arguments are
    auto-detected from the environment (pass nothing); explicit arguments are
    for CPU/GPU clusters or tests. Errors are swallowed only on the
    auto-detect path (single-process environments are a no-op there) — an
    explicitly requested multi-process init that fails must raise."""
    if num_processes is not None and num_processes <= 1:
        return
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # auto-detect on a single-process environment, or already initialized
        pass


def global_mesh(axis_names: Sequence[str] = ("batch",), shape=None):
    """Build a mesh over all global devices (all hosts)."""
    devs = jax.devices()
    if shape is None:
        shape = (len(devs),)
    return jax.make_mesh(tuple(shape), tuple(axis_names), devices=devs)


def hybrid_mesh(
    dcn: Optional[int] = None,
    ici: Optional[int] = None,
    axis_names: Sequence[str] = ("dcn", "ici"),
):
    """Two-axis DCN x ICI mesh — the BASELINE layout ("DP over DCN across
    hosts, batch over ICI within a slice").

    Defaults: ``dcn = jax.process_count()`` (one DCN granule per host
    process), ``ici = local_device_count`` — so collectives over the ``ici``
    axis stay inside a process/slice (riding ICI on a pod) and only the
    ``dcn`` axis crosses the data-center network. Multi-process meshes are
    laid out with ``mesh_utils.create_hybrid_device_mesh`` so the device
    order respects physical locality; the single-process fallback (virtual
    CPU meshes, one-host TPU) groups devices contiguously, which is the
    locality-correct order for `xla_force_host_platform_device_count`
    devices.

    Shard a flat scenario batch over *both* axes with
    ``PartitionSpec(("dcn", "ici"))`` (scenario parallelism is embarrassingly
    parallel until the Schur coupling reduce, which is a single psum over
    both axes — the cheapest possible cross-DCN traffic pattern).
    """
    devs = jax.devices()
    nproc = jax.process_count()
    if dcn is None:
        dcn = nproc
    if ici is None:
        if len(devs) % dcn:
            raise ValueError(
                f"{len(devs)} devices do not split over dcn={dcn}"
            )
        ici = len(devs) // dcn
    if dcn * ici != len(devs):
        raise ValueError(
            f"dcn*ici = {dcn}*{ici} != {len(devs)} global devices"
        )
    if nproc > 1 and dcn == nproc:
        from jax.experimental import mesh_utils

        try:
            # real TPU pods: group by slice (ICI domain) when the topology
            # exposes one, else by host process (CPU/GPU clusters)
            devices = mesh_utils.create_hybrid_device_mesh(
                (1, ici), (dcn, 1), devices=devs
            )
        except ValueError:
            devices = mesh_utils.create_hybrid_device_mesh(
                (1, ici), (dcn, 1), devices=devs, process_is_granule=True
            )
    else:
        devices = np.asarray(devs).reshape(dcn, ici)
    return jax.sharding.Mesh(devices, tuple(axis_names))


def scenario_sharding(mesh, ndim: int = 1):
    """NamedSharding placing a leading scenario/batch axis over every mesh
    axis (DCN x ICI jointly); trailing dims replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(
        mesh, P(tuple(mesh.axis_names), *([None] * (ndim - 1)))
    )


def profile_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace of the enclosed block
    (the framework's observability hook; view with TensorBoard/XProf)."""
    return jax.profiler.trace(log_dir)
