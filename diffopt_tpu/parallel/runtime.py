"""Multi-host runtime helpers.

The reference has no distributed runtime (SURVEY.md §5); on TPU pods the
framework scales with standard JAX multi-controller execution: every host
calls :func:`initialize_multihost` once, builds the same global mesh, and
shards scenario batches with `jax.sharding`/`shard_map` — DP over DCN across
hosts, batch over ICI within a slice. XLA inserts all collectives; there is
no custom wire protocol (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX distributed (no-op on a single process). On Cloud TPU
    the arguments are auto-detected from the environment."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


def global_mesh(axis_names: Sequence[str] = ("batch",), shape=None):
    """Build a mesh over all global devices (all hosts)."""
    devs = jax.devices()
    if shape is None:
        shape = (len(devs),)
    return jax.make_mesh(tuple(shape), tuple(axis_names), devices=devs)


def profile_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace of the enclosed block
    (the framework's observability hook; view with TensorBoard/XProf)."""
    return jax.profiler.trace(log_dir)
