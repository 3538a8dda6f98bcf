"""Scenario-batch sharding over a device mesh.

The reference has zero parallelism (SURVEY.md §2); the TPU-native scaling axes
are (a) batches of problem instances and (b) per-instance dimension. This
module implements (a): shard a batched problem IR over the ``batch`` axis of a
``jax.sharding.Mesh`` so each device factorizes its shard's KKT systems
locally; reductions (losses, gradients w.r.t. shared parameters) ride ICI
collectives inserted by XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "batch"
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = "batch") -> Any:
    """Place a batched pytree with the leading dim sharded over ``axis_name``."""

    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def batch_pad(tree: Any, multiple: int) -> Any:
    """Pad the leading batch dim of every leaf up to a multiple (instances are
    padded by repeating the first element so padded solves stay well-posed)."""

    def pad(x):
        if jnp.ndim(x) == 0:  # scalar leaves (shared params) have no batch dim
            return x
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        return jnp.concatenate([x, jnp.repeat(x[:1], rem, axis=0)], axis=0)

    return jax.tree.map(pad, tree)
