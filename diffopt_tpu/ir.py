"""Problem intermediate representation (IR): pytree structs for optimization programs.

TPU-native replacement for the reference's MOI model soup (matrix-of-constraints
forms in ``/root/reference/src/QuadraticProgram/QuadraticProgram.jl:35-61``,
``/root/reference/src/ConicProgram/ConicProgram.jl:35-52``). Every program is a
pytree of dense ``jnp`` arrays with static shapes, so it can be traced,
``vmap``-batched over instances, and sharded over a device mesh.

Conventions (AK17 / Amos-Kolter, arXiv:1703.00443):

``QuadProgram``::

    min_z  1/2 z'Qz + q'z
    s.t.   A z = b          (dual nu, Lagrangian term + nu.(Az - b))
           G z <= h         (dual lam >= 0, Lagrangian term + lam.(Gz - h))

Note the equality dual ``nu`` follows the *paper* sign convention; MOI's dual is
``-nu`` (see ``/root/reference/src/QuadraticProgram/QuadraticProgram.jl:156-171``).

``ConeProgram`` (Agrawal et al., arXiv:1904.09043 / SCS geometric form)::

    min_x  c'x
    s.t.   A x + s = b,  s in K        (dual y in K*)

All leading dimensions before the documented trailing shape are batch
dimensions handled by ``jax.vmap``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .cones import ConeSpec

Array = jax.Array


def _pytree_dataclass(cls=None, *, meta_fields: Tuple[str, ...] = ()):
    """Register a frozen dataclass as a JAX pytree with given static fields."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=list(data_fields), meta_fields=list(meta_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


@_pytree_dataclass
class QuadProgram:
    """Quadratic program ``min 1/2 z'Qz + q'z  s.t.  Az = b, Gz <= h``.

    Shapes: ``Q (n, n)``, ``q (n,)``, ``A (p, n)``, ``b (p,)``, ``G (m, n)``,
    ``h (m,)``. ``p`` or ``m`` may be zero. Mirrors the data extracted by the
    reference at ``QuadraticProgram.jl:182-213``.
    """

    Q: Array
    q: Array
    A: Array
    b: Array
    G: Array
    h: Array

    @property
    def num_vars(self) -> int:
        return self.q.shape[-1]

    @property
    def num_eq(self) -> int:
        return self.b.shape[-1]

    @property
    def num_ineq(self) -> int:
        return self.h.shape[-1]

    def with_batch(self) -> "QuadProgram":
        """Add a leading batch dim of size 1 to every field."""
        return jax.tree.map(lambda x: x[None], self)

    @staticmethod
    def make(
        Q=None, q=None, A=None, b=None, G=None, h=None, *, n=None, dtype=None
    ) -> "QuadProgram":
        """Build a QuadProgram, filling absent pieces with empty arrays."""
        if q is not None:
            q = jnp.asarray(q, dtype=dtype)
            n = q.shape[-1]
        if n is None:
            raise ValueError("need q or n to infer the variable count")
        dt = dtype or (q.dtype if q is not None else jnp.float64)
        Q = jnp.zeros((n, n), dt) if Q is None else jnp.asarray(Q, dt)
        q = jnp.zeros((n,), dt) if q is None else q.astype(dt)
        A = jnp.zeros((0, n), dt) if A is None else jnp.asarray(A, dt).reshape(-1, n)
        b = jnp.zeros((0,), dt) if b is None else jnp.asarray(b, dt).reshape(-1)
        G = jnp.zeros((0, n), dt) if G is None else jnp.asarray(G, dt).reshape(-1, n)
        h = jnp.zeros((0,), dt) if h is None else jnp.asarray(h, dt).reshape(-1)
        return QuadProgram(Q=Q, q=q, A=A, b=b, G=G, h=h)


@_pytree_dataclass
class QPSolution:
    """Primal-dual solution of a :class:`QuadProgram` in AK17 convention.

    ``z (n,)`` primal, ``lam (m,) >= 0`` inequality duals, ``nu (p,)`` equality
    duals with Lagrangian ``+ nu.(Az-b)`` (the negative of the MOI dual,
    ``QuadraticProgram.jl:156-171``).
    """

    z: Array
    lam: Array
    nu: Array


@_pytree_dataclass
class QPTangent:
    """Directional perturbation of QuadProgram data (forward-mode seed).

    Matches the seed bundle assembled by the reference's
    ``forward_differentiate!`` at ``QuadraticProgram.jl:357-433``.
    """

    dQ: Array
    dq: Array
    dA: Array
    db: Array
    dG: Array
    dh: Array

    @staticmethod
    def zeros_like(qp: QuadProgram) -> "QPTangent":
        return QPTangent(
            dQ=jnp.zeros_like(qp.Q),
            dq=jnp.zeros_like(qp.q),
            dA=jnp.zeros_like(qp.A),
            db=jnp.zeros_like(qp.b),
            dG=jnp.zeros_like(qp.G),
            dh=jnp.zeros_like(qp.h),
        )


@_pytree_dataclass(meta_fields=("cones",))
class ConeProgram:
    """Conic program ``min c'x  s.t.  Ax + s = b, s in K`` (SCS geometric form).

    ``A (m, n)``, ``b (m,)``, ``c (n,)``; ``cones`` is a static
    :class:`~diffopt_tpu.cones.ConeSpec` describing the row layout of K —
    the static analogue of the reference's runtime ``ProductOfSets``
    (``src/product_of_sets.jl:15-74``).
    """

    A: Array
    b: Array
    c: Array
    cones: ConeSpec

    @property
    def num_vars(self) -> int:
        return self.c.shape[-1]

    @property
    def num_rows(self) -> int:
        return self.b.shape[-1]


@_pytree_dataclass
class ConeSolution:
    """Primal-dual-slack solution: ``x (n,)``, ``y (m,)`` dual in K*, ``s (m,)``
    slack in K. Matches ``ConicProgram.jl:93-96``."""

    x: Array
    y: Array
    s: Array


@_pytree_dataclass
class ConeTangent:
    """Perturbations (dA, db, dc) of ConeProgram data."""

    dA: Array
    db: Array
    dc: Array

    @staticmethod
    def zeros_like(cp: ConeProgram) -> "ConeTangent":
        return ConeTangent(
            dA=jnp.zeros_like(cp.A),
            db=jnp.zeros_like(cp.b),
            dc=jnp.zeros_like(cp.c),
        )
