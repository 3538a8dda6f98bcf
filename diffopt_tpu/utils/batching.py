"""Heterogeneous-instance batching: padding and size-bucketing.

MOI's dynamic models have no JAX analogue (SURVEY.md §7 "Static shapes"):
batches must share shapes. These utilities pad a list of differently-sized
QuadPrograms into one static-shaped batch — inactive rows are padded so the
padded instance is mathematically identical to the original:

* objective: padded Q gets identity diagonal, padded q zeros, padded primal
  variables solve to 0 and are masked out of results;
* equality rows: pad with ``x_pad_i = 0`` rows (identity on padding vars);
* inequality rows: pad with ``0'x <= 1`` (never active, zero dual).

``bucket_by_shape`` groups instances into few shape buckets to bound padding
waste, the standard TPU batching pattern.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ir import QPSolution, QuadProgram

Array = jax.Array


def pad_qp(qp: QuadProgram, n: int, m: int, p: int) -> QuadProgram:
    """Pad one instance to (n, m, p) preserving its solution on the original
    coordinates."""
    n0, m0, p0 = qp.num_vars, qp.num_ineq, qp.num_eq
    if (n0, m0, p0) == (n, m, p):
        return qp
    dt = qp.Q.dtype
    Q = jnp.zeros((n, n), dt).at[:n0, :n0].set(qp.Q)
    idx = jnp.arange(n0, n)
    Q = Q.at[idx, idx].set(1.0)  # padded vars: min 1/2 x^2 -> 0
    q = jnp.zeros((n,), dt).at[:n0].set(qp.q)
    A = jnp.zeros((p, n), dt).at[:p0, :n0].set(qp.A)
    b = jnp.zeros((p,), dt).at[:p0].set(qp.b)
    # Every padded equality row MUST bind its own fresh padding variable
    # (x_pad_i = 0, whose dual is uniquely 0 by stationarity Q x_pad + nu =
    # 0). A trivial 0 = 0 row keeps the padded *solution* correct but its
    # dual is indeterminate — the KKT Jacobian goes singular and implicit
    # differentiation returns NaN (measured; the round-2 verdict's padded-
    # gradient gap). pad_and_stack sizes n so this never under-runs.
    extra = p - p0
    if extra > n - n0:
        raise ValueError(
            f"pad_qp: {extra} padded equality rows need {extra} padding "
            f"variables but only {n - n0} are available — pad n to at "
            f"least {n0 + extra}"
        )
    if extra > 0:
        rows = jnp.arange(p0, p0 + extra)
        cols = jnp.arange(n0, n0 + extra)
        A = A.at[rows, cols].set(1.0)
    G = jnp.zeros((m, n), dt).at[:m0, :n0].set(qp.G)
    h = jnp.ones((m,), dt).at[:m0].set(qp.h)  # padded rows: 0'x <= 1
    return QuadProgram(Q=Q, q=q, A=A, b=b, G=G, h=h)


def pad_and_stack(qps: Sequence[QuadProgram]) -> Tuple[QuadProgram, list]:
    """Pad a list of instances to their max dims and stack into one batch.
    Returns (batched_qp, original_dims) for unpadding results."""
    dims = [(qp.num_vars, qp.num_ineq, qp.num_eq) for qp in qps]
    m = max(d[1] for d in dims)
    p = max(d[2] for d in dims)
    # n must leave room for one fresh padding variable per padded equality
    # row of EVERY instance (see pad_qp: a 0 = 0 row has an indeterminate
    # dual and NaNs the implicit diff)
    n = max(max(d[0] for d in dims), max(d[0] + (p - d[2]) for d in dims))
    padded = [pad_qp(qp, n, m, p) for qp in qps]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
    return batched, dims


def unpad_solution(sol: QPSolution, dims: list) -> List[QPSolution]:
    """Slice a batched solution back to the original per-instance dims."""
    out = []
    for i, (n0, m0, p0) in enumerate(dims):
        out.append(
            QPSolution(
                z=sol.z[i, :n0], lam=sol.lam[i, :m0], nu=sol.nu[i, :p0]
            )
        )
    return out


def unpad_tangent(tan, dims: list):
    """Slice padded-batch *data gradients* back to the original per-instance
    shapes — the gradient counterpart of :func:`unpad_solution`.

    ``tan`` is a batched :class:`~diffopt_tpu.ir.QPTangent` (or any pytree
    with the QuadProgram field layout, e.g. the ``QuadProgram``-shaped
    cotangent from ``jax.grad`` through a padded batch). Cotangent entries on
    padding rows/columns perturb rows that do not exist in the original
    instance; on the original coordinates the padded program's solution map
    is identical to the unpadded one (padded duals are uniquely zero by
    construction), so the slices ARE the per-instance gradients — asserted
    against loop-of-solves oracles in ``tests/test_batching_grad.py``.
    """
    from ..ir import QPTangent

    def fields(t):
        if hasattr(t, "dQ"):
            return t.dQ, t.dq, t.dA, t.db, t.dG, t.dh, True
        return t.Q, t.q, t.A, t.b, t.G, t.h, False

    Q, q, A, b, G, h, is_tan = fields(tan)
    out = []
    for i, (n0, m0, p0) in enumerate(dims):
        vals = dict(
            dQ=Q[i, :n0, :n0], dq=q[i, :n0], dA=A[i, :p0, :n0],
            db=b[i, :p0], dG=G[i, :m0, :n0], dh=h[i, :m0],
        )
        if is_tan:
            out.append(QPTangent(**vals))
        else:
            out.append(
                QuadProgram(
                    Q=vals["dQ"], q=vals["dq"], A=vals["dA"], b=vals["db"],
                    G=vals["dG"], h=vals["dh"],
                )
            )
    return out


def bucket_by_shape(
    qps: Sequence[QuadProgram], max_buckets: int = 4
) -> Dict[Tuple[int, int, int], List[int]]:
    """Group instance indices into at most ``max_buckets`` shape buckets
    (greedy by padded-volume cost). Returns {bucket_dims: [indices]}."""
    dims = [(qp.num_vars, qp.num_ineq, qp.num_eq) for qp in qps]
    uniq = sorted(set(dims))
    if len(uniq) <= max_buckets:
        buckets = {u: [] for u in uniq}
        for i, d in enumerate(dims):
            buckets[d].append(i)
        return buckets
    # greedy merge: split sorted unique dims into contiguous groups, bucket
    # dim = elementwise max of the group
    groups = np.array_split(np.arange(len(uniq)), max_buckets)
    buckets: Dict[Tuple[int, int, int], List[int]] = {}
    assign = {}
    for g in groups:
        members = [uniq[i] for i in g]
        bd = tuple(int(max(u[k] for u in members)) for k in range(3))
        buckets[bd] = []
        for u in members:
            assign[u] = bd
    for i, d in enumerate(dims):
        buckets[assign[d]].append(i)
    return buckets


# ---------------------------------------------------------------------------
# Conic padding. Same contract as pad_qp — the padded instance is
# mathematically identical on the original coordinates — with per-kind
# padding rows chosen so padded slacks/duals are uniquely determined
# (no KKT degeneracy for the implicit diff):
#
# * nonneg/nonpos rows: ``0'x + s = +-1`` (strictly inactive, dual 0);
# * soc blocks grown from dim d0 to d: appended tail coordinates get zero
#   rows (s_tail = 0 inside the same cone, margin unchanged);
# * whole appended soc blocks: ``s = (1, 0, ..., 0)`` (strict interior,
#   dual 0).
#
# Variable counts must already match (scenario batches share x's meaning);
# zero-cone rows are not padded (a 0 = 0 row has an indeterminate dual).
# ---------------------------------------------------------------------------

from ..cones import ConeSpec  # noqa: E402
from ..ir import ConeProgram, ConeSolution  # noqa: E402


def cone_pad_spec(specs: Sequence[ConeSpec]) -> ConeSpec:
    """Elementwise-max target spec for a list of specs sharing the same
    ordered kind sequence (extra trailing blocks in some instances are
    allowed; missing blocks are padded in as interior blocks)."""
    max_len = max(len(sp.blocks) for sp in specs)
    blocks = []
    for i in range(max_len):
        kinds = {sp.blocks[i][0] for sp in specs if len(sp.blocks) > i}
        if len(kinds) != 1:
            raise ValueError(
                f"cone block {i}: mismatched kinds {sorted(kinds)}; "
                "heterogeneous batching needs a shared kind sequence"
            )
        (kind,) = kinds
        prms = {sp.blocks[i][2] for sp in specs if len(sp.blocks) > i}
        if len(prms) != 1:
            raise ValueError(
                f"cone block {i}: mismatched {kind} parameters {sorted(prms)}"
            )
        prm = prms.pop()
        if kind == "zero":
            dims = {sp.blocks[i][1] for sp in specs if len(sp.blocks) > i}
            if len(dims) != 1 or any(len(sp.blocks) <= i for sp in specs):
                raise ValueError(
                    "zero-cone blocks cannot be padded (indeterminate duals)"
                )
            blocks.append((kind, dims.pop()))
        else:
            d = max(sp.blocks[i][1] for sp in specs if len(sp.blocks) > i)
            blocks.append((kind, d) if prm is None else (kind, d, prm))
    return ConeSpec(blocks)


def pad_cone_program(cp: ConeProgram, target: ConeSpec) -> ConeProgram:
    """Pad one instance's rows to ``target`` (same n) preserving its
    solution: x identical, original (y, s) on the original rows, padded rows
    strictly inactive with zero dual."""
    if cp.cones == target:
        return cp
    dt = cp.A.dtype
    n = cp.num_vars
    src = list(cp.cones.offsets())
    A_rows, b_rows = [], []
    for i, (kind, t_off, t_dim) in enumerate(target.offsets()):
        if i < len(src):
            s_kind, s_off, s_dim = src[i]
            if s_kind != kind or s_dim > t_dim:
                raise ValueError(
                    f"block {i}: cannot pad {s_kind}({s_dim}) to {kind}({t_dim})"
                )
            A_rows.append(cp.A[s_off : s_off + s_dim])
            b_rows.append(cp.b[s_off : s_off + s_dim])
            extra = t_dim - s_dim
        else:
            s_dim = 0
            extra = t_dim
        if extra == 0:
            continue
        A_rows.append(jnp.zeros((extra, n), dt))
        if kind == "nonneg":
            b_rows.append(jnp.ones((extra,), dt))  # s = 1 > 0
        elif kind == "nonpos":
            b_rows.append(-jnp.ones((extra,), dt))  # s = -1 < 0
        elif kind in ("soc", "rsoc"):
            if s_dim > 0:
                b_rows.append(jnp.zeros((extra,), dt))  # tail coords 0
            else:
                head = jnp.zeros((extra,), dt).at[0].set(1.0)
                if kind == "rsoc" and extra > 1:
                    head = head.at[1].set(1.0)  # (1, 1, 0..): 2tu = 2 > 0
                b_rows.append(head)
        elif kind in ("exp", "dual_exp", "pow", "dual_pow"):
            # fixed 3-dim kinds: the only padding shape is a whole appended
            # block; s = a strictly interior point (alpha-independent for
            # the power cones), dual 0 — complementarity with s interior
            # forces the padded dual to exactly 0, so it stays unique
            interior = {
                "exp": [0.0, 1.0, 2.0],        # 1*e^0 = 1 < 2
                "dual_exp": [-1.0, 1.0, 1.0],  # 1*e^{-1} < e*1
                "pow": [1.0, 1.0, 0.0],        # 1 > 0
                "dual_pow": [1.0, 1.0, 0.0],   # (1/a)^a (1/(1-a))^{1-a} > 0
            }[kind]
            b_rows.append(jnp.asarray(interior, dt))
        elif kind == "psd":
            if s_dim > 0:
                raise ValueError(
                    "psd blocks cannot be grown in place (svec interleaving);"
                    " only whole appended psd blocks are supported"
                )
            from ..cones import _tri_side, sym_to_svec

            side = _tri_side(extra)
            b_rows.append(sym_to_svec(jnp.eye(side, dtype=dt)))
        else:
            raise ValueError(f"cannot pad cone kind {kind!r}")
    return ConeProgram(
        A=jnp.concatenate(A_rows, axis=0),
        b=jnp.concatenate(b_rows, axis=0),
        c=cp.c,
        cones=target,
    )


def pad_and_stack_cones(
    cps: Sequence[ConeProgram],
) -> Tuple[ConeProgram, list]:
    """Pad a list of same-n conic instances to a shared cone spec and stack.
    Returns (batched_cp, original_specs) for unpadding."""
    if len({cp.num_vars for cp in cps}) != 1:
        raise ValueError("pad_and_stack_cones requires a shared variable count")
    target = cone_pad_spec([cp.cones for cp in cps])
    padded = [pad_cone_program(cp, target) for cp in cps]
    batched = ConeProgram(
        A=jnp.stack([q.A for q in padded]),
        b=jnp.stack([q.b for q in padded]),
        c=jnp.stack([q.c for q in padded]),
        cones=target,
    )
    return batched, [cp.cones for cp in cps]


def unpad_cone_solution(
    sol: ConeSolution, specs: list, target: ConeSpec
) -> List[ConeSolution]:
    """Slice a batched solution back to each instance's original rows."""
    t_offsets = list(target.offsets())
    out = []
    for i, spec in enumerate(specs):
        rows = []
        for (kind, s_off, s_dim), (_, t_off, _) in zip(
            spec.offsets(), t_offsets
        ):
            rows.append(np.arange(t_off, t_off + s_dim))
        idx = jnp.asarray(np.concatenate(rows))
        out.append(
            ConeSolution(x=sol.x[i], y=sol.y[i, idx], s=sol.s[i, idx])
        )
    return out


def _cone_row_index(spec: ConeSpec, target: ConeSpec):
    rows = []
    for (kind, s_off, s_dim), (_, t_off, _) in zip(
        spec.offsets(), list(target.offsets())
    ):
        rows.append(np.arange(t_off, t_off + s_dim))
    return jnp.asarray(
        np.concatenate(rows) if rows else np.zeros((0,), np.int64)
    )


def unpad_cone_tangent(tan, specs: list, target: ConeSpec):
    """Conic counterpart of :func:`unpad_tangent`: slice padded-batch data
    gradients (a batched :class:`~diffopt_tpu.ir.ConeTangent`, or the
    ``ConeProgram``-shaped cotangent from ``jax.grad``) back to each
    instance's original rows. Padding rows are strictly inactive with zero
    dual, so on the original rows the padded solution map — and hence its
    gradient — is the unpadded one (tested against loop-of-solves oracles
    in ``tests/test_batching_grad.py``)."""
    from ..ir import ConeTangent

    is_tan = hasattr(tan, "dA")
    A = tan.dA if is_tan else tan.A
    b = tan.db if is_tan else tan.b
    c = tan.dc if is_tan else tan.c
    out = []
    for i, spec in enumerate(specs):
        idx = _cone_row_index(spec, target)
        vals = dict(dA=A[i, idx, :], db=b[i, idx], dc=c[i])
        if is_tan:
            out.append(ConeTangent(**vals))
        else:
            out.append(
                ConeProgram(
                    A=vals["dA"], b=vals["db"], c=vals["dc"], cones=spec
                )
            )
    return out
