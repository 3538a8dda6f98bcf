"""Differentiable problem rewrites (the reference's MOI bridges, as functions).

The reference transports derivatives through MOI bridges with per-bridge
attribute overloads (``/root/reference/src/bridges.jl``). Here each rewrite is
a plain traced function from IR to IR, so derivative transport is the chain
rule — with the one nontrivial case, the quadratic-constraint -> SOC rewrite,
getting the reference's explicit Cholesky-factor calculus
(``bridges.jl:224-323``) as first-class ops.

Rewrites provided (reference exercised set, SURVEY.md §7):

* ``geq_to_leq``        — sign-flip of >= rows into <= rows
* ``bounds_to_rows``    — variable bounds as inequality rows
* ``max_to_min``        — objective sense flip
* ``qp_to_cone``        — QuadProgram -> ConeProgram (zero + nonneg rows);
                          the LP/QP-as-conic path the reference gets from its
                          geometric form
* ``quad_constraint_to_soc`` — 1/2 x'Qx + a'x + b <= 0 into SOC rows via the
                          Cholesky factor (MOI QuadtoSOC bridge)
* ``dU_from_dQ`` / ``dQ_from_dU`` — the triangular derivative transport pair
                          (``bridges.jl:304-323`` and ``:246-268``)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .cones import ConeSpec
from .ir import ConeProgram, QuadProgram

Array = jax.Array


def geq_to_leq(G_geq: Array, h_geq: Array) -> Tuple[Array, Array]:
    """``Gx >= h``  ->  ``(-G)x <= (-h)`` (reference test harness sign logic,
    ``test/utils.jl:104-124``)."""
    return -G_geq, -h_geq


def bounds_to_rows(lb: Array, ub: Array) -> Tuple[Array, Array]:
    """Finite variable bounds as inequality rows ``Gx <= h``
    (``test/utils.jl:109-135``). Expects concrete lb/ub (static pattern)."""
    import numpy as np

    lb = np.asarray(lb, float)
    ub = np.asarray(ub, float)
    n = lb.shape[0]
    rows = []
    rhs = []
    for j in np.nonzero(np.isfinite(ub))[0]:
        e = np.zeros(n)
        e[j] = 1.0
        rows.append(e)
        rhs.append(ub[j])
    for j in np.nonzero(np.isfinite(lb))[0]:
        e = np.zeros(n)
        e[j] = -1.0
        rows.append(e)
        rhs.append(-lb[j])
    if not rows:
        return jnp.zeros((0, n)), jnp.zeros((0,))
    return jnp.asarray(np.stack(rows)), jnp.asarray(np.array(rhs))


def max_to_min(Q: Array, q: Array) -> Tuple[Array, Array]:
    """max 1/2 x'Qx + q'x == min of the negation (``ConicProgram.jl:206-208``)."""
    return -Q, -q


def qp_to_cone(
    qp: QuadProgram, quadratic: bool | None = None, psd: bool | None = None
) -> ConeProgram:
    """Lower a QuadProgram into conic geometric form.

    Affine objectives (LPs) lower directly: rows = [Az + s = b, s in {0}] +
    [Gz + s = h, s in R+]. Quadratic objectives lower via the epigraph
    rotated-SOC — the conic-form analogue of the reference's objective-slack
    bridge + QuadtoSOC calculus (``/root/reference/src/copy_dual.jl:103-109``,
    ``src/bridges.jl:6-21``): with ``Q = U'U``,

        min 1/2 x'Qx + q'x  ==  min q'x + t  s.t.  (t, 1, Ux) in RSOC

    (``2 t * 1 >= ||Ux||^2 = x'Qx``). The lowering is plain differentiable
    jnp (factorization included), so derivative transport through the bridge
    is the chain rule under jax AD — what ``bridges.jl:109-222`` hand-codes.

    ``quadratic=None`` auto-detects from a concrete Q (``norm(Q) != 0`` —
    the reference's LP test, ``QuadraticProgram.jl:333``); pass it explicitly
    when Q is a tracer (the cone layout is static structure).

    ``psd`` picks the factorization: ``False`` = Cholesky (Q strictly PD),
    ``True`` = eigh with eigenvalues clamped at zero, which handles
    PSD-*singular* Q the way the reference's pivoted Cholesky does
    (``/root/reference/src/bridges.jl:90-98``). ``None`` auto-detects from a
    concrete Q (and raises on an indefinite Q instead of silently NaN'ing);
    tracers default to Cholesky.
    """
    n, p, m = qp.num_vars, qp.num_eq, qp.num_ineq
    if quadratic is None:
        try:
            import numpy as _np

            quadratic = (
                float(
                    _np.linalg.norm(
                        _np.asarray(jax.core.concrete_or_error(None, qp.Q))
                    )
                )
                != 0.0
            )
        except Exception as exc:
            raise ValueError(
                "qp_to_cone: Q is a tracer — pass quadratic=True/False "
                "explicitly (the cone layout is static structure)"
            ) from exc
    if not quadratic:
        A = jnp.concatenate([qp.A, qp.G], axis=-2)
        b = jnp.concatenate([qp.b, qp.h], axis=-1)
        cones = ConeSpec([("zero", p), ("nonneg", m)])
        return ConeProgram(A=A, b=b, c=qp.q, cones=cones)

    dt = qp.Q.dtype
    if psd is None:
        try:
            import numpy as _np

            Qc = _np.asarray(jax.core.concrete_or_error(None, qp.Q))
            w = _np.linalg.eigvalsh(Qc)
            wmax = float(w.max()) if w.size else 0.0
            tol_psd = 1e2 * _np.finfo(Qc.dtype).eps * max(wmax, 1.0)
            if float(w.min()) < -tol_psd:
                raise ValueError(
                    "qp_to_cone: Q is indefinite (min eigenvalue "
                    f"{float(w.min()):.3e}); the epigraph-RSOC lowering "
                    "requires Q >= 0 (reference: bridges.jl:90-98 errors "
                    "via pivoted Cholesky)"
                )
            psd = float(w.min()) < tol_psd  # singular/semidefinite
        except ValueError:
            raise
        except Exception:
            psd = False  # tracer Q: assume strictly PD (pass psd= to force)
    if psd:
        # eigh factorization U = sqrt(clamp(w, 0)) V': U'U = Q for any PSD Q,
        # including singular Q where Cholesky produces NaN
        w, V = jnp.linalg.eigh(qp.Q)
        U = jnp.sqrt(jnp.maximum(w, 0.0))[..., :, None] * jnp.swapaxes(
            V, -1, -2
        )
    else:
        L = jnp.linalg.cholesky(qp.Q)
        U = jnp.swapaxes(L, -1, -2)
    zcol = jnp.zeros(qp.A.shape[:-2] + (p, 1), dt)
    zcol_m = jnp.zeros(qp.G.shape[:-2] + (m, 1), dt)
    A_eq = jnp.concatenate([qp.A, zcol], axis=-1)
    A_in = jnp.concatenate([qp.G, zcol_m], axis=-1)
    # rsoc rows: s1 = t, s2 = 1, s3.. = U x  (s = b - A xtilde)
    r1 = jnp.zeros(qp.Q.shape[:-2] + (1, n + 1), dt).at[..., 0, n].set(-1.0)
    b1 = jnp.zeros(qp.b.shape[:-1] + (1,), dt)
    r2 = jnp.zeros(qp.Q.shape[:-2] + (1, n + 1), dt)
    b2 = jnp.ones(qp.b.shape[:-1] + (1,), dt)
    r3 = jnp.concatenate(
        [-U, jnp.zeros(qp.Q.shape[:-2] + (n, 1), dt)], axis=-1
    )
    b3 = jnp.zeros(qp.b.shape[:-1] + (n,), dt)
    A = jnp.concatenate([A_eq, A_in, r1, r2, r3], axis=-2)
    b = jnp.concatenate([qp.b, qp.h, b1, b2, b3], axis=-1)
    c = jnp.concatenate(
        [qp.q, jnp.ones(qp.q.shape[:-1] + (1,), dt)], axis=-1
    )
    cones = ConeSpec([("zero", p), ("nonneg", m), ("rsoc", n + 2)])
    return ConeProgram(A=A, b=b, c=c, cones=cones)


def qp_via_conic(
    qp: QuadProgram,
    quadratic: bool | None = None,
    psd: bool | None = None,
    **solve_options,
):
    """Solve a QuadProgram through the conic backend and map the solution
    back to AK17 QP coordinates — the reference's both-backend route (every
    QP harness case also runs under ``ConicProgram.Model``,
    ``test/utils.jl:369-377``). Fully differentiable: gradients flow through
    the epigraph lowering (Cholesky calculus included) and the conic rule.

    Dual mapping: ``nu = y_zero`` (AK17 ``+nu(Az-b)`` sign), ``lam =
    y_nonneg``; the rsoc dual block ``(y_t, y_2, y_u)`` satisfies ``y_t = 1``
    and ``y_u = -U x`` at the optimum and is dropped.
    """
    from .solve import solve_conic

    cp = qp_to_cone(qp, quadratic=quadratic, psd=psd)
    sol = solve_conic(cp, **solve_options)
    n, p, m = qp.num_vars, qp.num_eq, qp.num_ineq
    from .ir import QPSolution

    return QPSolution(
        z=sol.x[..., :n],
        lam=sol.y[..., p : p + m],
        nu=sol.y[..., :p],
    )


def quad_constraint_to_soc(
    Q: Array, a: Array, beta: Array
) -> Tuple[Array, Array, ConeSpec]:
    """Rewrite ``1/2 x'Qx + a'x + beta <= 0`` (Q PSD) into SOC rows.

    MOI's QuadtoSOC bridge produces ``(1, -a'x - beta, Ux) in RSOC`` with
    ``Q = U'U`` (``bridges.jl:90-98``); composing with the standard
    RSOC->SOC map gives the SOC block ``(t+u, t-u, sqrt2 Ux)``.

    Returns ``(A_rows, b_rows, spec)`` in ``Ax + s = b`` orientation
    (s = row value). Written entirely in differentiable jnp, so forward
    and reverse derivative transport (the role of ``bridges.jl:109-222``)
    falls out of AD through the Cholesky factorization.
    """
    n = a.shape[-1]
    L = jnp.linalg.cholesky(Q)
    U = jnp.swapaxes(L, -1, -2)  # Q = U'U with U upper
    sq2 = jnp.sqrt(jnp.asarray(2.0, Q.dtype))
    # s rows as functions of x:  s1 = 1 + (-a'x - beta) = t+u, s2 = 1 - u,
    # s3.. = sqrt2 * U x  ->  A = -coeffs, b = constants
    A1 = a[..., None, :]  # s1 = (1 - beta) - a'x  -> A row = +a
    b1 = (1.0 - beta)[..., None]
    A2 = -a[..., None, :]  # s2 = (1 + beta) + a'x -> A row = -a
    b2 = (1.0 + beta)[..., None]
    A3 = -sq2 * U
    b3 = jnp.zeros(Q.shape[:-2] + (n,), Q.dtype)
    A_rows = jnp.concatenate([A1, A2, A3], axis=-2)
    b_rows = jnp.concatenate([b1, b2, b3], axis=-1)
    return A_rows, b_rows, ConeSpec([("soc", n + 2)])


def dU_from_dQ(dQ: Array, U: Array) -> Array:
    """Solve ``dQ = dU'U + U'dU`` for upper-triangular ``dU``
    (``bridges.jl:270-323``) — forward transport of a quadratic-form
    perturbation through its Cholesky factor.

    Closed form: with ``S = U^-T dQ U^-1`` (symmetric),
    ``dU = (strict_triu(S) + diag(S)/2) U``.
    """
    T1 = jax.scipy.linalg.solve_triangular(U, dQ, lower=False, trans=1)
    S = jax.scipy.linalg.solve_triangular(
        U, jnp.swapaxes(T1, -1, -2), lower=False, trans=1
    )
    S = jnp.swapaxes(S, -1, -2)
    F = jnp.triu(S, 1) + 0.5 * jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(
        jnp.diagonal(S, axis1=-2, axis2=-1)
    )
    return F @ U


def dQ_from_dU(dU: Array, U: Array) -> Array:
    """Return the symmetric ``dQ`` solving ``triu(dU) = 2 triu(U dQ)``
    (``bridges.jl:224-268``) — reverse transport from SOC coordinates back to
    the quadratic form.

    Closed form (two triangular solves + two matmuls; the reference's
    two-loop in-place kernel and this package's earlier column-by-column
    unroll are O(n) sequential — this is the batched/TPU shape): write
    ``M = U dQ = T + P`` with ``T = triu(dU)/2`` known and ``P`` strictly
    lower unknown. Symmetry of ``dQ = U^{-1} M`` is equivalent to
    ``P U' - U P' = U T' - T U' =: K`` (antisymmetric); since ``R = P U'``
    is strictly lower and ``R - R' = K``, it follows ``R = tril(K, -1)``,
    then ``P`` and ``dQ`` are triangular solves. Verified to machine
    precision against the unrolled recursion for n in {3,5,9,16}."""
    T = jnp.triu(dU) / 2.0
    Ut = jnp.swapaxes(U, -1, -2)
    Tt = jnp.swapaxes(T, -1, -2)
    K = U @ Tt - T @ Ut
    R = jnp.tril(K, -1)
    # P U' = R  <=>  U P' = R'
    Pt = jax.scipy.linalg.solve_triangular(
        U, jnp.swapaxes(R, -1, -2), lower=False
    )
    dQ = jax.scipy.linalg.solve_triangular(
        U, T + jnp.swapaxes(Pt, -1, -2), lower=False
    )
    # symmetric by construction; enforce exactly for downstream seeds
    return 0.5 * (dQ + jnp.swapaxes(dQ, -1, -2))
