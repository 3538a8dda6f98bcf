"""Nonsymmetric-cone PDIPM (``solvers/conic_nsipm.py``): exp / pow /
dual_exp / dual_pow programs solved in ~10-30 Newton steps instead of the
~20,000-iteration DR splitting, checked against analytic solutions, the DR
solver, and the implicit-diff rules.

The reference solves these cones through its SCS delegate and
differentiates via the generic projection machinery
(``/root/reference/src/diff_opt.jl:483-519``); here both the solver and the
derivative are first-class.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import (
    ConeProgram,
    ConeSpec,
    ConeTangent,
    conic_diff,
    solve_conic,
)
from diffopt_tpu.solvers import conic as conicsolver
from diffopt_tpu.solvers import conic_nsipm

from test_exp_cone_program import _entropy_program
from test_pow_rsoc_programs import _geomean_program


def test_supports_and_dispatch():
    assert conic_nsipm.supports(ConeSpec([("exp", 3), ("soc", 3)]))
    assert conic_nsipm.supports(ConeSpec([("pow", 3, 0.4), ("psd", 6)]))
    assert not conic_nsipm.has_nonsymmetric(ConeSpec([("nonneg", 2)]))
    assert conic_nsipm.has_nonsymmetric(ConeSpec([("dual_exp", 3)]))


def test_entropy_maximization_nsipm():
    """Entropy max: x_i = 1/k, t_i = -x log x — analytic (same case the DR
    solver needs ~40k iterations for; the PDIPM takes ~10 Newton steps)."""
    k = 3
    cp = _entropy_program(k)
    sol, info = conic_nsipm.solve(cp)
    assert bool(info.converged), (info.primal_residual, info.dual_residual)
    assert int(info.iterations) < 60
    np.testing.assert_allclose(np.asarray(sol.x[:k]), 1.0 / k, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(sol.x[k:]), -(1.0 / k) * np.log(1.0 / k), atol=1e-7
    )


def test_geomean_power_cone_nsipm():
    a = 0.3
    cp = _geomean_program(a)
    sol, info = conic_nsipm.solve(cp, tol=1e-12)
    assert bool(info.converged)
    t_star = a**a * (1 - a) ** (1 - a)
    np.testing.assert_allclose(
        np.asarray(sol.x), [a, 1 - a, t_star], atol=1e-8
    )


def _dual_exp_program():
    """min u s.t. (u, 1, 1) in K_exp^*: boundary -u e^{1/u} = e."""
    A = np.zeros((3, 1))
    A[0, 0] = -1.0
    b = np.array([0.0, 1.0, 1.0])
    c = np.array([1.0])
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("dual_exp", 3)]),
    )


def test_dual_exp_program_vs_dr():
    cp = _dual_exp_program()
    sol, info = conic_nsipm.solve(cp)
    assert bool(info.converged)
    sold, infod = conicsolver.solve(cp, max_iters=40000, tol=1e-10)
    assert bool(infod.converged)
    np.testing.assert_allclose(
        float(sol.x[0]), float(sold.x[0]), atol=1e-6
    )
    # boundary identity: -u e^{1/u} = e
    u = float(sol.x[0])
    np.testing.assert_allclose(-u * np.exp(1.0 / u), np.e, atol=1e-6)


def test_dual_pow_program_analytic():
    """min u + v s.t. (u, v, 1) in K_pow(a)^*: minimize over the boundary
    (u/a)^a (v/(1-a))^{1-a} = 1 gives u = a, v = 1-a (by AM-GM the
    unweighted sum is minimized at the scaling point)."""
    a = 0.4
    A = np.zeros((3, 2))
    A[0, 0] = -1.0
    A[1, 1] = -1.0
    b = np.array([0.0, 0.0, 1.0])
    c = np.array([1.0, 1.0])
    cp = ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("dual_pow", 3, a)]),
    )
    sol, info = conic_nsipm.solve(cp)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(sol.x), [a, 1 - a], atol=1e-6)


def _mixed_exp_soc_program():
    """max t + x s.t. (t, x, 1) in K_exp, (2, x, t) in K_soc.
    t <= x log(1/x) forces t = 0 at x = 1 (optimum; the soc is inactive).
    Vars [t, x]."""
    A = np.zeros((6, 2))
    b = np.zeros(6)
    A[0, 0] = -1.0
    A[1, 1] = -1.0
    b[2] = 1.0
    b[3] = 2.0
    A[4, 1] = -1.0
    A[5, 0] = -1.0
    c = np.array([-1.0, -1.0])
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("exp", 3), ("soc", 3)]),
    )


def test_mixed_exp_soc_program():
    """Mixed nonsymmetric + symmetric blocks in one program (the DR
    splitting fails to converge on this instance; the PDIPM solves it)."""
    cp = _mixed_exp_soc_program()
    sol, info = conic_nsipm.solve(cp)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(sol.x), [0.0, 1.0], atol=1e-6)


def test_entropy_f32():
    """f32 on-TPU regime: converges to the f32 complementarity floor."""
    cp64 = _entropy_program(3)
    cp = ConeProgram(
        A=cp64.A.astype(jnp.float32),
        b=cp64.b.astype(jnp.float32),
        c=cp64.c.astype(jnp.float32),
        cones=cp64.cones,
    )
    sol, info = conic_nsipm.solve(cp)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(sol.x[:3]), 1.0 / 3, atol=1e-5)


def test_batched_vmap():
    """vmap over a batch of entropy programs with perturbed simplex RHS:
    sum x = r  =>  x_i = r/k."""
    k = 3
    cp = _entropy_program(k)
    rs = jnp.asarray([1.0, 1.5, 0.7])
    Ab = jnp.broadcast_to(cp.A, (3,) + cp.A.shape)
    bb = jnp.tile(cp.b[None, :], (3, 1)).at[:, 0].set(-rs)
    cb = jnp.broadcast_to(cp.c, (3,) + cp.c.shape)
    cpb = ConeProgram(A=Ab, b=bb, c=cb, cones=cp.cones)
    sol, info = conic_nsipm.solve_batched(cpb)
    assert bool(jnp.all(info.converged))
    expect = np.broadcast_to(np.asarray(rs)[:, None] / k, (3, k))
    np.testing.assert_allclose(np.asarray(sol.x[:, :k]), expect, atol=1e-6)


def test_solve_conic_auto_routes_nsipm_and_grad():
    """solve_conic(solver='auto') routes exp programs to the PDIPM and the
    implicit-diff gradients match the analytic sensitivity dx/dr = 1/k
    (sum x = r perturbation; cf. test_entropy_sensitivity_fd)."""
    k = 3
    cp = _entropy_program(k)

    def loss(b):
        cpb = ConeProgram(A=cp.A, b=b, c=cp.c, cones=cp.cones)
        sol = solve_conic(cpb)  # auto -> nsipm (exp blocks)
        return jnp.sum(sol.x[:k])

    g = jax.grad(loss)(cp.b)
    # d(sum x)/d(b0): b0 = -r, sum x = r -> derivative -1
    np.testing.assert_allclose(float(g[0]), -1.0, atol=1e-5)


def test_forward_reverse_consistency_exp():
    """Scalar-product invariance of forward/reverse conic diff at an
    nsipm-solved point (the reference harness identity,
    test/utils.jl:328-343)."""
    cp = _entropy_program(3)
    sol, info = conic_nsipm.solve(cp)
    assert bool(info.converged)
    rng = np.random.default_rng(0)
    dA = jnp.asarray(rng.normal(size=cp.A.shape) * 0.1)
    db = jnp.asarray(rng.normal(size=cp.b.shape) * 0.1)
    dc = jnp.asarray(rng.normal(size=cp.c.shape) * 0.1)
    fwd = conic_diff.forward_differentiate(
        cp, sol, ConeTangent(dA=dA, db=db, dc=dc)
    )
    dx = jnp.asarray(rng.normal(size=cp.c.shape))
    rev = conic_diff.reverse_differentiate(cp, sol, dx=dx)
    lhs = float(jnp.dot(fwd.dx, dx))
    rhs = float(
        jnp.sum(rev.dA * dA) + jnp.dot(rev.db, db) + jnp.dot(rev.dc, dc)
    )
    np.testing.assert_allclose(lhs, rhs, atol=1e-6 * (1 + abs(lhs)))


def test_f32_exp_gradients_match_f64_oracle():
    """f32 exp-cone gradients through solve_conic (nsipm + HSDE polish, the
    on-TPU configuration) vs the f64 oracle: the polish must hold the error
    near the f32 representation floor rather than the ~1e-3 complementarity
    floor of a raw f32 solve."""
    cp = _entropy_program(3)

    def loss_of(cpx):
        def loss(b):
            s = solve_conic(
                ConeProgram(A=cpx.A, b=b, c=cpx.c, cones=cpx.cones)
            )
            return jnp.sum(s.x ** 2)

        return loss

    g64 = jax.grad(loss_of(cp))(cp.b)
    cp32 = ConeProgram(
        A=cp.A.astype(jnp.float32), b=cp.b.astype(jnp.float32),
        c=cp.c.astype(jnp.float32), cones=cp.cones,
    )
    g32 = jax.grad(loss_of(cp32))(cp32.b)
    err = float(jnp.max(jnp.abs(g32.astype(jnp.float64) - g64)))
    scale = 1.0 + float(jnp.max(jnp.abs(g64)))
    assert err / scale < 5e-5, (err, scale)


def test_heterogeneous_nonsymmetric_padding():
    """Appended exp/pow/dual_exp/dual_pow/psd blocks (zero rows, strictly
    interior slack) leave the instance's solution intact with forced-zero
    padded duals — the trailing-block padding shape heterogeneous batching
    uses when instances have different cone tails (QP/soc analogue:
    test_api_utils)."""
    from diffopt_tpu.utils.batching import (
        cone_pad_spec,
        pad_cone_program,
        unpad_cone_solution,
    )

    cp = _entropy_program(3)
    target = ConeSpec(
        list(cp.cones.blocks)
        + [("exp", 3), ("pow", 3, 0.3), ("dual_exp", 3),
           ("dual_pow", 3, 0.4), ("psd", 6)]
    )
    assert cone_pad_spec([cp.cones, target]) == target
    pp = pad_cone_program(cp, target)
    solp, infop = conic_nsipm.solve(pp)
    sol, info = conic_nsipm.solve(cp)
    assert bool(infop.converged) and bool(info.converged)
    np.testing.assert_allclose(
        np.asarray(solp.x), np.asarray(sol.x), atol=1e-6
    )
    m0 = cp.num_rows
    np.testing.assert_allclose(
        np.asarray(solp.y[:m0]), np.asarray(sol.y), atol=1e-6
    )
    # padded rows: zero dual, slack = the interior padding point
    np.testing.assert_allclose(np.asarray(solp.y[m0:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(solp.s[m0:]), np.asarray(pp.b[m0:]), atol=1e-6
    )
    un = unpad_cone_solution(
        jax.tree.map(lambda a: a[None], solp), [cp.cones], target
    )[0]
    assert un.y.shape == sol.y.shape


def test_pad_spec_rejects_mismatched_pow_alpha():
    with pytest.raises(ValueError):
        from diffopt_tpu.utils.batching import cone_pad_spec

        cone_pad_spec(
            [ConeSpec([("pow", 3, 0.3)]), ConeSpec([("pow", 3, 0.4)])]
        )


def test_rejects_unknown_and_equality_only():
    with pytest.raises(ValueError):
        conic_nsipm.solve(
            ConeProgram(
                A=jnp.zeros((2, 1)), b=jnp.zeros(2), c=jnp.zeros(1),
                cones=ConeSpec([("zero", 2)]),
            )
        )
