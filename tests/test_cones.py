"""Cone projection calculus: closed forms vs autodiff and projection
properties (idempotency, Moreau decomposition)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import ConeSpec
from diffopt_tpu import cones as C


def _moreau_check(spec, v, atol=1e-9):
    """v = Pi_{K*}(v) - Pi_{-K... for our pi (projection onto dual cone):
    Moreau: v = pi(v) + (v - pi(v)) with pi(v) in K*, v - pi(v) in -K and
    <pi(v), v - pi(v)> = 0."""
    p = C.pi(spec, v)
    r = v - p
    assert abs(float(jnp.dot(p, r))) < atol


def test_soc_projection_regions():
    spec = ConeSpec([("soc", 3)])
    # inside
    np.testing.assert_allclose(C.pi(spec, jnp.array([2.0, 1.0, 0.5])),
                               [2.0, 1.0, 0.5])
    # polar: -t >= |x|
    np.testing.assert_allclose(C.pi(spec, jnp.array([-2.0, 1.0, 0.5])),
                               [0.0, 0.0, 0.0], atol=1e-12)
    # boundary case
    v = jnp.array([0.5, 2.0, 0.0])
    p = C.pi(spec, v)
    t, x = float(p[0]), np.asarray(p[1:])
    assert abs(np.linalg.norm(x) - t) < 1e-12
    _moreau_check(spec, v)


def test_soc_dpi_matches_jacfwd():
    spec = ConeSpec([("soc", 4)])
    rng = np.random.default_rng(0)
    for _ in range(5):
        v = jnp.asarray(rng.normal(size=4))
        J_closed = C.dpi_dense(spec, v)
        J_ad = jax.jacfwd(lambda u: C.pi(spec, u))(v)
        np.testing.assert_allclose(J_closed, J_ad, atol=1e-9)


def test_psd_dpi_matches_jacfwd():
    spec = ConeSpec([("psd", 6)])  # 3x3 matrices
    rng = np.random.default_rng(1)
    for _ in range(3):
        v = jnp.asarray(rng.normal(size=6))
        J_closed = C.dpi_dense(spec, v)
        J_ad = jax.jacfwd(lambda u: C.pi(spec, u))(v)
        np.testing.assert_allclose(J_closed, J_ad, atol=1e-8)
        _moreau_check(spec, v)


def test_exp_cone_projection():
    """Exp cone: projection onto K_exp* via Moreau; check (a) points already
    in K* are fixed, (b) projections land in K*, (c) Moreau orthogonality."""
    spec = ConeSpec([("exp", 3)])
    # A point in K_exp^*: u<0, -u*exp(v/u) <= e*w: u=-1, v=0, w=1: e^0=1<=e*1 ok
    v_in = jnp.array([-1.0, 0.0, 1.0])
    np.testing.assert_allclose(C.pi(spec, v_in), v_in, atol=1e-9)

    rng = np.random.default_rng(2)
    for _ in range(6):
        v = jnp.asarray(rng.normal(size=3) * 2)
        p = C.pi(spec, v)
        # idempotency: pi(pi(v)) == pi(v)
        np.testing.assert_allclose(C.pi(spec, p), p, atol=1e-6)
        # Moreau orthogonality
        r = v - p
        assert abs(float(jnp.dot(p, r))) < 1e-6, (v, p)


def test_nonneg_nonpos_zero():
    spec = ConeSpec([("zero", 2), ("nonneg", 2), ("nonpos", 2)])
    v = jnp.array([1.0, -2.0, 3.0, -4.0, 5.0, -6.0])
    np.testing.assert_allclose(
        C.pi(spec, v), [1.0, -2.0, 3.0, 0.0, 0.0, -6.0]
    )
    dv = jnp.ones(6)
    np.testing.assert_allclose(
        C.dpi_apply(spec, v, dv), [1.0, 1.0, 1.0, 0.0, 0.0, 1.0]
    )


def test_svec_roundtrip():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(4, 4))
    X = jnp.asarray(X + X.T)
    v = C.sym_to_svec(X)
    np.testing.assert_allclose(C.svec_to_sym(v), X, atol=1e-12)
    # inner-product preservation
    Y = rng.normal(size=(4, 4))
    Y = jnp.asarray(Y + Y.T)
    assert abs(
        float(jnp.sum(X * Y)) - float(jnp.dot(v, C.sym_to_svec(Y)))
    ) < 1e-9


def test_rsoc_projection_properties():
    """Rotated SOC: self-dual; check membership after projection, fixpoints,
    Moreau orthogonality, and DPi vs jacfwd of pi."""
    spec = ConeSpec([("rsoc", 4)])

    def in_rsoc(p, tol=1e-9):
        t, u, x = float(p[0]), float(p[1]), np.asarray(p[2:])
        return t >= -tol and u >= -tol and 2 * t * u + tol >= x @ x

    # a point already in the cone is fixed
    v_in = jnp.array([1.0, 2.0, 1.5, 0.5])  # 2*1*2=4 >= 1.5^2+0.5^2=2.5
    np.testing.assert_allclose(C.pi(spec, v_in), v_in, atol=1e-12)

    rng = np.random.default_rng(7)
    for _ in range(8):
        v = jnp.asarray(rng.normal(size=4) * 2)
        p = C.pi(spec, v)
        assert in_rsoc(p), (v, p)
        np.testing.assert_allclose(C.pi(spec, p), p, atol=1e-9)
        _moreau_check(spec, v, atol=1e-8)
        J_closed = C.dpi_dense(spec, v)
        J_ad = jax.jacfwd(lambda u: C.pi(spec, u))(v)
        np.testing.assert_allclose(J_closed, J_ad, atol=1e-9)
        # dpi_apply/rmatvec agree with the dense block (symmetric)
        dv = jnp.asarray(rng.normal(size=4))
        np.testing.assert_allclose(C.dpi_apply(spec, v, dv), J_closed @ dv,
                                   atol=1e-9)
        np.testing.assert_allclose(C.dpi_rmatvec(spec, v, dv), J_closed.T @ dv,
                                   atol=1e-9)


def test_pow_cone_projection_properties():
    """Power cone: pi projects onto K_pow(a)^*; check membership, fixpoints,
    Moreau orthogonality, and DPi-apply vs finite differences."""
    a = 0.6
    spec = ConeSpec([("pow", 3, a)])

    def in_dual(p, tol=1e-7):
        u, v_, w = float(p[0]), float(p[1]), float(p[2])
        return (
            u >= -tol
            and v_ >= -tol
            and (max(u / a, 0.0) ** a) * (max(v_ / (1 - a), 0.0) ** (1 - a))
            + tol
            >= abs(w)
        )

    # a point already in K*: u=a, v=1-a, w=1 gives 1^a 1^(1-a) = 1 >= 1
    v_in = jnp.array([a, 1 - a, 1.0])
    np.testing.assert_allclose(C.pi(spec, v_in), v_in, atol=1e-9)

    rng = np.random.default_rng(11)
    for _ in range(10):
        v = jnp.asarray(rng.normal(size=3) * 2)
        p = C.pi(spec, v)
        assert in_dual(p), (v, p)
        np.testing.assert_allclose(C.pi(spec, p), p, atol=1e-6)
        _moreau_check(spec, v, atol=1e-6)
        # derivative vs central differences (skip near-boundary kinks)
        dv = jnp.asarray(rng.normal(size=3))
        eps = 1e-6
        fd = (C.pi(spec, v + eps * dv) - C.pi(spec, v - eps * dv)) / (2 * eps)
        ad = C.dpi_apply(spec, v, dv)
        np.testing.assert_allclose(ad, fd, atol=5e-4, rtol=5e-3)
        # rmatvec is the true adjoint: <J dv, w> == <dv, J' w>
        w = jnp.asarray(rng.normal(size=3))
        lhs = float(jnp.dot(C.dpi_apply(spec, v, dv), w))
        rhs = float(jnp.dot(dv, C.dpi_rmatvec(spec, v, w)))
        assert abs(lhs - rhs) < 1e-8


def test_dual_pow_projects_onto_primal_cone():
    a = 0.3
    spec = ConeSpec([("dual_pow", 3, a)])
    rng = np.random.default_rng(13)

    def in_primal(p, tol=1e-7):
        x, y, z = float(p[0]), float(p[1]), float(p[2])
        return (
            x >= -tol
            and y >= -tol
            and (max(x, 0.0) ** a) * (max(y, 0.0) ** (1 - a)) + tol >= abs(z)
        )

    for _ in range(8):
        v = jnp.asarray(rng.normal(size=3) * 2)
        p = C.pi(spec, v)
        assert in_primal(p), (v, p)
        np.testing.assert_allclose(C.pi(spec, p), p, atol=1e-6)
        _moreau_check(spec, v, atol=1e-6)


def test_cone_spec_param_validation():
    with pytest.raises(ValueError):
        ConeSpec([("pow", 3)])  # missing exponent
    with pytest.raises(ValueError):
        ConeSpec([("pow", 3, 1.5)])  # exponent out of range
    with pytest.raises(ValueError):
        ConeSpec([("soc", 3, 0.5)])  # unexpected parameter
    with pytest.raises(ValueError):
        ConeSpec([("pow", 4, 0.5)])  # power cones are 3-d
