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
