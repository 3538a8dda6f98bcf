"""Size-aware conic-diff dispatch (round-2 verdict item 4): past
``config.conic_lsqr_threshold`` the diff rules must route to the matrix-free
LSQR instead of materializing M — a side-32 SDP has a (528, 528) dense DPi
block per instance, and the reference *always* takes the lsqr path
(``/root/reference/src/ConicProgram/ConicProgram.jl:323,372``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffopt_tpu import ConeProgram, ConeSpec, ConeTangent, conic_diff
from diffopt_tpu.api import ConicDiffContext
from diffopt_tpu.cones import sym_to_svec
from diffopt_tpu.conic_diff import resolve_method
from diffopt_tpu.solvers import conic_ipm
from diffopt_tpu.utils.config import get_config, use_config


def _random_sdp(rng, d, n):
    """Solvable SDP: min c'x s.t. svec(B0 - sum x_i sym(B_i)) PSD with B0
    strictly PD (x = 0 strictly feasible) and c = -A'y* for strictly PD y*
    (dual strictly feasible)."""
    tri = d * (d + 1) // 2
    L0 = rng.normal(size=(d, d))
    B0 = L0 @ L0.T + np.eye(d)
    cols = []
    for _ in range(n):
        Bi = rng.normal(size=(d, d))
        cols.append(-np.asarray(sym_to_svec(jnp.asarray(Bi + Bi.T))))
    A = np.stack(cols, axis=1)
    b = np.asarray(sym_to_svec(jnp.asarray(B0)))
    Y = rng.normal(size=(d, d)) / np.sqrt(d)
    ystar = np.asarray(sym_to_svec(jnp.asarray(Y @ Y.T + 0.5 * np.eye(d))))
    c = -A.T @ ystar
    return ConeProgram(
        A=jnp.asarray(A), b=jnp.asarray(b), c=jnp.asarray(c),
        cones=ConeSpec([("psd", tri)]),
    )


def test_resolve_method_thresholds():
    rng = np.random.default_rng(0)
    small = _random_sdp(rng, d=3, n=2)  # N = 2 + 6 + 1 = 9
    big = _random_sdp(rng, d=32, n=8)  # N = 8 + 528 + 1 = 537 > 500
    assert resolve_method(small, "auto") == "lstsq"
    assert resolve_method(big, "auto") == "lsqr"
    assert resolve_method(big, "lstsq") == "lstsq"  # explicit wins
    cfg = dataclasses.replace(get_config(), conic_lsqr_threshold=5)
    with use_config(cfg):
        assert resolve_method(small, "auto") == "lsqr"


def test_side32_sdp_lsqr_matches_dense_oracle():
    """Reverse + forward gradients of a side-32 SDP: the matrix-free LSQR
    route must agree with the dense least-squares oracle."""
    rng = np.random.default_rng(1)
    cp = _random_sdp(rng, d=32, n=8)
    sol, info = conic_ipm.solve(cp, tol=1e-10)
    assert bool(info.converged)

    dx = jnp.asarray(rng.normal(size=cp.num_vars))
    rev_lsqr = conic_diff.reverse_differentiate(cp, sol, dx, method="lsqr")
    rev_dense = conic_diff.reverse_differentiate(cp, sol, dx, method="lstsq")
    scale = float(jnp.max(jnp.abs(rev_dense.db))) + 1.0
    np.testing.assert_allclose(
        rev_lsqr.db, rev_dense.db, atol=1e-6 * scale
    )
    np.testing.assert_allclose(
        rev_lsqr.dc, rev_dense.dc, atol=1e-6 * scale
    )
    np.testing.assert_allclose(
        rev_lsqr.dA, rev_dense.dA, atol=1e-6 * scale
    )

    dtan = ConeTangent(
        dA=jnp.zeros_like(cp.A),
        db=jnp.asarray(rng.normal(size=cp.num_rows)) * 1e-1,
        dc=jnp.zeros_like(cp.c),
    )
    fwd_lsqr = conic_diff.forward_differentiate(cp, sol, dtan, method="lsqr")
    fwd_dense = conic_diff.forward_differentiate(cp, sol, dtan, method="lstsq")
    fscale = float(jnp.max(jnp.abs(fwd_dense.dx))) + 1e-12
    np.testing.assert_allclose(
        fwd_lsqr.dx, fwd_dense.dx, atol=1e-6 * fscale + 1e-10
    )

    # 'auto' on this program IS the lsqr route (threshold 500 < 537)
    rev_auto = conic_diff.reverse_differentiate(cp, sol, dx, method="auto")
    np.testing.assert_allclose(rev_auto.db, rev_lsqr.db, atol=0)


def test_context_goes_matrix_free_past_threshold():
    rng = np.random.default_rng(2)
    cp = _random_sdp(rng, d=32, n=8)
    sol, info = conic_ipm.solve(cp, tol=1e-10)
    assert bool(info.converged)
    ctx = ConicDiffContext(cp, sol, polish=0)
    assert ctx._matfree
    assert ctx._M is None  # no dense M materialized
    dx = jnp.asarray(rng.normal(size=cp.num_vars))
    rev = ctx.reverse(dx)
    oracle = conic_diff.reverse_differentiate(cp, sol, dx, method="lstsq")
    scale = float(jnp.max(jnp.abs(oracle.db))) + 1.0
    np.testing.assert_allclose(rev.db, oracle.db, atol=2e-6 * scale)
    np.testing.assert_allclose(rev.dc, oracle.dc, atol=2e-6 * scale)
    # small programs keep the cached dense gram factors
    ctx_small = ConicDiffContext(_random_sdp(rng, d=3, n=2), polish=0)
    assert not ctx_small._matfree
