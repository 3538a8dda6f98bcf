"""Tensor-parallel blocked Cholesky (``parallel/tp_chol.py``) vs the local
factorization, on the 8-virtual-device CPU mesh (SURVEY §2's optional
tensor-parallel factorization component — no reference counterpart;
BASELINE.json mandate)."""

import numpy as np

import jax
import jax.numpy as jnp

from diffopt_tpu.parallel.sharding import make_mesh
from diffopt_tpu.parallel.tp_chol import (
    tp_cholesky,
    tp_cholesky_solve,
    tp_solve_psd,
)


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    return jnp.asarray(M @ M.T + n * np.eye(n))


def test_tp_cholesky_matches_local():
    mesh = make_mesh(8, "tp")
    H = _spd(32)
    L = tp_cholesky(H, mesh, "tp")
    L_ref = jnp.linalg.cholesky(H)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=1e-10)


def test_tp_solve_matches_local():
    mesh = make_mesh(8, "tp")
    H = _spd(40, seed=1)
    r = jnp.asarray(np.random.default_rng(2).normal(size=40))
    z = tp_solve_psd(H, r, mesh, "tp")
    z_ref = jnp.linalg.solve(H, r)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-9)


def test_tp_solve_under_jit():
    """The sharded factorization composes with jit (one compiled program
    whose collectives XLA schedules over the mesh)."""
    mesh = make_mesh(4, "tp")
    H = _spd(24, seed=3)
    r = jnp.asarray(np.random.default_rng(4).normal(size=24))

    @jax.jit
    def run(H, r):
        L = tp_cholesky(H, mesh, "tp")
        return tp_cholesky_solve(L, r, mesh, "tp")

    z = run(H, r)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(jnp.linalg.solve(H, r)), atol=1e-9
    )


def test_tp_kkt_solve_big_instance():
    """The intended use: one large QP-style normal-equations system solved
    across the mesh (single instance past a chip's batched-kernel envelope,
    here just shape-representative)."""
    mesh = make_mesh(8, "tp")
    n = 64
    rng = np.random.default_rng(5)
    G = rng.normal(size=(3 * n, n))
    H = jnp.asarray(G.T @ G + np.eye(n))
    q = jnp.asarray(rng.normal(size=n))
    z = tp_solve_psd(H, -q, mesh, "tp")
    np.testing.assert_allclose(
        np.asarray(H @ z), np.asarray(-q), atol=1e-8
    )
