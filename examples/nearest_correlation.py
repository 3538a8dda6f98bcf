"""Nearest correlation matrix — an SDP through the conic backend.

TPU-native rewrite of the reference's ``matrix_relax.jl`` / nearest-
correlation example: find the closest (Frobenius) correlation matrix to a
given symmetric A,

    min_X |X - A|_F   s.t.  X >= 0 (PSD),  diag(X) = 1

as a cone program over variables v = [x (svec), t]:  min t with
(t, x - a) in SOC, x in PSD(svec), and zero-cone rows pinning the diagonal.
Differentiable w.r.t. A through the homogeneous-embedding rule.
"""

import numpy as np

import jax
import jax.numpy as jnp

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffopt_tpu import ConeProgram, ConeSpec, solve_conic
from diffopt_tpu.cones import _tri_order, sym_to_svec, svec_to_sym


def nearest_correlation_program(A: jnp.ndarray) -> ConeProgram:
    d = A.shape[-1]
    tri = d * (d + 1) // 2
    a = sym_to_svec(A)
    order = _tri_order(d)
    diag_pos = np.nonzero(order[:, 0] == order[:, 1])[0]
    nv = tri + 1  # [x, t]
    dt = A.dtype

    # zero rows: x_diag - 1 in {0}  -> A = -coeff, b = const = -1
    Az = jnp.zeros((d, nv), dt)
    Az = Az.at[np.arange(d), diag_pos].set(-1.0)
    bz = -jnp.ones((d,), dt)
    # SOC rows: (t, x - a): A = -coeffs, b = (0, -a)
    Asoc = jnp.zeros((tri + 1, nv), dt)
    Asoc = Asoc.at[0, tri].set(-1.0)
    Asoc = Asoc.at[1 + np.arange(tri), np.arange(tri)].set(-1.0)
    bsoc = jnp.concatenate([jnp.zeros((1,), dt), -a])
    # PSD rows: x in PSD(svec): A = -I over x
    Ap = jnp.zeros((tri, nv), dt)
    Ap = Ap.at[np.arange(tri), np.arange(tri)].set(-1.0)
    bp = jnp.zeros((tri,), dt)

    Amat = jnp.concatenate([Az, Asoc, Ap], axis=0)
    b = jnp.concatenate([bz, bsoc, bp])
    c = jnp.zeros((nv,), dt).at[tri].set(1.0)
    cones = ConeSpec([("zero", d), ("soc", tri + 1), ("psd", tri)])
    return ConeProgram(A=Amat, b=b, c=c, cones=cones)


def nearest_correlation(A, **kw):
    cp = nearest_correlation_program(jnp.asarray(A))
    sol = solve_conic(cp, max_iters=kw.pop("max_iters", 40000), **kw)
    tri = A.shape[-1] * (A.shape[-1] + 1) // 2
    return svec_to_sym(sol.x[:tri])


if __name__ == "__main__":
    A = np.array([[1.0, 0.9, 0.7], [0.9, 1.0, 0.3], [0.7, 0.3, 1.0]])
    A[0, 2] = A[2, 0] = -0.9  # make it indefinite
    X = np.asarray(nearest_correlation(A))
    w = np.linalg.eigvalsh(X)
    print("nearest correlation:\n", X.round(4))
    print("eigs:", w.round(5), " diag:", np.diag(X).round(6))
