"""Differentiable entropic projection layer (exp-cone program in the loop).

No reference counterpart (the reference's nine examples cover QP/SOC/PSD
layers); this demonstrates the nonsymmetric-cone path end-to-end on the
framework's own solver stack: the *entropic projection*

    P(q) = argmax_x  q'x + H(x)   s.t.  sum x = 1, x >= 0
         (H(x) = -sum_i x_i log x_i)

is the exact solution of an exponential-cone program (epigraph t_i <=
-x_i log x_i  <=>  (t_i, x_i, 1) in K_exp), solved by the nonsymmetric-cone
PDIPM (``solvers/conic_nsipm.py``) and differentiated implicitly — a
"soft argmax with learnable logits" whose analytic solution is softmax(q),
which makes every gradient checkable in closed form. Fit logits q so the
projection matches a target distribution, with plain jax.grad descent.

Run: python examples/entropic_projection.py
"""

import sys
import pathlib

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from diffopt_tpu import ConeProgram, ConeSpec, solve_conic


def entropic_projection_program(q):
    """Conic form of max q'x + H(x) over the simplex: vars [x (k), t (k)],
    min -q'x - sum t, rows: zero(1) sum x = 1; per i (t_i, x_i, 1) in
    K_exp."""
    k = q.shape[0]
    dt = q.dtype
    nv = 2 * k
    rows = 1 + 3 * k
    A = np.zeros((rows, nv))
    b = np.zeros(rows)
    A[0, :k] = -1.0
    b[0] = -1.0
    for i in range(k):
        r = 1 + 3 * i
        A[r, k + i] = -1.0
        A[r + 1, i] = -1.0
        b[r + 2] = 1.0
    c = jnp.concatenate([-q, -jnp.ones(k, dt)])
    return ConeProgram(
        A=jnp.asarray(A, dt), b=jnp.asarray(b, dt), c=c,
        cones=ConeSpec([("zero", 1)] + [("exp", 3)] * k),
    )


def entropic_projection(q):
    """The layer: q -> P(q) (= softmax(q) analytically)."""
    sol = solve_conic(entropic_projection_program(q))
    return sol.x[: q.shape[0]]


def main():
    k = 4
    target = jnp.asarray(np.array([0.5, 0.25, 0.15, 0.10]))

    def loss(q):
        p = entropic_projection(q)
        return jnp.sum((p - target) ** 2)

    q = jnp.zeros(k)
    grad = jax.jit(jax.grad(loss))  # trace once; each step is one execution

    # closed-form check of the implicit gradient at the start: with
    # p = softmax(q), dL/dq = (diag(p) - p p') * 2 (p - target)
    p0 = jax.nn.softmax(q)
    g_analytic = (jnp.diag(p0) - jnp.outer(p0, p0)) @ (2 * (p0 - target))
    g_layer = grad(q)
    err = float(jnp.max(jnp.abs(g_layer - g_analytic)))
    print(f"implicit vs analytic softmax gradient: max err {err:.2e}")
    assert err < 1e-6, err

    lr = 2.0
    for it in range(150):
        q = q - lr * grad(q)
    p = entropic_projection(q)
    final = float(jnp.max(jnp.abs(p - target)))
    print(f"after 150 steps: projection {np.asarray(p).round(4)} "
          f"target {np.asarray(target).round(4)} (max err {final:.2e})")
    assert final < 1e-3, final
    print("OK")


if __name__ == "__main__":
    main()
