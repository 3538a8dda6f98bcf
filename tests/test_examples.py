"""The examples double as integration tests, mirroring the reference's
docs-as-tests policy (``docs/make.jl:30-40`` includes every example under a
testset)."""

import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "examples"))


def test_qp_relu_matches_relu():
    import jax
    import jax.numpy as jnp
    from qp_layers import qp_relu
    from diffopt_tpu import QuadProgram, solve_qp

    # exclude exact 0: the fully-degenerate point converges at sqrt(mu) rate
    y = jnp.asarray(np.linspace(-2, 2, 9))
    np.testing.assert_allclose(qp_relu(y), np.maximum(np.asarray(y), 0), atol=1e-4)

    # gradient is the active mask; forward mode needs the jvp-registered entry
    def relu_jvp(y):
        n = y.shape[-1]
        qp = QuadProgram(
            Q=jnp.eye(n), q=-y, A=jnp.zeros((0, n)), b=jnp.zeros((0,)),
            G=-jnp.eye(n), h=jnp.zeros((n,)),
        )
        return solve_qp(qp, mode="jvp").z

    y2 = jnp.asarray([-1.5, -0.3, 0.4, 2.0])
    g = jax.jacfwd(relu_jvp)(y2)
    np.testing.assert_allclose(
        np.diag(np.asarray(g)), (np.asarray(y2) > 0).astype(float), atol=1e-5
    )
    # reverse mode through the default entry
    gr = jax.grad(lambda y: qp_relu(y).sum())(y2)
    np.testing.assert_allclose(gr, (np.asarray(y2) > 0).astype(float), atol=1e-5)


def test_qp_relu_training_converges():
    from qp_layers import train_qp_relu_mlp

    losses = train_qp_relu_mlp(steps=25)
    assert losses[-1] < 0.5 * losses[0], losses


def test_polytope_learning_converges():
    from qp_layers import learn_polytope

    losses = learn_polytope(steps=30)
    assert losses[-1] < 0.5 * losses[0], losses


def test_autotuning_ridge():
    from autotuning_ridge import autotune

    hist = autotune(steps=30)
    assert hist[-1][1] <= hist[0][1]  # validation loss non-increasing


def test_svm_sensitivity_runs():
    from sensitivity_analysis import svm_hyperplane_sensitivity

    w, dw = svm_hyperplane_sensitivity()
    assert np.all(np.isfinite(w)) and np.all(np.isfinite(dw))
    # separating direction for the +2/-2 clusters points positive
    assert w[0] > 0 and w[1] > 0


def test_economic_dispatch():
    from sensitivity_analysis import economic_dispatch_prices

    g, price, dg = economic_dispatch_prices(demand=10.0)
    # cheap gen at its 6-unit limit, expensive serves the rest
    np.testing.assert_allclose(g, [6.0, 4.0], atol=1e-5)
    # marginal price = cost of the marginal (expensive) generator
    np.testing.assert_allclose(price, 3.0, atol=1e-5)
    # extra demand goes to the marginal generator
    np.testing.assert_allclose(dg, [0.0, 1.0], atol=1e-4)


def test_nearest_correlation_matches_higham():
    """SDP answer vs Higham's alternating-projection algorithm (numpy
    oracle, Dykstra-corrected) and PSD/diag feasibility."""
    from nearest_correlation import nearest_correlation

    A = np.array([[1.0, 0.9, -0.9], [0.9, 1.0, 0.3], [-0.9, 0.3, 1.0]])

    # Higham 2002 alternating projections with Dykstra correction
    def higham(A, iters=500):
        Y = A.copy()
        dS = np.zeros_like(A)
        for _ in range(iters):
            R = Y - dS
            w, U = np.linalg.eigh(R)
            Xp = (U * np.maximum(w, 0)) @ U.T
            dS = Xp - R
            Y = Xp.copy()
            np.fill_diagonal(Y, 1.0)
        return Y

    ref = higham(A)
    X = np.asarray(nearest_correlation(A))
    np.testing.assert_allclose(np.diag(X), 1.0, atol=1e-5)
    assert np.linalg.eigvalsh(X).min() > -1e-6
    np.testing.assert_allclose(X, ref, atol=2e-3)


def test_matrix_inversion_manual():
    from sensitivity_analysis import matrix_inversion_manual_check

    z, manual, framework = matrix_inversion_manual_check()
    np.testing.assert_allclose(z, [-0.25, -0.75], atol=1e-6)
    np.testing.assert_allclose(framework, manual, atol=1e-7)


def test_ridge_data_sensitivity():
    from sensitivity_analysis import ridge_data_sensitivity

    w, b, dw, X = ridge_data_sensitivity()
    assert abs(w - 2.0) < 0.3 and abs(b - 0.5) < 0.3
    # points far from the x-mean have the largest leverage on the slope, with
    # the sign of (x_i - xbar)
    corr = np.corrcoef(dw, X - X.mean())[0, 1]
    assert corr > 0.99


def test_unit_commitment_prices():
    import jax
    import jax.numpy as jnp
    from unit_commitment import make_uc_layer

    build, cost = make_uc_layer()
    demand = jnp.array([4.0, 7.0, 9.0, 5.0])
    prices = np.asarray(jax.grad(cost)(demand))
    assert np.all(np.isfinite(prices))
    # marginal prices are nonnegative and at least the cheap unit's cost
    assert np.all(prices > 0.5)
    # the peak period has the highest price
    assert prices.argmax() == 2


def test_entropic_projection_gradient_matches_softmax():
    """The exp-cone layer's implicit gradient equals the analytic softmax
    Jacobian-vector product (entropic projection over the simplex IS
    softmax) — the nonsymmetric-cone example's correctness gate. The full
    150-step training loop runs in examples/entropic_projection.py."""
    import jax
    import jax.numpy as jnp
    from entropic_projection import entropic_projection

    k = 4
    target = jnp.asarray(np.array([0.5, 0.25, 0.15, 0.10]))

    def loss(q):
        p = entropic_projection(q)
        return jnp.sum((p - target) ** 2)

    q = jnp.asarray([0.3, -0.2, 0.1, 0.0])
    p0 = jax.nn.softmax(q)
    g_analytic = (jnp.diag(p0) - jnp.outer(p0, p0)) @ (2 * (p0 - target))
    g_layer = jax.grad(loss)(q)
    np.testing.assert_allclose(
        np.asarray(g_layer), np.asarray(g_analytic), atol=1e-6
    )
