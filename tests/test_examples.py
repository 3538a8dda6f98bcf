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
