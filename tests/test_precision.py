"""utils/precision.py: the full-precision scope must actually govern traced
matmuls (TPU lowers f32 matmuls to bf16 inputs at DEFAULT precision — the
decorator is load-bearing for every KKT solve; see README 'Performance')."""

import jax
import jax.numpy as jnp

from diffopt_tpu.utils.precision import full_precision


def test_full_precision_sets_highest_in_scope():
    captured = {}

    @full_precision
    def traced(a, b):
        captured["cfg"] = jax.config.jax_default_matmul_precision
        return a @ b

    a = jnp.ones((4, 4))
    traced(a, a)
    assert captured["cfg"] == "highest"
    # and the scope is restored afterwards
    assert jax.config.jax_default_matmul_precision != "highest"


def test_full_precision_lowers_dot_with_highest():
    @full_precision
    def f(a, b):
        return a @ b

    jaxpr = jax.make_jaxpr(f)(jnp.ones((3, 3)), jnp.ones((3, 3)))
    (eqn,) = [e for e in jaxpr.jaxpr.eqns if e.primitive.name == "dot_general"]
    assert "HIGHEST" in str(eqn.params["precision"]).upper()


def test_cone_pad_spec_rejects_mismatched_kinds():
    import pytest

    from diffopt_tpu.cones import ConeSpec
    from diffopt_tpu.utils.batching import cone_pad_spec

    with pytest.raises(ValueError, match="mismatched kinds"):
        cone_pad_spec([ConeSpec([("soc", 3)]), ConeSpec([("nonneg", 3)])])
    with pytest.raises(ValueError, match="zero-cone"):
        cone_pad_spec([ConeSpec([("zero", 2)]), ConeSpec([("zero", 3)])])
