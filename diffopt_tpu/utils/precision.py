"""Full-precision matmul scope for KKT solves and implicit differentiation.

TPU XLA lowers f32 ``jnp`` matmuls to bf16-input MXU passes by default
(``DEFAULT`` precision). That is the right trade for neural nets and the
wrong one for Newton systems: a bf16 residual matvec floors iterative
refinement at ~8e-3 relative error, silently destroying the 1e-6 gradient
agreement this framework targets (BASELINE.json north star). Every public
solve/differentiate entry point wraps its body in
:func:`full_precision` so all matmuls traced inside run f32-in/f32-out
(``HIGHEST``). Pallas kernels are unaffected (their VPU arithmetic is
already f32).
"""

from __future__ import annotations

from functools import wraps

import jax


def residual_dtype(dt):
    """Accumulation dtype for iterative-refinement residuals.

    Classic mixed-precision refinement: factor/solve in the working dtype,
    accumulate residuals (and the solution estimate) in a wider one. With
    f64 residuals the refined forward error floors at the *storage* epsilon
    of the working dtype instead of ``cond * eps`` — the difference between
    ~1e-5 and ~1e-6 f32 conic gradients on ill-scaled M systems. Returns f64
    only when x64 is live (CPU, or TPU with ``jax_enable_x64``); on a pure
    f32 TPU stack this degrades gracefully to same-dtype refinement."""
    import jax.numpy as jnp

    if dt == jnp.float64:
        return dt
    return jnp.float64 if jax.config.jax_enable_x64 else dt


def full_precision(fn):
    """Decorator: trace ``fn`` under ``jax.default_matmul_precision('highest')``."""

    @wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
