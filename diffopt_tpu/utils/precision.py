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


def full_precision(fn):
    """Decorator: trace ``fn`` under ``jax.default_matmul_precision('highest')``."""

    @wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
