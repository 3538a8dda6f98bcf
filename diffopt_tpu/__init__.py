"""diffopt_tpu — a TPU-native differentiable-optimization framework.

Built from scratch in JAX with the capabilities of DiffOpt.jl (reference at
``/root/reference``): solve LP/QP/conic/NLP programs and differentiate their
primal-dual solution maps w.r.t. problem data or named parameters, via implicit
differentiation of KKT systems and conic homogeneous-embedding residuals.

Architecture (vs the reference's six MOI layers, SURVEY.md §1):

* pytree problem IRs (:mod:`diffopt_tpu.ir`) replace MOI matrix-of-constraint
  forms;
* pure differentiation verbs (:mod:`diffopt_tpu.qp_diff`,
  :mod:`diffopt_tpu.conic_diff`, :mod:`diffopt_tpu.nlp_diff`) replace the
  backend ``AbstractModel`` machinery;
* embedded batched solvers (:mod:`diffopt_tpu.solvers`) replace the external
  MOI solvers — required because a TPU framework must own the forward pass;
* ``jax.custom_vjp``-wrapped entry points (``solve_qp``/``solve_conic``)
  replace ChainRules integration;
* batching is ``vmap``; scale-out is ``shard_map`` over a mesh
  (:mod:`diffopt_tpu.parallel`).
"""

from .ir import (
    ConeProgram,
    ConeSolution,
    ConeTangent,
    QPSolution,
    QPTangent,
    QuadProgram,
)
from .cones import ConeSpec
from . import bridges, conic_diff, native, nlp_diff, parameters, qp_diff, utils
from .qp_diff import forward_differentiate, reverse_differentiate
from .solve import (
    solve_conic,
    solve_conic_batched,
    solve_nlp,
    solve_qp,
    solve_qp_batched,
)
from .nlp_diff import NLPProblem, NLPSolution
from .parameters import ParametricProgram
from .api import (
    ConicDiffContext,
    NLPDiffContext,
    NotSolvedError,
    QPDiffContext,
)

__version__ = "0.1.0"

__all__ = [
    "QuadProgram",
    "QPSolution",
    "QPTangent",
    "ConeProgram",
    "ConeSolution",
    "ConeTangent",
    "ConeSpec",
    "qp_diff",
    "conic_diff",
    "nlp_diff",
    "bridges",
    "parameters",
    "NLPProblem",
    "NLPSolution",
    "ParametricProgram",
    "QPDiffContext",
    "ConicDiffContext",
    "NLPDiffContext",
    "NotSolvedError",
    "native",
    "utils",
    "solve_qp",
    "solve_conic",
    "solve_nlp",
    "solve_conic_batched",
    "solve_qp_batched",
    "forward_differentiate",
    "reverse_differentiate",
]
