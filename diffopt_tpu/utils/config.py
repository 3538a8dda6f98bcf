"""Typed configuration — the reference's scattered hard-coded tolerances as
explicit knobs (SURVEY.md §5 flags the load-bearing constants:
``norm(RHS) <= 1e-400`` / ``1e-4`` conic zero-shortcuts ``ConicProgram.jl:
320,369``, ``tol=1e-6`` NLP dual-sign assertions ``nlp_utilities.jl:181``,
``iterative = norm(Q) ~= 0`` LP detection ``QuadraticProgram.jl:333``,
inertia step ``1e-6`` x 50 ``NonLinearProgram.jl:356-381``)."""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class DiffOptConfig:
    # --- QP/KKT diff ------------------------------------------------------
    kkt_method: str = "auto"  # 'lu' | 'lstsq' | 'ldl' | 'auto'
    kkt_refine_iters: int = 2  # iterative-refinement steps on ldl path
    ldl_lam_floor_f64: float = 1e-12
    ldl_lam_floor_f32: float = 1e-6
    ldl_reg_f64: float = 1e-11
    ldl_reg_f32: float = 1e-6

    # --- embedded solvers -------------------------------------------------
    qp_max_iters: int = 50
    qp_tol_f64: float = 1e-9
    qp_tol_f32: float = 5e-6
    conic_max_iters: int = 20000
    conic_tol: float = 1e-10
    conic_relaxation: float = 1.5
    nlp_max_iters: int = 100
    nlp_tol: float = 1e-9

    # --- NLP sensitivity --------------------------------------------------
    # reference: st=1e-6, max 50 corrections (NonLinearProgram.jl:356-381)
    inertia_shift: float = 1e-6
    inertia_max_corrections: int = 50
    # reference: dual-sign assertion tolerance (nlp_utilities.jl:181)
    dual_sign_tol: float = 1e-6

    # --- conic diff -------------------------------------------------------
    # the reference zero-shortcuts (ConicProgram.jl:320,369) are effectively
    # 'skip the solve when the seed is exactly zero'; lstsq of a zero rhs is
    # already zero so no shortcut is needed, but the knob is kept for parity
    conic_zero_shortcut_forward: float = 0.0
    conic_zero_shortcut_reverse: float = 0.0


DEFAULT_CONFIG = DiffOptConfig()
