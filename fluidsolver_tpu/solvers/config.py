"""Solver configuration.

Replaces the reference's three config tiers — per-case ``constexpr`` blocks,
preprocessor feature flags, and argv parsing (SURVEY.md §5) — with one frozen,
hashable dataclass that is passed as a static argument to the jitted step.
Field names follow the reference's constants (examples/TwoPhaseSolver.cpp:19-53).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from fluidsolver_tpu.core.bc import FlowBCs


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    # fluid properties (two-phase: gas == phase vf=0, liquid == vf=1)
    rho_gas: float = 1.0
    rho_liquid: float = 1.0
    visc_gas: float = 1e-3
    visc_liquid: float = 1e-3
    sigma: float = 0.0  # surface tension coefficient

    # time stepping
    cfl_max: float = 0.9
    dt_max: float = 1e-2
    num_subiter: int = 5

    # pressure solve (defaults match HYPRE PCG+PFMG tol/maxiter usage,
    # examples/IncompSolver.cpp:40-41)
    pressure_tol: float = 1e-6
    pressure_max_iter: int = 50
    pressure_pin: Optional[str] = None  # None | "left"|"right"|"bottom"|"top"
    # "mg" (PCG + geometric-multigrid V-cycle, the HYPRE PCG+PFMG analog),
    # "jacobi" (diag-precond CG, the Accelerate-backend analog,
    # src/LinearSolver_Accelerate.hpp), "none", or "direct" (dense, small grids)
    pressure_solver: str = "mg"
    # TODO(perf): bilinear transfers in the V-cycle (PC transfers cap the
    # convergence factor ~0.5; bilinear reaches ~0.1)
    mg_pre: int = 2
    mg_post: int = 2

    # boundary conditions
    bcs: FlowBCs = None

    # outflow mass correction at the right boundary
    # (examples/IncompSolver.cpp:189-193)
    outflow_correction: bool = False

    # body force (RisingBubble gravity, examples/RisingBubble.cpp:453-455)
    gravity: Tuple[float, float] = (0.0, 0.0)

    # maintain a prescribed total mass flow through the x-boundaries
    # (periodic-channel driving, test/PeriodicChannel.cpp:187-197)
    flow_forcing: Optional[float] = None

    # FS_ARITHMETIC_VISC flag (src/FS.hpp:618)
    arithmetic_visc: bool = False

    # curvature method: "volume_matching" | "regression" | "convolved"
    curvature_method: str = "volume_matching"

    # immersed-boundary mode: None | "diffuse" | "sharp" | "luchini" |
    # "luchini_implicit"; the precomputed IB fields are passed to make_step
    ib_mode: Optional[str] = None

    # interfacial mass flux m_dot [mass/(length*time)] for phase-change
    # cases (examples/ExpandingBubble.cpp:222-241, 310-321): shifts the PLIC
    # planes into the liquid and adds the volume-expansion divergence source
    phase_change_mdot: Optional[float] = None
