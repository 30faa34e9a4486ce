"""Mass-source cases: growing solid + expanding bubble.

Reference: examples/GrowingIB.cpp (divergence source ``-wall * (3/r) drdt``
for a solid growing at prescribed drdt) and examples/ExpandingBubble.cpp
(interfacial mass flux; implemented via cfg.phase_change_mdot in the
two-phase solver).
"""

from __future__ import annotations

import jax.numpy as jnp

from fluidsolver_tpu.cases.registry import Case, register
from fluidsolver_tpu.core import bc
from fluidsolver_tpu.core.grid import make_grid
from fluidsolver_tpu.solvers.config import SolverConfig


@register("growing_ib")
def growing_ib(ny: int = 64, r0: float = 0.1, drdt: float = 0.1) -> Case:
    """Channel with a solid circle growing at drdt; the displaced volume
    enters the continuity equation as div -= wall*(3/r)*drdt
    (examples/GrowingIB.cpp:93-100). The solid fraction is evaluated
    on-device from the signed distance (PLIC linearization), so the growing
    radius r(t) stays inside the jitted step."""
    from fluidsolver_tpu.ib.diffuse import DiffuseIB
    from fluidsolver_tpu.vof.plic import area_fraction

    y_max, x_max = 1.0, 3.0
    nx = int(ny * x_max / y_max)
    g = make_grid(0.0, x_max, nx, 0.0, y_max, ny)
    cx, cy = 1.0, 0.5

    def inflow(y, t):
        return 4.0 * 1.0 * y * (y_max - y) / y_max**2

    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1.0, visc_gas=1e-3, visc_liquid=1e-3,
        cfl_max=0.5, dt_max=5e-3, num_subiter=3,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(
            bc.Dirichlet(u=inflow, v=0.0), bc.Neumann(clipped=True),
            bc.Dirichlet(), bc.Dirichlet(),
        ),
        outflow_correction=False,
        ib_mode="diffuse",
    )

    def circle_fraction(px, py, r, w, h):
        """Cell solid fraction from the linearized circle boundary: the
        half-plane n.(p - p0) <= r - dist through the cell's lower-left
        corner, exact to O(h^2)."""
        ex = px - cx
        ey = py - cy
        dist = jnp.sqrt(ex * ex + ey * ey)
        nrm = jnp.where(dist > 0.0, dist, 1.0)
        nx_ = ex / nrm
        ny_ = ey / nrm
        # solid = {dist <= r}: inward normal, local coords from cell corner
        d_loc = r - dist
        return area_fraction(nx_, ny_, d_loc, w, h)

    def ib_builder(grid):
        xg = jnp.asarray(grid.x)
        yg = jnp.asarray(grid.y)
        xmg = jnp.asarray(grid.xm)
        ymg = jnp.asarray(grid.ym)

        def fields(state):
            r = r0 + drdt * state.t
            Xc, Yc = jnp.meshgrid(xg[:-1], yg[:-1], indexing="ij")
            ib_c = circle_fraction(Xc, Yc, r, grid.dx, grid.dy)
            Xu, Yu = jnp.meshgrid(xg - grid.dx / 2, yg[:-1], indexing="ij")
            ib_u = circle_fraction(Xu, Yu, r, grid.dx, grid.dy)
            Xv, Yv = jnp.meshgrid(xg[:-1], yg - grid.dy / 2, indexing="ij")
            ib_v = circle_fraction(Xv, Yv, r, grid.dx, grid.dy)
            return DiffuseIB(ib=ib_c, ib_u=ib_u, ib_v=ib_v)

        return fields

    case = Case("growing_ib", g, cfg, t_end=2.0, dt_write=2e-2,
                ib_builder=ib_builder, meta=dict(r0=r0, drdt=drdt, cx=cx, cy=cy))

    # divergence source: the growing solid displaces fluid
    def make_step_with_source():
        from fluidsolver_tpu.solvers import incomp

        fields = ib_builder(g)

        def div_source(state, dt):
            r = r0 + drdt * state.t
            ib_fields = fields(state)
            return -ib_fields.ib * (3.0 / r) * drdt

        return incomp.make_step(g, cfg, ib=fields, div_source=div_source)

    case.make_step = make_step_with_source  # type: ignore[method-assign]
    return case


@register("expanding_bubble")
def expanding_bubble(n: int = 128, m_dot: float = 0.01) -> Case:
    """Evaporating/expanding bubble via interfacial mass flux
    (examples/ExpandingBubble.cpp:19-60, phase change handled by
    cfg.phase_change_mdot)."""
    g = make_grid(0.0, 1.0, n, 0.0, 1.0, n)
    cfg = SolverConfig(
        rho_gas=1.0, rho_liquid=1e3, visc_gas=1e-6, visc_liquid=1e-3,
        sigma=1.0 / 20.0, cfl_max=0.5, dt_max=1e-3, num_subiter=5,
        pressure_tol=1e-6, pressure_max_iter=50,
        bcs=bc.FlowBCs(bc.Neumann(), bc.Neumann(), bc.Neumann(), bc.Neumann()),
        phase_change_mdot=m_dot,
    )

    def vf0(x, y):
        # gas bubble (vf=0) centered in liquid
        return ~((x - 0.5) ** 2 + (y - 0.5) ** 2 <= 0.15**2)

    return Case("expanding_bubble", g, cfg, t_end=0.5, dt_write=5e-3,
                vf0=vf0, two_phase=True, meta=dict(m_dot=m_dot))
