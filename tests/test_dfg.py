"""DFG 2D-1 cylinder benchmark (Re=20, steady): drag/lift/pressure-diff
evaluators + literature-band sanity.

Published reference values (Schäfer & Turek 1996): C_D = 5.57-5.59,
C_L = 0.0104-0.0110, dp = 0.1172-0.1176. A coarse diffuse-IB run lands in a
loose band around these; exact parity needs finer grids (scaling harness).
"""

import numpy as np
import pytest

from fluidsolver_tpu.cases import get_case
from fluidsolver_tpu.cases import dfg


@pytest.mark.slow
def test_dfg1_diffuse_ib_coefficients():
    case = get_case("diffuse_ib_dfg", ny=64, benchmark=1)
    g = case.grid
    state = case.make_state()
    step = case.make_step()
    # run to quasi-steady state (Re = 20)
    for _ in range(300):
        state = step(state, 1.5)
        if float(state.t) >= 1.5 - 1e-12:
            break

    um = dfg.u_mean(1, float(state.t))
    cd = float(dfg.calc_c_d(state.p, state.U, g, um))
    cl = float(dfg.calc_c_l(state.p, state.V, g, um))
    dp = float(dfg.calc_p_diff(state.p, g))

    assert 4.0 < cd < 8.0, f"C_D = {cd:.3f} (lit. 5.58)"
    assert abs(cl) < 0.5, f"C_L = {cl:.4f} (lit. 0.0107)"
    assert 0.05 < dp < 0.2, f"dp = {dp:.4f} (lit. 0.1175)"


def test_dfg_evaluators_run():
    # quick: evaluators produce finite values on an arbitrary state
    case = get_case("diffuse_ib_dfg", ny=32, benchmark=1)
    state = case.make_state()
    step = case.make_step()
    state = step(state, 1e9)
    um = dfg.u_mean(1, 0.0)
    for v in [
        dfg.calc_c_d(state.p, state.U, case.grid, um),
        dfg.calc_c_l(state.p, state.V, case.grid, um),
        dfg.calc_p_diff(state.p, case.grid),
    ]:
        assert np.isfinite(float(v))
    assert np.isclose(dfg.reynolds(1), 20.0)
    assert np.isclose(dfg.reynolds(2), 100.0)
