"""Loop-based numpy oracle for the staggered-grid operators.

Direct, deliberately-slow transcriptions of the discrete formulas from the
reference solver (cited per function), used only to validate the vectorized
JAX implementations on small grids. Logical index r maps to array index r+1;
corner-mesh scratch arrays use logical indices directly.
"""

import numpy as np

VF_LOW = 1e-8
VF_HIGH = 1.0 - VF_LOW


def hybrid_interp(rho_eps, rm, rp, vm, vp, tm, tp):
    # src/FS.hpp:131-150
    if abs(rp - rm) > rho_eps:
        if tm + tp >= 0.0:
            return rm, vm
        return rp, vp
    return 0.5 * (rm + rp), 0.5 * (vm + vp)


def calc_dmomdt(nx, ny, U, V, rho_u_old, rho_v_old, visc, p, pj_u, pj_v, dx, dy, rho_eps):
    """src/FS.hpp:158-315 (unfused variant)."""

    def FXU(i, j):  # center mesh
        rh, uh = hybrid_interp(
            rho_eps,
            rho_u_old[i + 1, j + 1], rho_u_old[i + 2, j + 1],
            U[i + 1, j + 1], U[i + 2, j + 1],
            U[i + 1, j + 1], U[i + 2, j + 1],
        )
        u_c = 0.5 * (U[i + 2, j + 1] + U[i + 1, j + 1])
        dudx = (U[i + 2, j + 1] - U[i + 1, j + 1]) / dx
        return -rh * uh * u_c + 2.0 * visc[i + 1, j + 1] * dudx - p[i + 1, j + 1]

    def visc_corner(i, j):
        return 0.25 * (
            visc[i + 1, j + 1] + visc[i, j + 1] + visc[i + 1, j] + visc[i, j]
        )

    def FYU(i, j):  # corner mesh
        rh, uh = hybrid_interp(
            rho_eps,
            rho_u_old[i + 1, j], rho_u_old[i + 1, j + 1],
            U[i + 1, j], U[i + 1, j + 1],
            V[i, j + 1], V[i + 1, j + 1],
        )
        v_c = 0.5 * (V[i, j + 1] + V[i + 1, j + 1])
        dudy = (U[i + 1, j + 1] - U[i + 1, j]) / dy
        dvdx = (V[i + 1, j + 1] - V[i, j + 1]) / dx
        return -rh * uh * v_c + visc_corner(i, j) * (dudy + dvdx)

    def FXV(i, j):  # corner mesh
        rh, vh = hybrid_interp(
            rho_eps,
            rho_v_old[i, j + 1], rho_v_old[i + 1, j + 1],
            V[i, j + 1], V[i + 1, j + 1],
            U[i + 1, j], U[i + 1, j + 1],
        )
        u_c = 0.5 * (U[i + 1, j + 1] + U[i + 1, j])
        dudy = (U[i + 1, j + 1] - U[i + 1, j]) / dy
        dvdx = (V[i + 1, j + 1] - V[i, j + 1]) / dx
        return -rh * u_c * vh + visc_corner(i, j) * (dudy + dvdx)

    def FYV(i, j):  # center mesh
        rh, vh = hybrid_interp(
            rho_eps,
            rho_v_old[i + 1, j + 1], rho_v_old[i + 1, j + 2],
            V[i + 1, j + 1], V[i + 1, j + 2],
            V[i + 1, j + 1], V[i + 1, j + 2],
        )
        v_c = 0.5 * (V[i + 1, j + 1] + V[i + 1, j + 2])
        dvdy = (V[i + 1, j + 2] - V[i + 1, j + 1]) / dy
        return -rh * vh * v_c + 2.0 * visc[i + 1, j + 1] * dvdy - p[i + 1, j + 1]

    dmomU = np.zeros_like(U)
    for i in range(0, nx + 1):
        for j in range(0, ny):
            dmomU[i + 1, j + 1] = (
                (FXU(i, j) - FXU(i - 1, j)) / dx
                + (FYU(i, j + 1) - FYU(i, j)) / dy
                + pj_u[i + 1, j + 1]
            )

    dmomV = np.zeros_like(V)
    for i in range(0, nx):
        for j in range(0, ny + 1):
            dmomV[i + 1, j + 1] = (
                (FXV(i + 1, j) - FXV(i, j)) / dx
                + (FYV(i, j) - FYV(i, j - 1)) / dy
                + pj_v[i + 1, j + 1]
            )
    return dmomU, dmomV


def calc_drhodt(nx, ny, U, V, rho_u_old, rho_v_old, dx, dy, rho_eps):
    """src/FS.hpp:318-406."""

    def FXU(i, j):
        rh, _ = hybrid_interp(
            rho_eps, rho_u_old[i + 1, j + 1], rho_u_old[i + 2, j + 1],
            0.0, 0.0, U[i + 1, j + 1], U[i + 2, j + 1],
        )
        return -rh * 0.5 * (U[i + 1, j + 1] + U[i + 2, j + 1])

    def FYU(i, j):
        rh, _ = hybrid_interp(
            rho_eps, rho_u_old[i + 1, j], rho_u_old[i + 1, j + 1],
            0.0, 0.0, V[i, j + 1], V[i + 1, j + 1],
        )
        return -rh * 0.5 * (V[i, j + 1] + V[i + 1, j + 1])

    def FXV(i, j):
        rh, _ = hybrid_interp(
            rho_eps, rho_v_old[i, j + 1], rho_v_old[i + 1, j + 1],
            0.0, 0.0, U[i + 1, j], U[i + 1, j + 1],
        )
        return -rh * 0.5 * (U[i + 1, j] + U[i + 1, j + 1])

    def FYV(i, j):
        rh, _ = hybrid_interp(
            rho_eps, rho_v_old[i + 1, j + 1], rho_v_old[i + 1, j + 2],
            0.0, 0.0, V[i + 1, j + 1], V[i + 1, j + 2],
        )
        return -rh * 0.5 * (V[i + 1, j + 1] + V[i + 1, j + 2])

    drho_u = np.zeros_like(rho_u_old)
    for i in range(0, nx + 1):
        for j in range(0, ny):
            drho_u[i + 1, j + 1] = (FXU(i, j) - FXU(i - 1, j)) / dx + (
                FYU(i, j + 1) - FYU(i, j)
            ) / dy

    drho_v = np.zeros_like(rho_v_old)
    for i in range(0, nx):
        for j in range(0, ny + 1):
            drho_v[i + 1, j + 1] = (FXV(i + 1, j) - FXV(i, j)) / dx + (
                FYV(i, j) - FYV(i, j - 1)
            ) / dy
    return drho_u, drho_v


def assemble_poisson(nx, ny, rho_u, rho_v, dx, dy, dirichlet=None):
    """5-point operator over the full ghost box (src/LinearSystem.hpp:32-122).

    Returns coefficient arrays (aC, aL, aR, aB, aT) of shape (nx+2, ny+2),
    box index b = logical + 1.
    """
    vol = dx * dy
    N, M = nx + 2, ny + 2
    aC = np.zeros((N, M)); aL = np.zeros((N, M)); aR = np.zeros((N, M))
    aB = np.zeros((N, M)); aT = np.zeros((N, M))
    for bi in range(N):
        for bj in range(M):
            # faces: left rho_u[bi, bj], right rho_u[bi+1, bj] (rho_u shape (nx+3, ny+2))
            if bi == 0:
                aC[bi, bj] += vol / (dx * dx * rho_u[bi + 1, bj])
                aR[bi, bj] += -vol / (dx * dx * rho_u[bi + 1, bj])
            elif bi == N - 1:
                aC[bi, bj] += vol / (dx * dx * rho_u[bi, bj])
                aL[bi, bj] += -vol / (dx * dx * rho_u[bi, bj])
            else:
                aC[bi, bj] += vol / (dx * dx * rho_u[bi, bj]) + vol / (dx * dx * rho_u[bi + 1, bj])
                aL[bi, bj] += -vol / (dx * dx * rho_u[bi, bj])
                aR[bi, bj] += -vol / (dx * dx * rho_u[bi + 1, bj])
            if bj == 0:
                aC[bi, bj] += vol / (dy * dy * rho_v[bi, bj + 1])
                aT[bi, bj] += -vol / (dy * dy * rho_v[bi, bj + 1])
            elif bj == M - 1:
                aC[bi, bj] += vol / (dy * dy * rho_v[bi, bj])
                aB[bi, bj] += -vol / (dy * dy * rho_v[bi, bj])
            else:
                aC[bi, bj] += vol / (dy * dy * rho_v[bi, bj]) + vol / (dy * dy * rho_v[bi, bj + 1])
                aB[bi, bj] += -vol / (dy * dy * rho_v[bi, bj])
                aT[bi, bj] += -vol / (dy * dy * rho_v[bi, bj + 1])
    # Pinned identity rows + symmetric elimination of couplings into the
    # pinned cells (deliberate deviation from src/LinearSystem.hpp:79-121,
    # which leaves the matrix non-symmetric; solution is identical since the
    # pinned value is exactly zero).
    if dirichlet == "left":
        aC[0, :] = 1.0; aL[0, :] = aR[0, :] = aB[0, :] = aT[0, :] = 0.0
        aL[1, :] = 0.0
    elif dirichlet == "right":
        aC[-1, :] = 1.0; aL[-1, :] = aR[-1, :] = aB[-1, :] = aT[-1, :] = 0.0
        aR[-2, :] = 0.0
    elif dirichlet == "bottom":
        aC[:, 0] = 1.0; aL[:, 0] = aR[:, 0] = aB[:, 0] = aT[:, 0] = 0.0
        aB[:, 1] = 0.0
    elif dirichlet == "top":
        aC[:, -1] = 1.0; aL[:, -1] = aR[:, -1] = aB[:, -1] = aT[:, -1] = 0.0
        aT[:, -2] = 0.0
    return aC, aL, aR, aB, aT


def poisson_dense_matrix(aC, aL, aR, aB, aT):
    """Dense matrix of the 5-point operator for direct-solve cross-checks."""
    N, M = aC.shape
    n = N * M
    A = np.zeros((n, n))

    def k(bi, bj):
        return bi * M + bj

    for bi in range(N):
        for bj in range(M):
            A[k(bi, bj), k(bi, bj)] = aC[bi, bj]
            if bi > 0:
                A[k(bi, bj), k(bi - 1, bj)] = aL[bi, bj]
            if bi < N - 1:
                A[k(bi, bj), k(bi + 1, bj)] = aR[bi, bj]
            if bj > 0:
                A[k(bi, bj), k(bi, bj - 1)] = aB[bi, bj]
            if bj < M - 1:
                A[k(bi, bj), k(bi, bj + 1)] = aT[bi, bj]
    return A
