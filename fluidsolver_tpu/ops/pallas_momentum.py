"""Pallas TPU kernel: fused momentum + density-transport subiteration stage.

One subiteration's momentum work — consistent density transport
(mom.calc_drhodt + mom.update_density), conservative momentum fluxes with
hybrid upwinding (mom.calc_dmomdt), gravity, and the velocity update
(mom.update_velocity) — reads the same staggered fields several times when
left to XLA's per-op fusion. This kernel performs the whole stage
band-by-band out of VMEM: every input is DMA'd once, all fluxes and updates
run on-chip, and the four results (rho_u, rho_v, U, V) stream back.

Kernel math is written in "canvas" form for Mosaic: every mesh (U-faces,
V-faces, centers, corners) lives on a common (W+1, M+1) window canvas at
offset 0, staggered neighbor access is roll+mask (`_shift_in`), interiors
are selected with iota masks — no lane-offset slices, pads, or scatters
(all of which hit unimplemented Mosaic lowerings). The formulas mirror
ops/momentum.py term by term (reference: src/FS.hpp:131-436) and the
equality is pinned to rounding by tests/test_pallas_momentum.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fluidsolver_tpu.poisson.pallas_vcycle import _shift_in

VMEM_BUDGET_BYTES = 10 * 1024 * 1024
H = 2  # halo rows: flux stencils reach <= 2 rows from an updated row


def _hybrid(rho_eps, rho_m, rho_p, velo_m, velo_p, transp_m, transp_p):
    """mom.hybrid_interp on canvas values (src/FS.hpp:131-150)."""
    upwind_minus = transp_p + transp_m >= 0.0
    rho_up = jnp.where(upwind_minus, rho_m, rho_p)
    velo_up = jnp.where(upwind_minus, velo_m, velo_p)
    use_up = jnp.abs(rho_p - rho_m) > rho_eps
    rho = jnp.where(use_up, rho_up, 0.5 * (rho_p + rho_m))
    velo = jnp.where(use_up, velo_up, 0.5 * (velo_p + velo_m))
    return rho, velo


def _stage_on_canvas(U, V, U_old, V_old, ruo, rvo, rho_u, rho_v, visc, p,
                     pj_u, pj_v, dt, dx, dy, rho_eps, gx, gy,
                     n_u_rows, n_c_rows, n_c_cols, row_base):
    """The full momentum stage on (R, C) canvases.

    Index conventions on the canvas (matching ops/momentum.py):
      U/rho_u/pj_u valid at [0:n_u_rows, 0:n_c_cols]  (n_u_rows = n_c_rows+1)
      V/rho_v/pj_v valid at [0:n_c_rows, 0:n_c_cols+1]
      centers      valid at [0:n_c_rows, 0:n_c_cols]
      center  c    pairs faces U[c], U[c+1]
      corner (k,l) uses U[k+1, l], U[k+1, l+1], V[k, l+1], V[k+1, l+1]
    ``row_base`` = absolute index of canvas row 0 (for the domain-interior
    masks). Returns (rho_u_new, rho_v_new, U_new, V_new) full canvases.
    """

    def R(a, di, dj):
        return _shift_in(a, di, dj)

    # ---- center-mesh x fluxes: FXU (momentum), GXU (density) --------------
    U_e = R(U, 1, 0)        # U[c+1]
    ru_e = R(ruo, 1, 0)
    rho_h, u_h = _hybrid(rho_eps, ruo, ru_e, U, U_e, U, U_e)
    u_c = 0.5 * (U + U_e)
    dudx = (U_e - U) / dx
    FXU = -rho_h * u_h * u_c + 2.0 * visc * dudx - p
    GXU = -rho_h * 0.5 * (U + U_e)

    # ---- corner-mesh fluxes: FYU, FXV (momentum), GYU, GXV (density) ------
    u_lo = R(U, 1, 0)       # U[k+1, l]
    u_hi = R(U, 1, 1)       # U[k+1, l+1]
    v_lo = R(V, 0, 1)       # V[k, l+1]
    v_hi = R(V, 1, 1)       # V[k+1, l+1]
    ru_lo = R(ruo, 1, 0)
    ru_hi = R(ruo, 1, 1)
    rv_lo = R(rvo, 0, 1)
    rv_hi = R(rvo, 1, 1)
    # corner viscosity: 0.25*(visc[k,l] + visc[k+1,l] + visc[k,l+1] + visc[k+1,l+1])
    mu_c = 0.25 * (visc + R(visc, 1, 0) + R(visc, 0, 1) + R(visc, 1, 1))
    dudy = (u_hi - u_lo) / dy
    dvdx = (v_hi - v_lo) / dx
    rho_h, u_h = _hybrid(rho_eps, ru_lo, ru_hi, u_lo, u_hi, v_lo, v_hi)
    FYU = -rho_h * u_h * 0.5 * (v_lo + v_hi) + mu_c * (dudy + dvdx)
    GYU = -rho_h * 0.5 * (v_lo + v_hi)
    rho_h, v_h = _hybrid(rho_eps, rv_lo, rv_hi, v_lo, v_hi, u_lo, u_hi)
    FXV = -rho_h * v_h * 0.5 * (u_lo + u_hi) + mu_c * (dudy + dvdx)
    GXV = -rho_h * 0.5 * (u_lo + u_hi)

    # ---- center-mesh y fluxes: FYV, GYV ------------------------------------
    V_n = R(V, 0, 1)        # V[c, l+1]
    rv_n = R(rvo, 0, 1)
    rho_h, v_h = _hybrid(rho_eps, rvo, rv_n, V, V_n, V, V_n)
    v_c = 0.5 * (V + V_n)
    dvdy = (V_n - V) / dy
    FYV = -rho_h * v_h * v_c + 2.0 * visc * dvdy - p
    GYV = -rho_h * 0.5 * (V + V_n)

    # ---- flux differences --------------------------------------------------
    # dmomU[i, j] = (FXU[i] - FXU[i-1])/dx + (FYU[i-1, j] - FYU[i-1, j-1])/dy
    #              + pj_u[i, j]
    dmomU = (
        (FXU - R(FXU, -1, 0)) / dx
        + (R(FYU, -1, 0) - R(FYU, -1, -1)) / dy
        + pj_u
    )
    drho_u = (GXU - R(GXU, -1, 0)) / dx + (R(GYU, -1, 0) - R(GYU, -1, -1)) / dy
    # dmomV[c, j] = (FXV[c, j-1] - FXV[c-1, j-1])/dx + (FYV[c, j] - FYV[c, j-1])/dy
    #              + pj_v[c, j]
    dmomV = (
        (R(FXV, 0, -1) - R(FXV, -1, -1)) / dx
        + (FYV - R(FYV, 0, -1)) / dy
        + pj_v
    )
    drho_v = (R(GXV, 0, -1) - R(GXV, -1, -1)) / dx + (GYV - R(GYV, 0, -1)) / dy

    # ---- interior masks (absolute domain indices) ---------------------------
    Rr, Cc = U.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (Rr, Cc), 0) + row_base
    jj = jax.lax.broadcasted_iota(jnp.int32, (Rr, Cc), 1)
    in_u = (ii > 0) & (ii < n_u_rows - 1) & (jj > 0) & (jj < n_c_cols - 1)
    in_v = (ii > 0) & (ii < n_c_rows - 1) & (jj > 0) & (jj < n_c_cols)

    # ---- updates (mom.update_density / update_velocity) --------------------
    rho_u_new = jnp.where(in_u, ruo + dt * drho_u, rho_u)
    rho_v_new = jnp.where(in_v, rvo + dt * drho_v, rho_v)
    if gx != 0.0:
        dmomU = dmomU + jnp.where(in_u, rho_u_new * gx, 0.0)
    if gy != 0.0:
        dmomV = dmomV + jnp.where(in_v, rho_v_new * gy, 0.0)
    ru_safe = jnp.where(rho_u_new == 0.0, 1.0, rho_u_new)
    rv_safe = jnp.where(rho_v_new == 0.0, 1.0, rho_v_new)
    U_new = jnp.where(in_u, (ruo * U_old + dt * dmomU) / ru_safe, U)
    V_new = jnp.where(in_v, (rvo * V_old + dt * dmomV) / rv_safe, V)
    return rho_u_new, rho_v_new, U_new, V_new


def _make_kernel(B, W, Nc_pad, M, C, dx, dy, rho_eps, gx, gy, dtype,
                 n_u_rows, n_c_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N_IN = 12
    N_OUT = 4
    # C = canvas cols: M+1 (V mesh) rounded up to a 128 multiple (Mosaic:
    # HBM slice lane dims must be tile-aligned); masks use the true M
    Rr = W + 8         # canvas rows: U windows read 8 extra (aligned) rows

    def kernel(dt_ref, *refs):
        # separate 2D canvases per array (3D VMEM slabs cannot be index-
        # sliced unless the lane dim is 128-aligned)
        ins = refs[:N_IN]
        outs = refs[N_IN:N_IN + N_OUT]
        scr = refs[N_IN + N_OUT:N_IN + N_OUT + N_IN]
        out_scr = refs[N_IN + N_OUT + N_IN:N_IN + N_OUT + N_IN + N_OUT]
        sem_in = refs[-2]
        sem_out = refs[-1]

        band = pl.program_id(0)
        row0 = pl.multiple_of(band * B, 8)
        # fixed 8-row halo (>= H) keeps the DMA start provably 8-aligned
        start = pl.multiple_of(jnp.clip(row0 - 8, 0, Nc_pad - W), 8)

        # every input is padded (rows AND cols) to the uniform canvas shape
        # by the wrapper, so each DMA fills a whole scratch slab — windowed
        # sub-ref targets trip Mosaic's tiling-alignment rules
        dmas = []
        for i in range(N_IN):
            dmas.append(pltpu.make_async_copy(
                ins[i].at[pl.ds(start, Rr), :],
                scr[i],
                sem_in.at[i],
            ))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

        vals = [scr[i][:] for i in range(N_IN)]
        dt = dt_ref[0, 0]
        res = _stage_on_canvas(
            *vals, dt, dx, dy, rho_eps, gx, gy,
            n_u_rows, n_c_rows, M, start,
        )
        # PRE-ALIGNED flat outputs: each band DMAs its own B interior rows
        # to rows [row0, row0+B) of a flat (Nc_pad, C) buffer, so the
        # wrapper extract is a plain slice. (The old per-band (n_bands,
        # Rr, C) outputs forced an XLA slice+concat chain per output —
        # ~16 dynamic-update-slices x 4 outputs x 5 subiters ~ 300
        # launches/step at 1024^2, the single biggest block of the
        # round-4 step census.) Both offsets are 8-aligned: row0 = band*B
        # (B a multiple of 8) and off = row0 - start with start 8-aligned,
        # so the VMEM sub-ref and the HBM window satisfy Mosaic tiling.
        off = pl.multiple_of(row0 - start, 8)
        outs_dma = []
        for k in range(N_OUT):
            out_scr[k][:] = res[k]
            outs_dma.append(pltpu.make_async_copy(
                out_scr[k].at[pl.ds(off, B)],
                outs[k].at[pl.ds(row0, B)],
                sem_out.at[k],
            ))
        for d in outs_dma:
            d.start()
        for d in outs_dma:
            d.wait()

    return kernel


def _layout(Nc, M, dtype):
    """(B, W, n_bands, Nc_pad, C_pad) of the momentum band layout — a pure
    function of the center shape + dtype, shared by fused_momentum and
    prepad_step_constants so pre-padded operands always fit."""
    C_pad = -(-(M + 1) // 128) * 128
    B = 256
    per_row = (12 + 4) * C_pad * jnp.dtype(dtype).itemsize
    while B > 8 and (B + 2 * H + 9) * per_row > VMEM_BUDGET_BYTES:
        B //= 2
    W = B + 16
    n_bands = max(-(-Nc // B), -(-W // B))
    return B, W, n_bands, n_bands * B, C_pad


def prepad_step_constants(U_old, V_old, rho_u_old, rho_v_old, visc,
                          center_shape):
    """Pad the five per-STEP-constant fused_momentum inputs once per step
    (they are re-padded identically on every one of the 5 subiteration
    calls otherwise — ~25 extra kernels + ~100 MB of HBM copies per step
    at 1024^2)."""
    Nc, M = center_shape
    _, _, _, Nc_pad, C_pad = _layout(Nc, M, visc.dtype)

    def pad_to(a):
        return jnp.pad(a, ((0, Nc_pad + 8 - a.shape[0]),
                           (0, C_pad - a.shape[1])))

    return tuple(pad_to(a) for a in (U_old, V_old, rho_u_old, rho_v_old,
                                     visc))


@functools.partial(
    jax.jit,
    static_argnames=("dx", "dy", "rho_eps", "gx", "gy", "interpret"),
)
def fused_momentum(U, V, U_old, V_old, rho_u_old, rho_v_old, rho_u, rho_v,
                   visc, p, pj_u, pj_v, dt, *, dx, dy, rho_eps,
                   gx=0.0, gy=0.0, interpret=False, prepadded=None):
    """Fused subiteration momentum stage. Returns
    (rho_u_new, rho_v_new, U_new, V_new) — identical (to rounding) to the
    unfused call sequence in solvers/twophase.subiter."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Nc, M = p.shape  # center rows/cols; U has Nc+1 rows; V has M+1 cols
    dtype = p.dtype

    # canvas layout: lane-aligned cols, fixed 8-row halo both sides so
    # every band DMA start/length is aligned (see _layout)
    B, W, n_bands, Nc_pad, C_pad = _layout(Nc, M, dtype)

    def pad_to(a, rows):
        r = rows - a.shape[0]
        c = C_pad - a.shape[1]
        return jnp.pad(a, ((0, r), (0, c)))

    # every input padded to the uniform (Nc_pad + 8, M + 1) shape so each
    # band's DMA reads a full canvas slab (Rr = W + 8 rows) at an aligned
    # start; the 8 extra rows double as the U-mesh's one-row overhang.
    # The five per-step-constant inputs may come pre-padded
    # (prepad_step_constants) — padded once per step, not per subiteration.
    if prepadded is not None:
        Uo_p, Vo_p, ruo_p, rvo_p, visc_p = prepadded
        assert Uo_p.shape == (Nc_pad + 8, C_pad), (
            Uo_p.shape, (Nc_pad + 8, C_pad))
    else:
        Uo_p = pad_to(U_old, Nc_pad + 8)
        Vo_p = pad_to(V_old, Nc_pad + 8)
        ruo_p = pad_to(rho_u_old, Nc_pad + 8)
        rvo_p = pad_to(rho_v_old, Nc_pad + 8)
        visc_p = pad_to(visc, Nc_pad + 8)
    args = [pad_to(U, Nc_pad + 8), pad_to(V, Nc_pad + 8),
            Uo_p, Vo_p, ruo_p, rvo_p,
            pad_to(rho_u, Nc_pad + 8), pad_to(rho_v, Nc_pad + 8),
            visc_p, pad_to(p, Nc_pad + 8),
            pad_to(pj_u, Nc_pad + 8), pad_to(pj_v, Nc_pad + 8)]

    kernel = _make_kernel(
        B, W, Nc_pad, M, C_pad, dx, dy, rho_eps, gx, gy, dtype,
        n_u_rows=Nc + 1, n_c_rows=Nc,
    )

    # explicit HBM: ANY may place small operands in VMEM, where the
    # banded DMA becomes a lane-misaligned VMEM slice Mosaic rejects
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((Nc_pad, C_pad), dtype) for _ in range(4)
    )
    scratch = (
        [pltpu.VMEM((W + 8, C_pad), dtype) for _ in range(16)]
        + [pltpu.SemaphoreType.DMA((12,)), pltpu.SemaphoreType.DMA((4,))]
    )

    dt_arr = jnp.asarray(dt, dtype).reshape(1, 1)
    res = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        out_shape=out_shapes,
        in_specs=[smem] + [hbm] * 12,
        out_specs=(hbm, hbm, hbm, hbm),
        scratch_shapes=scratch,
        # v5e has 128 MiB VMEM; the default 16 MiB scoped limit rejects the
        # larger bands (scratch slabs + Mosaic value stack)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(dt_arr, *args)

    # outputs are written pre-aligned (rows [0, Nc_pad)) in-kernel; the
    # extraction below is plain slicing that fuses into the consumers
    rho_u_new, rho_v_new, U_new, V_new = res
    # bands cover rows [0, Nc_pad); the last U-shaped row (index Nc, a ghost
    # row the updates must keep at its base value) is appended from the base
    return (
        jnp.concatenate([rho_u_new[:Nc, :M], rho_u[Nc:Nc + 1]], axis=0),
        rho_v_new[:Nc, :M + 1],
        jnp.concatenate([U_new[:Nc, :M], U[Nc:Nc + 1]], axis=0),
        V_new[:Nc, :M + 1],
    )
