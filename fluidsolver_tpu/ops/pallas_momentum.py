"""Pallas TPU kernel: fused momentum + density-transport subiteration stage.

One subiteration's momentum work — consistent density transport
(mom.calc_drhodt + update_density), conservative momentum fluxes
(mom.calc_dmomdt), gravity, and the velocity update (mom.update_velocity) —
reads the same staggered fields several times when left to XLA's per-op
fusion. This kernel performs the whole stage band-by-band out of VMEM: every
input is DMA'd once, all fluxes and updates run on-chip, and the four
results (rho_u, rho_v, U, V) stream back. The in-kernel math literally
CALLS the existing ops/momentum.py functions on the loaded windows
(trapezoidal blocking with a 2-row halo; rows the functions treat as
window ghosts fall inside the discarded halo), so there is a single source
of truth for the numerics (reference: src/FS.hpp:158-436).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fluidsolver_tpu.ops import momentum as mom

VMEM_BUDGET_BYTES = 10 * 1024 * 1024
H = 2  # halo rows: flux stencils reach <= 2 rows from an updated row


def _make_kernel(B, W, Nc_pad, dx, dy, rho_eps, gx, gy, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # inputs: U, V, U_old, V_old, rho_u_old, rho_v_old, rho_u, rho_v,
    #         visc, p, pj_u, pj_v  (U-shaped inputs 0,2,4,6,10 have an
    #         extra row relative to the center/V-shaped ones)
    N_IN = 12
    N_OUT = 4

    def kernel(dt_ref, *refs):
        ins = refs[:N_IN]
        outs = refs[N_IN:N_IN + N_OUT]
        scr = refs[N_IN + N_OUT:N_IN + N_OUT + N_IN]
        out_scr = refs[N_IN + N_OUT + N_IN:N_IN + N_OUT + N_IN + N_OUT]
        sem_in = refs[-2]
        sem_out = refs[-1]

        band = pl.program_id(0)
        row0 = band * B                      # first center row of the band
        start = jnp.clip(row0 - H, 0, Nc_pad - W)

        dmas = []
        for i in range(N_IN):
            rows = W + 1 if i in (0, 2, 4, 6, 10) else W
            dmas.append(pltpu.make_async_copy(
                ins[i].at[pl.ds(start, rows), :], scr[i], sem_in.at[i]
            ))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

        U = scr[0][:]
        V = scr[1][:]
        U_old = scr[2][:]
        V_old = scr[3][:]
        rho_u_old = scr[4][:]
        rho_v_old = scr[5][:]
        rho_u = scr[6][:]
        rho_v = scr[7][:]
        visc = scr[8][:]
        p = scr[9][:]
        pj_u = scr[10][:]
        pj_v = scr[11][:]
        dt = dt_ref[0, 0]

        drho_u, drho_v = mom.calc_drhodt(
            U, V, rho_u_old, rho_v_old, dx, dy, rho_eps
        )
        rho_u_new, rho_v_new = mom.update_density(
            rho_u_old, rho_v_old, drho_u, drho_v, dt, rho_u, rho_v
        )
        dmomU, dmomV = mom.calc_dmomdt(
            U, V, rho_u_old, rho_v_old, visc, p, pj_u, pj_v, dx, dy, rho_eps
        )
        if gx != 0.0:
            dmomU = dmomU.at[1:-1, 1:-1].add(rho_u_new[1:-1, 1:-1] * gx)
        if gy != 0.0:
            dmomV = dmomV.at[1:-1, 1:-1].add(rho_v_new[1:-1, 1:-1] * gy)
        U_new, V_new = mom.update_velocity(
            U_old, V_old, rho_u_old, rho_v_old, rho_u_new, rho_v_new,
            dmomU, dmomV, dt, U, V,
        )

        out_scr[0][:] = rho_u_new
        out_scr[1][:] = rho_v_new
        out_scr[2][:] = U_new
        out_scr[3][:] = V_new

        off = row0 - start
        outs_dma = []
        for k in range(N_OUT):
            rows = B + 1 if k in (0, 2) else B
            outs_dma.append(pltpu.make_async_copy(
                out_scr[k].at[pl.ds(off, rows), :],
                outs[k].at[pl.ds(row0, rows), :],
                sem_out.at[k],
            ))
        for d in outs_dma:
            d.start()
        for d in outs_dma:
            d.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dx", "dy", "rho_eps", "gx", "gy", "interpret"),
)
def fused_momentum(U, V, U_old, V_old, rho_u_old, rho_v_old, rho_u, rho_v,
                   visc, p, pj_u, pj_v, dt, *, dx, dy, rho_eps,
                   gx=0.0, gy=0.0, interpret=False):
    """Fused subiteration momentum stage. Returns
    (rho_u_new, rho_v_new, U_new, V_new) — identical (to rounding) to the
    unfused call sequence in solvers/twophase.subiter."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Nc, M = p.shape  # center rows/cols; U has Nc+1 rows; V has M+1 cols
    dtype = p.dtype

    # band size over CENTER rows
    B = 256
    per_row = (12 + 4 + 8) * max(M + 1, M) * jnp.dtype(dtype).itemsize
    while B > 8 and (B + 2 * H + 1) * per_row > VMEM_BUDGET_BYTES:
        B //= 2
    n_bands = -(-Nc // B)
    Nc_pad = max(n_bands * B, B + 2 * H)
    n_bands = Nc_pad // B
    W = B + 2 * H

    def pad_rows(a, extra):
        target = Nc_pad + extra
        if a.shape[0] == target:
            return a
        return jnp.pad(a, ((0, target - a.shape[0]), (0, 0)))

    # order matters (see kernel): U-shaped inputs at indices 0,2,4,6,10
    args = [
        pad_rows(U, 1), pad_rows(V, 0),
        pad_rows(U_old, 1), pad_rows(V_old, 0),
        pad_rows(rho_u_old, 1), pad_rows(rho_v_old, 0),
        pad_rows(rho_u, 1), pad_rows(rho_v, 0),
        pad_rows(visc, 0), pad_rows(p, 0),
        pad_rows(pj_u, 1), pad_rows(pj_v, 0),
    ]
    col = [a.shape[1] for a in args]

    kernel = _make_kernel(B, W, Nc_pad, dx, dy, rho_eps, gx, gy, dtype)

    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((Nc_pad + 1, col[4]), dtype),  # rho_u
        jax.ShapeDtypeStruct((Nc_pad, col[5]), dtype),      # rho_v
        jax.ShapeDtypeStruct((Nc_pad + 1, col[0]), dtype),  # U
        jax.ShapeDtypeStruct((Nc_pad, col[1]), dtype),      # V
    )
    scratch = (
        [pltpu.VMEM((W + 1 if i in (0, 2, 4, 6, 10) else W, col[i]), dtype)
         for i in range(12)]
        + [pltpu.VMEM((W + 1, col[4]), dtype), pltpu.VMEM((W, col[5]), dtype),
           pltpu.VMEM((W + 1, col[0]), dtype), pltpu.VMEM((W, col[1]), dtype)]
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
        interpret=interpret,
    )(dt_arr, *args)

    rho_u_new, rho_v_new, U_new, V_new = res
    # The last REAL row of each output is a ghost row the update functions
    # must leave at its base value; when the domain does not end on a band
    # boundary, the kernel's window saw zero-padded rows beyond it and
    # overwrote it with junk — restore from the base arrays. (Row 0 is safe:
    # the first band's window is clamped to start=0, so the functions' own
    # edge handling preserved it.)
    return (
        rho_u_new[:Nc + 1].at[-1].set(rho_u[-1]),
        rho_v_new[:Nc].at[-1].set(rho_v[-1]),
        U_new[:Nc + 1].at[-1].set(U[-1]),
        V_new[:Nc].at[-1].set(V[-1]),
    )
