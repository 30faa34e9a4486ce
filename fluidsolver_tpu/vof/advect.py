"""Unsplit geometric VOF advection as dense vectorized 2D polygon clipping.

Re-designs the reference's IRL-based advection (src/VOF.hpp:187-332) in
2D-native form. The reference backtracks the 8 corners of a z-slab cell with
RK4, inserts volume-corrected cap vertices per face (``Polyhedron24`` +
``adjustCapToMatchVolume``), and accumulates overlap volumes against the 9
neighbors' localized PLIC liquid regions. Here the z-invariant geometry is
done directly in the plane:

  * the 4 cell corners are RK4-backtracked through the clamped-bilinear
    cell-centered velocity (same integrator as ``advect_point``,
    src/VOF.hpp:66-85);
  * each face gets a midpoint vertex, displaced along the face normal so the
    face's swept (pentagon) area equals the discrete staggered flux
    ``U_face * dy * dt`` — the closed-form 2D equivalent of
    ``adjustCapToMatchVolume`` (src/VOF.hpp:251-289). The backtracked cell
    is then an octagon whose area is exactly ``vol * (1 - dt*div)``;
  * the new fraction is (octagon ∩ neighbor cell ∩ neighbor liquid
    half-plane) summed over the 3x3 neighborhood, divided by the octagon
    area (src/VOF.hpp:300-313). Pure-liquid or ghost neighbors with no
    reconstruction contribute their full rectangle overlap, matching the
    reference's zero-plane-separator semantics.

Everything is fixed-shape masked compute: Sutherland-Hodgman clipping with
K=16 vertex buffers, compaction by stable argsort. Early exits (all-gas /
all-liquid neighborhoods, src/VOF.hpp:198-214) become ``where``-selects.

Two execution strategies share the same per-cell math (bit-identical):

  * **sparse** (default): the clip geometry runs only on the *active* cells
    (those whose 3x3 neighborhood is neither all-gas nor all-liquid),
    gathered into a fixed-size batch of ``max_active`` lanes and scattered
    back. This is the TPU-shaped analog of the reference's dynamic-schedule
    loop over mixed cells (src/VOF.hpp:318-332): the interface is O(N) cells
    of the N^2 grid, so dense geometry wastes ~99% of the work at production
    sizes (and 13+ GB of XLA temp buffers at 1024^2). Overflowing lanes
    (more active cells than ``max_active``) are detected and reported as an
    ``inf`` volume error — never silently dropped.
  * **dense** (``max_active=0``): the original all-cells batch, kept as the
    oracle for equivalence tests and for tiny grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fluidsolver_tpu.core.fields import set_interior
from fluidsolver_tpu.core.grid import Grid
from fluidsolver_tpu.ops.stencil import (sample_centered_stack,
                                         sample_centered_stack_lattice)
from fluidsolver_tpu.vof.plic import Plic, _NEIGHBOR_OFFSETS, _shift, clamp_lanes

K = 16  # vertex buffer size: octagon (8) + 4 rect clips + PLIC clip <= 13


# ---- point backtracking (src/VOF.hpp:66-85) -------------------------------
def backtrack_rk4(px, py, Ui, Vi, grid: Grid, dt, lattice: bool = False,
                  shard=None):
    """RK4 backward trace through the cell-centered interpolated velocity.

    ``lattice=True``: the points are the full (nx+1, ny+1) interior corner
    lattice (dense advection) — use the gather-free shifted-view sampler
    (bit-identical; see stencil.sample_centered_stack_lattice).

    ``shard``: shard-local view (parallel/dist_vof.ShardView): Ui/Vi are
    halo-extended local x-slabs; sample with a shard-shifted origin and
    GLOBAL domain clamp (stencil.sample_centered_stack x_clamp)."""
    # Python floats (weak-typed), NOT numpy f64 scalars: under enabled x64 a
    # numpy scalar would promote the whole f32 backtrack (and hence vf) to f64
    x0 = float(grid.xm[1])
    y0 = float(grid.ym[1])
    x_clamp = None
    if shard is not None:
        x_clamp = (x0, grid.nx, -shard.row_off)
        x0 = x0 + shard.row_off.astype(px.dtype) * grid.dx
    # one gather per RK stage instead of eight (u+v, 4 corners each)
    UiVi = jnp.stack([Ui, Vi])
    sample = sample_centered_stack_lattice if lattice else sample_centered_stack

    def vel(x, y):
        if lattice:
            uv = sample(UiVi, x0, grid.dx, y0, grid.dy, x, y)
        else:
            uv = sample(UiVi, x0, grid.dx, y0, grid.dy, x, y,
                        x_clamp=x_clamp)
        return uv[0], uv[1]

    u1, v1 = vel(px, py)
    u2, v2 = vel(px - 0.5 * dt * u1, py - 0.5 * dt * v1)
    u3, v3 = vel(px - 0.5 * dt * u2, py - 0.5 * dt * v2)
    u4, v4 = vel(px - dt * u3, py - dt * v3)
    return (
        px - dt / 6.0 * (u1 + 2.0 * u2 + 2.0 * u3 + u4),
        py - dt / 6.0 * (v1 + 2.0 * v2 + 2.0 * v3 + v4),
    )


def backtrack_rk4_staggered(px, py, U, V, grid: Grid, dt):
    """RK4 backward trace through the RAW STAGGERED velocity — the
    ``FS_VOF_ADVECT_WITH_STAGGERED_VELOCITY`` A/B variant
    (src/VOF.hpp:89-114 ``advect_point2``): u bilinear on the
    (x-face, y-center) grid, v on the (x-center, y-face) grid, stage
    displacements shared between the u and v samples exactly as upstream."""
    from fluidsolver_tpu.ops.stencil import sample_centered

    xf0, yc0 = float(grid.x[1]), float(grid.ym[1])
    xc0, yf0 = float(grid.xm[1]), float(grid.y[1])

    def vel(x, y):
        u = sample_centered(U, xf0, grid.dx, yc0, grid.dy, x, y)
        v = sample_centered(V, xc0, grid.dx, yf0, grid.dy, x, y)
        return u, v

    u1, v1 = vel(px, py)
    u2, v2 = vel(px - 0.5 * dt * u1, py - 0.5 * dt * v1)
    u3, v3 = vel(px - 0.5 * dt * u2, py - 0.5 * dt * v2)
    u4, v4 = vel(px - dt * u3, py - dt * v3)
    return (
        px - dt / 6.0 * (u1 + 2.0 * u2 + 2.0 * u3 + u4),
        py - dt / 6.0 * (v1 + 2.0 * v2 + 2.0 * v3 + v4),
    )


# ---- fixed-size polygon helpers ------------------------------------------
def _next_vertex(a, n):
    """a[..., (idx+1) mod n] for the ``n`` valid leading slots as a lane
    ROTATE + select — never a gather. ``take_along_axis`` along the minor
    dimension lowers to scalar gathers on TPU (~1000x speed-of-light:
    measured 12.3 ms to permute 9 MB); ``roll`` by one is a vectorized lane
    rotate. Invalid slots (idx >= n) read rotated garbage, exactly as
    harmless as the old gather's slot-0 read — every consumer masks them."""
    idx = jnp.arange(K)
    return jnp.where(idx == n[..., None] - 1, a[..., :1], jnp.roll(a, -1, axis=-1))


def _poly_area(vx, vy, n):
    """Signed shoelace area of polygons with ``n`` valid leading vertices."""
    idx = jnp.arange(K)
    valid = idx < n[..., None]
    x2 = _next_vertex(vx, n)
    y2 = _next_vertex(vy, n)
    contrib = jnp.where(valid, vx * y2 - x2 * vy, 0.0)
    return 0.5 * jnp.sum(contrib, axis=-1)


def _clip_halfplane(vx, vy, n, a, b, c):
    """Sutherland-Hodgman clip against {a x + b y <= c}.

    (vx, vy): (..., K) vertex buffers with ``n`` valid; (a, b, c)
    broadcastable to the batch. Returns new (vx, vy, n).
    """
    idx = jnp.arange(K)
    valid = idx < n[..., None]
    d = a[..., None] * vx + b[..., None] * vy - c[..., None]
    inside = (d <= 0.0) & valid

    d_n = _next_vertex(d, n)
    vx_n = _next_vertex(vx, n)
    vy_n = _next_vertex(vy, n)
    inside_n = _next_vertex(inside, n)

    denom = d - d_n
    t = jnp.where(jnp.abs(denom) > 0.0, d / jnp.where(denom == 0.0, 1.0, denom), 0.0)
    ix = vx + t * (vx_n - vx)
    iy = vy + t * (vy_n - vy)

    emit_v = inside
    emit_i = (inside ^ inside_n) & valid

    # interleave: slot 2k = vertex k, slot 2k+1 = intersection on edge k
    def interleave(a1, a2):
        return jnp.stack([a1, a2], axis=-1).reshape(*a1.shape[:-1], 2 * K)

    out_x = interleave(vx, ix)
    out_y = interleave(vy, iy)
    flags = interleave(emit_v, emit_i)

    # stable compaction: flagged slots first, order preserved. Keys are
    # distinct (pos or 2K+pos), so an unstable variadic sort that co-sorts
    # the coordinates is equivalent to argsort + 2 gathers and avoids the
    # two take_along_axis passes on TPU.
    pos = jnp.arange(2 * K)
    keys = jnp.where(flags, pos, 2 * K + pos)
    _, out_x, out_y = jax.lax.sort(
        (jnp.broadcast_to(keys, out_x.shape), out_x, out_y),
        dimension=-1, num_keys=1,
    )
    out_x = out_x[..., :K]
    out_y = out_y[..., :K]
    new_n = jnp.sum(flags, axis=-1).astype(n.dtype)
    # zero the tail so downstream arithmetic stays finite
    tail = jnp.arange(K) >= new_n[..., None]
    out_x = jnp.where(tail, 0.0, out_x)
    out_y = jnp.where(tail, 0.0, out_y)
    return out_x, out_y, new_n


def _pentagon_area(p0x, p0y, p1x, p1y, a1x, a1y, mx, my, a0x, a0y):
    """Shoelace of the face-swept pentagon (p0, p1, a1, m, a0)."""
    return 0.5 * (
        p0x * p1y - p1x * p0y
        + p1x * a1y - a1x * p1y
        + a1x * my - mx * a1y
        + mx * a0y - a0x * my
        + a0x * p0y - p0x * a0y
    )


def _face_midpoint(a0x, a0y, a1x, a1y, p0x, p0y, p1x, p1y, target):
    """Cap vertex on face (a1 -> m -> a0): midpoint of (a0, a1) displaced
    perpendicular so the pentagon area hits ``target`` (2D analog of
    IRL adjustCapToMatchVolume)."""
    cx = 0.5 * (a0x + a1x)
    cy = 0.5 * (a0y + a1y)
    quad = _pentagon_area(p0x, p0y, p1x, p1y, a1x, a1y, cx, cy, a0x, a0y)
    ex = a0x - a1x
    ey = a0y - a1y
    elen = jnp.sqrt(ex * ex + ey * ey)
    # triangle (a1, m, a0) area = 0.5 * eta * |e|  for m = c + eta * (ey,-ex)/|e|
    eta = jnp.where(elen > 0.0, 2.0 * (target - quad) / jnp.where(elen == 0.0, 1.0, elen), 0.0)
    mx = cx + eta * ey / jnp.where(elen == 0.0, 1.0, elen)
    my = cy - eta * ex / jnp.where(elen == 0.0, 1.0, elen)
    return mx, my


def _octagon_slots(a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y,
                   U_W, U_E, V_S, V_N, dx, dy, dt):
    """The 8 octagon slot coordinates (two lists of per-slot arrays) from
    backtracked corners (cell-local coords) and the four staggered face
    velocities; faces CCW with flux-matched midpoints."""
    zeros = jnp.zeros_like(a00x)
    dxa = jnp.full_like(a00x, dx)
    dya = jnp.full_like(a00x, dy)

    # CCW faces: S (p00->p10), E (p10->p11), N (p11->p01), W (p01->p00)
    mSx, mSy = _face_midpoint(a00x, a00y, a10x, a10y, zeros, zeros, dxa, zeros, -V_S * dx * dt)
    mEx, mEy = _face_midpoint(a10x, a10y, a11x, a11y, dxa, zeros, dxa, dya, U_E * dy * dt)
    mNx, mNy = _face_midpoint(a11x, a11y, a01x, a01y, dxa, dya, zeros, dya, V_N * dx * dt)
    mWx, mWy = _face_midpoint(a01x, a01y, a00x, a00y, zeros, dya, zeros, zeros, -U_W * dy * dt)

    return ([a00x, mSx, a10x, mEx, a11x, mNx, a01x, mWx],
            [a00y, mSy, a10y, mEy, a11y, mNy, a01y, mWy])


def _quad_slots(a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y):
    """``VOF_NO_CORRECTION`` A/B variant (src/VOF.hpp:216-218, 237-248
    compiled out): the advected cell is the PLAIN backtraced quadrilateral —
    no flux-matched face caps, so the polygon volume is not reconciled with
    the discrete face fluxes and the advection picks up an O(dt*div_h)
    volume error per step. Kept for parity experiments; the corrected
    octagon is the production path."""
    return [a00x, a10x, a11x, a01x], [a00y, a10y, a11y, a01y]


def _pad_slots(slots_x, slots_y, dtype):
    """Assemble slot lists into the (..., K) AoS buffers of the XLA clip
    path (tail slots zero, valid count = len(slots))."""
    n0 = len(slots_x)
    vx = jnp.stack(slots_x, axis=-1)
    vy = jnp.stack(slots_y, axis=-1)
    pad = jnp.zeros(slots_x[0].shape + (K - n0,), dtype)
    vx = jnp.concatenate([vx, pad], axis=-1)
    vy = jnp.concatenate([vy, pad], axis=-1)
    n = jnp.full(slots_x[0].shape, n0, jnp.int32)
    return vx, vy, n


def _build_octagon(a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y,
                   U_W, U_E, V_S, V_N, dx, dy, dt, dtype):
    """Octagon (..., K) buffers (XLA clip-path form of _octagon_slots)."""
    xs, ys = _octagon_slots(a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y,
                            U_W, U_E, V_S, V_N, dx, dy, dt)
    return _pad_slots(xs, ys, dtype)


def _build_quad(a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y, dtype):
    """Quad (..., K) buffers (XLA clip-path form of _quad_slots)."""
    xs, ys = _quad_slots(a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y)
    return _pad_slots(xs, ys, dtype)


def _overlap_from_neighbors(oct_x, oct_y, n8, vf_nb, mixed, pnx, pny, pd,
                            x_lo, y_lo, dx, dy):
    """Sum of (octagon ∩ neighbor rect ∩ neighbor PLIC liquid) areas over the
    stacked 9-neighbor axis. All neighbor inputs are (9, ...); the octagon is
    (..., K) and broadcast across it — ONE batched clip pipeline (9x smaller
    XLA graph than unrolling, same math)."""
    batch = vf_nb.shape
    ones9 = jnp.ones_like(x_lo)
    zeros9 = jnp.zeros_like(x_lo)
    vx = jnp.broadcast_to(oct_x, batch + (K,))
    vy = jnp.broadcast_to(oct_y, batch + (K,))
    n = jnp.broadcast_to(n8, batch)
    vx, vy, n = _clip_halfplane(vx, vy, n, -ones9, zeros9, -x_lo)
    vx, vy, n = _clip_halfplane(vx, vy, n, ones9, zeros9, x_lo + dx)
    vx, vy, n = _clip_halfplane(vx, vy, n, zeros9, -ones9, -y_lo)
    vx, vy, n = _clip_halfplane(vx, vy, n, zeros9, ones9, y_lo + dy)

    # PLIC liquid half-plane in the target cell's local frame; disabled
    # (always-true plane 0 <= 1) when the neighbor has no reconstruction
    a_p = jnp.where(mixed, pnx, 0.0)
    b_p = jnp.where(mixed, pny, 0.0)
    c_p = jnp.where(mixed, pd + pnx * x_lo + pny * y_lo, 1.0)
    vx, vy, n = _clip_halfplane(vx, vy, n, a_p, b_p, c_p)

    area = _poly_area(vx, vy, n)
    from fluidsolver_tpu.constants import vf_cutoffs

    lo, _ = vf_cutoffs(vf_nb.dtype)
    return jnp.sum(jnp.where(vf_nb > lo, area, 0.0), axis=0)


def _classify(vf_old, nx, ny, dtype):
    """Early-exit classification (src/VOF.hpp:198-214): (all_gas, all_liq)
    over the (nx, ny) interior."""
    from fluidsolver_tpu.constants import vf_cutoffs

    lo, hi = vf_cutoffs(dtype)
    nb_sum = jnp.zeros((nx, ny), dtype)
    for di, dj in _NEIGHBOR_OFFSETS:
        nb_sum = nb_sum + _shift(vf_old, di, dj)
    return nb_sum < lo, nb_sum >= 9.0 * hi


def default_max_active(nx: int, ny: int) -> int:
    """Active-lane budget for the sparse path: generous for any resolved
    interface (length <~ 4 domain diagonals of cells), never larger than the
    grid itself."""
    return min(nx * ny, max(4096, 16 * max(nx, ny)))


def advect(vf_old, rec: Plic, U, V, Ui, Vi, grid: Grid, dt, max_active=None,
           pin=None, no_correction: bool = False, staggered: bool = False):
    """One unsplit geometric advection of the VOF field.

    Returns (vf_new, max_volume_error). ``vf_old`` ghost values are kept
    (the reference never rewrites ghost fractions after init).

    ``max_active``: lane budget of the sparse active-cell path (None = auto,
    ``default_max_active``); 0 = dense all-cells path. If the interface
    outgrows the budget the returned volume error is ``inf`` (loud failure;
    raise the budget).

    ``pin``: optional array -> array sharding-constraint hook (the sharded
    solver's ``_constrain``). Applied around the interior->full-box pad so
    GSPMD lowers the shard-tile change to neighbor permutes instead of a
    full-field all-gather (tools/collective_census.py).

    A/B debug variants (reference compile-time flags, src/VOF.hpp:216-298):
    ``no_correction`` = VOF_NO_CORRECTION (plain backtraced quad, no
    flux-matched caps); ``staggered`` =
    FS_VOF_ADVECT_WITH_STAGGERED_VELOCITY (RK4 through the raw staggered
    velocity instead of the cell-centered interpolation)."""
    vf_old = jnp.asarray(vf_old)  # tolerate numpy input at the API boundary
    if max_active is None:
        max_active = default_max_active(grid.nx, grid.ny)
    if max_active:
        return _advect_sparse(vf_old, rec, U, V, Ui, Vi, grid, dt,
                              int(max_active), no_correction=no_correction,
                              staggered=staggered)
    return _advect_dense(vf_old, rec, U, V, Ui, Vi, grid, dt, pin=pin,
                         no_correction=no_correction, staggered=staggered)


def _advect_dense(vf_old, rec: Plic, U, V, Ui, Vi, grid: Grid, dt, pin=None,
                  no_correction: bool = False, staggered: bool = False):
    """All-cells batch (the equivalence oracle for the sparse path)."""
    nx, ny = grid.nx, grid.ny
    dx, dy = grid.dx, grid.dy
    dtype = vf_old.dtype

    # ---- backtrack the (nx+1) x (ny+1) interior corner points -------------
    cx = jnp.asarray(grid.x[1:-1], dtype)
    cy = jnp.asarray(grid.y[1:-1], dtype)
    PX, PY = jnp.meshgrid(cx, cy, indexing="ij")
    if staggered:
        AX, AY = backtrack_rk4_staggered(PX, PY, U, V, grid, dt)
    else:
        AX, AY = backtrack_rk4(PX, PY, Ui, Vi, grid, dt, lattice=True)

    # per-cell corner positions in CELL-LOCAL coordinates (origin = cell's
    # lower-left corner) for precision
    X0 = PX[:-1, :-1]
    Y0 = PY[:-1, :-1]
    a00x, a00y = AX[:-1, :-1] - X0, AY[:-1, :-1] - Y0
    a10x, a10y = AX[1:, :-1] - X0, AY[1:, :-1] - Y0
    a11x, a11y = AX[1:, 1:] - X0, AY[1:, 1:] - Y0
    a01x, a01y = AX[:-1, 1:] - X0, AY[:-1, 1:] - Y0

    if no_correction:
        oct_x, oct_y, n8 = _build_quad(
            a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y, dtype)
    else:
        oct_x, oct_y, n8 = _build_octagon(
            a00x, a00y, a10x, a10y, a11x, a11y, a01x, a01y,
            U[1:-2, 1:-1], U[2:-1, 1:-1], V[1:-1, 1:-2], V[1:-1, 2:-1],
            dx, dy, dt, dtype,
        )

    oct_area = _poly_area(oct_x, oct_y, n8)
    cell_area = dx * dy
    volume_error = jnp.abs(cell_area - jnp.abs(oct_area))

    # ---- overlap accumulation over the 3x3 neighborhood --------------------
    vf_nb = jnp.stack([_shift(vf_old, di, dj) for di, dj in _NEIGHBOR_OFFSETS])
    mixed = jnp.stack([_shift(rec.valid, di, dj) for di, dj in _NEIGHBOR_OFFSETS])
    pnx = jnp.stack([_shift(rec.nx, di, dj) for di, dj in _NEIGHBOR_OFFSETS])
    pny = jnp.stack([_shift(rec.ny, di, dj) for di, dj in _NEIGHBOR_OFFSETS])
    pd = jnp.stack([_shift(rec.d, di, dj) for di, dj in _NEIGHBOR_OFFSETS])
    offs = jnp.asarray(_NEIGHBOR_OFFSETS, dtype)
    x_lo = (offs[:, 0] * dx)[:, None, None] * jnp.ones((1, nx, ny), dtype)
    y_lo = (offs[:, 1] * dy)[:, None, None] * jnp.ones((1, nx, ny), dtype)

    overlap = _overlap_from_neighbors(
        oct_x, oct_y, n8, vf_nb, mixed, pnx, pny, pd, x_lo, y_lo, dx, dy
    )
    vf_new = overlap / jnp.where(oct_area == 0.0, 1.0, oct_area)

    # ---- early exits (src/VOF.hpp:198-214) ---------------------------------
    all_gas, all_liq = _classify(vf_old, nx, ny, dtype)
    vf_new = jnp.where(all_gas, 0.0, jnp.where(all_liq, 1.0, vf_new))
    volume_error = jnp.where(all_gas | all_liq, 0.0, volume_error)

    if pin is not None:
        # pin BOTH sides of the (nx,ny)->(nx+2,ny+2) pad: the shard tile
        # changes across it, and unconstrained GSPMD replicates (one
        # full-field all-gather + DUS); constrained it permutes halos.
        grown = pin(jnp.pad(pin(vf_new), ((1, 1), (1, 1))))
        n, m = vf_old.shape
        ii = jax.lax.broadcasted_iota(jnp.int32, vf_old.shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, vf_old.shape, 1)
        inside = (ii > 0) & (ii < n - 1) & (jj > 0) & (jj < m - 1)
        vf_out = pin(jnp.where(inside, grown, vf_old))
    else:
        vf_out = set_interior(vf_old, vf_new)
    return vf_out, jnp.max(volume_error)


# tests force the Pallas overlap kernel on CPU: set to "interpret"
_PALLAS_OVERRIDE = None


def _overlap_sparse(slots_x, slots_y, gathered, dx, dy, dtype):
    """Overlap accumulation of the sparse path: the fused Pallas kernel
    (one launch, vof/pallas_advect.py) when available, else the XLA clip
    chain (~100 launches). Same math, same emission order; differences are
    float summation-order noise (see pallas_advect module doc)."""
    from fluidsolver_tpu.constants import vf_cutoffs
    from fluidsolver_tpu.vof import pallas_advect as pa

    n0 = len(slots_x)
    m = slots_x[0].shape[0]
    mode = _PALLAS_OVERRIDE
    if mode is None:
        from fluidsolver_tpu.flags import pallas_enabled

        if pallas_enabled("FS_PALLAS_VOF") and pa.available(m, dtype, n0):
            mode = "tpu"
    if mode in ("tpu", "interpret"):
        lo, _ = vf_cutoffs(dtype)
        return pa.overlap_pallas(
            jnp.stack(slots_x), jnp.stack(slots_y), gathered,
            dx=float(dx), dy=float(dy), lo=float(lo),
            interpret=(mode == "interpret"))

    oct_x, oct_y, n8 = _pad_slots(slots_x, slots_y, dtype)
    oct_area = _poly_area(oct_x, oct_y, n8)
    vf_nb = gathered[0]
    mixed = gathered[1] > 0.5
    pnx = gathered[2]
    pny = gathered[3]
    pd = gathered[4]
    offs = jnp.asarray(_NEIGHBOR_OFFSETS, dtype)
    x_lo = (offs[:, 0] * dx)[:, None] * jnp.ones((1, m), dtype)
    y_lo = (offs[:, 1] * dy)[:, None] * jnp.ones((1, m), dtype)
    overlap = _overlap_from_neighbors(
        oct_x, oct_y, n8, vf_nb, mixed, pnx, pny, pd, x_lo, y_lo, dx, dy
    )
    return overlap, oct_area


def _advect_sparse(vf_old, rec: Plic, U, V, Ui, Vi, grid: Grid, dt, m: int,
                   no_correction: bool = False, staggered: bool = False,
                   shard=None):
    """Active-cell path: gather the cells that need geometry into ``m``
    lanes, run the identical octagon/clip pipeline there, scatter back.

    Per-cell arithmetic is bit-identical to the dense path (same formulas on
    the same inputs, same 9-neighbor summation order); only the batching
    differs. Padding lanes read clamped garbage and are dropped on scatter;
    a lane-count overflow surfaces as an ``inf`` volume error.

    ``shard``: shard-local view (parallel/dist_vof.ShardView) — all arrays
    are halo-extended local x-slabs of the global fields; lanes are
    compacted from the shard's OWNED cell rows only, grid-coordinate
    lookups use global indices (local + row_off), and the backtrace
    samples with the global domain clamp. ``m`` is then the per-shard
    budget."""
    # local interior dims from the arrays (== grid dims single-device;
    # the extended slab dims under a shard view)
    nx, ny = vf_old.shape[0] - 2, vf_old.shape[1] - 2
    dx, dy = grid.dx, grid.dy
    dtype = vf_old.dtype

    all_gas, all_liq = _classify(vf_old, nx, ny, dtype)
    active = ~(all_gas | all_liq)
    if shard is not None:
        # each global cell is owned by exactly one shard; halo cells are
        # computed (and scattered) by their owner
        ig_rows = jnp.arange(nx, dtype=jnp.int32) + shard.row_off
        owned = (ig_rows >= shard.own_lo) & (ig_rows < shard.own_hi) \
            & (ig_rows >= 0) & (ig_rows < grid.nx)
        active = active & owned[:, None]
    n_active = jnp.sum(active)
    # fill index is far out of bounds so the final scatter (mode="drop")
    # discards those lanes; all GATHERS go through the clamped copies so the
    # eager (non-jit) public API works too (plic.clamp_lanes)
    from fluidsolver_tpu.vof.plic import compact_indices

    ii, jj = compact_indices(active, m, nx * ny)
    iig, jjg = clamp_lanes(ii, jj, nx, ny)

    # ---- per-active-cell corners, backtracked ------------------------------
    gx = jnp.asarray(grid.x[1:-1], dtype)  # corner coords, faces 0..nx
    gy = jnp.asarray(grid.y[1:-1], dtype)
    if shard is not None:
        ig = jnp.clip(iig + shard.row_off, 0, grid.nx - 1)
    else:
        ig = iig
    x_lo_c = gx[ig]
    x_hi_c = gx[ig + 1]
    y_lo_c = gy[jjg]
    y_hi_c = gy[jjg + 1]
    # 4 corners per lane: (m, 4) with order p00, p10, p11, p01
    px = jnp.stack([x_lo_c, x_hi_c, x_hi_c, x_lo_c], axis=-1)
    py = jnp.stack([y_lo_c, y_lo_c, y_hi_c, y_hi_c], axis=-1)
    if staggered:
        if shard is not None:
            raise NotImplementedError(
                "vof_staggered_backtrace is an A/B debug flag; the sharded "
                "sparse path supports the production cell-centered trace")
        AX, AY = backtrack_rk4_staggered(px, py, U, V, grid, dt)
    else:
        AX, AY = backtrack_rk4(px, py, Ui, Vi, grid, dt, shard=shard)
    # cell-local coordinates (origin = lower-left corner)
    ax = AX - x_lo_c[:, None]
    ay = AY - y_lo_c[:, None]

    if no_correction:
        slots_x, slots_y = _quad_slots(
            ax[:, 0], ay[:, 0], ax[:, 1], ay[:, 1],
            ax[:, 2], ay[:, 2], ax[:, 3], ay[:, 3])
    else:
        slots_x, slots_y = _octagon_slots(
            ax[:, 0], ay[:, 0], ax[:, 1], ay[:, 1], ax[:, 2], ay[:, 2], ax[:, 3], ay[:, 3],
            U[1 + iig, 1 + jjg], U[2 + iig, 1 + jjg], V[1 + iig, 1 + jjg], V[1 + iig, 2 + jjg],
            dx, dy, dt,
        )

    # ---- gathered 3x3 neighborhood: ONE gather for all 5 fields x 9
    # neighbors (45 separate gathers would be 45 XLA kernels; a gather is
    # never fused with its consumers)
    offs_i = jnp.asarray([di for di, _ in _NEIGHBOR_OFFSETS], jnp.int32)
    offs_j = jnp.asarray([dj for _, dj in _NEIGHBOR_OFFSETS], jnp.int32)
    II = 1 + offs_i[:, None] + iig[None, :]     # (9, m)
    JJ = 1 + offs_j[:, None] + jjg[None, :]
    stacked = jnp.stack([vf_old, rec.valid.astype(dtype),
                         rec.nx, rec.ny, rec.d])
    gathered = stacked[:, II, JJ]               # (5, 9, m)

    overlap, oct_area = _overlap_sparse(slots_x, slots_y, gathered,
                                        dx, dy, dtype)
    cell_area = dx * dy
    volume_error = jnp.abs(cell_area - jnp.abs(oct_area))
    vf_act = overlap / jnp.where(oct_area == 0.0, 1.0, oct_area)

    # ---- assemble: early exits dense, active lanes scattered ---------------
    vf_new = jnp.where(all_liq, 1.0, jnp.zeros((nx, ny), dtype))
    vf_new = vf_new.at[ii, jj].set(vf_act, mode="drop")
    vf_out = set_interior(vf_old, vf_new)
    if shard is not None:
        # non-owned cells (halo rows, pseudo-cells beyond the grid) keep
        # their input values — their owner shard computes them
        owned_full = jnp.pad(jnp.broadcast_to(owned[:, None], (nx, ny)),
                             ((1, 1), (1, 1)))
        vf_out = jnp.where(owned_full, vf_out, vf_old)

    lane_valid = jnp.arange(m) < n_active
    vol_err = jnp.max(jnp.where(lane_valid, volume_error, 0.0))
    vol_err = jnp.where(n_active > m, jnp.inf, vol_err)
    return vf_out, vol_err
