"""Distributed BoxMG-preconditioned CG over an x-slab device mesh.

The multi-chip pressure solve: the same BoxMG-PCG as the single-device
production path (poisson/boxmg.py + poisson/cg.py), executed as an explicit
``shard_map`` program over a 1D mesh along grid-x. The reference has no
distributed solver at all (SURVEY.md: HYPRE built without MPI); this module
is the TPU-side bar SURVEY S2/S5 set — domain decomposition with ICI
point-to-point halo exchange, not a translation of any MPI code.

Design (and why it matches the single-device solve iterate-for-iterate):

- **x-slab decomposition.** The (nx+2, ny+2) unknown box is padded with
  decoupled identity rows (aC=1, couplings 0, rhs 0) up to ``NX`` divisible
  by ``ndev * 2^L``; each device owns a contiguous slab of ``mx = NX/ndev``
  rows. Padding rows solve to exactly 0 and never couple back, so the
  padded solve equals the unpadded one on real rows.

- **Halo-extended reuse of the single-device setup.** Per distributed
  level, each device extends its local operator planes by 2 rows via
  ``lax.ppermute`` (zeros beyond the mesh edge — exactly the zero-padded
  shifts of the global code) and runs the UNCHANGED ``collapse_weights`` /
  ``galerkin_closed`` on the extended slab, cropping the interior. Because
  those are pure elementwise/strided-slice programs, the cropped result is
  bitwise the global computation's local rows; slab sizes are kept even so
  local index parity equals global parity (checkerboards and coarse
  alignment need no per-device offset).

- **Distributed smoothing/transfers on the fine levels; replicated tail.**
  Red-black sweeps re-exchange a 1-row halo per color; restriction /
  prolongation run on (even-width) extended slabs through the unchanged
  ``restrict_box`` / ``prolong_box``. Once the x-slab is 2-4 rows the level
  is ``all_gather``-ed, cropped to real rows, and the remaining hierarchy
  runs REPLICATED on every device through the stock ``build_hierarchy`` /
  ``v_cycle`` (coarse levels are tiny; redundant compute beats latency-bound
  collectives — the standard coarse-grid strategy for distributed MG).

- **PCG with psum reductions.** The outer CG is the same recurrence as
  ``cg.solve_pcg`` (stagnation guard, breakdown guard, nullspace
  projection) with every dot product ``lax.psum``-ed over the mesh; the
  projection masks padding rows so the singular (all-Neumann) case subtracts
  the mean over real cells only.

Replaces parallel/halo.make_distributed_jacobi_poisson as THE distributed
pressure path (the Jacobi skeleton remains as a teaching demo). Solve
contract matches src/LinearSolver_StructHypre.hpp:119-192 (rel-residual
tolerance, iteration count out).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from fluidsolver_tpu.poisson import boxmg, cg
from fluidsolver_tpu.poisson.boxmg import (
    COARSEST, DIRECT_CAP, DIRECT_COARSEST, MAX_LEVELS, Stencil9, _checkerboard,
    _safe, collapse_weights, galerkin_closed, prolong_box, restrict_box,
)
from fluidsolver_tpu.poisson.linsys import StencilOp

AXIS = "x"

_OP5 = ("aC", "aL", "aR", "aB", "aT")
_OP9 = _OP5 + ("aSW", "aSE", "aNW", "aNE")
_TR = ("pW", "pE", "pS", "pN", "pSW", "pSE", "pNW", "pNE")


# ---------------------------------------------------------------- planning

def _global_depth(nx2: int, ny2: int) -> int:
    """Level count build_hierarchy produces for a (nx2, ny2) box (shared
    stop predicate — see boxmg._stop_here)."""
    n, m, levels = nx2, ny2, 0
    while True:
        levels += 1
        done, _ = boxmg._stop_here((n, m), levels)
        if done:
            return levels
        n, m = (n + 1) // 2, (m + 1) // 2


@dataclasses.dataclass(frozen=True)
class Plan:
    ndev: int
    NX: int            # padded global rows at level 0
    nx2: int           # real rows at level 0
    ny2: int
    L_dist: int        # number of distributed levels (tail gathers below)
    n_real: tuple      # real row count per level, 0..L_dist inclusive
    ny: tuple          # column count per level, 0..L_dist inclusive

    @property
    def mx(self):
        return tuple(self.NX // (self.ndev * (1 << l))
                     for l in range(self.L_dist + 1))


def make_plan(nx2: int, ny2: int, ndev: int, max_dist: int = 4) -> Plan:
    if ndev < 2:
        raise ValueError("sharded solve needs >= 2 devices (use cg.solve_pcg)")
    if nx2 < 2 * ndev:
        raise ValueError(f"{nx2} rows over {ndev} devices: slabs too thin")
    depth = _global_depth(nx2, ny2)
    # distributed slabs must stay even (parity/coarse alignment) and >= 4;
    # the tail needs at least one level of its own
    l_by_size = 0
    while (nx2 >> (l_by_size + 1)) // ndev >= 4:
        l_by_size += 1
    L = max(1, min(depth - 1, max_dist, l_by_size))
    g = ndev * (1 << L)
    NX = -(-nx2 // g) * g
    n_real, ny = [nx2], [ny2]
    for _ in range(L):
        n_real.append((n_real[-1] + 1) // 2)
        ny.append((ny[-1] + 1) // 2)
    return Plan(ndev=ndev, NX=NX, nx2=nx2, ny2=ny2, L_dist=L,
                n_real=tuple(n_real), ny=tuple(ny))


# ----------------------------------------------------- local-view helpers

def _extend_x(f: jnp.ndarray, w: int) -> jnp.ndarray:
    """Local slab extended by w rows per side from mesh neighbors; devices at
    the mesh edge get ZEROS (jax.lax.ppermute semantics for absent sources),
    which reproduces the global code's zero-padded shifts exactly."""
    n = lax.axis_size(AXIS)
    from_left = lax.ppermute(f[-w:], AXIS, [(i, i + 1) for i in range(n - 1)])
    from_right = lax.ppermute(f[:w], AXIS, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, f, from_right], axis=0)


def _extend_op(op, w: int):
    names = _OP9 if isinstance(op, Stencil9) else _OP5
    return type(op)(**{k: _extend_x(getattr(op, k), w) for k in names})


def _extend_tr(tr, w: int):
    return type(tr)(**{k: _extend_x(getattr(tr, k), w) for k in _TR})


def _apply_local(op, x: jnp.ndarray) -> jnp.ndarray:
    """y = A x on the local slab, 1-row halo exchange for the x-shifts."""
    m = x.shape[0]
    xe = _extend_x(x, 1)

    def sh(di, dj):
        a = lax.slice_in_dim(xe, 1 + di, 1 + di + m, axis=0)
        if dj == -1:
            a = jnp.pad(a[:, :-1], ((0, 0), (1, 0)))
        elif dj == 1:
            a = jnp.pad(a[:, 1:], ((0, 0), (0, 1)))
        return a

    asw, ase, anw, ane = boxmg._corners(op)
    return (
        op.aC * x
        + op.aL * sh(-1, 0) + op.aR * sh(1, 0)
        + op.aB * sh(0, -1) + op.aT * sh(0, 1)
        + asw * sh(-1, -1) + ase * sh(1, -1)
        + anw * sh(-1, 1) + ane * sh(1, 1)
    )


def _sweep_local(op, red, x, b, reverse=False):
    """Red-black sweep == boxmg._rb_sweep with a halo refresh per color."""
    aC_safe = _safe(op.aC)
    first = 1.0 - red if reverse else red
    for mask in (first, 1.0 - first):
        ax_off = _apply_local(op, x) - op.aC * x
        x = jnp.where(mask > 0.5, (b - ax_off) / aC_safe, x)
    return x


def _dist_fused_ok(op_loc, n_pre: int, n_post: int) -> bool:
    """Gate for the fused Pallas smoother at a DISTRIBUTED level: the
    kernel runs per-shard inside the shard_map body (safe under the
    flags.shard_local_pallas context the dist bodies establish), on the
    halo-extended slab — both phase extents must pass the kernel's shape
    gate. Same math as the _sweep_local chain (pallas_shard docstring;
    bitwise-validated on an 8-device mesh, tests/test_pallas_shard.py)."""
    from fluidsolver_tpu.flags import pallas_enabled

    if not pallas_enabled("FS_PALLAS_VCYCLE"):
        return False
    from fluidsolver_tpu.parallel import pallas_shard as ps
    from fluidsolver_tpu.poisson import pallas_vcycle as pv

    shape = op_loc.aC.shape
    w_pre = ps.halo_width((True, False) * n_pre, True)
    w_post = ps.halo_width((False, True) * n_post, False)
    return all(pv.available((shape[0] + 2 * w, shape[1]), op_loc.aC.dtype)
               for w in (w_pre, w_post))


# ------------------------------------------------------------- the solver

def _pad_operator(op: StencilOp, b, x0, NX: int):
    """Pad with decoupled identity rows up to NX global rows."""
    pad = NX - b.shape[0]
    if pad == 0:
        return op, b, x0

    def padz(a):
        return jnp.pad(a, ((0, pad), (0, 0)))

    aC = jnp.pad(op.aC, ((0, pad), (0, 0)), constant_values=1.0)
    op = StencilOp(aC=aC, aL=padz(op.aL), aR=padz(op.aR),
                   aB=padz(op.aB), aT=padz(op.aT))
    return op, padz(b), padz(x0)


def _build_dist_levels(op_local, plan: Plan):
    """Distributed hierarchy: per level the local operator, the coarse-
    extended transfer, and the checkerboard; then the gathered+cropped tail
    run through the stock single-device build."""
    levels = []
    cur = op_local
    for l in range(plan.L_dist):
        fine_shape_ext = (cur.aC.shape[0] + 4, cur.aC.shape[1])
        op_ext = _extend_op(cur, 2)
        tr_ext = collapse_weights(op_ext)
        nxt_ext = galerkin_closed(op_ext, tr_ext, fine_shape_ext)
        levels.append(dict(
            op=cur, tr_ext=tr_ext,
            red=_checkerboard(cur.aC.shape, cur.aC.dtype),
        ))
        cur = Stencil9(**{k: getattr(nxt_ext, k)[1:-1] for k in _OP9})
    # replicated tail: gather the coarsest distributed product, crop padding
    gathered = Stencil9(**{
        k: lax.all_gather(getattr(cur, k), AXIS, axis=0,
                          tiled=True)[: plan.n_real[plan.L_dist]]
        for k in _OP9
    })
    tail = boxmg.build_hierarchy(gathered)
    return levels, tail


def _dist_v_cycle(levels, tail, plan: Plan, b_loc, n_pre: int, n_post: int):
    idx = lax.axis_index(AXIS)

    def cycle(lvl, b_l):
        if lvl == plan.L_dist:
            mx = plan.mx[lvl]
            b_glob = lax.all_gather(b_l, AXIS, axis=0, tiled=True)
            e = boxmg.v_cycle(tail, b_glob[: plan.n_real[lvl]],
                              n_pre=n_pre, n_post=n_post)
            e = jnp.pad(e, ((0, b_glob.shape[0] - e.shape[0]), (0, 0)))
            return lax.dynamic_slice_in_dim(e, idx * mx, mx, axis=0)
        L = levels[lvl]
        fused = _dist_fused_ok(L["op"], n_pre, n_post)
        if fused:
            # one pallas_call + one halo exchange per smoothing phase
            # instead of ~2 XLA launches + 1 exchange per color
            from fluidsolver_tpu.parallel import pallas_shard as ps

            x, r = ps.fused_smooth_local(
                L["op"], b_l, colors=(True, False) * n_pre, residual=True)
        else:
            x = jnp.zeros_like(b_l)
            for _ in range(n_pre):
                x = _sweep_local(L["op"], L["red"], x, b_l)
            r = b_l - _apply_local(L["op"], x)
        bc = restrict_box(L["tr_ext"], _extend_x(r, 2))[1:-1]
        ec = cycle(lvl + 1, bc)
        fine_ext = (b_l.shape[0] + 4, b_l.shape[1])
        x = x + prolong_box(L["tr_ext"], _extend_x(ec, 1), fine_ext)[2:-2]
        if fused:
            from fluidsolver_tpu.parallel import pallas_shard as ps

            x = ps.fused_smooth_local(
                L["op"], b_l, x0_loc=x, colors=(False, True) * n_post)
        else:
            for _ in range(n_post):
                x = _sweep_local(L["op"], L["red"], x, b_l, reverse=True)
        return x

    return cycle(0, b_loc)


def _solve_local(plan: Plan, max_iter, singular, n_pre, n_post,
                 aC, aL, aR, aB, aT, b, x0, use_x0, tol):
    """The shard_map body: full PCG on local slabs. Mirrors cg.solve_pcg
    (stagnation + breakdown guards) with psum-reduced dots. ``tol`` is a
    traced scalar so callers can schedule it per subiteration
    (cfg.pressure_tol_intermediate plumbing)."""
    from fluidsolver_tpu.flags import shard_local_pallas

    with shard_local_pallas():
        op = StencilOp(aC=aC, aL=aL, aR=aR, aB=aB, aT=aT)
        levels, tail = _build_dist_levels(op, plan)
        return _pcg_local(plan, max_iter, singular, n_pre, n_post,
                          op, levels, tail, b, x0, use_x0, tol)


def _solve_local_pre(plan: Plan, max_iter, singular, n_pre, n_post,
                     aC, aL, aR, aB, aT, b, x0, use_x0, tol, levels, tail):
    """shard_map body consuming a PREBUILT hierarchy (see
    build_hierarchy_sharded) — the mesh analog of cg.solve_pcg(levels=...):
    pressure_precond_refresh="step" builds once per step and reuses the
    hierarchy across the 5 subiteration solves instead of rebuilding it
    inside every solve (the round-4 dist path's 5x setup overhead)."""
    from fluidsolver_tpu.flags import shard_local_pallas

    op = StencilOp(aC=aC, aL=aL, aR=aR, aB=aB, aT=aT)
    with shard_local_pallas():
        return _pcg_local(plan, max_iter, singular, n_pre, n_post,
                          op, levels, tail, b, x0, use_x0, tol)


def _pcg_local(plan: Plan, max_iter, singular, n_pre, n_post,
               op, levels, tail, b, x0, use_x0, tol):
    idx = lax.axis_index(AXIS)
    mx0 = plan.mx[0]
    gi = idx * mx0 + lax.broadcasted_iota(jnp.int32, b.shape, 0)
    maskf = (gi < plan.nx2).astype(b.dtype)
    n_cells = plan.nx2 * plan.ny2

    def pdot(u, v):
        return lax.psum(jnp.sum(u * v), AXIS)

    def project(v):
        if singular:
            return (v - lax.psum(jnp.sum(v * maskf), AXIS) / n_cells) * maskf
        return v * maskf  # padding rows are decoupled; keep them at 0

    def M_inv(r):
        z = _dist_v_cycle(levels, tail, plan, r, n_pre, n_post)
        return jnp.nan_to_num(z, nan=0.0, posinf=0.0, neginf=0.0)

    b = project(b)
    b_norm = jnp.sqrt(pdot(b, b))
    safe_b_norm = jnp.where(b_norm > 0.0, b_norm, 1.0)

    x0 = project(x0)
    r_ws = b - _apply_local(op, x0)
    good = use_x0 & (pdot(r_ws, r_ws) < pdot(b, b))
    x0 = jnp.where(good, x0, jnp.zeros_like(b))
    r0 = jnp.where(good, r_ws, b)
    z0 = project(M_inv(r0))
    p0 = z0
    rz0 = pdot(r0, z0)
    rel0 = jnp.sqrt(pdot(r0, r0)) / safe_b_norm

    STAG_WINDOW = 25 if jnp.finfo(b.dtype).bits <= 32 else 100

    def cond(carry):
        _, _, _, _, _, k, rel, best, since = carry
        return ((k < max_iter) & (rel > tol) & (b_norm > 0.0)
                & (since < STAG_WINDOW))

    def body(carry):
        x0_, r0_, z0_, p0_, rz, k, rel0_, best, since, x_best = carry
        Ap = _apply_local(op, p0_)
        pAp = pdot(p0_, Ap)
        alpha = rz / jnp.where(pAp != 0.0, pAp, 1.0)
        x = x0_ + alpha * p0_
        r = r0_ - alpha * Ap
        z = project(M_inv(r))
        rz_new = pdot(r, z)
        beta = rz_new / jnp.where(rz != 0.0, rz, 1.0)
        p = z + beta * p0_
        rel = jnp.sqrt(pdot(r, r)) / safe_b_norm
        ok = (pAp > 0.0) & jnp.isfinite(rel) & jnp.isfinite(rz_new)
        x = jnp.where(ok, x, x0_)
        r = jnp.where(ok, r, r0_)
        z = jnp.where(ok, z, z0_)
        p = jnp.where(ok, p, p0_)
        rz_new = jnp.where(ok, rz_new, rz)
        rel = jnp.where(ok, rel, rel0_)
        improved = ok & (rel < best * 0.9999)
        best = jnp.minimum(best, rel)
        since = jnp.where(improved, 0, jnp.where(ok, since + 1, STAG_WINDOW))
        # best-iterate return, mirroring cg.solve_pcg (see its comment)
        x_best = jnp.where(rel <= best, x, x_best)
        return (x, r, z, p, rz_new, k + 1, rel, best, since, x_best)

    _, _, _, _, _, iters, _, best, _, x_best = lax.while_loop(
        lambda c: cond(c[:9]), body,
        (x0, r0, z0, p0, rz0, 0, rel0, rel0, 0, x0),
    )
    x, rel = x_best, best
    return project(x) if singular else x, rel, iters


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     check_vma=False)


def _pin_pad_operator(mesh, op: StencilOp, b, x0, plan: Plan):
    """The shared global-view entry plumbing: pin P(AXIS) shardings on both
    sides of the NX row pad (see solve_pcg_sharded's comment) and pad the
    operator/vectors with decoupled identity rows."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    spec = NamedSharding(mesh, P(AXIS, None))

    def pin(a):
        # only under a trace: eager with_sharding_constraint device_puts,
        # which rejects row counts not divisible by the mesh (the GSPMD
        # compiler pads implicitly; the runtime cannot)
        if isinstance(a, jax.core.Tracer):
            return jax.lax.with_sharding_constraint(a, spec)
        return a

    def pin_op(o):
        return StencilOp(aC=pin(o.aC), aL=pin(o.aL), aR=pin(o.aR),
                         aB=pin(o.aB), aT=pin(o.aT))

    op, b, x0 = _pad_operator(pin_op(op), pin(b), pin(x0), plan.NX)
    return pin_op(op), pin(b), pin(x0), pin


def build_hierarchy_sharded(mesh, op: StencilOp, *, axis: str = AXIS):
    """Build the distributed BoxMG hierarchy ONCE from a global-view
    operator; the result feeds ``solve_pcg_sharded(levels=...)`` so repeated
    solves (5 subiterations/step) reuse it instead of rebuilding per call —
    the mesh analog of cg.build_precond_levels + pressure_precond_refresh
    ="step" (single-device: solvers/twophase.py do_subiters; reference
    setup-cost analog: src/LinearSolver_StructHypre.hpp:217-237).

    Returns an opaque (levels, tail) pair of global-view pytrees: the
    distributed per-level operands live sharded along ``axis`` (their
    global view is the slab concatenation), the replicated tail as plain
    replicated arrays."""
    from jax.sharding import PartitionSpec as P

    if axis != AXIS:
        raise ValueError(f"mesh axis must be named {AXIS!r}")
    ndev = mesh.shape[AXIS]
    plan = make_plan(op.aC.shape[0], op.aC.shape[1], ndev)
    op, _, _, _ = _pin_pad_operator(mesh, op, op.aC, op.aC, plan)

    def build(aC, aL, aR, aB, aT):
        from fluidsolver_tpu.flags import shard_local_pallas

        with shard_local_pallas():
            return _build_dist_levels(
                StencilOp(aC=aC, aL=aL, aR=aR, aB=aB, aT=aT), plan)

    fn = jax.jit(_shard_map(
        build, mesh,
        in_specs=(P(AXIS),) * 5,
        out_specs=(P(AXIS), P()),
    ))
    return fn(op.aC, op.aL, op.aR, op.aB, op.aT)


def solve_pcg_sharded(mesh, op: StencilOp, b, *, tol, max_iter, singular,
                      n_pre: int = 1, n_post: int = 1, x0=None,
                      axis: str = AXIS, levels=None):
    """Global-view entry: shard, solve, return (x, rel_residual, iters).

    ``mesh``: a 1D jax.sharding.Mesh whose axis ``axis`` decomposes grid-x.
    Arrays come in (and go out) as global-view (nx+2, ny+2) boxes; the
    BoxMG hierarchy is rebuilt per call (it must track the operator) unless
    a prebuilt ``levels`` pair from build_hierarchy_sharded is given."""
    from jax.sharding import PartitionSpec as P

    if axis != AXIS:
        raise ValueError(f"mesh axis must be named {AXIS!r}")
    ndev = mesh.shape[AXIS]
    plan = make_plan(b.shape[0], b.shape[1], ndev)
    use_x0 = x0 is not None
    if x0 is None:
        x0 = jnp.zeros_like(b)

    # Pin P(AXIS) on BOTH sides of the row pad (nx2 -> NX changes the GSPMD
    # tile, e.g. 9 -> 10 rows/device). Constrained pads lower to neighbor
    # collective-permutes; unconstrained, GSPMD replicates every shard_map
    # operand through a FULL-FIELD all-gather (7 per solve — the flagged
    # rows in tools/collective_census.py before this fix).
    op, b, x0, pin = _pin_pad_operator(mesh, op, b, x0.astype(b.dtype), plan)

    # jit is mandatory: an eager shard_map dispatches every primitive of the
    # hierarchy build as its own tiny 8-way sharded op (minutes of per-op
    # compile + rendezvous; measured as an apparent hang on CPU meshes)
    scalars = (jnp.asarray(use_x0), jnp.asarray(tol, b.dtype))
    if levels is None:
        fn = jax.jit(_shard_map(
            partial(_solve_local, plan, int(max_iter), bool(singular),
                    int(n_pre), int(n_post)),
            mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS), P(AXIS), P(), P()),
            out_specs=(P(AXIS), P(), P()),
        ))
        x, rel, iters = fn(op.aC, op.aL, op.aR, op.aB, op.aT, b, x0,
                           *scalars)
    else:
        lv, tail = levels
        fn = jax.jit(_shard_map(
            partial(_solve_local_pre, plan, int(max_iter), bool(singular),
                    int(n_pre), int(n_post)),
            mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS), P(AXIS), P(), P(), P(AXIS), P()),
            out_specs=(P(AXIS), P(), P()),
        ))
        x, rel, iters = fn(op.aC, op.aL, op.aR, op.aB, op.aT, b, x0,
                           *scalars, lv, tail)
    # NX -> nx2 crop: constrained, this is one half-field subgroup gather
    # (GSPMD can't prove the shrink is local); unconstrained it replicates.
    return pin(pin(x)[: plan.nx2]), rel, iters
