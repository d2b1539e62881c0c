"""Pallas TPU kernel for the batched APGD contact solve.

Motivation (measured): the XLA-level APGD loop is ~half of physics time at
4096 envs, and almost all of it is op-dispatch latency — each of the
16 iterations issues ~10 small HBM-bound ops. This kernel runs the entire
iteration loop on-chip: one grid step processes a tile of 128 environments
laid out env-on-lanes ((row, env) = (sublane, lane) — the native VPU shape),
so 16 iterations become straight-line vector code over VMEM-resident tiles
with zero dispatch overhead.

Layout contract (marshalled by `apgd_solve_pallas`):
  A:    (T, R, R, 128)  Delassus, rows padded 60 -> R=64
  r:    (T, R, 128)     gradient offset (u0 - target), sign-folded
  step: (T, 1, 128)     1/L per env
  mu:   (T, 1, 128)     friction coefficient per env
  -> lam (T, R, 128)

Sign folding: joint-limit rows are pre-multiplied by their direction sign
outside the kernel (A' = s s^T ∘ A, r' = s ∘ r), so in-kernel projection is
uniformly: 16 friction cones + nonnegativity on the limit rows; padding rows
project to 0 via a row mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_POINTS = 16  # contact blocks (8 sole points x 2 feet)
ROWS = 64  # padded row count (60 real rows)
ENV_TILE = 128

# Ambient mesh for pallas solver dispatch (set by the runner on multi-device
# meshes; consulted at trace time). A bare pallas_call has no GSPMD rule, so
# sharded batches must go through shard_map over this mesh.
_SOLVER_MESH = None


def set_solver_mesh(mesh, force: bool = False) -> None:
    """Install the ambient mesh for pallas solver dispatch. Size-1 meshes
    are ignored by default (plain vmap dispatch is equivalent and cheaper
    to trace); `force=True` installs them anyway so a single chip can run
    the IDENTICAL shard_map-dispatched program a pod runs (bench.py
    HGT_BENCH_MESH; round-5 VERDICT #3)."""
    global _SOLVER_MESH
    if mesh is not None and (mesh.size > 1 or force):
        _SOLVER_MESH = mesh
    else:
        _SOLVER_MESH = None


def get_solver_mesh():
    return _SOLVER_MESH


def _apgd_kernel(
    A_ref, r_ref, step_ref, mu_ref, lam0_ref, nlim_ref, iters_ref, lam_ref
):
    A = A_ref[0]  # (R, R, 128)
    r = r_ref[0]  # (R, 128)
    step = step_ref[0]  # (1, 128)
    mu = mu_ref[0]  # (1, 128)
    lam0 = lam0_ref[0]  # (R, 128) warm start, sign-folded

    nc3 = 3 * N_POINTS
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ENV_TILE), 0)
    nlim = nlim_ref[0]
    valid = (row_ids < (nc3 + nlim)).astype(A.dtype)

    def project(x):
        # friction-cone projection on the 16 interleaved (tx, ty, n) blocks
        blocks = x[:nc3].reshape(N_POINTS, 3, ENV_TILE)
        tx = blocks[:, 0]
        ty = blocks[:, 1]
        n = blocks[:, 2]
        nt = jnp.sqrt(tx * tx + ty * ty + 1e-24)
        inside = nt <= mu * n
        polar = mu * nt <= -n
        n_p = jnp.maximum((mu * nt + n) / (1.0 + mu * mu), 0.0)
        scale = mu * n_p / nt
        keep = inside.astype(x.dtype)
        mid = (1.0 - keep) * (1.0 - polar.astype(x.dtype))
        tx_n = keep * tx + mid * tx * scale
        ty_n = keep * ty + mid * ty * scale
        n_n = keep * n + mid * n_p
        cone = jnp.stack([tx_n, ty_n, n_n], axis=1).reshape(nc3, ENV_TILE)
        rest = jnp.maximum(x[nc3:], 0.0)
        # padding + inactive rows zeroed by the validity mask
        return jnp.concatenate([cone, rest], axis=0) * valid

    def body(_, carry):
        lam, y, theta = carry
        g = jnp.sum(A * y[None, :, :], axis=1) + r  # (R, 128) matvec
        lam_new = project(y - step * g)
        d = lam_new - lam
        restart = jnp.sum(g * d, axis=0, keepdims=True) > 0.0  # (1, 128)
        theta = jnp.where(restart, 1.0, theta)
        theta_new = 0.5 * (theta * jnp.sqrt(theta * theta + 4.0) - theta * theta)
        beta = theta * (1.0 - theta) / (theta * theta + theta_new)
        beta = jnp.where(restart, 0.0, beta)
        y_new = lam_new + beta * d
        return lam_new, y_new, theta_new

    init = project(lam0)  # projected warm start (feasible before first step)
    ones = jnp.ones((1, ENV_TILE), A.dtype)
    lam, _, _ = jax.lax.fori_loop(0, iters_ref[0], body, (init, init, ones))
    lam_ref[0] = lam


@functools.partial(jax.jit, static_argnames=("iterations", "interpret"))
def apgd_solve_pallas(
    A: jnp.ndarray,  # (N, nrow, nrow)
    u0: jnp.ndarray,  # (N, nrow)
    lo_bound: jnp.ndarray,  # (N, n_points)
    limit_sign: jnp.ndarray,  # (N, nlim)
    limit_bound: jnp.ndarray,  # (N, nlim)
    mu: jnp.ndarray,  # (N,)
    step_bound: jnp.ndarray | None = None,  # (N,) Lipschitz bound
    lam0: jnp.ndarray | None = None,  # (N, nrow) warm start (physical signs)
    iterations: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched front-end: marshal to env-lane-major tiles, run the kernel,
    unmarshal. Returns lam (N, nrow)."""
    N, nrow, _ = A.shape
    nc3 = 3 * N_POINTS
    nlim = nrow - nc3
    if lam0 is None:
        lam0 = jnp.zeros((N, nrow), A.dtype)

    # sign folding for limit rows
    s = jnp.concatenate(
        [jnp.ones((N, nc3), A.dtype), limit_sign.astype(A.dtype)], axis=1
    )
    A_f = A * s[:, :, None] * s[:, None, :]
    target = jnp.zeros((N, nrow), A.dtype)
    target = target.at[:, jnp.arange(N_POINTS) * 3 + 2].set(lo_bound)
    target = target.at[:, nc3:].set(limit_bound)  # already sign-local bound
    r = s * u0 - target

    if step_bound is None:
        step_bound = jnp.max(jnp.sum(jnp.abs(A_f), axis=-1), axis=-1)
    L = jnp.maximum(step_bound, 1e-6)
    step = (1.0 / L).astype(A.dtype)

    # pad rows to ROWS, envs to a multiple of ENV_TILE
    n_pad = (-N) % ENV_TILE
    Np = N + n_pad
    T = Np // ENV_TILE

    def pad_envs(x, extra_row_pad):
        x = jnp.pad(x, ((0, n_pad),) + extra_row_pad)
        return x

    A_p = pad_envs(A_f, ((0, ROWS - nrow), (0, ROWS - nrow)))
    r_p = pad_envs(r, ((0, ROWS - nrow),))
    step_p = pad_envs(step[:, None], ((0, 0),))
    mu_p = pad_envs(mu.astype(A.dtype)[:, None], ((0, 0),))
    lam0_p = pad_envs((s * lam0).astype(A.dtype), ((0, ROWS - nrow),))

    # (Np, R, R) -> (T, R, R, 128) env-lane-major
    def to_tiles(x):
        # x: (Np, ...) -> (T, 128, ...) -> move env to last axis
        x = x.reshape((T, ENV_TILE) + x.shape[1:])
        return jnp.moveaxis(x, 1, -1)

    A_t = to_tiles(A_p)
    r_t = to_tiles(r_p)
    step_t = to_tiles(step_p)
    mu_t = to_tiles(mu_p)

    lam_t = pl.pallas_call(
        _apgd_kernel,
        out_shape=jax.ShapeDtypeStruct((T, ROWS, ENV_TILE), A.dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, ROWS, ROWS, ENV_TILE),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ROWS, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ROWS, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        A_t,
        r_t,
        step_t,
        mu_t,
        to_tiles(lam0_p),
        jnp.asarray([nlim], jnp.int32),
        jnp.asarray([iterations], jnp.int32),
    )

    # unmarshal: (T, R, 128) -> (Np, R) -> (N, nrow), unfold signs
    lam = jnp.moveaxis(lam_t, -1, 1).reshape(Np, ROWS)[:N, :nrow]
    return lam * s


def make_apgd_batched(iterations: int, interpret: bool = False):
    """Solver with a custom vmap rule: the single-env call falls back to the
    XLA APGD loop, but under jax.vmap the whole batch dispatches to the
    Pallas kernel — so the (vmapped single-env) physics code needs no
    batching-aware restructuring."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def solve(A, u0, lo, sign, lb, mu, step_bound, lam0):
        from .contact import apgd_solve

        return apgd_solve(
            A, u0, N_POINTS, lo, sign, lb, mu, iterations,
            step_bound=step_bound, lam0=lam0,
        )

    @solve.def_vmap
    def _vmap_rule(
        axis_size, in_batched, A, u0, lo, sign, lb, mu, step_bound, lam0
    ):
        args = [A, u0, lo, sign, lb, mu, step_bound, lam0]
        args = [
            x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))
            for x, b in zip(args, in_batched)
        ]
        lam = apgd_solve_pallas(
            *args, iterations=iterations, interpret=interpret
        )
        return lam, True

    return solve


# --------------------------------------------------------------------------- #
# Fused dynamics+contact kernel: cholesky(Mtilde) -> v_free -> B = L^-1 J^T
# -> A = B^T B -> APGD -> qvel_new, all on-chip per 128-env tile.
# --------------------------------------------------------------------------- #

NV = 18  # generalized velocities
NVP = 24  # padded to sublane multiple


def _fused_core(
    A0, Jt, qvel, rhs, target, sign, mu, valid, iterations, compliance=None,
    lam0=None,
):
    """The on-chip dynamics+contact solve shared by the fused and mega
    kernels: cholesky(Mtilde) -> v_free -> B = L^-1 J^T -> A = B^T B ->
    APGD -> qvel_new. All operands are env-lane-major VMEM values:

      A0     (NVP, NVP, 128) Mtilde (padded rows/cols carry identity diag)
      Jt     (NVP, ROWS, 128) J^T (cols padded; NOT sign-folded)
      qvel   (NVP, 128)
      rhs    (NVP, 128) dt*(tau - h)
      target (ROWS, 128) desired constraint velocities
      sign   (ROWS, 128) +-1 on limit rows, 1 elsewhere
      mu     (1, 128)
      valid  (ROWS, 128) 1.0 on live constraint rows
      iterations: int or traced scalar (fori_loop bound)
      compliance: optional (128,) CFM scale — adds
        compliance*mean(diag(A))*I on live rows (soft-contact DR)
      lam0: optional (ROWS, 128) warm-start impulses in PHYSICAL signs
        (the previous substep's lam; projected before the first step)

    Returns (qvel_new (NVP, 128), lam (ROWS, 128) unfolded to physical
    impulse signs).
    """
    f32 = A0.dtype
    vrow = jax.lax.broadcasted_iota(jnp.int32, (NVP, ENV_TILE), 0)
    # static one-hot row masks (Mosaic has no scatter lowering — all row
    # writes are expressed as mask arithmetic)
    below = [jnp.where(vrow > k, 1.0, 0.0) for k in range(NV)]
    above = [jnp.where(vrow < k, 1.0, 0.0) for k in range(NV)]
    onehot = [
        jnp.where(vrow == k, 1.0, 0.0) for k in range(NV)
    ]  # (NVP, 128) each

    # ---- cholesky of Mtilde, unrolled ----
    A = A0
    L = jnp.zeros((NVP, NVP, ENV_TILE), f32)
    for k in range(NV):
        d = jnp.sqrt(jnp.maximum(A[k][k], 1e-12))  # (128,)
        col = below[k] * (A[:, k, :] / d[None, :])
        col_k = col + onehot[k] * d[None, :]
        L = L + col_k[:, None, :] * onehot[k][None, :, :]
        A = A - col[:, None, :] * col[None, :, :]

    def solve_lower_vec(b):  # L x = b, b (NVP, 128)
        x = b
        for k in range(NV):
            xk = x[k] / L[k][k]  # (128,)
            x = x * (1.0 - onehot[k]) + onehot[k] * xk[None, :]
            x = x - below[k] * (L[:, k, :] * xk[None, :])
        return x

    def solve_lower_mat(Bm):  # L X = Bm, Bm (NVP, ROWS, 128)
        X = Bm
        for k in range(NV):
            xk = X[k] / L[k][k][None, :]  # (ROWS, 128)
            oh = onehot[k][:, None, :]
            X = X * (1.0 - oh) + oh * xk[None, :, :]
            X = X - below[k][:, None, :] * (
                L[:, k, :][:, None, :] * xk[None, :, :]
            )
        return X

    def solve_upper(b):  # L^T x = b, b (NVP, 128)
        x = b
        for k in reversed(range(NV)):
            xk = x[k] / L[k][k]
            x = x * (1.0 - onehot[k]) + onehot[k] * xk[None, :]
            # x[i] -= L[k, i] * xk for i < k  (column k of L^T is row k of L)
            x = x - above[k] * (L[k] * xk[None, :])
        return x

    # ---- v_free = qvel + Mtilde^-1 rhs ----
    v_free = qvel + solve_upper(solve_lower_vec(rhs))

    # ---- B = L^-1 J^T (sign-folded), u0 = J v_free ----
    B = solve_lower_mat(Jt)  # (NVP, ROWS, 128)
    B = B * sign[None, :, :]
    u0 = jnp.sum(Jt * v_free[:, None, :], axis=0) * sign  # (ROWS, 128)
    r = u0 - target

    # ---- A = B^T B ----
    # (NB: int index combined with None in one bracket lowers to an
    # unsupported >2D gather in Mosaic — index first, then expand)
    Ac = jnp.zeros((ROWS, ROWS, ENV_TILE), f32)
    for k in range(NV):
        Bk = B[k]
        Ac = Ac + Bk[:, None, :] * Bk[None, :, :]

    if compliance is not None:
        # CFM regularizer: Ac + compliance*mean(diag)*I on live rows
        diag_sum = Ac[0][0] * valid[0]
        for k in range(1, ROWS):
            diag_sum = diag_sum + Ac[k][k] * valid[k]
        nlive = jnp.maximum(jnp.sum(valid, axis=0), 1.0)  # (128,)
        reg = compliance * diag_sum / nlive
        rr_ = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS, ENV_TILE), 0)
        cc_ = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS, ENV_TILE), 1)
        eye3 = jnp.where(rr_ == cc_, 1.0, 0.0) * valid[:, None, :]
        Ac = Ac + eye3 * reg[None, None, :]

    # ---- APGD step bound: ||G||_inf on the small Gram G = B B^T (same
    # spectrum as Ac, tighter than ||Ac||_inf; shared with every APGD path
    # so the solver-equivalence contract holds). keepdims: see
    # _fused_core_opt on the Mosaic sublane-relayout rule. ----
    absG_rowsum = None
    for v in range(NV):
        Gv = jnp.sum(B * B[v][None, :, :], axis=1, keepdims=True)
        s_ = jnp.sum(jnp.abs(Gv), axis=0)  # (1, 128)
        absG_rowsum = s_ if absG_rowsum is None else jnp.maximum(absG_rowsum, s_)
    if compliance is not None:
        absG_rowsum = absG_rowsum + reg[None, :]
    L_apgd = jnp.maximum(absG_rowsum[0], 1e-6)
    step = 1.0 / L_apgd  # (128,)

    nc3 = 3 * N_POINTS

    def project(x):
        blocks = x[:nc3].reshape(N_POINTS, 3, ENV_TILE)
        tx, ty, n = blocks[:, 0], blocks[:, 1], blocks[:, 2]
        nt = jnp.sqrt(tx * tx + ty * ty + 1e-24)
        inside = nt <= mu * n
        polar = mu * nt <= -n
        n_p = jnp.maximum((mu * nt + n) / (1.0 + mu * mu), 0.0)
        scale = mu * n_p / nt
        keep = inside.astype(f32)
        mid = (1.0 - keep) * (1.0 - polar.astype(f32))
        cone = jnp.stack(
            [keep * tx + mid * tx * scale, keep * ty + mid * ty * scale,
             keep * n + mid * n_p], axis=1
        ).reshape(nc3, ENV_TILE)
        rest = jnp.maximum(x[nc3:], 0.0)
        return jnp.concatenate([cone, rest], axis=0) * valid

    def body(_, carry):
        lam, y, theta = carry
        g = jnp.sum(Ac * y[None, :, :], axis=1) + r
        lam_new = project(y - step[None, :] * g)
        d = lam_new - lam
        restart = jnp.sum(g * d, axis=0, keepdims=True) > 0.0
        theta = jnp.where(restart, 1.0, theta)
        theta_new = 0.5 * (theta * jnp.sqrt(theta * theta + 4.0) - theta * theta)
        beta = theta * (1.0 - theta) / (theta * theta + theta_new)
        beta = jnp.where(restart, 0.0, beta)
        return lam_new, lam_new + beta * d, theta_new

    if lam0 is None:
        init = jnp.zeros((ROWS, ENV_TILE), f32)
    else:
        init = project(lam0 * sign)  # fold to solver signs, then project
    ones = jnp.ones((1, ENV_TILE), f32)
    lam, _, _ = jax.lax.fori_loop(0, iterations, body, (init, init, ones))

    # ---- qvel_new = v_free + L^-T (B lam) ----
    y1 = jnp.sum(B * lam[None, :, :], axis=1)  # (NVP, 128)
    dv = solve_upper(y1)
    return v_free + dv, lam * sign  # lam unfolded to physical impulses


def _fused_core_opt(
    L_ref, Mt, Jt, qvel, rhs, target, sign, mu, valid, iterations,
    compliance=None, lam0=None, leg_blocks=False,
):
    """Optimized mega-kernel solve stage — same math as `_fused_core`, same
    operand layouts, restructured for ~3x fewer VPU ops:

    - Cholesky runs IN PLACE in the `L_ref` VMEM scratch with statically
      sliced shrinking-block updates (the one-hot full-array rewrites in
      `_fused_core` touch all NVP x NVP rows 4x per column).
    - The triangular solve L^-1 J^T keeps its NV row-blocks as SSA values
      and only updates rows k+1..NV-1 at step k (static Python slices).
    - APGD runs in FACTOR FORM: the (ROWS, ROWS, 128) Delassus matrix
      A = B^T B is never built (the single largest cost of `_fused_core`,
      and 2 MB of live values per tile); matvecs are B^T (B y), and the
      step bound comes from the inf-norm of the small (NV, NV) Gram matrix
      G = B B^T — a guaranteed upper bound on lambda_max (same spectrum as
      A) that is typically TIGHTER than the inf-norm of the 64x64 A, so
      convergence at fixed iteration count is as good or better.

    L_ref must be a (NVP, NVP) + lane-shape f32 VMEM ref (scratch). After
    the call it holds the Cholesky factor in its lower triangle (upper
    triangle carries downdate residue — never read). Returns
    (qvel_new, lam) exactly like `_fused_core`.

    Lane shape: every operand carries the env axis as its trailing
    dimensions — (128,) for the classic lane-major tile, or (S, 128) for
    sublane-env tiles (mega_kernel HGT_MEGA_SUB) where each per-env scalar
    op fills S of the 8 VPU sublanes. The code below is rank-agnostic:
    `ls = Mt.shape[2:]`.

    leg_blocks (round 4): static two-chain block structure. When True the
    caller supplies M/J/qvel/rhs in the SOLVER-INTERNAL DOF order
    [leg-L joints 0:6, leg-R joints 6:12, base 12:18] (qvel_new comes back
    in the same order; the constraint-row space is unchanged). Cross-leg
    mass-matrix blocks are structurally zero (mega-kernel CRBA never
    writes them), and with the base ordered LAST the Cholesky factor has
    NO cross-leg fill-in — L[R-rows, L-cols] == 0 exactly. That sparsity
    is exploited statically everywhere: the factor build and triangular
    solves skip cross-leg terms, the B = L^-1 J^T rows of each leg stay
    supported on that leg's 32-column window (own foot's 24 contact rows
    + its 6 limit rows), the APGD matvec runs two half-width leg blocks
    plus the dense 6-row base block, and the cross-leg Gram entries of
    the step bound are skipped as exact zeros. Same math, same step
    bound value, ~30% fewer VPU issue slots in the solve stage.
    """
    f32 = Mt.dtype
    ls = tuple(Mt.shape[2:])  # (128,) or (S, 128)
    nc3 = 3 * N_POINTS
    half = NV // 3  # 6: joints per leg (and base DOF count)

    if leg_blocks:
        def lz(i, k):  # L[i, k] structurally zero (below-diagonal, i > k)
            return k < half and half <= i < 2 * half
    else:
        def lz(i, k):
            return False

    # ---- in-place right-looking Cholesky in the scratch ref ----
    # Block-structured: only the structurally-nonzero below-diagonal
    # segments of each pivot column are formed, and trailing updates touch
    # only lower blocks (upper-triangle entries are residue, never read).
    L_ref[...] = Mt
    for k in range(NV):
        d = jnp.sqrt(jnp.maximum(L_ref[k, k], 1e-12))  # ls
        L_ref[k, k] = d
        if leg_blocks and k < half:
            segs = [(k + 1, half), (2 * half, NV)]
        elif leg_blocks and k < 2 * half:
            segs = [(k + 1, 2 * half), (2 * half, NV)]
        else:
            segs = [(k + 1, NV)]
        segs = [(a, b) for a, b in segs if a < b]
        cols = []
        for a, b in segs:
            c = L_ref[a:b, k] / d[None]
            L_ref[a:b, k] = c
            cols.append((a, b, c))
        for aj, bj, cj in cols:  # update-column segment
            for ai, bi, ci in cols:  # update-row segment
                if ai < aj:
                    continue  # strictly-above block: residue, skip
                L_ref[ai:bi, aj:bj] = (
                    L_ref[ai:bi, aj:bj] - ci[:, None] * cj[None]
                )
    Lv = L_ref[...]  # (NVP, NVP) + ls; lower triangle + diag valid
    Ldiag = [Lv[k, k] for k in range(NV)]  # ls each
    Lcol = [[Lv[i, k] for k in range(NV)] for i in range(NV)]  # ls each

    # Triangular solves in scalar-SSA form: rows are NV separate ls-shaped
    # values and step k updates only rows below (above) the pivot — the
    # masked whole-vector rewrites this replaces touched all NVP rows 3x
    # per step (~4x the VPU issue slots; round-4 vreg census). Same
    # per-element arithmetic and order, so values are unchanged.
    def solve_lower_rows(rows_in):  # L x = b, list of NV ls values
        x = list(rows_in)
        for k in range(NV):
            xk = x[k] / Ldiag[k]
            x[k] = xk
            for i in range(k + 1, NV):
                if not lz(i, k):
                    x[i] = x[i] - Lcol[i][k] * xk
        return x

    def solve_upper_rows(rows_in):  # L^T x = b
        x = list(rows_in)
        for k in reversed(range(NV)):
            xk = x[k] / Ldiag[k]
            x[k] = xk
            for i in range(k):
                if not lz(k, i):
                    x[i] = x[i] - Lcol[k][i] * xk
        return x

    # ---- v_free = qvel + Mtilde^-1 rhs ----
    vf_rows = solve_upper_rows(solve_lower_rows([rhs[k] for k in range(NV)]))
    # padded rows pass through both solves untouched (L's padding columns
    # are zero), exactly as the masked form left them
    v_free = jnp.stack(
        [qvel[k] + vf_rows[k] for k in range(NV)]
        + [qvel[k] + rhs[k] for k in range(NV, NVP)]
    )

    # ---- B = L^-1 J^T (sign-folded) as NV row-block values ----
    rows = [Jt[k] for k in range(NV)]  # (ROWS,) + ls each
    for k in range(NV):
        xk = rows[k] / Ldiag[k][None]
        rows[k] = xk
        for i in range(k + 1, NV):
            if not lz(i, k):
                rows[i] = rows[i] - Lcol[i][k][None] * xk
    rows = [rk * sign for rk in rows]

    if leg_blocks:
        # 32-column leg windows: a leg's B rows are supported on its own
        # foot's contact rows plus its 6 limit rows; the window is padded
        # to 32 with the neighbouring limit rows, whose entries in that
        # leg's B rows are exact zeros (so shared-window sums are exact)
        def half_cols(x, leg):
            if leg == 0:  # contact rows [0:24], limit rows [48:56]
                return jnp.concatenate([x[: nc3 // 2], x[nc3 : nc3 + 8]], 0)
            # contact rows [24:48], limit rows [52:60]
            return jnp.concatenate([x[nc3 // 2 : nc3], x[nc3 + 4 : nc3 + 12]], 0)

        def scatter_halves(gL, gR, g_full):
            # inverse of half_cols: add the two 32-wide leg images onto the
            # dense (ROWS,) base image; overlap columns carry exact zeros
            # from the non-owning leg
            h = nc3 // 2
            return g_full + jnp.concatenate(
                [
                    gL[:h],
                    gR[:h],
                    gL[h : h + 4],
                    gL[h + 4 : h + 8] + gR[h : h + 4],
                    gR[h + 4 : h + 8],
                    jnp.zeros((ROWS - nc3 - 12,) + ls, f32),
                ],
                axis=0,
            )

        rows_L = [half_cols(rows[i], 0) for i in range(half)]
        rows_R = [half_cols(rows[i], 1) for i in range(half, 2 * half)]
        rows_B = rows[2 * half :]
        base_L = [half_cols(rb, 0) for rb in rows_B]
        base_R = [half_cols(rb, 1) for rb in rows_B]

    # u0 = J v_free (sign-folded); padded J columns (v >= NV) are zero
    u0 = jnp.zeros((ROWS,) + ls, f32)
    for k in range(NV):
        u0 = u0 + Jt[k] * v_free[k][None]
    u0 = u0 * sign
    r = u0 - target

    # ---- step bound: ||G||_inf >= lambda_max(G) = lambda_max(B^T B) ----
    # G is symmetric, so each off-diagonal |G_vw| is computed ONCE and
    # accumulated into both row sums — the previous full-matrix pass
    # (NV reductions over the whole (NV, ROWS) stack) was the largest
    # single item in the substep's vreg census (round 4). Entry values are
    # identical; only the (associativity-level) order of the row-sum
    # accumulation changes. Mosaic layout rule: (ROWS,) + ls -> ls
    # reductions over axis 0 lower fine (proven in the production kernel).
    rowsums = [None] * NV  # ls each: Sigma_w |G_vw|

    def _acc(v, w, gvw):
        rowsums[v] = gvw if rowsums[v] is None else rowsums[v] + gvw
        if w != v:
            rowsums[w] = gvw if rowsums[w] is None else rowsums[w] + gvw

    if leg_blocks:
        # cross-leg Gram entries are exact zeros (disjoint column support)
        # and skipped; leg-leg and leg-base pairs reduce over the 32-column
        # leg window instead of all ROWS
        for v in range(half):
            for w in range(v, half):
                _acc(v, w, jnp.abs(jnp.sum(rows_L[v] * rows_L[w], axis=0)))
        for v in range(half):
            for w in range(v, half):
                _acc(half + v, half + w,
                     jnp.abs(jnp.sum(rows_R[v] * rows_R[w], axis=0)))
        for v in range(half):
            for w in range(half):
                _acc(v, 2 * half + w,
                     jnp.abs(jnp.sum(rows_L[v] * base_L[w], axis=0)))
                _acc(half + v, 2 * half + w,
                     jnp.abs(jnp.sum(rows_R[v] * base_R[w], axis=0)))
        for v in range(half):
            for w in range(v, half):
                _acc(2 * half + v, 2 * half + w,
                     jnp.abs(jnp.sum(rows_B[v] * rows_B[w], axis=0)))
    else:
        for v in range(NV):
            for w in range(v, NV):
                _acc(v, w, jnp.abs(jnp.sum(rows[v] * rows[w], axis=0)))
    acc = rowsums[0]
    for v in range(1, NV):
        acc = jnp.maximum(acc, rowsums[v])
    absG_rowsum = acc[None]  # (1,) + ls
    # stacked factor blocks for the APGD matvec; the NVP padding rows are
    # exact zeros and every use reduces over this axis, so they're dropped
    if leg_blocks:
        BL = jnp.stack(rows_L)  # (6, 32) + ls
        BR = jnp.stack(rows_R)
        BB = jnp.stack(rows_B)  # (6, ROWS) + ls
    else:
        Bv = jnp.stack(rows)  # (NV, ROWS) + ls

    if compliance is not None:
        # CFM regularizer reg*I on live rows; diag(A)_r = sum_v B[v,r]^2
        if leg_blocks:
            dA = scatter_halves(
                jnp.sum(BL * BL, axis=0),
                jnp.sum(BR * BR, axis=0),
                jnp.sum(BB * BB, axis=0),
            )
        else:
            dA = jnp.sum(Bv * Bv, axis=0)  # (ROWS,) + ls
        nlive = jnp.maximum(jnp.sum(valid, axis=0), 1.0)
        reg = (compliance * jnp.sum(dA * valid, axis=0) / nlive)[None]
        absG_rowsum = absG_rowsum + reg
    L_apgd = jnp.maximum(absG_rowsum, 1e-6)
    step = 1.0 / L_apgd  # (1,) + ls

    def project(x):
        blocks = x[:nc3].reshape((N_POINTS, 3) + ls)
        tx, ty, n = blocks[:, 0], blocks[:, 1], blocks[:, 2]
        nt = jnp.sqrt(tx * tx + ty * ty + 1e-24)
        inside = nt <= mu * n
        polar = mu * nt <= -n
        n_p = jnp.maximum((mu * nt + n) / (1.0 + mu * mu), 0.0)
        scale = mu * n_p / nt
        keep = inside.astype(f32)
        mid = (1.0 - keep) * (1.0 - polar.astype(f32))
        cone = jnp.stack(
            [keep * tx + mid * tx * scale, keep * ty + mid * ty * scale,
             keep * n + mid * n_p], axis=1
        ).reshape((nc3,) + ls)
        rest = jnp.maximum(x[nc3:], 0.0)
        return jnp.concatenate([cone, rest], axis=0) * valid

    if leg_blocks:
        def matvec(y):  # A y = B^T (B y): two half-width leg blocks + base
            yL = half_cols(y, 0)
            yR = half_cols(y, 1)
            tL = jnp.sum(BL * yL[None], axis=1, keepdims=True)  # (6, 1) + ls
            tR = jnp.sum(BR * yR[None], axis=1, keepdims=True)
            tB = jnp.sum(BB * y[None], axis=1, keepdims=True)
            g = scatter_halves(
                jnp.sum(BL * tL, axis=0),
                jnp.sum(BR * tR, axis=0),
                jnp.sum(BB * tB, axis=0),
            )
            if compliance is not None:
                g = g + reg * (y * valid)
            return g
    else:
        def matvec(y):  # A y = B^T (B y) (+ reg y on live rows)
            t = jnp.sum(Bv * y[None], axis=1, keepdims=True)  # (NV, 1) + ls
            g = jnp.sum(Bv * t, axis=0)  # (ROWS,) + ls
            if compliance is not None:
                g = g + reg * (y * valid)
            return g

    def body(_, carry):
        lam, y, theta = carry
        g = matvec(y) + r
        lam_new = project(y - step * g)
        d = lam_new - lam
        restart = jnp.sum(g * d, axis=0, keepdims=True) > 0.0
        theta = jnp.where(restart, 1.0, theta)
        theta_new = 0.5 * (theta * jnp.sqrt(theta * theta + 4.0) - theta * theta)
        beta = theta * (1.0 - theta) / (theta * theta + theta_new)
        beta = jnp.where(restart, 0.0, beta)
        return lam_new, lam_new + beta * d, theta_new

    if lam0 is None:
        init = jnp.zeros((ROWS,) + ls, f32)
    else:
        init = project(lam0 * sign)  # fold to solver signs, then project
    ones = jnp.ones((1,) + ls, f32)
    lam, _, _ = jax.lax.fori_loop(0, iterations, body, (init, init, ones))

    # ---- qvel_new = v_free + L^-T (B lam) ----
    if leg_blocks:
        lamL = half_cols(lam, 0)
        lamR = half_cols(lam, 1)
        y1_rows = (
            [jnp.sum(rk * lamL, axis=0) for rk in rows_L]
            + [jnp.sum(rk * lamR, axis=0) for rk in rows_R]
            + [jnp.sum(rk * lam, axis=0) for rk in rows_B]
        )
    else:
        y1_rows = [jnp.sum(rk * lam, axis=0) for rk in rows]  # ls each
    dv_rows = solve_upper_rows(y1_rows)
    dv = jnp.stack(dv_rows + [jnp.zeros(ls, f32)] * (NVP - NV))
    return v_free + dv, lam * sign


def _fused_kernel(
    Mt_ref, Jt_ref, qvel_ref, rhs_ref, target_ref, sign_ref, mu_ref,
    comp_ref, lam0_ref, nlim_ref, iters_ref, qvel_out_ref, lam_out_ref,
):
    f32 = Mt_ref.dtype
    rrow = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ENV_TILE), 0)
    valid = (rrow < (3 * N_POINTS + nlim_ref[0])).astype(f32)
    qvel_new, lam = _fused_core(
        Mt_ref[0], Jt_ref[0], qvel_ref[0], rhs_ref[0], target_ref[0],
        sign_ref[0], mu_ref[0], valid, iters_ref[0],
        compliance=comp_ref[0][0], lam0=lam0_ref[0],
    )
    qvel_out_ref[0] = qvel_new
    lam_out_ref[0] = lam


@functools.partial(jax.jit, static_argnames=("iterations", "interpret"))
def fused_solve_pallas(
    Mt: jnp.ndarray,  # (N, nv, nv)
    J: jnp.ndarray,  # (N, nrow, nv)
    qvel: jnp.ndarray,  # (N, nv)
    rhs: jnp.ndarray,  # (N, nv) dt*(tau - h)
    lo_bound: jnp.ndarray,  # (N, n_points)
    limit_sign: jnp.ndarray,  # (N, nlim)
    limit_bound: jnp.ndarray,  # (N, nlim)
    mu: jnp.ndarray,  # (N,)
    compliance: jnp.ndarray,  # (N,) CFM scale (0 = rigid)
    lam0: jnp.ndarray | None = None,  # (N, nrow) warm start (physical signs)
    iterations: int = 16,
    interpret: bool = False,
):
    """Returns (qvel_new (N, nv), lam (N, nrow))."""
    N, nrow, nv = J.shape
    nc3 = 3 * N_POINTS
    nlim = nrow - nc3
    if lam0 is None:
        lam0 = jnp.zeros((N, nrow), J.dtype)

    sign = jnp.concatenate(
        [jnp.ones((N, nc3), J.dtype), limit_sign.astype(J.dtype)], axis=1
    )
    target = jnp.zeros((N, nrow), J.dtype)
    target = target.at[:, jnp.arange(N_POINTS) * 3 + 2].set(lo_bound)
    target = target.at[:, nc3:].set(limit_bound)

    n_pad = (-N) % ENV_TILE
    Np = N + n_pad
    T = Np // ENV_TILE

    def pad(x, row_pads, diag_identity=False):
        x = jnp.pad(x, ((0, n_pad),) + row_pads)
        if diag_identity:
            # keep padded Mtilde diagonal nonsingular
            idx = jnp.arange(nv, NVP)
            x = x.at[:, idx, idx].set(1.0)
        return x

    Mt_p = pad(Mt, ((0, NVP - nv), (0, NVP - nv)), diag_identity=True)
    Jt_p = pad(jnp.swapaxes(J, 1, 2), ((0, NVP - nv), (0, ROWS - nrow)))
    qvel_p = pad(qvel, ((0, NVP - nv),))
    rhs_p = pad(rhs, ((0, NVP - nv),))
    target_p = pad(target, ((0, ROWS - nrow),))
    sign_p = jnp.pad(sign, ((0, n_pad), (0, ROWS - nrow)), constant_values=1.0)
    mu_p = pad(mu.astype(J.dtype)[:, None], ((0, 0),))
    comp_p = pad(compliance.astype(J.dtype)[:, None], ((0, 0),))
    lam0_p = pad(lam0.astype(J.dtype), ((0, ROWS - nrow),))

    def to_tiles(x):
        x = x.reshape((T, ENV_TILE) + x.shape[1:])
        return jnp.moveaxis(x, 1, -1)

    spec3 = lambda a, b: pl.BlockSpec(
        (1, a, b, ENV_TILE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec2 = lambda a: pl.BlockSpec(
        (1, a, ENV_TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    qvel_new_t, lam_t = pl.pallas_call(
        _fused_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, NVP, ENV_TILE), J.dtype),
            jax.ShapeDtypeStruct((T, ROWS, ENV_TILE), J.dtype),
        ),
        grid=(T,),
        in_specs=[
            spec3(NVP, NVP),  # Mt
            spec3(NVP, ROWS),  # Jt
            spec2(NVP),  # qvel
            spec2(NVP),  # rhs
            spec2(ROWS),  # target
            spec2(ROWS),  # sign
            spec2(1),  # mu
            spec2(1),  # compliance
            spec2(ROWS),  # lam0 warm start
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(spec2(NVP), spec2(ROWS)),
        interpret=interpret,
    )(
        to_tiles(Mt_p),
        to_tiles(Jt_p),
        to_tiles(qvel_p),
        to_tiles(rhs_p),
        to_tiles(target_p),
        to_tiles(sign_p),
        to_tiles(mu_p),
        to_tiles(comp_p),
        to_tiles(lam0_p),
        jnp.asarray([nlim], jnp.int32),
        jnp.asarray([iterations], jnp.int32),
    )
    qvel_new = jnp.moveaxis(qvel_new_t, -1, 1).reshape(Np, NVP)[:N, :nv]
    lam = jnp.moveaxis(lam_t, -1, 1).reshape(Np, ROWS)[:N, :nrow]
    return qvel_new, lam


def make_fused_batched(iterations: int, interpret: bool = False, mesh=None):
    """custom_vmap wrapper: single-env falls back to XLA path; vmapped batch
    dispatches the fused kernel. With `mesh`, the batched call is wrapped in
    shard_map over the env axis — a bare pallas_call has no GSPMD partition
    rule, so this is required for multi-chip meshes (each device runs the
    kernel on its local env shard; zero cross-chip traffic)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def solve(Mt, J, qvel, rhs, lo, sign, lb, mu, compliance, lam0):
        # single-env fallback: unrolled XLA path (same math)
        from .contact import apgd_solve
        from .linalg import chol_unrolled, solve_lower_unrolled, solve_upper_unrolled

        L = chol_unrolled(Mt)
        v_free = qvel + solve_upper_unrolled(L.T, solve_lower_unrolled(L, rhs))
        B = solve_lower_unrolled(L, J.T)
        A = B.T @ B
        nrow_ = A.shape[0]
        reg = compliance * (jnp.trace(A) / nrow_)
        A = A + reg * jnp.eye(nrow_, dtype=A.dtype)
        u0 = J @ v_free
        G = B @ B.T
        step_bound = jnp.max(jnp.sum(jnp.abs(G), axis=-1)) + reg
        lam = apgd_solve(
            A, u0, N_POINTS, lo, sign, lb, mu, iterations,
            step_bound=step_bound, lam0=lam0,
        )
        qvel_new = v_free + solve_upper_unrolled(L.T, B @ lam)
        return qvel_new, lam

    def batched(*args):
        return fused_solve_pallas(*args, iterations=iterations, interpret=interpret)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        spec = P(axis)
        batched = shard_map(
            batched,
            mesh=mesh,
            in_specs=(spec,) * 10,
            out_specs=(spec, spec),
            check_vma=False,
        )

    @solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))
            for x, b in zip(args, in_batched)
        ]
        out = batched(*args)
        return out, (True, True)

    return solve
