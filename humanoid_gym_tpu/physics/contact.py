"""Batched contact + joint-limit solver: projected Gauss-Seidel on velocities.

Replaces the PhysX TGS contact pipeline the reference depends on
(humanoid_config.py:135-147: solver_type TGS, 4 position iters,
contact_offset 0.01, max_depenetration_velocity 1.0).

Design for XLA/TPU:
- Fixed candidate set (static shapes): P sole points per foot (force-solved)
  plus one unilateral row per joint (position limits). Activity is expressed
  through constraint *bounds*, never through shapes.
- One dense Delassus operator A = J Mtilde^-1 J^T per env (tiny: ~60x60),
  built with batched matmuls; PGS sweeps are unrolled straight-line code.
- Friction: Coulomb disk projection per contact, mu supplied per env
  (friction domain randomization, reference legged_robot.py:257-269).

Unilateral normal rows obey: v_n+ >= b  complementary to  lambda_n >= 0, where
b encodes PhysX-like depenetration: approach-limited when separated by less
than contact_offset, Baumgarte push-out capped by max_depenetration_velocity
when penetrating.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .dynamics import Dyn
from .kinematics import ancestor_mask, dof_basis, f32_matmul, point_jacobian
from .model import RobotModel


class ContactSetup(NamedTuple):
    J: jnp.ndarray  # (nrow, nv) stacked constraint Jacobian
    lo_bound: jnp.ndarray  # (ncon_pts,) velocity lower bound per normal row
    limit_bound: jnp.ndarray  # (nj,) placeholder; real bounds from joint_limit_bounds
    limit_sign: jnp.ndarray  # (nj,) placeholder; real signs from joint_limit_bounds
    phi: jnp.ndarray  # (ncon_pts,) signed gap of force-solved points
    pos_w: jnp.ndarray  # (ncon_pts,3) world candidate positions
    frames: jnp.ndarray | None  # (ncon_pts,3,3) rows (t1, t2, n) per point,
    # or None on flat terrain (identity frames — world x/y/z rows)


def terrain_contact_frames(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Per-point contact frames from terrain slope: rows (t1, t2, n) with
    n = normalize(-dh/dx, -dh/dy, 1) — the surface normal of the height
    function — and tangents spanning the surface plane. PhysX trimesh /
    MuJoCo hfield prisms resolve contacts along this normal; a vertical
    normal neither decelerates a foot landing on an up-slope nor tilts the
    friction cone. Returns (K, 3, 3)."""
    ones = jnp.ones_like(gx)
    n = jnp.stack([-gx, -gy, ones], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    # t1 = normalize(e_y x n) = [n_z, 0, -n_x]/|.| — never degenerate while
    # the surface is walkable (n_z > 0)
    t1 = jnp.stack([n[:, 2], jnp.zeros_like(gx), -n[:, 0]], axis=-1)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    return jnp.stack([t1, t2, n], axis=1)


def build_contact_setup(
    model: RobotModel,
    dyn: Dyn,
    terrain_height_fn,
    dt: float,
    contact_offset: float = 0.01,
    baumgarte: float = 0.2,
    max_depen_vel: float = 1.0,
    limit_margin: float = 0.05,
    frames_override: jnp.ndarray | None = None,
) -> ContactSetup:
    k = dyn.k
    mask = ancestor_mask(model)
    basis = dof_basis(model, k)

    body_idx = jnp.asarray(model.contact_point_body)
    offs = model.contact_point_offset  # (K,3)
    Rb = k.R[body_idx, :, :]
    pb = k.p[body_idx, :]
    pos = pb + jnp.einsum("kij,kj->ki", Rb, offs)  # (K,3)
    ground = terrain_height_fn(pos[:, 0], pos[:, 1])
    phi = pos[:, 2] - ground

    # stacked point Jacobians (K,3,nv), world x/y/z rows
    Jpts = jax.vmap(
        lambda mrow, x: point_jacobian(basis, mrow, x), in_axes=(0, 0)
    )(mask[body_idx], pos)

    if frames_override is not None:
        # sloped contact frames: rotate each point's 3 rows into (t1, t2, n)
        # and measure penetration along the normal (vertical gap x n_z).
        # frames_override carries POLICY-STEP-START frames (all solver paths
        # freeze frames across the decimation window, matching the mega
        # kernel's step-start slope gather — frames are never recomputed
        # per substep).
        frames = frames_override
        Jpts = jnp.einsum("kdc,kcv->kdv", frames, Jpts)
        phi_n = phi * frames[:, 2, 2]
    else:
        frames = None
        phi_n = phi

    # normal-row bound b: v_n+ >= b
    inactive = phi_n > contact_offset
    b_pen = jnp.minimum(baumgarte * (-phi_n) / dt, max_depen_vel)  # push out
    b_gap = -phi_n / dt  # allowed approach
    lo = jnp.where(phi_n <= 0.0, b_pen, b_gap)
    lo = jnp.where(inactive, -1e9, lo)

    # joint-limit rows: one per joint, signed toward the nearer limit
    qj_rows = jnp.eye(model.nv)[6:]  # (nj, nv)
    # bounds computed by caller via qpos; returned by companion function below
    K = pos.shape[0]
    J = jnp.concatenate([Jpts.reshape(3 * K, model.nv), qj_rows], axis=0)
    return ContactSetup(
        J=J,
        lo_bound=lo,
        limit_bound=jnp.zeros(model.nj, pos.dtype),  # filled by with_joint_limits
        limit_sign=jnp.ones(model.nj, pos.dtype),
        phi=phi,
        pos_w=pos,
        frames=frames,
    )


def joint_limit_bounds(
    model: RobotModel,
    qpos: jnp.ndarray,
    dt: float,
    baumgarte: float = 0.2,
    max_depen_vel: float = 2.0,
    margin: float = 0.05,
):
    """Per-joint unilateral bound. Constraint: sign * qdot+ >= b.

    sign=+1 enforces the lower limit (qdot >= b), sign=-1 the upper
    (-qdot >= b i.e. qdot <= -b).
    """
    qj = qpos[7:]
    mid = 0.5 * (model.dof_lower + model.dof_upper)
    near_lower = qj < mid
    sign = jnp.where(near_lower, 1.0, -1.0)
    viol = jnp.where(near_lower, model.dof_lower - qj, qj - model.dof_upper)  # >0 when out
    b_pen = jnp.minimum(baumgarte * viol / dt, max_depen_vel)
    b_gap = viol / dt  # negative when inside: allowed approach speed
    b = jnp.where(viol >= 0.0, b_pen, b_gap)
    b = jnp.where(viol < -margin, -1e9, b)
    return sign, b


def pgs_solve(
    A: jnp.ndarray,  # (nrow, nrow) Delassus
    u0: jnp.ndarray,  # (nrow,) J v_free
    n_points: int,
    lo_bound: jnp.ndarray,  # (n_points,)
    limit_sign: jnp.ndarray,  # (nlim,)
    limit_bound: jnp.ndarray,  # (nlim,)
    mu: jnp.ndarray,  # () friction coefficient
    iterations: int,
    lam0: jnp.ndarray | None = None,  # (nrow,) warm start (physical signs)
) -> jnp.ndarray:
    """Projected Gauss-Seidel over 3D friction blocks + 1D limit rows.

    Returns impulses lam (nrow,). Rows of each contact block are ordered
    (x, y, z=normal) in world axes (flat-terrain normal).
    """
    nrow = A.shape[0]
    nlim = limit_sign.shape[0]
    eps = 1e-7

    diag = jnp.diagonal(A) + eps
    lim_diag = diag[3 * n_points :]

    def contact_block(kk, carry):
        """Row-wise projected Gauss-Seidel on one 3D contact: scalar normal
        update clamped at 0, scalar tangential updates, then disk projection
        onto the friction cone (the classic convergent scheme; a full-block
        inverse followed by projection is biased when rows saturate)."""
        lam, u = carry
        r = kk * 3
        lam_k = jax.lax.dynamic_slice(lam, (r,), (3,))
        u_k = jax.lax.dynamic_slice(u, (r,), (3,))
        d_k = jax.lax.dynamic_slice(diag, (r,), (3,))
        ln = jnp.maximum(lam_k[2] + (lo_bound[kk] - u_k[2]) / d_k[2], 0.0)
        lt = lam_k[:2] - u_k[:2] / d_k[:2]
        tn = jnp.linalg.norm(lt) + 1e-12
        scale = jnp.minimum(1.0, mu * ln / tn)
        new_k = jnp.concatenate([lt * scale, ln[None]])
        d = new_k - lam_k
        lam = jax.lax.dynamic_update_slice(lam, new_k, (r,))
        Acol = jax.lax.dynamic_slice(A, (0, r), (nrow, 3))
        u = u + Acol @ d
        return lam, u

    def limit_row(jj, carry):
        lam, u = carry
        r = 3 * n_points + jj
        s = limit_sign[jj]
        # constraint: s*u_r >= b, impulse along s direction, lam_signed >= 0
        viol = limit_bound[jj] - s * u[r]
        dlam = viol / lim_diag[jj] * s
        cand = (lam[r] + dlam) * s  # signed magnitude
        new = jnp.maximum(cand, 0.0) * s
        d = new - lam[r]
        lam = lam.at[r].set(new)
        u = u + A[:, r] * d
        return lam, u

    def sweep(_, carry):
        carry = jax.lax.fori_loop(0, n_points, contact_block, carry)
        carry = jax.lax.fori_loop(0, nlim, limit_row, carry)
        return carry

    if lam0 is None:
        lam0 = jnp.zeros(nrow, A.dtype)
        u_init = u0
    else:
        # warm start: residual velocity must include the carried impulses
        lam0 = _project_cone(lam0, n_points, mu, limit_sign)
        u_init = u0 + A @ lam0
    lam, _ = jax.lax.fori_loop(0, iterations, sweep, (lam0, u_init))
    return lam


def _project_cone(lam: jnp.ndarray, n_points: int, mu, limit_sign):
    """Project stacked impulses onto the feasible set: second-order friction
    cones for the 3D contact blocks, signed half-lines for limit rows.

    lam: (nrow,) with blocks [(tx, ty, n) x n_points, limit rows].
    """
    blocks = lam[: 3 * n_points].reshape(n_points, 3)
    t = blocks[:, :2]
    n = blocks[:, 2]
    nt = jnp.linalg.norm(t, axis=-1)
    # standard second-order-cone projection (Boyd 8.1.1 / APGD literature)
    inside = nt <= mu * n
    polar = mu * nt <= -n
    n_proj = jnp.clip((mu * nt + n) / (1.0 + mu * mu), 0.0)
    scale = jnp.where(nt > 1e-12, mu * n_proj / jnp.maximum(nt, 1e-12), 0.0)
    t_new = jnp.where(
        inside[:, None], t, jnp.where(polar[:, None], 0.0, t * scale[:, None])
    )
    n_new = jnp.where(inside, n, jnp.where(polar, 0.0, n_proj))
    proj_blocks = jnp.concatenate([t_new, n_new[:, None]], axis=-1).reshape(-1)

    lim = lam[3 * n_points :]
    lim_new = jnp.maximum(lim * limit_sign, 0.0) * limit_sign
    return jnp.concatenate([proj_blocks, lim_new])


def apgd_solve(
    A: jnp.ndarray,  # (nrow, nrow) Delassus
    u0: jnp.ndarray,  # (nrow,) J v_free
    n_points: int,
    lo_bound: jnp.ndarray,  # (n_points,) normal-velocity targets
    limit_sign: jnp.ndarray,  # (nlim,)
    limit_bound: jnp.ndarray,  # (nlim,)
    mu: jnp.ndarray,  # () friction coefficient
    iterations: int,
    step_bound: jnp.ndarray | None = None,  # () Lipschitz bound >= lam_max(A)
    lam0: jnp.ndarray | None = None,  # (nrow,) warm start (physical signs)
) -> jnp.ndarray:
    """Accelerated projected gradient (Nesterov + adaptive restart) on the
    convex contact QP: min 0.5 lam^T A lam + lam^T r over the product of
    friction cones + signed half-lines.

    The TPU-native solver: every iteration is one batched matvec plus fused
    elementwise projections — no sequential block sweeps, so the op-dispatch
    chain is ~iterations long instead of ~iterations x rows (the PGS shape
    that is latency-bound on TPU). Physics capability replaced: PhysX TGS
    iterative contact solve (reference humanoid_config.py:135-147).
    """
    nrow = A.shape[0]
    # gradient offset r: grad = A lam + u0 - target, target holds the
    # desired normal/limit velocities (same bounds PGS enforces row-wise)
    target = jnp.zeros(nrow, A.dtype)
    target = target.at[jnp.arange(n_points) * 3 + 2].set(lo_bound)
    target = target.at[3 * n_points :].set(limit_sign * limit_bound)
    r = u0 - target

    # step size 1/L. Callers that hold the half-factor B (A = B^T B) pass
    # step_bound = ||B B^T||_inf (+ compliance reg): same spectrum as A on a
    # (nv, nv) matrix, so the bound is tighter (measured ~1.7x lam_max vs
    # ~2.4x for ||A||_inf on the 60x60 Delassus) -> faster convergence at a
    # fixed iteration count. All solver paths share this bound so the
    # equivalence contract holds. Fallback: row-sum bound on A itself.
    if step_bound is None:
        step_bound = jnp.max(jnp.sum(jnp.abs(A), axis=-1))
    L = jnp.maximum(step_bound, 1e-6)
    step = 1.0 / L

    def body(_, carry):
        lam, y, theta = carry
        g = A @ y + r
        lam_new = _project_cone(y - step * g, n_points, mu, limit_sign)
        d = lam_new - lam
        # adaptive restart on non-descent (O'Donoghue-Candes)
        restart = jnp.dot(g, d) > 0.0
        theta = jnp.where(restart, 1.0, theta)
        theta_new = 0.5 * (theta * jnp.sqrt(theta * theta + 4.0) - theta * theta)
        beta = theta * (1.0 - theta) / (theta * theta + theta_new)
        beta = jnp.where(restart, 0.0, beta)
        y_new = lam_new + beta * d
        return lam_new, y_new, theta_new

    if lam0 is None:
        lam0 = jnp.zeros(nrow, A.dtype)
    else:
        # warm start from the previous substep's impulses (projected, so a
        # stale/flipped carry is feasible before the first gradient step)
        lam0 = _project_cone(lam0, n_points, mu, limit_sign)
    lam, _, _ = jax.lax.fori_loop(0, iterations, body, (lam0, lam0, jnp.asarray(1.0)))
    return lam


class ContactResult(NamedTuple):
    qvel_new: jnp.ndarray  # (nv,)
    impulses: jnp.ndarray  # (K,3) per force-solved point (world frame)
    phi: jnp.ndarray  # (K,) gaps
    pos_w: jnp.ndarray  # (K,3)
    lam: jnp.ndarray  # (nrow,) full impulse vector (physical signs) — the
    # warm-start carry for the next substep's solve


@f32_matmul
def resolve_contacts(
    model: RobotModel,
    dyn: Dyn,
    qpos: jnp.ndarray,
    v_free: jnp.ndarray,
    terrain_height_fn,
    dt: float,
    mu: jnp.ndarray,
    iterations: int = 8,
    contact_offset: float = 0.01,
    max_depen_vel: float = 1.0,
    solver: str = "apgd",
    baumgarte=0.2,
    compliance=0.0,
    lam0: jnp.ndarray | None = None,
    frames_override: jnp.ndarray | None = None,
) -> ContactResult:
    setup = build_contact_setup(
        model, dyn, terrain_height_fn, dt, contact_offset=contact_offset,
        max_depen_vel=max_depen_vel, baumgarte=baumgarte,
        frames_override=frames_override,
    )
    sign, lb = joint_limit_bounds(model, qpos, dt)
    K = setup.phi.shape[0]

    # A = J Mtilde^-1 J^T via the half-factor B = L^-1 J^T: one triangular
    # solve instead of two (A = B^T B), and the post-solve velocity update
    # needs only L^-T (B lam).
    from .linalg import solve_lower_unrolled, solve_upper_unrolled

    L = dyn.Mtilde_chol
    B = solve_lower_unrolled(L, setup.J.T)  # (nv, nrow)
    A = B.T @ B  # (nrow, nrow)
    # contact compliance (CFM): A + r*mean(diag)*I — the velocity-level
    # analog of MuJoCo's soft-constraint regularizer R (solref/solimp add a
    # diagonal to the Delassus); r=0 is exact rigid contact. Used by the
    # contact-model DR to randomize over the rigid<->compliant family.
    nrow_ = A.shape[0]
    reg = compliance * (jnp.trace(A) / nrow_)
    A = A + reg * jnp.eye(nrow_, dtype=A.dtype)
    u0 = setup.J @ v_free
    # shared APGD step bound from the small Gram matrix G = B B^T (same
    # nonzero spectrum as A = B^T B, invariant to limit-row sign folding)
    G = B @ B.T
    step_bound = jnp.max(jnp.sum(jnp.abs(G), axis=-1)) + reg
    if solver == "apgd":
        lam = apgd_solve(
            A, u0, K, setup.lo_bound, sign, lb, mu, iterations,
            step_bound=step_bound, lam0=lam0,
        )
    elif solver in ("apgd_pallas", "apgd_pallas_interpret"):
        from .pallas_solver import N_POINTS, make_apgd_batched

        assert K == N_POINTS, f"pallas solver is built for {N_POINTS} contacts"
        solve = make_apgd_batched(
            iterations, interpret=solver.endswith("interpret")
        )
        lam0_arr = jnp.zeros(nrow_, A.dtype) if lam0 is None else lam0
        lam = solve(A, u0, setup.lo_bound, sign, lb, mu, step_bound, lam0_arr)
    elif solver == "pgs":
        lam = pgs_solve(
            A, u0, K, setup.lo_bound, sign, lb, mu, iterations, lam0=lam0
        )
    else:
        raise ValueError(f"unknown contact solver {solver!r}")
    qvel_new = v_free + solve_upper_unrolled(L.T, B @ lam)
    imp = lam[: 3 * K].reshape(K, 3)
    if setup.frames is not None:
        # impulses live in the (t1, t2, n) frame — report world-frame
        imp = jnp.einsum("kd,kdc->kc", imp, setup.frames)
    return ContactResult(
        qvel_new=qvel_new,
        impulses=imp,
        phi=setup.phi,
        pos_w=setup.pos_w,
        lam=lam,
    )
