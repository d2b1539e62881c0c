"""The 1 kHz physics step: PD actuation -> dynamics -> contacts -> integrate.

One policy step = `decimation` physics substeps under lax.scan, exactly
mirroring the reference control path (legged_robot.py:84-102: decimation x
[_compute_torques -> gym.simulate]) but as one fused XLA program.

All functions are single-env; the env layer vmaps them.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from . import spatial as S
from .contact import (
    ContactResult,
    build_contact_setup,
    joint_limit_bounds,
    resolve_contacts,
)
from .dynamics import compute_dynamics, solve_mtilde
from .model import RobotModel


@struct.dataclass
class PhysicsState:
    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    # per-env physical randomization
    friction: jnp.ndarray  # () contact friction coefficient
    base_mass_scale: jnp.ndarray  # () multiplicative base-mass randomization
    contact_stiffness: jnp.ndarray  # () Baumgarte scale (contact-model DR)
    contact_offset: jnp.ndarray  # () contact activation distance [m]
    contact_compliance: jnp.ndarray  # () CFM scale: A + c*mean(diag)*I (0 = rigid)
    kp_scale: jnp.ndarray  # () actuator-strength scale on kp
    kd_scale: jnp.ndarray  # () actuator-strength scale on kd
    # outputs of the last substep (for observations / rewards)
    contact_forces: jnp.ndarray  # (nb,3) net per-body contact force [N]
    torques: jnp.ndarray  # (nj,) last applied actuator torques
    # warm-start carry: the last substep's full impulse vector (physical
    # signs, (3*ncon + nj,)). Seeding the next solve from it roughly halves
    # the APGD iterations needed for the same accuracy (contacts persist
    # across 1 ms substeps AND 10 ms policy steps while in stance). Zeroed
    # on env reset.
    contact_lam: jnp.ndarray
    # contact-slope DR: per-env bias (2,) added to the terrain gradient
    # (dh/dx, dh/dy) the contact FRAMES are built from — policies cannot
    # exploit exact slope-contact detail (the slope analog of the
    # stiffness/offset/compliance contact-model DR; measured: policies that
    # survive their training engine's slopes fall on MuJoCo's). Inert on
    # flat terrain and at zeros.
    slope_bias: jnp.ndarray
    # end-of-step feet/knee kinematics from the mega kernel ((14,) in the
    # OUT_FK layout, mega_kernel.py): [fLx,fRx, fLy,fRy, fLz,fRz, kLx,kRx,
    # kLy,kRy, vLx,vRx, vLy,vRy] — feet/knee positions BASE-RELATIVE, feet
    # v_origin world-frame. Replaces the env's per-policy-step XLA
    # fk()/body_velocities() (26% of the train iteration, docs/ROUND3.md).
    # Left as zeros by the non-mega solver paths — the env falls back to
    # XLA fk() there (dispatch is static, by solver type).
    fk_out: jnp.ndarray


def default_state(model: RobotModel, base_pos, base_quat_wxyz, qj=None) -> PhysicsState:
    nq, nv, nb, njnt = model.nq, model.nv, model.nbody, model.nj
    qj = jnp.zeros(njnt) if qj is None else qj
    qpos = jnp.concatenate([jnp.asarray(base_pos), jnp.asarray(base_quat_wxyz), qj])
    return PhysicsState(
        qpos=qpos,
        qvel=jnp.zeros(nv),
        friction=jnp.asarray(1.0),
        base_mass_scale=jnp.asarray(1.0),
        contact_stiffness=jnp.asarray(1.0),
        contact_offset=jnp.asarray(0.01),
        contact_compliance=jnp.asarray(0.0),
        kp_scale=jnp.asarray(1.0),
        kd_scale=jnp.asarray(1.0),
        contact_forces=jnp.zeros((nb, 3)),
        torques=jnp.zeros(njnt),
        contact_lam=jnp.zeros(3 * model.ncon + njnt),
        slope_bias=jnp.zeros(2),
        fk_out=jnp.zeros(14),
    )


def pd_torques(
    model: RobotModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    targets: jnp.ndarray,
    kp: jnp.ndarray,
    kd: jnp.ndarray,
    torque_limit: jnp.ndarray,
) -> jnp.ndarray:
    """PD controller (reference legged_robot.py:340-356):
    tau = kp*(target - q) - kd*qdot, clipped to +-torque_limit."""
    q = qpos[7:]
    dq = qvel[6:]
    tau = kp * (targets - q) - kd * dq
    return jnp.clip(tau, -torque_limit, torque_limit)


def make_substep(
    model: RobotModel,
    dt: float,
    kp: jnp.ndarray,
    kd: jnp.ndarray,
    torque_limit: jnp.ndarray,
    terrain_height_fn: Callable,
    solver_iterations: int = 24,
    max_depen_vel: float = 1.0,
    solver: str = "apgd",
):
    """Returns substep(state, joint_targets) -> state (single env).

    frames_override: policy-step-start contact frames (K, 3, 3) on
    heightfield terrain (None = flat, identity frames). Every solver path
    freezes frames across the decimation window — make_physics_step
    computes them once per policy step, matching the mega kernel's
    step-start slope gather."""

    nb = model.nbody
    body_idx = jnp.asarray(model.contact_point_body)

    def substep(
        state: PhysicsState,
        targets: jnp.ndarray,
        frames_override: jnp.ndarray | None = None,
    ) -> PhysicsState:
        qpos, qvel = state.qpos, state.qvel
        # motor-strength DR scales the effective PD gains per env
        kp_eff = kp * state.kp_scale
        kd_eff = kd * state.kd_scale
        tau = pd_torques(model, qpos, qvel, targets, kp_eff, kd_eff, torque_limit)

        # implicit damping: PD kd + URDF viscous damping on joint DOFs
        implicit_d = kd_eff + model.dof_damping
        mass_scale = jnp.ones(nb).at[0].set(state.base_mass_scale)
        dyn = compute_dynamics(model, qpos, qvel, dt, implicit_d, mass_scale)

        # Coulomb joint friction (URDF <dynamics friction>), smooth sign,
        # plus the explicit part of URDF viscous damping (implicit remainder
        # lives in Mtilde's LHS; the PD kd term is already inside tau).
        tau_fric = -model.dof_friction * jnp.tanh(qvel[6:] / 0.05) - model.dof_damping * qvel[6:]
        # delta-v form: (M + dt D)(v+ - v) = dt (tau - h); the damping D moved
        # to the LHS makes the kd/viscous terms implicit while tau still
        # reports the reference's explicit clipped PD torque.
        gen_force = jnp.concatenate([jnp.zeros(6, tau.dtype), tau + tau_fric])

        if solver.startswith("fused"):
            # fully fused path: cholesky + v_free + Delassus + APGD + dv in
            # one Pallas kernel per env tile (pallas_solver.py)
            from .pallas_solver import make_fused_batched

            setup = build_contact_setup(
                model, dyn, terrain_height_fn, dt, max_depen_vel=max_depen_vel,
                baumgarte=0.2 * state.contact_stiffness,
                contact_offset=state.contact_offset,
                frames_override=frames_override,
            )
            sign, lb = joint_limit_bounds(model, qpos, dt)
            D = jnp.concatenate([jnp.zeros(6, tau.dtype), implicit_d])
            Mt = dyn.M + dt * jnp.diag(D)
            rhs = dt * (gen_force - dyn.h)
            from .pallas_solver import get_solver_mesh

            fused = make_fused_batched(
                solver_iterations,
                interpret=solver.endswith("interpret"),
                mesh=get_solver_mesh(),
            )
            qvel_new, lam = fused(
                Mt, setup.J, qvel, rhs, setup.lo_bound, sign, lb,
                state.friction, state.contact_compliance, state.contact_lam,
            )
            K = setup.phi.shape[0]
            imp = lam[: 3 * K].reshape(K, 3)
            if setup.frames is not None:
                imp = jnp.einsum("kd,kdc->kc", imp, setup.frames)
            res = ContactResult(
                qvel_new=qvel_new,
                impulses=imp,
                phi=setup.phi,
                pos_w=setup.pos_w,
                lam=lam,
            )
        else:
            v_free = qvel + solve_mtilde(dyn.Mtilde_chol, dt * (gen_force - dyn.h))
            res = resolve_contacts(
                model,
                dyn,
                qpos,
                v_free,
                terrain_height_fn,
                dt,
                state.friction,
                iterations=solver_iterations,
                max_depen_vel=max_depen_vel,
                solver=solver,
                baumgarte=0.2 * state.contact_stiffness,
                contact_offset=state.contact_offset,
                compliance=state.contact_compliance,
                lam0=state.contact_lam,
                frames_override=frames_override,
            )
        qvel_new = res.qvel_new
        # DOF velocity limits (PhysX clamps at maxVelocity; URDF <limit velocity>)
        vj = jnp.clip(qvel_new[6:], -model.dof_vel_limit, model.dof_vel_limit)
        qvel_new = qvel_new.at[6:].set(vj)

        # integrate (semi-implicit Euler; quaternion exponential map)
        pos_new = qpos[0:3] + dt * qvel_new[0:3]
        quat_new = S.quat_integrate(qpos[3:7], qvel_new[3:6], dt)
        qj_new = qpos[7:] + dt * qvel_new[6:]
        qpos_new = jnp.concatenate([pos_new, quat_new, qj_new])

        # net contact force per body (world frame, Newtons)
        forces = res.impulses / dt  # (K,3)
        cf = jnp.zeros((nb, 3), forces.dtype).at[body_idx].add(forces)
        return state.replace(
            qpos=qpos_new,
            qvel=qvel_new,
            contact_forces=cf,
            torques=tau,
            contact_lam=res.lam,
        )

    return substep


def make_physics_step(
    model: RobotModel,
    sim_dt: float,
    decimation: int,
    kp: jnp.ndarray,
    kd: jnp.ndarray,
    torque_limit: jnp.ndarray,
    terrain_height_fn: Callable,
    solver_iterations: int = 24,
    solver: str = "apgd",
    unroll: int = 1,
    terrain_map=None,
):
    """Returns step(state, joint_targets) -> state running `decimation`
    substeps at sim_dt with the targets held (100 Hz policy / 1 kHz physics,
    reference humanoid_config.py:128-131). `unroll` trades compile time for
    less while-loop overhead on TPU.

    solver="mega" dispatches the whole decimation loop to ONE Pallas
    launch (mega_kernel.py); heightfield terrain rides in-kernel slope/
    height patches gathered at policy-step start."""

    if solver.startswith("mega"):
        from ..terrain.terrain import flat_height_fn
        from .mega_kernel import make_mega_step_batched

        assert terrain_height_fn is flat_height_fn or terrain_map is not None, (
            "mega solver needs a flat plane or the TerrainMap (for the "
            "in-kernel heightfield patches); use fused_pallas otherwise"
        )
        nb = model.nbody
        mega = make_mega_step_batched(
            model, sim_dt, decimation, kp, kd, torque_limit,
            iterations=solver_iterations,
            interpret=solver.endswith("interpret"),
            terrain_map=(
                terrain_map if terrain_height_fn is not flat_height_fn else None
            ),
        )

        # per-foot body ids in OUT_FF row order (shared grouping helper)
        foot_idx = jnp.asarray([b for b, _, _ in model.contact_point_runs()])

        def step(state: PhysicsState, targets: jnp.ndarray) -> PhysicsState:
            qpos_new, qvel_new, lam, tau, ff, fk14 = mega(
                state.qpos, state.qvel, state.friction,
                state.base_mass_scale, state.contact_stiffness,
                state.contact_offset, state.kp_scale, state.kd_scale,
                state.contact_compliance, state.contact_lam,
                state.slope_bias, targets,
            )
            # ff: per-foot WORLD-frame impulse sums (frame-correct on sloped
            # terrain, where raw lam rows live in per-point (t1, t2, n))
            forces = ff.reshape(foot_idx.shape[0], 3) / sim_dt
            cf = jnp.zeros((nb, 3), forces.dtype).at[foot_idx].add(forces)
            return state.replace(
                qpos=qpos_new, qvel=qvel_new, contact_forces=cf, torques=tau,
                contact_lam=lam, fk_out=fk14,
            )

        # forwarded for tests (windowed-tap exactness)
        step.terrain_patches = getattr(mega, "terrain_patches", None)
        return step

    # Heightfield CONTACT geometry: the bilinear surface + sloped frames
    # (PhysX-trimesh capability analog). The passed terrain_height_fn keeps
    # the reference's 3-tap-min OBSERVATION semantics in the env layer; as
    # contact geometry that lookup is piecewise-constant (10 cm terraces —
    # feet never land on an actual slope), so contacts resolve against the
    # continuous bilinear surface instead. Flat terrain: zero cost.
    terrain_grad_fn = None
    if terrain_map is not None:
        from ..terrain.terrain import flat_height_fn as _flat

        if terrain_height_fn is not _flat:
            from ..terrain.terrain import make_contact_height_fn, make_grad_fn

            terrain_height_fn = make_contact_height_fn(terrain_map)
            terrain_grad_fn = make_grad_fn(terrain_map)

    substep = make_substep(
        model,
        sim_dt,
        kp,
        kd,
        torque_limit,
        terrain_height_fn,
        solver_iterations,
        solver=solver,
    )

    if terrain_grad_fn is not None:
        # policy-step-start contact frames, frozen across the decimation
        # window in EVERY solver path (exactly the mega kernel's semantics:
        # slope gathered once per launch). 10 ms of frame staleness is
        # negligible; identical semantics keep the paths equivalence-testable.
        from .contact import terrain_contact_frames
        from .kinematics import f32_matmul, fk

        body_idx_f = jnp.asarray(model.contact_point_body)
        offs_f = model.contact_point_offset

        @f32_matmul
        def _frames_at(qpos, slope_bias):
            k = fk(model, qpos)
            pos = k.p[body_idx_f] + jnp.einsum(
                "kij,kj->ki", k.R[body_idx_f], offs_f
            )
            gx, gy = terrain_grad_fn(pos[:, 0], pos[:, 1])
            return terrain_contact_frames(
                gx + slope_bias[0], gy + slope_bias[1]
            )

        def step(state: PhysicsState, targets: jnp.ndarray) -> PhysicsState:
            frames0 = _frames_at(state.qpos, state.slope_bias)

            def body(st, _):
                return substep(st, targets, frames0), None

            out, _ = jax.lax.scan(
                body, state, None, length=decimation, unroll=unroll
            )
            return out

        return step

    def step(state: PhysicsState, targets: jnp.ndarray) -> PhysicsState:
        def body(st, _):
            return substep(st, targets), None

        out, _ = jax.lax.scan(body, state, None, length=decimation, unroll=unroll)
        return out

    return step


def physics_step(*args, **kw):  # convenience alias
    return make_physics_step(*args, **kw)
