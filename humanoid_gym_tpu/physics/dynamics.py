"""Joint-space dynamics: mass matrix, bias forces, free-velocity solve.

Formulation (one env; vmap over the env axis):

  M(q) qacc + h(q, v) = S tau + J_c^T f_c

- M assembled as sum_b J_b^T I_b J_b over COM-frame world-axis Jacobians
  (composite-rigid-body, expressed through Jacobians — O(nb * nv^2) dense ops
  that XLA maps to a handful of batched matmuls; ideal for TPU where nb=13,
  nv=18 are tiny but the env batch is thousands).
- Coriolis/centrifugal + gravity bias obtained *exactly* via jax.jvp of the
  body-velocity function (bias acceleration = d(J v)/dq * qdot with qacc=0),
  plus the gyroscopic torque omega x I omega. No hand-derived RNEA to get
  wrong; AD is the derivation.
- Joint damping (URDF + the PD controller's kd) is integrated implicitly:
  Mtilde = M + dt * diag(D) on the LHS keeps a 1 kHz step stable with
  kd=10 on the nearly massless ankle DOFs (the reference relies on PhysX TGS
  for the same robustness, humanoid_config.py:135-147).

Replaces the dynamics core of Isaac Gym PhysX (reference legged_robot.py:94-102
drives it via gym.simulate at dt=1ms).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import spatial as S
from .linalg import chol_unrolled, solve_spd_chol
from .kinematics import (
    FK,
    ancestor_mask,
    body_jacobians,
    body_velocities,
    f32_matmul,
    fk,
)
from .model import RobotModel


def qpos_derivative(qpos: jnp.ndarray, qvel: jnp.ndarray) -> jnp.ndarray:
    """Time derivative of qpos given qvel (quaternion via 0.5*omega⊗q)."""
    dquat = S.quat_derivative(qpos[3:7], qvel[3:6])
    return jnp.concatenate([qvel[0:3], dquat, qvel[6:]])


def world_inertias(model: RobotModel, k: FK, mass_scale: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-body world-frame rotational inertia about COM and scaled masses.

    mass_scale: (nb,) multiplicative randomization (base-mass DR: reference
    legged_robot.py:296-302 adds U(-5,5) kg to the base; we express it as a
    scale so inertia stays consistent, matching recomputeInertia=True).
    """
    I_w = jnp.einsum("bij,bjk,blk->bil", k.R, model.body_inertia, k.R)
    return I_w * mass_scale[:, None, None], model.body_mass * mass_scale


@f32_matmul
def mass_matrix(
    model: RobotModel,
    k: FK,
    mask: jnp.ndarray,
    mass_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Dense (nv, nv) mass matrix."""
    J_ang, J_lin = body_jacobians(model, k, mask)  # (nb,3,nv)
    I_w, m = world_inertias(model, k, mass_scale)
    M_rot = jnp.einsum("biv,bij,bjw->vw", J_ang, I_w, J_ang)
    M_lin = jnp.einsum("b,biv,biw->vw", m, J_lin, J_lin)
    M = M_rot + M_lin
    # armature on joint DOFs
    arm = jnp.concatenate([jnp.zeros(6, M.dtype), model.dof_armature])
    return M + jnp.diag(arm)


@f32_matmul
def bias_forces(
    model: RobotModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    k: FK,
    mask: jnp.ndarray,
    mass_scale: jnp.ndarray,
) -> jnp.ndarray:
    """h(q,v) = C(q,v) v + g(q), shape (nv,)."""
    qdot = qpos_derivative(qpos, qvel)
    vel_fn = lambda qp: body_velocities(model, qp, qvel)
    bv, bacc = jax.jvp(vel_fn, (qpos,), (qdot,))
    alpha_bias = bacc.omega  # (nb,3) bias angular acceleration
    # bias acceleration of the *material* COM point: differentiate v_com
    a_com_bias = bacc.v_com
    I_w, m = world_inertias(model, k, mass_scale)
    f_ang = jnp.einsum("bij,bj->bi", I_w, alpha_bias) + jnp.cross(
        bv.omega, jnp.einsum("bij,bj->bi", I_w, bv.omega)
    )
    f_lin = m[:, None] * (a_com_bias - model.gravity[None, :])
    J_ang, J_lin = body_jacobians(model, k, mask)
    return jnp.einsum("biv,bi->v", J_ang, f_ang) + jnp.einsum("biv,bi->v", J_lin, f_lin)


@f32_matmul
def bias_forces_explicit(
    model: RobotModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    k: FK,
    mask: jnp.ndarray,
    mass_scale: jnp.ndarray,
) -> jnp.ndarray:
    """h(q,v) via explicit velocity/bias-acceleration propagation down the
    tree (one pass; no AD). Equivalent to bias_forces (cross-checked in
    tests/test_physics_oracle.py) but ~2 fewer FK evaluations per call —
    the dynamics is on the 1 kHz hot path, so op-chain length matters on TPU.

    World-frame recursion with qacc=0 (body origins sit at joint pivots):
      omega_b = omega_p + a_w qd        alpha_b = alpha_p + (omega_p x a_w) qd
      v_b = v_p + omega_p x r           a_b = a_p + alpha_p x r + omega_p x (omega_p x r)
    """
    omegas = [qvel[3:6]]
    alphas = [jnp.zeros(3, qpos.dtype)]
    v_orig = [qvel[0:3]]
    a_orig = [jnp.zeros(3, qpos.dtype)]
    for i, parent in enumerate(model.body_parent[1:]):
        w_p, al_p = omegas[parent], alphas[parent]
        v_p, a_p = v_orig[parent], a_orig[parent]
        r = k.pivot_w[i] - k.p[parent]
        wxr = jnp.cross(w_p, r)
        a_w = k.axis_w[i]
        qd = qvel[6 + i]
        omegas.append(w_p + a_w * qd)
        alphas.append(al_p + jnp.cross(w_p, a_w) * qd)
        v_orig.append(v_p + wxr)
        a_orig.append(a_p + jnp.cross(al_p, r) + jnp.cross(w_p, wxr))
    omega = jnp.stack(omegas)
    alpha = jnp.stack(alphas)
    v_o = jnp.stack(v_orig)
    a_o = jnp.stack(a_orig)
    rc = k.com - k.p
    a_com = a_o + jnp.cross(alpha, rc) + jnp.cross(omega, jnp.cross(omega, rc))

    I_w, m = world_inertias(model, k, mass_scale)
    f_ang = jnp.einsum("bij,bj->bi", I_w, alpha) + jnp.cross(
        omega, jnp.einsum("bij,bj->bi", I_w, omega)
    )
    f_lin = m[:, None] * (a_com - model.gravity[None, :])
    J_ang, J_lin = body_jacobians(model, k, mask)
    return jnp.einsum("biv,bi->v", J_ang, f_ang) + jnp.einsum("biv,bi->v", J_lin, f_lin)


class Dyn(NamedTuple):
    k: FK
    M: jnp.ndarray  # (nv,nv) (without implicit damping)
    Mtilde_chol: jnp.ndarray  # cholesky of M + dt*D
    h: jnp.ndarray  # (nv,)


@f32_matmul
def compute_dynamics(
    model: RobotModel,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    dt: float,
    implicit_damping: jnp.ndarray,  # (nj,) e.g. kd gains + URDF damping
    mass_scale: jnp.ndarray,  # (nb,)
) -> Dyn:
    k = fk(model, qpos)
    mask = ancestor_mask(model)
    M = mass_matrix(model, k, mask, mass_scale)
    h = bias_forces_explicit(model, qpos, qvel, k, mask, mass_scale)
    D = jnp.concatenate([jnp.zeros(6, M.dtype), implicit_damping])
    Mt = M + dt * jnp.diag(D)
    # unrolled straight-line Cholesky: XLA's lax.linalg lowers tiny batched
    # factorizations to while-loops that serialize badly on TPU (linalg.py)
    chol = chol_unrolled(Mt)
    return Dyn(k=k, M=M, Mtilde_chol=chol, h=h)


def solve_mtilde(chol: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (M + dt D) x = rhs via the cached Cholesky factor.

    rhs may be (nv,) or (nv, k). Unrolled substitution (see linalg.py).
    """
    return solve_spd_chol(chol, rhs)
