"""Forward kinematics, body velocities, and point Jacobians.

Pure functions over a single environment's state; batch with vmap. The tree
is unrolled at trace time (13 bodies), producing straight-line XLA code with
no dynamic control flow — the shape XLA fuses best.

Replaces the capability of Isaac Gym's rigid-body state tensors
(reference legged_robot.py:438-457: root/dof/rigid-body views).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


def f32_matmul(fn):
    """Run fn under full-f32 matmul precision.

    Rotation chains and small dense solves need true float32; the TPU default
    (bf16 MXU passes) loses ~1e-3 — catastrophic over 1000 Hz integration.
    These matrices are tiny, so MXU throughput is irrelevant here; the big
    policy matmuls keep the default fast path.
    """

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped

from . import spatial as S
from .model import RobotModel


class FK(NamedTuple):
    R: jnp.ndarray  # (nb,3,3) body frame rotation (world)
    p: jnp.ndarray  # (nb,3) body frame origin (world)
    com: jnp.ndarray  # (nb,3) body COM (world)
    axis_w: jnp.ndarray  # (nj,3) world joint axes
    pivot_w: jnp.ndarray  # (nj,3) world joint origins


@f32_matmul
def fk(model: RobotModel, qpos: jnp.ndarray) -> FK:
    """qpos: (nq,) = [pos(3), quat wxyz(4), q_joints(nj)]."""
    base_p = qpos[0:3]
    base_R = S.quat_to_mat(qpos[3:7])
    qj = qpos[7:]

    Rs = [base_R]
    ps = [base_p]
    axes = []
    pivots = []
    for i, parent in enumerate(model.body_parent[1:]):
        Rp, pp = Rs[parent], ps[parent]
        Rj = Rp @ model.joint_rot[i]
        pj = Rp @ model.joint_pos[i] + pp
        a = model.joint_axis[i]
        q = S.quat_from_axis_angle(a, qj[i])
        Rb = Rj @ S.quat_to_mat(q)
        Rs.append(Rb)
        ps.append(pj)
        axes.append(Rj @ a)
        pivots.append(pj)
    R = jnp.stack(Rs)
    p = jnp.stack(ps)
    com = p + jnp.einsum("bij,bj->bi", R, model.body_com)
    return FK(R=R, p=p, com=com, axis_w=jnp.stack(axes), pivot_w=jnp.stack(pivots))


class BodyVel(NamedTuple):
    omega: jnp.ndarray  # (nb,3) world angular velocity
    v_origin: jnp.ndarray  # (nb,3) world linear velocity of body frame origin
    v_com: jnp.ndarray  # (nb,3) world linear velocity of body COM


@f32_matmul
def body_velocities(model: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray) -> BodyVel:
    """Propagate spatial velocities down the tree.

    qvel layout: [v_base_world(3), omega_base_world(3), qdot_joints(nj)].
    Differentiable in qpos (used with jvp to obtain bias accelerations).
    """
    k = fk(model, qpos)
    omegas = [qvel[3:6]]
    v_orig = [qvel[0:3]]
    for i, parent in enumerate(model.body_parent[1:]):
        w_p = omegas[parent]
        v_p = v_orig[parent]
        # joint origin is a material point of the parent body
        v_o = v_p + jnp.cross(w_p, k.pivot_w[i] - k.p[parent])
        w_b = w_p + k.axis_w[i] * qvel[6 + i]
        omegas.append(w_b)
        v_orig.append(v_o)
    omega = jnp.stack(omegas)
    v_origin = jnp.stack(v_orig)
    v_com = v_origin + jnp.cross(omega, k.com - k.p)
    return BodyVel(omega=omega, v_origin=v_origin, v_com=v_com)


class DofBasis(NamedTuple):
    """Per-DOF screw data for assembling Jacobians at arbitrary points.

    For DOF column c and a world point x attached to a body whose ancestor set
    includes c:
      angular contribution = ang[c]
      linear contribution  = ang[c] x (x - pivot[c]) + lin[c]
    """

    ang: jnp.ndarray  # (nv,3)
    lin: jnp.ndarray  # (nv,3)
    pivot: jnp.ndarray  # (nv,3)


def dof_basis(model: RobotModel, k: FK) -> DofBasis:
    nv = model.nv
    eye3 = jnp.eye(3, dtype=k.p.dtype)
    ang = jnp.concatenate([jnp.zeros((3, 3), k.p.dtype), eye3, k.axis_w], axis=0)
    lin = jnp.concatenate(
        [eye3, jnp.zeros((3, 3), k.p.dtype), jnp.zeros((model.nj, 3), k.p.dtype)], axis=0
    )
    pivot = jnp.concatenate(
        [jnp.zeros((3, 3), k.p.dtype), jnp.tile(k.p[0], (3, 1)), k.pivot_w], axis=0
    )
    assert ang.shape == (nv, 3)
    return DofBasis(ang=ang, lin=lin, pivot=pivot)


def ancestor_mask(model: RobotModel) -> jnp.ndarray:
    """(nb, nv) static 0/1 mask: which DOF columns move each body."""
    import numpy as np

    nb, nv, nj = model.nbody, model.nv, model.nj
    m = np.zeros((nb, nv), dtype=np.float32)
    m[:, :6] = 1.0  # free base moves everything
    for b in range(1, nb):
        cur = b
        while cur != 0:
            m[b, 6 + cur - 1] = 1.0  # joint i connects body i+1... see note below
            cur = model.body_parent[cur]
    return jnp.asarray(m)


def point_jacobian(
    basis: DofBasis, mask_row: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """Linear-velocity Jacobian (3, nv) of world point x on the body whose
    ancestor mask row is mask_row."""
    lin = jnp.cross(basis.ang, x[None, :] - basis.pivot) + basis.lin  # (nv,3)
    return (lin * mask_row[:, None]).T


def body_jacobians(model: RobotModel, k: FK, mask: jnp.ndarray):
    """Full 6D Jacobians at body COMs.

    Returns (J_ang, J_lin): each (nb, 3, nv). Row b gives world angular /
    COM-linear velocity of body b as J @ qvel.
    """
    basis = dof_basis(model, k)
    # (nb, nv, 3)
    lin = jnp.cross(
        basis.ang[None, :, :], k.com[:, None, :] - basis.pivot[None, :, :]
    ) + basis.lin[None, :, :]
    ang = jnp.broadcast_to(basis.ang[None], (model.nbody,) + basis.ang.shape)
    m = mask[:, :, None]
    J_ang = jnp.swapaxes(ang * m, 1, 2)
    J_lin = jnp.swapaxes(lin * m, 1, 2)
    return J_ang, J_lin
