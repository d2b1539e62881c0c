"""RobotModel: the static description of the articulated system, as arrays.

Built once on host from the URDF (see urdf.py), then used inside jitted,
vmapped, sharded programs. Replaces the capability of Isaac Gym's asset +
actor machinery (reference legged_robot.py:588-681) with an explicit,
functional data structure.

Layout (XBot-L after fixed-joint collapse):
  bodies: 0=base_link, 1..6 left leg chain, 7..12 right leg chain
  qpos (nq=19): [pos(3), quat wxyz(4), joint angles(12)]
  qvel (nv=18): [v_world(3), omega_world(3), joint vels(12)]
DOF columns of every Jacobian follow qvel layout.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

from . import urdf as U


@struct.dataclass
class RobotModel:
    # --- static topology / metadata (not traced) ---
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    dof_names: Tuple[str, ...] = struct.field(pytree_node=False)
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)  # -1 for base
    feet_body_idx: Tuple[int, ...] = struct.field(pytree_node=False)
    knee_body_idx: Tuple[int, ...] = struct.field(pytree_node=False)
    termination_body_idx: Tuple[int, ...] = struct.field(pytree_node=False)
    penalized_body_idx: Tuple[int, ...] = struct.field(pytree_node=False)
    contact_point_body: Tuple[int, ...] = struct.field(pytree_node=False)  # per candidate
    probe_point_body: Tuple[int, ...] = struct.field(pytree_node=False)  # detection-only pts

    # --- arrays (leaves) ---
    joint_pos: jnp.ndarray  # (nj,3) joint origin in parent body frame
    joint_rot: jnp.ndarray  # (nj,3,3) joint frame rotation in parent body frame
    joint_axis: jnp.ndarray  # (nj,3) axis in joint(child) frame
    body_mass: jnp.ndarray  # (nb,)
    body_com: jnp.ndarray  # (nb,3) in body frame
    body_inertia: jnp.ndarray  # (nb,3,3) about COM, body frame
    dof_lower: jnp.ndarray  # (nj,)
    dof_upper: jnp.ndarray  # (nj,)
    dof_effort: jnp.ndarray  # (nj,) URDF effort limit
    dof_vel_limit: jnp.ndarray  # (nj,)
    dof_damping: jnp.ndarray  # (nj,) URDF viscous damping
    dof_friction: jnp.ndarray  # (nj,) URDF Coulomb friction
    dof_armature: jnp.ndarray  # (nj,)
    contact_point_offset: jnp.ndarray  # (K,3) in owning body frame (force-solved)
    probe_point_offset: jnp.ndarray  # (P,3) detection-only candidates
    gravity: jnp.ndarray  # (3,)

    @property
    def nbody(self) -> int:
        return len(self.body_parent)

    @property
    def nj(self) -> int:
        return len(self.dof_names)

    @property
    def nv(self) -> int:
        return 6 + self.nj

    @property
    def nq(self) -> int:
        return 7 + self.nj

    @property
    def ncon(self) -> int:
        return len(self.contact_point_body)

    def contact_point_runs(self) -> Tuple[Tuple[int, int, int], ...]:
        """Contiguous (body, start, end) runs over contact_point_body.

        THE single source of the per-foot contact-point grouping: the
        OUT_FF row layout (foot-major, xyz-minor) of every solver path —
        mega kernel, XLA fallback, and the per-foot force consumer in
        step.py — is derived from this ordering."""
        runs = []
        cb = self.contact_point_body
        g0 = 0
        for k in range(1, len(cb) + 1):
            if k == len(cb) or cb[k] != cb[g0]:
                runs.append((cb[g0], g0, k))
                g0 = k
        return tuple(runs)


def _fk_numpy(bodies, qpos_joints: np.ndarray):
    """Host-side FK at a given joint configuration (identity base). Returns
    per-body (R, p) in base frame. Used only at model-build time."""
    R = [np.eye(3)]
    p = [np.zeros(3)]
    for b in bodies[1:]:
        Rp, pp = R[b.parent], p[b.parent]
        Rj = Rp @ b.joint_rot
        pj = Rp @ b.joint_pos + pp
        axis = b.joint.axis
        ang = qpos_joints[len(R) - 1] if len(qpos_joints) else 0.0
        c, s = np.cos(ang), np.sin(ang)
        a = axis / np.linalg.norm(axis)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        Raxis = np.eye(3) + s * K + (1 - c) * (K @ K)
        R.append(Rj @ Raxis)
        p.append(pj)
    return np.stack(R), np.stack(p)


def build_model_from_urdf(
    urdf_path: str,
    dof_order,
    foot_name: str = "ankle_roll",
    knee_name: str = "knee",
    termination_names=("base_link",),
    penalized_names=("base_link",),
    mesh_dir: str | None = None,
    gravity=(0.0, 0.0, -9.81),
    armature: float = 0.0,
    dtype=jnp.float32,
) -> RobotModel:
    """Parse URDF, collapse fixed joints, extract contact candidates."""
    import os

    parsed = U.parse_urdf(urdf_path)
    bodies = U.collapse_fixed_joints(parsed, dof_order=list(dof_order))
    if mesh_dir is None:
        mesh_dir = os.path.normpath(os.path.join(os.path.dirname(urdf_path), "..", "meshes"))

    body_names = tuple(b.name for b in bodies)
    nb = len(bodies)
    feet_idx = tuple(i for i, n in enumerate(body_names) if foot_name in n)
    knee_idx = tuple(i for i, n in enumerate(body_names) if knee_name in n)
    term_idx = tuple(
        i for i, n in enumerate(body_names) if any(t in n for t in termination_names)
    )
    pen_idx = tuple(
        i for i, n in enumerate(body_names) if any(t in n for t in penalized_names)
    )

    # --- contact candidates -------------------------------------------------
    # Force-solved candidates: sole points of each foot, extracted from the
    # collision mesh. 'Down' in the foot frame is found from FK at the default
    # (zero) pose: the direction that maps to world -z.
    Rfk, _ = _fk_numpy(bodies, np.zeros(len(dof_order)))
    contact_body: list[int] = []
    contact_off: list[np.ndarray] = []
    for fi in feet_idx:
        down_local = Rfk[fi].T @ np.array([0.0, 0.0, -1.0])
        mesh_col = next(
            ((X, c) for (X, c) in bodies[fi].collisions if c.kind == "mesh"), None
        )
        assert mesh_col is not None, f"foot body {body_names[fi]} has no collision mesh"
        X, col = mesh_col
        fname = os.path.basename(col.mesh_file)
        pts_link = U.foot_sole_points(os.path.join(mesh_dir, fname), X.R.T @ down_local)
        if col.mesh_scale is not None:
            pts_link = pts_link * col.mesh_scale[None, :]
        pts_body = (X.R @ pts_link.T).T + X.p
        for pt in pts_body:
            contact_body.append(fi)
            contact_off.append(pt)

    # Detection-only probes: corners of the base collision box (termination /
    # collision-penalty checks: reference legged_robot.py:156-161 uses contact
    # force >1N on base_link; geometric penetration is the equivalent signal).
    probe_body: list[int] = []
    probe_off: list[np.ndarray] = []
    for ti in sorted(set(term_idx) | set(pen_idx)):
        for X, c in bodies[ti].collisions:
            if c.kind == "box":
                sx, sy, sz = c.size / 2.0
                for dx in (-sx, sx):
                    for dy in (-sy, sy):
                        for dz in (-sz, sz):
                            probe_body.append(ti)
                            probe_off.append(X.apply(np.array([dx, dy, dz])))

    nj = len(dof_order)
    model = RobotModel(
        body_names=body_names,
        dof_names=tuple(dof_order),
        body_parent=tuple(b.parent for b in bodies),
        feet_body_idx=feet_idx,
        knee_body_idx=knee_idx,
        termination_body_idx=term_idx,
        penalized_body_idx=pen_idx,
        contact_point_body=tuple(contact_body),
        probe_point_body=tuple(probe_body),
        joint_pos=jnp.asarray(np.stack([b.joint_pos for b in bodies[1:]]), dtype),
        joint_rot=jnp.asarray(np.stack([b.joint_rot for b in bodies[1:]]), dtype),
        joint_axis=jnp.asarray(np.stack([b.joint.axis for b in bodies[1:]]), dtype),
        body_mass=jnp.asarray(np.array([b.mass for b in bodies]), dtype),
        body_com=jnp.asarray(np.stack([b.com for b in bodies]), dtype),
        body_inertia=jnp.asarray(np.stack([b.inertia for b in bodies]), dtype),
        dof_lower=jnp.asarray(np.array([b.joint.lower for b in bodies[1:]]), dtype),
        dof_upper=jnp.asarray(np.array([b.joint.upper for b in bodies[1:]]), dtype),
        dof_effort=jnp.asarray(np.array([b.joint.effort for b in bodies[1:]]), dtype),
        dof_vel_limit=jnp.asarray(np.array([b.joint.velocity for b in bodies[1:]]), dtype),
        dof_damping=jnp.asarray(np.array([b.joint.damping for b in bodies[1:]]), dtype),
        dof_friction=jnp.asarray(np.array([b.joint.friction for b in bodies[1:]]), dtype),
        dof_armature=jnp.full((nj,), armature, dtype),
        contact_point_offset=jnp.asarray(np.stack(contact_off), dtype),
        probe_point_offset=jnp.asarray(
            np.stack(probe_off) if probe_off else np.zeros((0, 3)), dtype
        ),
        gravity=jnp.asarray(np.array(gravity), dtype),
    )
    return model


def build_xbot_model(urdf_path: str | None = None, **kw) -> RobotModel:
    from .. import XBOT_URDF
    from ..config.xbotl import XBOT_DOF_NAMES

    return build_model_from_urdf(
        urdf_path or XBOT_URDF,
        dof_order=XBOT_DOF_NAMES,
        foot_name="ankle_roll",
        knee_name="knee",
        termination_names=("base_link",),
        penalized_names=("base_link",),
        **kw,
    )
