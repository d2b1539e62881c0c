"""Generate a minimal MJCF from a RobotModel for MuJoCo oracle tests.

The exported model has the exact same bodies/joints/inertias as the JAX
engine's RobotModel, with a floating base, no geoms (contact-free) — so
MuJoCo's mj_fullM / mj_rne / mj_forward ground-truth the engine's FK, mass
matrix, bias forces and free dynamics on identical parameters.

Test-infrastructure only; never on the training path.
"""

from __future__ import annotations

import numpy as np

from .urdf import mat_to_quat_wxyz
from .model import RobotModel


def model_to_mjcf(model: RobotModel, armature: float = 0.0) -> str:
    mass = np.asarray(model.body_mass)
    com = np.asarray(model.body_com)
    inertia = np.asarray(model.body_inertia)
    jpos = np.asarray(model.joint_pos)
    jrot = np.asarray(model.joint_rot)
    jaxis = np.asarray(model.joint_axis)
    lower = np.asarray(model.dof_lower)
    upper = np.asarray(model.dof_upper)

    def fmt(v):
        return " ".join(f"{x:.10g}" for x in np.atleast_1d(v))

    def body_xml(i: int, depth: int) -> str:
        ind = "  " * depth
        name = model.body_names[i]
        # full inertia via eigendecomposition -> principal frame
        w, V = np.linalg.eigh(inertia[i])
        if np.linalg.det(V) < 0:
            V = -V
        q_i = mat_to_quat_wxyz(V)
        lines = []
        if i == 0:
            lines.append(f'{ind}<body name="{name}" pos="0 0 0">')
            lines.append(f'{ind}  <freejoint name="root"/>')
        else:
            q_j = mat_to_quat_wxyz(jrot[i - 1])
            lines.append(
                f'{ind}<body name="{name}" pos="{fmt(jpos[i-1])}" quat="{fmt(q_j)}">'
            )
            lines.append(
                f'{ind}  <joint name="{model.dof_names[i-1]}" type="hinge" '
                f'axis="{fmt(jaxis[i-1])}" range="{lower[i-1]:.10g} {upper[i-1]:.10g}" '
                f'limited="false" damping="0" armature="{armature}" frictionloss="0"/>'
            )
        lines.append(
            f'{ind}  <inertial pos="{fmt(com[i])}" quat="{fmt(q_i)}" '
            f'mass="{mass[i]:.10g}" diaginertia="{fmt(np.maximum(w, 1e-12))}"/>'
        )
        for c, par in enumerate(model.body_parent):
            if par == i:
                lines.append(body_xml(c, depth + 1))
        lines.append(f"{ind}</body>")
        return "\n".join(lines)

    return f"""<mujoco model="hgt-oracle">
  <compiler angle="radian"/>
  <option timestep="0.001" gravity="0 0 -9.81" integrator="Euler"/>
  <worldbody>
{body_xml(0, 2)}
  </worldbody>
</mujoco>
"""
