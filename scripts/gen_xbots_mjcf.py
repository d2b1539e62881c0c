"""Generate the XBot-S MuJoCo validation model.

The reference claims zero-shot sim2real on BOTH XBot-S (1.2 m) and XBot-L
(1.65 m) (reference README.md:19) but ships assets only for XBot-L. This
writes resources/robots/XBot-S/mjcf/XBot-S.xml from the Froude-scaled
XBot-S RobotModel (utils/scale_urdf.py + config/xbots.py): floating base
at standing height, per-DOF torque motors at the scaled effort limits,
IMU 'orientation'/'angular-velocity' sensors (the deployment loop's
inputs), plane + 16 sole contact spheres, and the controller kd baked
into joint damping (implicit integration — explicit -kd*dq at dt = 1 ms
is unstable on the scaled, nearly massless ankle bodies; same PD law).

Usage: JAX_PLATFORMS=cpu python scripts/gen_xbots_mjcf.py
Deterministic: reruns reproduce the committed asset byte-for-byte.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from humanoid_gym_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np  # noqa: E402

from humanoid_gym_tpu import HGT_ROOT_DIR  # noqa: E402
from humanoid_gym_tpu.config.xbots import SCALE, XBotSCfg  # noqa: E402
from humanoid_gym_tpu.physics.mjcf_export import model_to_mjcf  # noqa: E402
from humanoid_gym_tpu.physics.model import build_model_from_urdf  # noqa: E402


def main():
    cfg = XBotSCfg()
    m = build_model_from_urdf(
        cfg.asset.file,
        dof_order=list(cfg.init_state.default_joint_angles.keys()),
        foot_name=cfg.asset.foot_name,
        knee_name=cfg.asset.knee_name,
        termination_names=tuple(cfg.asset.terminate_after_contacts_on),
        penalized_names=tuple(cfg.asset.penalize_contacts_on),
        armature=cfg.asset.armature,
        mesh_dir=cfg.asset.mesh_dir,
    )
    kd = np.array([10.0] * 12) * SCALE**4.5  # config/xbots.py damping
    xml = model_to_mjcf(
        m,
        armature=cfg.asset.armature,
        with_contacts=True,
        friction=0.9,  # reference XBot-L.xml geom friction
        joint_damping=np.asarray(m.dof_damping) + kd,
        deployable=True,
        base_z=float(cfg.init_state.pos[2]),
    )
    out = os.path.join(
        HGT_ROOT_DIR, "resources", "robots", "XBot-S", "mjcf", "XBot-S.xml"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(xml)
    print(f"wrote {out} ({len(xml)} bytes)")

    # Deployment-terrain variant: the SAME uneven.png as the XBot-L hfield
    # (reference XBot-L-terrain.xml:151 size="50 50 0.35 0.1") with every
    # extent Froude-scaled by s — cells 1 m -> 0.73 m, mounds 0.35 -> 0.25 m
    # — so the S morphology faces the same RELATIVE footing difficulty the
    # L standings measure (docs/standings/RESULTS.md).
    xml_t = model_to_mjcf(
        m,
        armature=cfg.asset.armature,
        with_contacts=True,
        friction=0.9,
        joint_damping=np.asarray(m.dof_damping) + kd,
        deployable=True,
        base_z=float(cfg.init_state.pos[2]),
        hfield_png="../../XBot-L/terrain/uneven.png",
        hfield_size=(50 * SCALE, 50 * SCALE, 0.35 * SCALE, 0.1 * SCALE),
    )
    out_t = os.path.join(
        HGT_ROOT_DIR, "resources", "robots", "XBot-S", "mjcf",
        "XBot-S-terrain.xml",
    )
    with open(out_t, "w") as f:
        f.write(xml_t)
    print(f"wrote {out_t} ({len(xml_t)} bytes)")


if __name__ == "__main__":
    main()
