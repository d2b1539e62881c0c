"""XBot-S task configuration: Froude-scaled variant of XBot-L.

The reference supports XBot-S (1.2 m) on real hardware (README.md:19) but
ships no assets for it; this config drives a dynamically consistent scaled
model synthesized from the XBot-L URDF (utils/scale_urdf.py). Scale
s = 1.2/1.65; Froude scaling gives time ~ sqrt(s), velocity ~ sqrt(s),
torque ~ s^4 — so kp x s^4, kd x s^4.5, gait cycle x sqrt(s), heights x s.
"""

from __future__ import annotations

import math
import os

from . import base as B
from .xbotl import XBotLCfg, XBotLCfgPPO

SCALE = 1.2 / 1.65
_SQ = math.sqrt(SCALE)


def XBotSCfg() -> B.LeggedRobotCfg:
    from ..utils.scale_urdf import ensure_xbot_s

    cfg = XBotLCfg()
    s = SCALE

    cfg.asset.file = ensure_xbot_s()
    cfg.asset.name = "XBot-S"
    # meshes are shared with XBot-L (geometry scaled via URDF mesh scale)
    cfg.asset.mesh_dir = os.path.normpath(
        os.path.join(os.path.dirname(XBotLCfg().asset.file), "..", "meshes")
    )

    # lengths/heights x s
    cfg.init_state.pos = [0.0, 0.0, 0.95 * s]
    cfg.rewards.base_height_target = 0.89 * s
    cfg.rewards.min_dist = 0.2 * s
    cfg.rewards.max_dist = 0.5 * s
    cfg.rewards.target_feet_height = 0.06 * s
    cfg.rewards.sole_offset = 0.05 * s

    # time x sqrt(s)
    cfg.rewards.cycle_time = 0.64 * _SQ

    # torques x s^4, damping x s^4.5
    cfg.control.stiffness = {k: v * s**4 for k, v in cfg.control.stiffness.items()}
    cfg.control.damping = {k: v * s**4.5 for k, v in cfg.control.damping.items()}

    # command velocities x sqrt(s) (Froude speed)
    r = cfg.commands.ranges
    r.lin_vel_x = [v * _SQ for v in r.lin_vel_x]
    r.lin_vel_y = [v * _SQ for v in r.lin_vel_y]

    # terrain x s (round 5, VERDICT #4): menu HEIGHT amplitudes scale at
    # map-build time so the S half of joint training faces the same
    # RELATIVE footing difficulty as L even when task recipes set
    # absolute amplitudes afterward (terrain/terrain.py froude_scale),
    # and the deploy-style menu samples the Froude-scaled deployment
    # field (XBot-S-terrain.xml) instead of the full-size one. Before
    # this, S trained on unscaled L terrain (1.37x relative amplitude)
    # with no morphology-consistent curriculum signal of its own.
    cfg.terrain.froude_scale = s
    from .. import XBOT_S_TERRAIN_MJCF

    cfg.terrain.deploy_mjcf = XBOT_S_TERRAIN_MJCF

    # pushes x sqrt(s)
    cfg.domain_rand.max_push_vel_xy *= _SQ
    # base-mass DR x s^3 (same relative range)
    cfg.domain_rand.added_mass_range = [
        v * s**3 for v in cfg.domain_rand.added_mass_range
    ]

    return cfg


def XBotSCfgPPO() -> B.PPOCfg:
    cfg = XBotLCfgPPO()
    cfg.runner.experiment_name = "XBotS_ppo"
    return cfg
