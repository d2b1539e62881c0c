"""humanoid_gym_tpu: a TPU-native humanoid locomotion RL framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
``roboterax/humanoid-gym`` (reference mounted read-only at /root/reference):

- ``physics/``  : batched articulated rigid-body engine (replaces Isaac Gym's
  closed-source PhysX core; see reference humanoid/envs/base/legged_robot.py:84-117
  for the capability it provides). Pure functions, vmap over envs, shardable.
- ``envs/``     : pure-functional legged-robot environments reproducing the
  reference numerical contract (obs layout, 22 reward terms, DR, resets).
- ``algo/``     : PPO as a single jitted, sharded program (rollout scan + GAE +
  minibatch epochs), mirroring reference humanoid/algo/ppo semantics.
- ``parallel/`` : device-mesh construction and sharding rules (env axis sharded,
  params replicated, psum-reduced statistics).
- ``terrain/``  : heightfield synthesis + lookup (reference humanoid/utils/terrain.py).
- ``export/``   : deployment artifacts + MuJoCo sim2sim validation path
  (reference humanoid/scripts/sim2sim.py).
"""

import os

HGT_ROOT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# XBot-L robot assets (URDF + MJCF + meshes + deployment heightfield) are
# vendored under resources/robots/XBot-L so the framework runs standalone;
# HGT_XBOT_* env vars still override (e.g. to point at another checkout).
_XBOT_L_DIR = os.path.join(HGT_ROOT_DIR, "resources", "robots", "XBot-L")
XBOT_URDF = os.environ.get(
    "HGT_XBOT_URDF", os.path.join(_XBOT_L_DIR, "urdf", "XBot-L.urdf")
)
XBOT_MJCF = os.environ.get(
    "HGT_XBOT_MJCF", os.path.join(_XBOT_L_DIR, "mjcf", "XBot-L.xml")
)
XBOT_TERRAIN_MJCF = os.environ.get(
    "HGT_XBOT_TERRAIN_MJCF",
    os.path.join(_XBOT_L_DIR, "mjcf", "XBot-L-terrain.xml"),
)
# XBot-S validation model (generated — scripts/gen_xbots_mjcf.py; the
# reference ships no XBot-S assets despite claiming sim2real on it,
# README.md:19)
XBOT_S_MJCF = os.environ.get(
    "HGT_XBOT_S_MJCF",
    os.path.join(
        HGT_ROOT_DIR, "resources", "robots", "XBot-S", "mjcf", "XBot-S.xml"
    ),
)
# Froude-scaled deployment-terrain variant (same uneven.png, extents x s)
XBOT_S_TERRAIN_MJCF = os.environ.get(
    "HGT_XBOT_S_TERRAIN_MJCF",
    os.path.join(
        HGT_ROOT_DIR, "resources", "robots", "XBot-S", "mjcf",
        "XBot-S-terrain.xml",
    ),
)

__version__ = "0.1.0"
