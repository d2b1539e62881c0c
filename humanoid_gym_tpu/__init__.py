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
# Robot assets live in the reference checkout; paths resolved through config.
XBOT_URDF = os.environ.get(
    "HGT_XBOT_URDF",
    "/root/reference/resources/robots/XBot/urdf/XBot-L.urdf",
)
XBOT_MJCF = os.environ.get(
    "HGT_XBOT_MJCF",
    "/root/reference/resources/robots/XBot/mjcf/XBot-L.xml",
)

__version__ = "0.1.0"
