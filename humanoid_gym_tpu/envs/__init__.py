"""Pure-functional legged-robot environments.

The environment is an explicit state pytree plus a pure, jittable step
function — the TPU-native re-design of the reference's stateful
object-oriented env stack (reference humanoid/envs/base/legged_robot.py,
humanoid/envs/custom/humanoid_env.py). All per-step host<->device traffic and
indexed resets of the reference collapse into one fused XLA program with
masked auto-resets.
"""

from .env import HumanoidEnv, Transition, make_env
from .state import EnvState

__all__ = ["EnvState", "HumanoidEnv", "Transition", "make_env"]
