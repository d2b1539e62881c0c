"""PPO as a single jitted, sharded program.

Re-designs the reference's torch PPO stack (humanoid/algo/ppo/: ActorCritic,
PPO, RolloutStorage, OnPolicyRunner) TPU-natively: the whole train iteration —
rollout scan over the horizon, GAE reverse scan, minibatched clipped-PPO
epochs with KL-adaptive LR — is one pure function jitted end-to-end; batch
statistics (advantage normalization, KL mean) are global reductions that XLA
lowers to collectives when the env axis is sharded over a mesh.
"""

from .networks import ActorCritic
from .ppo import PPOConfig, TrainState, make_train_iter

__all__ = ["ActorCritic", "PPOConfig", "TrainState", "make_train_iter"]
