"""Actor-critic MLPs (flax.linen).

Architecture contract from the reference (humanoid/algo/ppo/actor_critic.py:
36-127): two independent ELU MLPs — actor obs->hidden dims->num_actions
(mean), critic priv_obs->hidden dims->1 (value) — plus a state-independent
learned std stored as a *raw* parameter initialized to init_noise_std
(actor_critic.py:80), exactly as the reference optimizes it (no softplus
reparameterization; Adam sees std directly).

Big, batched matmuls in bfloat16-friendly shapes: the (minibatch, 705)x(705,
512) products are the MXU work of the learning phase.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class ActorCritic(nn.Module):
    num_actions: int
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (768, 256, 128)
    init_noise_std: float = 1.0
    # DWL-style state-estimation head (BASELINE config[4]): predicts
    # privileged quantities (base linear velocity) from the deployable actor
    # observation; trained supervised alongside PPO, exported for real-robot
    # state estimation. 0 disables (default — reference parity).
    estimator_dim: int = 0
    estimator_hidden: Sequence[int] = (256, 128)

    def setup(self):
        self.actor = MLP(self.actor_hidden, self.num_actions)
        self.critic = MLP(self.critic_hidden, 1)
        self.std = self.param(
            "std", lambda key: jnp.full((self.num_actions,), self.init_noise_std)
        )
        if self.estimator_dim > 0:
            self.estimator = MLP(self.estimator_hidden, self.estimator_dim)

    def __call__(self, obs, priv_obs) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(mean, std, value) — used for parameter init."""
        mean = self.actor(obs)
        value = self.critic(priv_obs)[..., 0]
        if self.estimator_dim > 0:
            _ = self.estimator(obs)  # touch so init creates the head
        return mean, self.std, value

    def act(self, obs):
        """Policy distribution parameters (reference actor_critic.py:111-120).

        The std is a raw learned parameter as in the reference; a small floor
        guards the log/KL math against a gradient step pushing a component
        nonpositive (a known rsl_rl-family failure mode)."""
        return self.actor(obs), jnp.maximum(self.std, 1e-3)

    def evaluate(self, priv_obs):
        """State value (reference actor_critic.py:126-127)."""
        return self.critic(priv_obs)[..., 0]

    def act_inference(self, obs):
        """Deterministic action = mean (reference actor_critic.py:122-124)."""
        return self.actor(obs)

    def estimate(self, obs):
        """Privileged-state estimate from deployable obs (DWL-style head)."""
        return self.estimator(obs)


def normal_log_prob(mean, std, x):
    """Diagonal Gaussian log-density, summed over the action axis."""
    var = jnp.square(std)
    lp = -0.5 * (jnp.square(x - mean) / var + jnp.log(2 * jnp.pi * var))
    return jnp.sum(lp, axis=-1)


def normal_entropy(std, batch_shape):
    """Entropy summed over the action axis (actor_critic.py:107-109)."""
    ent = jnp.sum(0.5 * jnp.log(2 * jnp.pi * jnp.e * jnp.square(std)))
    return jnp.broadcast_to(ent, batch_shape)
