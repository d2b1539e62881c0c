"""Actor-critic MLPs (flax.linen).

Architecture contract from the reference (humanoid/algo/ppo/actor_critic.py:
36-127): two independent ELU MLPs — actor obs->hidden dims->num_actions
(mean), critic priv_obs->hidden dims->1 (value) — plus a state-independent
learned std stored as a *raw* parameter initialized to init_noise_std
(actor_critic.py:80), exactly as the reference optimizes it (no softplus
reparameterization; Adam sees std directly).

Big, batched matmuls in bfloat16-friendly shapes: the (minibatch, 705)x(705,
512) products are the MXU work of the learning phase.

Mixed precision (round 4): with compute_dtype="bfloat16" the HIDDEN-layer
matmuls run in bf16 on the MXU (f32 master params, MXU accumulates in f32,
flax casts kernel+activations per layer); each MLP's OUTPUT layer and
everything distributional (action mean head, std, value head, log-prob/KL
math in ppo.py) stays f32. The default "auto" resolves to bf16 on
accelerators and f32 on CPU — CPU test goldens stay bit-stable while the
TPU path takes the 2x MXU rate. Fidelity-gated: the production recipe
retrained under bf16 must hold its flat-MuJoCo and hfield transfer
(docs/ROUND4.md); 98% of the train iteration's FLOPs are these nets
(scripts/roofline.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def resolve_compute_dtype(name: str = "auto"):
    """'auto' -> bf16 on accelerators, f32 on CPU; else the named dtype."""
    if name in (None, "", "auto"):
        import jax

        return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    dtype: type = jnp.float32  # compute dtype of the HIDDEN matmuls

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h, dtype=self.dtype)(x))
        # output layer in f32: casts bf16 activations up, so the head
        # matmul and everything downstream (log-probs, values) are f32
        return nn.Dense(self.out, dtype=jnp.float32)(x)


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
    # "auto" | "float32" | "bfloat16" — see resolve_compute_dtype
    compute_dtype: str = "auto"

    def setup(self):
        dt = resolve_compute_dtype(self.compute_dtype)
        self.actor = MLP(self.actor_hidden, self.num_actions, dtype=dt)
        self.critic = MLP(self.critic_hidden, 1, dtype=dt)
        self.std = self.param(
            "std", lambda key: jnp.full((self.num_actions,), self.init_noise_std)
        )
        if self.estimator_dim > 0:
            self.estimator = MLP(
                self.estimator_hidden, self.estimator_dim, dtype=dt
            )

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
