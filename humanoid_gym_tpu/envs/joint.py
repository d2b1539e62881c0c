"""Joint multi-robot environment: heterogeneous robots in one batch.

BASELINE config[4] asks for XBot-S + XBot-L trained *jointly*. Both tasks
share the observation/action contract (47-dim frames x15, 73x3 privileged,
12 actions), so one policy can drive both: the batch is split at static
boundaries, each slice stepped by its robot's own physics/env closures, and
the transitions concatenated. Everything stays jittable (static split sizes,
two vmapped sub-programs) and shards over the mesh like any env batch —
chips simply own slices of possibly different robots.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from .env import HumanoidEnv


class JointEnv:
    """Wraps N sub-envs with identical obs/action dims into one batch.

    counts[i] envs of each sub-env, concatenated in order. Exposes the same
    step/init_state/reset_all surface as HumanoidEnv.
    """

    def __init__(self, envs: Sequence[HumanoidEnv], counts: Sequence[int]):
        assert len(envs) == len(counts) and len(envs) >= 1
        e0 = envs[0]
        for e in envs[1:]:
            assert e.cfg.env.num_single_obs == e0.cfg.env.num_single_obs
            assert (
                e.cfg.env.single_num_privileged_obs
                == e0.cfg.env.single_num_privileged_obs
            )
            assert e.num_actions == e0.num_actions
            assert e.n_reward_terms == e0.n_reward_terms, (
                "reward term sets must match for concatenated episode sums"
            )
        self.envs = list(envs)
        self.counts = list(counts)
        self.num_envs = sum(counts)
        self.num_actions = e0.num_actions
        self.cfg = e0.cfg
        self.dt = e0.dt
        self.max_episode_length = max(e.max_episode_length for e in envs)
        self.reward_names = e0.reward_names
        self.model = e0.model  # flagship model (for tooling that needs one)

        self._offsets = []
        off = 0
        for c in counts:
            self._offsets.append(off)
            off += c

    def init_state(self, keys, idx):
        states = []
        for e, c, off in zip(self.envs, self.counts, self._offsets):
            # jit: eager vmapped init at thousands of envs takes minutes
            states.append(
                jax.jit(e.init_state)(keys[off : off + c], jnp.arange(c))
            )
        return states  # list-of-pytrees: the joint state

    def step(self, state_list: List, actions: jnp.ndarray):
        new_states = []
        transitions = []
        for e, c, off, st in zip(
            self.envs, self.counts, self._offsets, state_list
        ):
            ns, tr = e.step(st, actions[off : off + c])
            new_states.append(ns)
            transitions.append(tr)
        joined = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *transitions
        )
        return new_states, joined

    def reset_all(self, key):
        keys = jax.random.split(key, self.num_envs)
        state = self.init_state(keys, jnp.arange(self.num_envs))
        zero = jnp.zeros((self.num_envs, self.num_actions))
        state, tr = jax.jit(self.step)(state, zero)
        return state, tr.obs, tr.privileged_obs


def make_joint_xbot_env(num_envs_l: int, num_envs_s: int, cfg_overrides=None):
    """XBot-L + XBot-S jointly (BASELINE config[4]). cfg_overrides (a callable
    mutating each sub-env cfg) propagates solver selection etc. to BOTH
    robots' env builds."""
    from .. import registry

    env_l, _ = registry.make_env(
        "humanoid_ppo", num_envs=num_envs_l, cfg_overrides=cfg_overrides
    )
    env_s, _ = registry.make_env(
        "humanoid_s_ppo", num_envs=num_envs_s, cfg_overrides=cfg_overrides
    )
    return JointEnv([env_l, env_s], [num_envs_l, num_envs_s])
