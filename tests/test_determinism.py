"""Reproducibility: same seed => bit-identical rollout and training step."""

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_gym_tpu.config.xbotl import XBotLCfg
from humanoid_gym_tpu.envs import make_env
import pytest


def _rollout(seed):
    cfg = XBotLCfg()
    cfg.env.num_envs = 2
    env = make_env(cfg)
    keys = jax.random.split(jax.random.PRNGKey(seed), 2)
    state = jax.jit(env.init_state)(keys, jnp.arange(2))
    step = jax.jit(env.step)
    outs = []
    for i in range(3):
        state, tr = step(state, 0.05 * jnp.ones((2, 12)) * (i + 1))
        outs.append(np.asarray(tr.obs))
    return np.stack(outs), np.asarray(state.phys.qpos)


@pytest.mark.slow
def test_env_rollout_deterministic():
    o1, q1 = _rollout(7)
    o2, q2 = _rollout(7)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(q1, q2)
    o3, _ = _rollout(8)
    assert not np.array_equal(o1, o3)  # different seed -> different noise/DR
