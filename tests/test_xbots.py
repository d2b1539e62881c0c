"""XBot-S (Froude-scaled variant) tests: scaling invariants + env step."""

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_gym_tpu import registry
from humanoid_gym_tpu.config.xbots import SCALE


def test_xbot_s_scaling_invariants():
    env_l, _ = registry.make_env("humanoid_ppo", num_envs=1)
    env_s, cfg_s = registry.make_env("humanoid_s_ppo", num_envs=1)
    ml, ms = env_l.model, env_s.model
    s = SCALE

    # same topology
    assert ms.nbody == ml.nbody and ms.dof_names == ml.dof_names
    # masses x s^3
    np.testing.assert_allclose(
        np.asarray(ms.body_mass), np.asarray(ml.body_mass) * s**3, rtol=1e-4
    )
    # joint origins x s
    np.testing.assert_allclose(
        np.asarray(ms.joint_pos), np.asarray(ml.joint_pos) * s, atol=1e-6
    )
    # inertia x s^5
    np.testing.assert_allclose(
        np.asarray(ms.body_inertia), np.asarray(ml.body_inertia) * s**5, rtol=1e-3,
        atol=1e-9,
    )
    # effort x s^4
    np.testing.assert_allclose(
        np.asarray(ms.dof_effort), np.asarray(ml.dof_effort) * s**4, rtol=1e-4
    )
    # contact points x s (sole geometry scales with the mesh scale attr)
    np.testing.assert_allclose(
        np.asarray(ms.contact_point_offset),
        np.asarray(ml.contact_point_offset) * s,
        atol=1e-6,
    )
    # standing height scaled
    assert abs(cfg_s.init_state.pos[2] - 0.95 * s) < 1e-6


def test_xbot_s_env_steps():
    env, cfg = registry.make_env("humanoid_s_ppo", num_envs=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    state = jax.jit(env.init_state)(keys, jnp.arange(2))
    step = jax.jit(env.step)
    for _ in range(5):
        state, tr = step(state, jnp.zeros((2, 12)))
    assert np.all(np.isfinite(np.asarray(tr.obs)))
    assert np.all(np.isfinite(np.asarray(tr.reward)))
    # standing at the scaled height, not fallen
    assert float(state.phys.qpos[0, 2]) > 0.4
