"""Joint XBot-L + XBot-S environment: one policy, heterogeneous batch
(BASELINE config[4] "jointly")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_joint_env_step_and_train():
    from humanoid_gym_tpu.algo.networks import ActorCritic
    from humanoid_gym_tpu.algo.ppo import PPOConfig, init_train_state, make_train_iter
    from humanoid_gym_tpu.envs.joint import make_joint_xbot_env

    env = make_joint_xbot_env(2, 2)
    assert env.num_envs == 4

    state, obs, priv = env.reset_all(jax.random.PRNGKey(0))
    assert obs.shape == (4, 705) and priv.shape == (4, 219)
    assert np.all(np.isfinite(np.asarray(obs)))
    # the two robots stand at different heights
    zs = np.asarray(jnp.concatenate([state[0].phys.qpos[:, 2], state[1].phys.qpos[:, 2]]))
    assert zs[:2].mean() > 0.85 and zs[2:].mean() < 0.75

    # a full PPO iteration over the heterogeneous batch
    net = ActorCritic(num_actions=12)
    ac = PPOConfig()
    ac.num_steps_per_env = 2
    ac.num_mini_batches = 2
    ac.num_learning_epochs = 1
    key = jax.random.PRNGKey(1)
    ts = init_train_state(key, net, 705, 219, ac.learning_rate)
    ti = jax.jit(make_train_iter(env, net, ac, env.num_envs))
    ts, state, obs, priv, _, metrics = ti(ts, state, obs, priv, key)
    assert np.isfinite(float(metrics["value_loss"]))
    assert np.isfinite(float(metrics["mean_step_reward"]))


@pytest.mark.slow
def test_joint_deploy_task_builds():
    """humanoid_joint_deploy: joint L+S batch on the deployment hfield with
    the full contact-DR stack (round-2 footing recipe, docs/ROUND2.md)."""
    from humanoid_gym_tpu import registry

    env, cfg = registry.make_env("humanoid_joint_deploy", num_envs=4)
    assert env.num_envs == 4 and len(env.envs) == 2
    for sub in env.envs:
        assert sub.cfg.terrain.style == "deploy"
        assert sub.cfg.terrain.curriculum
        assert sub.cfg.domain_rand.randomize_contact_slope
    train_cfg = registry.get_task("humanoid_joint_deploy").make_train_cfg()
    assert train_cfg.policy.estimator_dim == 3
    assert train_cfg.algorithm.estimator_coef == 1.0

    state, obs, priv = env.reset_all(jax.random.PRNGKey(0))
    assert obs.shape == (4, 705) and np.all(np.isfinite(np.asarray(obs)))
