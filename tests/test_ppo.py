"""Algorithm-layer tests: GAE math, Gaussian log-prob/entropy, sharded
training step on an emulated 8-device mesh (SURVEY §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_gym_tpu.algo.networks import (
    ActorCritic,
    normal_entropy,
    normal_log_prob,
)
from humanoid_gym_tpu.algo.ppo import gae
import pytest


def test_gae_hand_computed():
    """T=3, N=1 against hand-rolled recursion (rollout_storage.py:122-132)."""
    gamma, lam = 0.9, 0.8
    rewards = jnp.asarray([[1.0], [2.0], [3.0]])
    values = jnp.asarray([[0.5], [0.6], [0.7]])
    dones = jnp.asarray([[False], [False], [False]])
    last_value = jnp.asarray([0.8])
    adv, ret = gae(rewards, values, dones, last_value, gamma, lam)

    # manual reverse recursion
    a = np.zeros(4)
    vals = [0.5, 0.6, 0.7, 0.8]
    rews = [1.0, 2.0, 3.0]
    expect = np.zeros(3)
    running = 0.0
    for t in reversed(range(3)):
        delta = rews[t] + gamma * vals[t + 1] - vals[t]
        running = delta + gamma * lam * running
        expect[t] = running
    np.testing.assert_allclose(np.asarray(adv)[:, 0], expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(adv + values), rtol=1e-6)


def test_gae_done_masks_bootstrap():
    gamma, lam = 0.99, 0.95
    rewards = jnp.asarray([[1.0], [1.0]])
    values = jnp.asarray([[0.0], [0.0]])
    dones = jnp.asarray([[True], [False]])
    last_value = jnp.asarray([10.0])
    adv, _ = gae(rewards, values, dones, last_value, gamma, lam)
    # t=1 bootstraps off last_value; t=0 is cut by done
    np.testing.assert_allclose(float(adv[1, 0]), 1.0 + gamma * 10.0, rtol=1e-6)
    np.testing.assert_allclose(float(adv[0, 0]), 1.0, rtol=1e-6)


def test_normal_log_prob_matches_closed_form():
    mean = jnp.asarray([0.0, 1.0])
    std = jnp.asarray([1.0, 2.0])
    x = jnp.asarray([0.5, 0.0])
    lp = float(normal_log_prob(mean, std, x))
    expect = sum(
        -0.5 * ((xi - mi) / si) ** 2 - np.log(si) - 0.5 * np.log(2 * np.pi)
        for xi, mi, si in [(0.5, 0.0, 1.0), (0.0, 1.0, 2.0)]
    )
    np.testing.assert_allclose(lp, expect, rtol=1e-5)
    ent = float(normal_entropy(std, ()))
    expect_ent = sum(0.5 * np.log(2 * np.pi * np.e * s**2) for s in [1.0, 2.0])
    np.testing.assert_allclose(ent, expect_ent, rtol=1e-5)


def test_actor_critic_shapes():
    net = ActorCritic(num_actions=12)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((3, 705)), jnp.zeros((3, 219)))
    mean, std, value = net.apply(params, jnp.zeros((3, 705)), jnp.zeros((3, 219)))
    assert mean.shape == (3, 12) and value.shape == (3,) and std.shape == (12,)
    # std initialized at init_noise_std
    np.testing.assert_allclose(np.asarray(std), 1.0)
    a = net.apply(params, jnp.zeros((3, 705)), method=ActorCritic.act_inference)
    assert a.shape == (3, 12)


@pytest.mark.slow
def test_sharded_train_step_runs():
    """Full PPO iteration with env axis sharded over 8 emulated devices."""
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    g.dryrun_multichip(8)


def test_estimator_head_trains():
    """DWL-style estimator: head exists, gradient flows, supervised loss
    decreases on a fixed batch."""
    import optax

    net = ActorCritic(num_actions=12, estimator_dim=3)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((2, 705)), jnp.zeros((2, 219)))
    assert "estimator" in params["params"]

    obs = jax.random.normal(key, (64, 705))
    target = obs[:, :3] * 0.5  # recoverable mapping

    opt = optax.adam(1e-3)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        def loss(p):
            est = net.apply(p, obs, method=ActorCritic.estimate)
            return jnp.mean(jnp.square(est - target))

        l, g = jax.value_and_grad(loss)(params)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(params, up), ost, l

    params, ost, l0 = step(params, ost)
    for _ in range(50):
        params, ost, l = step(params, ost)
    assert float(l) < float(l0) * 0.5
