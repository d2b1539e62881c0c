"""Learning-curve regression gate (BASELINE config[1] analog, shrunk to CPU
scale).

The reference's only regression signal is training metrics watched by a
human (SURVEY §4.3); this pins that signal as tolerance bands. A seeded
16-env short training run must land inside bands recorded from the
known-good build — a physics or reward regression that still "learns
something" (e.g. broken contact bounds, a dropped reward term, exploding
dynamics) moves mean step reward / episode length / value loss far outside
them, while benign RNG-stream reshuffles stay inside.

Pinned on CPU (deterministic per tests/test_determinism.py) from:
  seed 5, 16 envs, T=60, 12 iters ->
  step_rew[4:12] mean 0.0132, ep_len[4:12] mean 138, vloss 0.066 -> 0.015
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_learning_curve_bands():
    from humanoid_gym_tpu.algo.networks import ActorCritic
    from humanoid_gym_tpu.algo.ppo import (
        PPOConfig,
        init_train_state,
        make_train_iter,
    )
    from humanoid_gym_tpu.config.xbotl import XBotLCfg, XBotLCfgPPO
    from humanoid_gym_tpu.envs import make_env

    cfg = XBotLCfg()
    cfg.env.num_envs = 16
    tcfg = XBotLCfgPPO()
    env = make_env(cfg)
    net = ActorCritic(
        num_actions=12,
        actor_hidden=tuple(tcfg.policy.actor_hidden_dims),
        critic_hidden=tuple(tcfg.policy.critic_hidden_dims),
    )
    acfg = PPOConfig.from_cfg(tcfg.algorithm)
    acfg.num_steps_per_env = 60

    key = jax.random.PRNGKey(5)
    k1, k2, key = jax.random.split(key, 3)
    ts = init_train_state(
        k1, net, cfg.env.num_observations, cfg.env.num_privileged_obs,
        acfg.learning_rate,
    )
    state, obs, priv = env.reset_all(k2)
    train_iter = jax.jit(make_train_iter(env, net, acfg, 16))

    step_rew, ep_len, vloss, nonfinite = [], [], [], 0
    term_sums = np.zeros(env.n_reward_terms)
    late_resets = 0.0
    for it in range(12):
        key, k = jax.random.split(key)
        ts, state, obs, priv, _, m = train_iter(ts, state, obs, priv, k)
        m = jax.device_get(m)
        n = max(float(m["ep_reset_count"]), 1.0)
        step_rew.append(float(m["mean_step_reward"]))
        ep_len.append(float(m["ep_len_sum"]) / n)
        vloss.append(float(m["value_loss"]))
        nonfinite += int(m.get("nonfinite_resets", 0))
        if it >= 4:
            term_sums += np.asarray(m["ep_term_sums"])
            late_resets += float(m["ep_reset_count"])

    late_rew = float(np.mean(step_rew[4:]))
    late_len = float(np.mean(ep_len[4:]))
    term_mean = dict(zip(env.reward_names, term_sums / max(late_resets, 1.0)))

    # Bands pinned from the known-good build (healthy / torque-broken):
    #   late_len 138 / 80; tracking_lin_vel .0218 / .0128;
    #   feet_contact_number .0268 / .0157.
    # Each lower bound sits ~35% under healthy and well above broken; a
    # benign RNG reshuffle moves one metric a little, a physics/reward
    # regression drags all of them down together.
    assert 0.006 <= late_rew <= 0.030, (late_rew, step_rew)
    assert 100.0 <= late_len <= 280.0, (late_len, ep_len)
    assert term_mean["tracking_lin_vel"] >= 0.016, term_mean
    assert term_mean["feet_contact_number"] >= 0.020, term_mean
    # value function must actually fit: large initial loss, small late loss
    assert vloss[0] > 0.03, vloss
    assert vloss[-1] < 0.035 and vloss[-1] < 0.6 * vloss[0], vloss
    # nothing exploded
    assert nonfinite == 0
    assert all(np.isfinite(step_rew)) and all(np.isfinite(vloss))
