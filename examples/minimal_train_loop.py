"""Minimal custom training loop against the library API (no runner).

Shows the three-layer surface a framework user composes:
  env   = make_env(cfg)                  # pure batched step/reset
  net   = ActorCritic(...)               # flax policy/value
  iter  = make_train_iter(env, net, ...) # one fused PPO iteration

Run small on CPU:  JAX_PLATFORMS=cpu python examples/minimal_train_loop.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")

from humanoid_gym_tpu.utils.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from humanoid_gym_tpu.algo.networks import ActorCritic
from humanoid_gym_tpu.algo.ppo import PPOConfig, init_train_state, make_train_iter
from humanoid_gym_tpu.config.xbotl import XBotLCfg
from humanoid_gym_tpu.envs import make_env


def main(num_envs=8, iterations=3, horizon=8):
    cfg = XBotLCfg()
    cfg.env.num_envs = num_envs

    env = make_env(cfg)
    net = ActorCritic(num_actions=cfg.env.num_actions)
    algo = PPOConfig()
    algo.num_steps_per_env = horizon

    key = jax.random.PRNGKey(0)
    key, k_init, k_env = jax.random.split(key, 3)
    ts = init_train_state(
        k_init, net, cfg.env.num_observations, cfg.env.num_privileged_obs,
        algo.learning_rate,
    )
    state, obs, priv = env.reset_all(k_env)

    train_iter = jax.jit(make_train_iter(env, net, algo, num_envs))
    for i in range(iterations):
        key, k = jax.random.split(key)
        ts, state, obs, priv, _, metrics = train_iter(ts, state, obs, priv, k)
        print(
            f"iter {i}: step reward {float(metrics['mean_step_reward']):.4f} "
            f"value loss {float(metrics['value_loss']):.4f}"
        )

    # deterministic policy for deployment
    act = lambda o: net.apply(ts.params, o, method=ActorCritic.act_inference)
    print("action sample:", act(obs[:1])[0, :4])


if __name__ == "__main__":
    main()
