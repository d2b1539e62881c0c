"""Scaling study: PPO throughput vs mesh size (BASELINE: >=80% linear).

Runs the fused train iteration with the env axis sharded over 1, 2, 4, ..., N
devices (fixed envs-per-device, weak scaling) and reports steps/s and
parallel efficiency. On this dev box it runs against emulated CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N before launch); on a TPU
slice the same code measures real ICI scaling.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --envs_per_device 64 --iters 3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from humanoid_gym_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def measure(n_devices: int, envs_per_device: int, iters: int, T: int):
    import jax
    import jax.numpy as jnp

    from humanoid_gym_tpu.algo.networks import ActorCritic
    from humanoid_gym_tpu.algo.ppo import PPOConfig, init_train_state, make_train_iter
    from humanoid_gym_tpu.config.xbotl import XBotLCfg
    from humanoid_gym_tpu.envs import make_env
    from humanoid_gym_tpu.parallel.mesh import make_env_mesh, replicate, shard_env_axis

    num_envs = n_devices * envs_per_device
    cfg = XBotLCfg()
    cfg.env.num_envs = num_envs
    env = make_env(cfg)
    net = ActorCritic(num_actions=cfg.env.num_actions)
    algo_cfg = PPOConfig()
    algo_cfg.num_steps_per_env = T

    key = jax.random.PRNGKey(0)
    k_init, k_env, key = jax.random.split(key, 3)
    ts = init_train_state(
        k_init, net, cfg.env.num_observations, cfg.env.num_privileged_obs,
        algo_cfg.learning_rate,
    )
    keys = jax.random.split(k_env, num_envs)
    state = jax.jit(env.init_state)(keys, jnp.arange(num_envs))
    obs = jnp.zeros((num_envs, cfg.env.num_observations))
    priv = jnp.zeros((num_envs, cfg.env.num_privileged_obs))

    mesh = make_env_mesh(jax.devices()[:n_devices])
    state = shard_env_axis(state, mesh)
    obs = shard_env_axis(obs, mesh)
    priv = shard_env_axis(priv, mesh)
    ts = replicate(ts, mesh)

    train_iter = jax.jit(make_train_iter(env, net, algo_cfg, num_envs))
    key, k = jax.random.split(key)
    out = train_iter(ts, state, obs, priv, k)
    jax.block_until_ready(out[5]["value_loss"])
    ts, state, obs, priv = out[0], out[1], out[2], out[3]

    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        out = train_iter(ts, state, obs, priv, k)
        ts, state, obs, priv = out[0], out[1], out[2], out[3]
    jax.block_until_ready(out[5]["value_loss"])
    dt = (time.time() - t0) / iters
    return T * num_envs / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs_per_device", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--horizon", type=int, default=12)
    p.add_argument("--max_devices", type=int, default=None)
    args = p.parse_args()

    import jax

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= (args.max_devices or n_avail)]
    results = {}
    for n in sizes:
        fps = measure(n, args.envs_per_device, args.iters, args.horizon)
        results[n] = fps
        base = results[sizes[0]]
        eff = fps / (base * n / sizes[0])
        print(
            json.dumps(
                {
                    "devices": n,
                    "envs": n * args.envs_per_device,
                    "steps_per_sec": round(fps, 1),
                    "scaling_efficiency": round(eff, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
