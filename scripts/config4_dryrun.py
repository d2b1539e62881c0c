"""BASELINE config[4] scale evidence: 16,384-env sharded train iteration.

Round-5 VERDICT item #9: joint L+S production training ran at 4096 envs;
this script turns the "16k+ envs multi-host" claim from extrapolation
into evidence by executing ONE full sharded PPO train iteration of the
production joint task (`humanoid_joint_deploy`: XBot-L + XBot-S jointly
on the deployment-matched terrain, BASELINE config ladder row 4) at
16,384 envs over an emulated 8-device mesh, and recording the measured
per-device footprint plus the T=60 production projection.

Memory accounting (CPU devices expose no memory_stats):
  - live-array bytes grouped by sharding -> persistent per-device bytes
  - peak host RSS (captures XLA transients across all 8 emulated devices)
  - analytic rollout-storage bytes, measured at the run's T and projected
    to the production T=60

Solver: `apgd` (the XLA path, which GSPMD partitions automatically).
The mega kernel's footprint is per-TILE (128 envs in VMEM scratch,
mega_kernel.py) and does not grow with env count, so solver choice does
not change the HBM-per-env accounting this artifact is about; real-
Mosaic-under-shard_map execution is covered by `bench.py --mesh` on the
TPU chip (VERDICT item #3).

Usage:
  python scripts/config4_dryrun.py [--envs 16384] [--devices 8]
      [--horizon 8] [--out docs/config4_dryrun.json]
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
ap = argparse.ArgumentParser()
ap.add_argument("--envs", type=int, default=16384)
ap.add_argument("--devices", type=int, default=8)
ap.add_argument("--horizon", type=int, default=8)
ap.add_argument("--out", type=str, default=None)
args = ap.parse_args()
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={args.devices}"
)

from humanoid_gym_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def live_bytes_by_device():
    import jax

    per = {}
    for a in jax.live_arrays():
        try:
            for sh in a.addressable_shards:
                per[str(sh.device)] = per.get(str(sh.device), 0) + int(
                    sh.data.size * sh.data.dtype.itemsize
                )
        except Exception:
            pass
    return per


def main():
    import jax
    import jax.numpy as jnp

    from humanoid_gym_tpu import registry
    from humanoid_gym_tpu.algo.networks import ActorCritic
    from humanoid_gym_tpu.algo.ppo import (
        PPOConfig, init_train_state, make_train_iter,
    )
    from humanoid_gym_tpu.parallel.mesh import (
        make_env_mesh, replicate, shard_env_axis,
    )

    assert len(jax.devices()) == args.devices
    mesh = make_env_mesh(jax.devices())
    task = "humanoid_joint_deploy"
    spec = registry.get_task(task)

    def _ovr(c):
        c.sim.solver.solver_type = "apgd"

    t0 = time.time()
    env, cfg = registry.make_env(task, num_envs=args.envs, cfg_overrides=_ovr)
    tcfg = spec.make_train_cfg()
    net = ActorCritic(
        num_actions=cfg.env.num_actions,
        actor_hidden=tuple(tcfg.policy.actor_hidden_dims),
        critic_hidden=tuple(tcfg.policy.critic_hidden_dims),
        compute_dtype="float32",
    )
    algo_cfg = PPOConfig.from_cfg(tcfg.algorithm)
    algo_cfg.num_steps_per_env = args.horizon
    T = args.horizon

    key = jax.random.PRNGKey(0)
    k_init, k_env, k_it = jax.random.split(key, 3)
    ts = init_train_state(
        k_init, net, cfg.env.num_observations, cfg.env.num_privileged_obs,
        algo_cfg.learning_rate,
    )
    keys = jax.random.split(k_env, args.envs)
    state = jax.jit(env.init_state)(keys, jnp.arange(args.envs))
    obs = jnp.zeros((args.envs, cfg.env.num_observations))
    priv = jnp.zeros((args.envs, cfg.env.num_privileged_obs))

    state = shard_env_axis(state, mesh)
    obs = shard_env_axis(obs, mesh)
    priv = shard_env_axis(priv, mesh)
    ts = replicate(ts, mesh)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    setup_s = time.time() - t0

    state_bytes = sum(
        a.size * a.dtype.itemsize for a in jax.tree.leaves(state)
    )
    per_dev_setup = live_bytes_by_device()

    train_iter = jax.jit(
        make_train_iter(env, net, algo_cfg, args.envs), donate_argnums=(0, 1)
    )
    t0 = time.time()
    ts, state, obs, priv, _, metrics = train_iter(ts, state, obs, priv, k_it)
    vloss = float(jax.block_until_ready(metrics["value_loss"]))
    iter_s = time.time() - t0
    per_dev_after = live_bytes_by_device()
    peak_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024

    # rollout-vector row: obs + priv + actions*3 + 4 scalars (f32)
    row = cfg.env.num_observations + cfg.env.num_privileged_obs + \
        cfg.env.num_actions * 3 + 4
    rollout_bytes = args.envs * T * row * 4
    # T=60 production projection, per device: env-state shard + rollout
    # shard + one permuted copy (the two-gather epoch permutation holds
    # the gathered copy while the source is still live)
    per_dev_60 = (
        state_bytes + 2 * args.envs * 60 * row * 4
    ) / args.devices

    out = {
        "task": task,
        "envs": args.envs,
        "devices": args.devices,
        "mesh": "emulated CPU (xla_force_host_platform_device_count)",
        "horizon": T,
        "solver": "apgd (XLA; mega kernel footprint is per-128-env tile, "
                  "independent of env count)",
        "value_loss": vloss,
        "setup_s": round(setup_s, 1),
        "iter_s": round(iter_s, 1),
        "env_state_bytes_total": state_bytes,
        "env_state_bytes_per_env": round(state_bytes / args.envs),
        "rollout_bytes_total_at_T": rollout_bytes,
        "per_device_live_bytes_after_setup": {
            k: v for k, v in sorted(per_dev_setup.items())
        },
        "per_device_live_bytes_after_iter": {
            k: v for k, v in sorted(per_dev_after.items())
        },
        "host_peak_rss_bytes": peak_rss,
        "projection_T60_per_device_bytes": round(per_dev_60),
        "projection_note": (
            "per-device persistent bytes at production T=60 = env-state "
            "shard + rollout shard + one permuted epoch copy; at 16384 "
            "envs over 8 chips this is ~{:.2f} GB of the v5e's 16 GB HBM"
        ).format(per_dev_60 / 2**30),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
