"""Scaling study: PPO throughput vs mesh size (BASELINE: >=80% linear).

Runs the fused train iteration with the env axis sharded over 1, 2, 4, ..., N
devices (fixed envs-per-device, weak scaling) and reports steps/s and
parallel efficiency. On this dev box it runs against emulated CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N before launch); on a TPU
slice the same code measures real ICI scaling.

Emulation caveat (why the committed artifact carries three protocols): a
single emulated CPU "device" already spreads its compute over every host
core via XLA's intra-op thread pool, so on a fixed 4-core host the 1-device
weak-scaling baseline is NOT one device's worth of hardware — multi-device
efficiency computed against it conflates sharding overhead with core
timeslicing. The artifact therefore records:

  1. `fixed_host`  — the naive weak-scaling sweep (all points share every
     core), median-of-k with per-point spread. Interpret with the caveat.
  2. `pinned`      — device-per-core points (n devices pinned to n cores,
     n <= nproc), the closest emulation of "each device is its own
     hardware". The 1-device/1-core baseline over-pays for XLA's fixed-size
     runtime pool spinning on one core, so ratios >1.0 appear; recorded
     as measured.
  3. `control`     — the serialization control and the emulation's one
     clean signal: the SAME total env batch, sharded over max_devices vs
     unsharded on one device, on identical cores. Any sharding-induced
     serialization (e.g. an accidental global all-gather of env state)
     shows up directly as a ratio drop; compute parallelism cancels out.

Real >=80% ICI scaling remains hardware-gated (one chip on this box); the
driver's dryrun_multichip validates the sharded step compiles+runs at 8
devices, and these protocols keep the harness honest until a pod is
available.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --repeats 5            # sweep
    ... scripts/scaling_bench.py --control --repeats 5         # control only
    python scripts/scaling_bench.py --artifact docs/scaling_emulated.json
        # full three-protocol run (spawns pinned subprocesses itself)
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
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


def measure_stats(n_devices, envs_per_device, iters, T, repeats):
    """Median-of-k around measure(); returns per-point spread, not just a scalar."""
    vals = [measure(n_devices, envs_per_device, iters, T) for _ in range(repeats)]
    med = statistics.median(vals)
    return {
        "steps_per_sec": round(med, 1),
        "repeats": repeats,
        "min": round(min(vals), 1),
        "max": round(max(vals), 1),
        "cv": round(statistics.pstdev(vals) / med, 4) if med else None,
    }


def run_sweep(args):
    import jax

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= (args.max_devices or n_avail)]
    points, base = [], None
    for n in sizes:
        st = measure_stats(n, args.envs_per_device, args.iters, args.horizon, args.repeats)
        st.update(devices=n, envs=n * args.envs_per_device)
        if base is None:
            base = st["steps_per_sec"]
        st["scaling_efficiency"] = round(
            st["steps_per_sec"] / (base * n / sizes[0]), 4
        )
        points.append(st)
        print(json.dumps(st), flush=True)
    return points


def run_control(args):
    """Same total envs, sharded over max devices vs unsharded on one device."""
    import jax

    n = args.max_devices or len(jax.devices())
    total = n * args.envs_per_device
    unsharded = measure_stats(1, total, args.iters, args.horizon, args.repeats)
    sharded = measure_stats(n, args.envs_per_device, args.iters, args.horizon, args.repeats)
    out = {
        "total_envs": total,
        "devices_sharded": n,
        "unsharded_steps_per_sec": unsharded,
        "sharded_steps_per_sec": sharded,
        "sharded_over_unsharded": round(
            sharded["steps_per_sec"] / unsharded["steps_per_sec"], 4
        ),
    }
    print(json.dumps(out), flush=True)
    return out


def run_pinned_point(args):
    """Child-process entry: one device-per-core point (invoked via --pinned-point)."""
    st = measure_stats(
        args.pinned_point, args.envs_per_device, args.iters, args.horizon, args.repeats
    )
    st.update(devices=args.pinned_point, envs=args.pinned_point * args.envs_per_device)
    print("PINNED " + json.dumps(st), flush=True)


def spawn_pinned_sweep(args):
    """Parent: one subprocess per point, n devices pinned to cores 0..n-1."""
    nproc = os.cpu_count() or 1
    sizes = [n for n in (1, 2, 4, 8) if n <= min(nproc, args.max_devices or nproc)]
    points, base = [], None
    for n in sizes:
        cmd = [
            "taskset", "-c", f"0-{n - 1}" if n > 1 else "0",
            sys.executable, os.path.abspath(__file__),
            "--pinned-point", str(n),
            "--envs_per_device", str(args.envs_per_device),
            "--iters", str(args.iters),
            "--horizon", str(args.horizon),
            "--repeats", str(args.repeats),
        ]
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("PINNED ")]
        if not line:
            print(f"pinned point n={n} failed:\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        st = json.loads(line[-1][len("PINNED "):])
        if base is None:
            # normalize by per-device throughput of the FIRST SUCCESSFUL
            # point (base_n may be >1 if n=1 failed), so efficiency stays
            # relative to an actual measurement rather than assuming the
            # baseline was 1 device (ADVICE r4)
            base, base_n = st["steps_per_sec"], n
        st["scaling_efficiency"] = round(
            st["steps_per_sec"] / (base / base_n * n), 4
        )
        if base_n != 1:
            st["efficiency_baseline_devices"] = base_n
        points.append(st)
        print(json.dumps(st), flush=True)
    return points


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs_per_device", type=int, default=16)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--max_devices", type=int, default=None)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--control", action="store_true", help="serialization control only")
    p.add_argument("--pinned", action="store_true", help="device-per-core sweep only")
    p.add_argument("--pinned-point", type=int, default=None, help=argparse.SUPPRESS)
    p.add_argument("--artifact", type=str, default=None,
                   help="run all three protocols, write the JSON artifact here")
    args = p.parse_args()

    if args.pinned_point is not None:
        run_pinned_point(args)
        return
    if args.artifact:
        artifact = {
            "protocol": {
                "workload": "full fused PPO train iteration (rollout T=%d + learn), "
                            "%d envs/device, weak scaling" % (args.horizon, args.envs_per_device),
                "host": f"{os.cpu_count()} CPU cores, emulated devices "
                        f"(xla_force_host_platform_device_count)",
                "stat": f"median of {args.repeats}, spread as min/max/cv per point",
                "fixed_host": "all points share every core; the 1-device baseline "
                              "already uses all cores via intra-op threads, so "
                              "efficiency conflates sharding with core timeslicing",
                "pinned": "n devices pinned (taskset) to n cores, own subprocess; "
                          "1-core baseline over-pays XLA's fixed-size spinning "
                          "pool, so >1.0 ratios appear",
                "control": "same total envs sharded vs unsharded on identical "
                           "cores — compute parallelism cancels; a ratio drop "
                           "IS sharding-induced serialization. The clean signal.",
            },
            "fixed_host": run_sweep(args),
            "control": run_control(args),
            "pinned": spawn_pinned_sweep(args),
        }
        with open(args.artifact, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.artifact}", flush=True)
        return
    if args.control:
        run_control(args)
        return
    if args.pinned:
        spawn_pinned_sweep(args)
        return
    run_sweep(args)


if __name__ == "__main__":
    main()
