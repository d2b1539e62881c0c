"""Evaluate + export a trained policy (reference humanoid/scripts/play.py).

Runs 1200 steps (12 s) in the JAX engine with fixed command vx=0.5 on flat
terrain, no pushes/noise (play.py:51-63,119-123); exports the actor as
policy.npz + policy_jit.pt (play.py:81-84); dumps a state/reward trace and a
matplotlib dashboard (utils/logger.py analog) instead of a live viewer.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from humanoid_gym_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import numpy as np


def play(args):
    import jax
    import jax.numpy as jnp

    from humanoid_gym_tpu import registry
    from humanoid_gym_tpu.export.policy_export import export_policy
    from humanoid_gym_tpu.runner import OnPolicyRunner
    from humanoid_gym_tpu.utils.helpers import get_load_path

    spec = registry.get_task(args.task)
    train_cfg = spec.make_train_cfg()

    def overrides(cfg):
        # eval-time config (reference play.py:51-63)
        cfg.env.num_envs = 1
        cfg.terrain.mesh_type = "plane"
        cfg.terrain.curriculum = False
        cfg.noise.add_noise = True
        cfg.domain_rand.push_robots = False
        cfg.domain_rand.randomize_friction = False
        cfg.domain_rand.randomize_base_mass = False
        cfg.domain_rand.action_delay = 0.0
        cfg.domain_rand.action_noise = 0.0
        cfg.commands.heading_command = False

    env, env_cfg = registry.make_env(args.task, num_envs=1, cfg_overrides=overrides)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)

    root = args.log_root or os.path.join(
        os.getcwd(), "logs", train_cfg.runner.experiment_name
    )
    path = get_load_path(root, load_run=args.load_run or -1, checkpoint=args.checkpoint)
    print(f"Loading model from: {path}")
    runner.load(path)
    policy = runner.get_inference_policy()

    # export (reference play.py:76-84)
    export_dir = os.path.join(root, "exported", "policies")
    params = jax.device_get(runner.train_state.params)
    written = export_policy(params, export_dir)
    print("Exported policy to:", written)

    # fixed-command rollout (reference play.py:115-151, FIX_COMMAND vx=0.5)
    state, obs, priv = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    fixed_cmd = jnp.asarray([[0.5, 0.0, 0.0, 0.0]])
    traces = {k: [] for k in (
        "dof_pos_target", "dof_pos", "dof_vel", "dof_torque",
        "base_vel_x", "base_vel_y", "base_vel_z", "base_vel_yaw",
        "command_x", "command_y", "command_yaw", "contact_forces_z", "reward",
    )}
    for i in range(1200):
        state = state.replace(commands=fixed_cmd)
        action = policy(obs)
        state, tr = step(state, action)
        obs = tr.obs
        traces["dof_pos_target"].append(np.asarray(action[0, 2]) * 0.25)
        traces["dof_pos"].append(np.asarray(state.phys.qpos[0, 7 + 2]))
        traces["dof_vel"].append(np.asarray(state.phys.qvel[0, 6 + 2]))
        traces["dof_torque"].append(np.asarray(state.phys.torques[0, 2]))
        traces["base_vel_x"].append(np.asarray(state.base_lin_vel[0, 0]))
        traces["base_vel_y"].append(np.asarray(state.base_lin_vel[0, 1]))
        traces["base_vel_z"].append(np.asarray(state.base_lin_vel[0, 2]))
        traces["base_vel_yaw"].append(np.asarray(state.base_ang_vel[0, 2]))
        traces["command_x"].append(0.5)
        traces["command_y"].append(0.0)
        traces["command_yaw"].append(0.0)
        feet = np.asarray(state.phys.contact_forces[0])[list(env.model.feet_body_idx), 2]
        traces["contact_forces_z"].append(feet)
        traces["reward"].append(float(tr.reward[0]))

    out = os.path.join(root, "exported", "play_trace.npz")
    np.savez(out, **{k: np.asarray(v) for k, v in traces.items()})
    print(f"Saved trace to {out}; mean reward {np.mean(traces['reward']):.3f}, "
          f"mean vx {np.mean(traces['base_vel_x']):.3f}")

    try:
        from humanoid_gym_tpu.utils.play_logger import plot_states

        png = os.path.join(root, "exported", "play_dashboard.png")
        plot_states(traces, dt=env.dt, out_path=png)
        print(f"Dashboard: {png}")
    except Exception as e:
        print(f"plotting skipped: {e}")

    # gait video of the exported policy (reference play.py:127-134 records
    # an mp4 via a camera sensor; here a headless software render of the
    # MuJoCo deployment rollout — also the best human check of transfer)
    if os.environ.get("HGT_PLAY_VIDEO", "1") != "0":
        try:
            from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg, run_mujoco

            mp4 = os.path.join(root, "exported", "gait.mp4")
            from scripts.sim2sim import XBOT_MJCF  # canonical MJCF path

            from humanoid_gym_tpu.export.policy_export import load_policy

            npz = next(p for p in written if p.endswith(".npz"))
            res = run_mujoco(
                load_policy(npz),
                Sim2SimCfg(mujoco_model_path=XBOT_MJCF, sim_duration=10.0),
                video_path=mp4,
            )
            print(f"Gait video: {mp4} (walked {res['distance_x']:.2f} m)")
        except Exception as e:
            print(f"video skipped: {e}")


if __name__ == "__main__":
    from humanoid_gym_tpu.utils.helpers import get_args

    play(get_args())
