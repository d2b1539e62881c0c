"""Train a task (reference humanoid/scripts/train.py).

Usage:
    python scripts/train.py --task humanoid_ppo --num_envs 4096 \
        --max_iterations 3001 --run_name v1

On a multi-host TPU pod set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID (or rely on the TPU runtime's auto config) — the runner calls
jax.distributed.initialize before building the mesh.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from humanoid_gym_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def train(args):
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    from humanoid_gym_tpu import registry
    from humanoid_gym_tpu.runner import OnPolicyRunner
    from humanoid_gym_tpu.utils.helpers import (
        get_load_path,
        resolve_log_dir,
        update_cfg_from_args,
    )

    spec = registry.get_task(args.task)
    env_cfg = spec.make_env_cfg()
    train_cfg = spec.make_train_cfg()
    update_cfg_from_args(env_cfg, train_cfg, args)

    log_dir = resolve_log_dir(train_cfg, root=args.log_root)
    resume_path = None
    if train_cfg.runner.resume:
        # resolve before the (expensive) env build so a missing run fails fast
        resume_path = get_load_path(
            os.path.dirname(log_dir),
            load_run=train_cfg.runner.load_run,
            checkpoint=train_cfg.runner.checkpoint,
        )
        print(f"Will resume from: {resume_path}")

    def overrides(c):
        update_cfg_from_args(c, None, args)
        # solver: mega kernel (whole-substep-loop Pallas launch, ~4.8x the
        # fused kernel's physics throughput) on accelerators for flat
        # terrain; fused Pallas for heightfield; XLA apgd on CPU.
        # HGT_SOLVER overrides.
        import jax

        if jax.default_backend() == "cpu":
            default_solver = "apgd"
        else:
            # mega handles heightfields too (per-point min-grid patches
            # gathered in XLA, one-hot selected in-kernel)
            default_solver = "mega"
        c.sim.solver.solver_type = os.environ.get("HGT_SOLVER", default_solver)

    env, _ = registry.make_env(
        args.task,
        num_envs=env_cfg.env.num_envs,
        cfg_overrides=overrides,
    )
    runner = OnPolicyRunner(env, train_cfg, log_dir=log_dir)
    if runner.log_dir:
        # reproducibility: dump the resolved config tree next to the ckpts
        import json

        from humanoid_gym_tpu.utils.helpers import class_to_dict

        with open(os.path.join(runner.log_dir, "config.json"), "w") as f:
            json.dump(
                {"env": class_to_dict(env_cfg), "train": class_to_dict(train_cfg)},
                f, indent=1, default=str,
            )
    if resume_path is not None:
        # exact resume: restore Adam moments/count alongside params
        # (reference restores optimizer state by default, on_policy_runner.py:289-295)
        runner.load(resume_path, load_optimizer=True)
    runner.learn(
        num_learning_iterations=train_cfg.runner.max_iterations,
        init_at_random_ep_len=True,
    )


if __name__ == "__main__":
    from humanoid_gym_tpu.utils.helpers import get_args

    train(get_args())
