"""OnPolicyRunner: the training orchestration loop.

Mirrors the reference runner's observable behavior (humanoid/algo/ppo/
on_policy_runner.py:45-307): same scalar names on TensorBoard, same console
banner contract (steps/s, ETA), checkpoint every save_interval, resumable —
but the per-iteration work (rollout + GAE + update) is ONE jitted XLA program
built by algo.ppo.make_train_iter, so the host only sees one device round-trip
per iteration for metrics.

Checkpoints are full train-state pytrees (params, Adam moments, adaptive LR,
iteration) via flax serialization — exact resume (SURVEY §5: the reference
checkpoints learner state only; we keep that contract for ckpt files and
optionally bundle env state for bit-exact continuation).
"""

from __future__ import annotations

import json
import os
import statistics
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..algo.networks import ActorCritic
from ..algo.ppo import PPOConfig, init_train_state, make_train_iter
from ..parallel.mesh import make_env_mesh, replicate, shard_env_axis


class OnPolicyRunner:
    def __init__(
        self,
        env,
        train_cfg,
        log_dir: Optional[str] = None,
        device_mesh=None,
        seed: Optional[int] = None,
    ):
        self.env = env
        self.cfg = train_cfg
        self.log_dir = log_dir
        self.seed = train_cfg.seed if seed is None else seed

        ec = env.cfg.env
        self.num_envs = env.num_envs
        self.num_steps_per_env = train_cfg.runner.num_steps_per_env
        self.save_interval = train_cfg.runner.save_interval

        self.net = ActorCritic(
            num_actions=ec.num_actions,
            actor_hidden=tuple(train_cfg.policy.actor_hidden_dims),
            critic_hidden=tuple(train_cfg.policy.critic_hidden_dims),
            init_noise_std=train_cfg.policy.init_noise_std,
            estimator_dim=getattr(train_cfg.policy, "estimator_dim", 0),
            estimator_hidden=tuple(
                getattr(train_cfg.policy, "estimator_hidden_dims", (256, 128))
            ),
            compute_dtype=getattr(train_cfg.policy, "compute_dtype", "auto"),
        )
        algo_cfg = PPOConfig.from_cfg(train_cfg.algorithm)
        algo_cfg.num_steps_per_env = self.num_steps_per_env
        self.algo_cfg = algo_cfg

        key = jax.random.PRNGKey(self.seed)
        self.key, k_init, k_env = jax.random.split(key, 3)
        self.train_state = init_train_state(
            k_init, self.net, ec.num_observations, ec.num_privileged_obs,
            algo_cfg.learning_rate,
        )

        # sharding: env axis over all devices, params replicated
        self.mesh = device_mesh or make_env_mesh()
        multi_process = jax.process_count() > 1
        if len(self.mesh.devices.flat) > 1:
            # pallas solvers need shard_map dispatch on multi-device meshes
            from ..physics.pallas_solver import set_solver_mesh

            set_solver_mesh(self.mesh)

        # env state + first obs (reference on_policy_runner.py:91 env.reset())
        if multi_process:
            # each host initializes only its env block; global arrays are
            # assembled from per-host shards (parallel/multihost.py)
            import numpy as np

            from ..parallel.multihost import assemble_global, host_sharded_env_state

            state = host_sharded_env_state(env, k_env, self.mesh)
            start, count = 0, self.num_envs // jax.process_count()
            zeros = lambda d: assemble_global(
                np.zeros((count, d), np.float32), self.mesh
            )
            self.train_state = replicate(self.train_state, self.mesh)
            actions0 = zeros(ec.num_actions)
            state, tr = jax.jit(env.step)(state, actions0)
            self.env_state, self.obs, self.priv_obs = (
                state,
                tr.obs,
                tr.privileged_obs,
            )
        else:
            self.env_state, self.obs, self.priv_obs = env.reset_all(k_env)
            if len(self.mesh.devices.flat) > 1:
                self.env_state = shard_env_axis(self.env_state, self.mesh)
                self.obs = shard_env_axis(self.obs, self.mesh)
                self.priv_obs = shard_env_axis(self.priv_obs, self.mesh)
                self.train_state = replicate(self.train_state, self.mesh)

        self._train_iter = jax.jit(
            make_train_iter(env, self.net, algo_cfg, self.num_envs),
            donate_argnums=(0, 1),
        )

        self.is_main_process = jax.process_index() == 0
        self.writer = None
        self.current_learning_iteration = 0
        self.rewbuffer = deque(maxlen=100)
        self.lenbuffer = deque(maxlen=100)
        self.tot_timesteps = 0
        self.tot_time = 0.0
        # every process keeps the CHECKPOINT dir (process 0's, broadcast —
        # each process computes the timestamped name with its own clock) so
        # env-state shards can be written/read collectively; logging sinks
        # below stay host-0-only
        self._ckpt_dir = log_dir
        if jax.process_count() > 1:
            from ..parallel.multihost import broadcast_str

            self._ckpt_dir = broadcast_str(
                log_dir if self.is_main_process else None
            ) or None
            if self._ckpt_dir:
                os.makedirs(self._ckpt_dir, exist_ok=True)
        if log_dir is not None and not self.is_main_process:
            log_dir = None  # only host 0 writes logs/checkpoints
            self.log_dir = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._metrics_file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir=log_dir, flush_secs=10)
            except Exception:
                self.writer = None
            # wandb experiment logging, mirroring the reference
            # (on_policy_runner.py:96-102: wandb.init(project="XBot",
            # sync_tensorboard=True)). Optional import: zero-egress and
            # wandb-less deployments run identically without it; set
            # HGT_WANDB=0 to disable explicitly.
            self.wandb_run = None
            if os.environ.get("HGT_WANDB", "1") != "0":
                try:
                    import wandb

                    self.wandb_run = wandb.init(
                        project=os.environ.get("HGT_WANDB_PROJECT", "XBot"),
                        sync_tensorboard=True,
                        dir=log_dir,
                        name=os.path.basename(log_dir),
                    )
                except Exception:
                    self.wandb_run = None
        else:
            self._metrics_file = None
            self.wandb_run = None

    # ------------------------------------------------------------------ #

    def learn(self, num_learning_iterations: int, init_at_random_ep_len: bool = False):
        if init_at_random_ep_len:
            # (reference on_policy_runner.py:103-106)
            self.key, k = jax.random.split(self.key)
            ep_len_all = jax.random.randint(
                k, (self.num_envs,), 0, self.env.max_episode_length
            )
            if jax.process_count() > 1:
                import numpy as np

                from ..parallel.multihost import assemble_global, local_env_slice

                start, count = local_env_slice(self.num_envs)
                ep_len = assemble_global(
                    np.asarray(ep_len_all)[start : start + count], self.mesh
                )
            else:
                ep_len = ep_len_all
            if isinstance(self.env_state, list):  # JointEnv: list of pytrees
                parts, off = [], 0
                for st in self.env_state:
                    n = st.episode_length.shape[0]
                    parts.append(
                        st.replace(episode_length=ep_len[off : off + n])
                    )
                    off += n
                self.env_state = parts
            else:
                self.env_state = self.env_state.replace(episode_length=ep_len)

        start_iter = self.current_learning_iteration
        tot_iter = start_iter + num_learning_iterations
        steps_per_iter = self.num_steps_per_env * self.num_envs

        profile_dir = os.environ.get("HGT_PROFILE_DIR")
        # Double-buffered logging (round 5): fetching metrics to the host
        # costs a ~25 ms round trip on the axon tunnel — ~12% of a 190 ms
        # iteration. Dispatch is async, so iteration i+1 is ENQUEUED
        # before iteration i's metrics are pulled; the fetch then overlaps
        # device compute and the sync cost amortizes away. Log lines
        # carry the correct iteration indices, just emitted one iteration
        # later in wall time. Under HGT_PROFILE_DIR the loop runs
        # synchronously so the trace brackets exactly one iteration.
        pending = None  # (it, dispatch timestamp, device metrics)
        t_prev = time.time()

        def consume(p_it, p_dt, metrics):
            metrics = jax.device_get(metrics)
            self.tot_timesteps += steps_per_iter
            self.tot_time += p_dt
            n_resets = float(metrics["ep_reset_count"])
            if n_resets > 0:
                self.rewbuffer.append(float(metrics["ep_reward_sum"]) / n_resets)
                self.lenbuffer.append(float(metrics["ep_len_sum"]) / n_resets)
            fps = steps_per_iter / max(p_dt, 1e-9)
            self._log(p_it, tot_iter, metrics, fps, p_dt, n_resets)

        for it in range(start_iter, tot_iter):
            # capture a device trace of the second iteration (first is compile)
            if profile_dir and it == start_iter + 1:
                jax.profiler.start_trace(profile_dir)
            self.key, k = jax.random.split(self.key)
            (
                self.train_state,
                self.env_state,
                self.obs,
                self.priv_obs,
                _,
                metrics,
            ) = self._train_iter(
                self.train_state, self.env_state, self.obs, self.priv_obs, k
            )
            if profile_dir:
                metrics = jax.device_get(metrics)  # sync inside the trace
            if profile_dir and it == start_iter + 1:
                jax.profiler.stop_trace()
                print(f"[profiler] trace written to {profile_dir}", flush=True)
            if pending is not None:
                consume(*pending)
            now = time.time()
            pending = (it, now - t_prev, metrics)
            t_prev = now
            self.current_learning_iteration = it + 1

            if self.log_dir and (it % self.save_interval == 0):
                # save() pulls train_state to the host — a natural sync
                self.save(os.path.join(self.log_dir, f"model_{it}.ckpt"))
        if pending is not None:
            consume(*pending)
        if self._ckpt_dir:
            # the final checkpoint bundles env state (curriculum levels,
            # command ranges, DR draws, histories) so a resumed run
            # continues the curriculum instead of re-spreading terrain
            # levels and dipping (the reference never checkpoints env
            # state — resume is learner-only, SURVEY §5; bundling is an
            # extension, ~4 KB/env, final ckpt only). Multi-process runs
            # write per-process .envshard<rank> files (collective call).
            self.save(
                os.path.join(
                    self._ckpt_dir,
                    f"model_{self.current_learning_iteration}.ckpt",
                ),
                include_env_state=True,
            )
        self.close()

    def close(self):
        """Flush and release log sinks (avoids noisy interpreter-teardown
        aborts from the TensorBoard writer thread)."""
        if self.writer is not None:
            try:
                self.writer.close()
            except Exception:
                pass
            self.writer = None
        if self._metrics_file is not None:
            try:
                self._metrics_file.close()
            except Exception:
                pass
            self._metrics_file = None
        if getattr(self, "wandb_run", None) is not None:
            try:
                self.wandb_run.finish()
            except Exception:
                pass
            self.wandb_run = None

    # ------------------------------------------------------------------ #

    def _log(self, it, tot_iter, metrics, fps, dt_iter, n_resets, width=80):
        mean_rew = statistics.mean(self.rewbuffer) if self.rewbuffer else 0.0
        mean_len = statistics.mean(self.lenbuffer) if self.lenbuffer else 0.0
        scalars = {
            "Loss/value_function": float(metrics["value_loss"]),
            "Loss/surrogate": float(metrics["surrogate_loss"]),
            "Loss/entropy": float(metrics["entropy"]),
            "Loss/learning_rate": float(metrics["lr"]),
            "Loss/kl": float(metrics["kl"]),
            "Loss/estimator": float(metrics.get("estimator_loss", 0.0)),
            "Policy/mean_noise_std": float(metrics["action_std_mean"]),
            "Perf/total_fps": fps,
            "Perf/iter_time": dt_iter,
            "Train/mean_reward": mean_rew,
            "Train/mean_episode_length": mean_len,
            "Train/mean_step_reward": float(metrics["mean_step_reward"]),
            "Train/nonfinite_resets": float(metrics["nonfinite_resets"]),
            # (reference legged_robot.py:204-205 logs terrain level for trimesh)
            "Episode/terrain_level": float(metrics["mean_terrain_level"]),
        }
        # per-term episode reward means (reference Episode/rew_* scalars)
        if n_resets > 0:
            sums = np.asarray(metrics["ep_term_sums"])
            for name, s in zip(self.env.reward_names, sums):
                scalars[f"Episode/rew_{name}"] = float(s) / n_resets
        if self.writer:
            for k, v in scalars.items():
                self.writer.add_scalar(k, v, it)
        if self._metrics_file:
            self._metrics_file.write(json.dumps({"iter": it, **scalars}) + "\n")
            self._metrics_file.flush()

        if not self.is_main_process:
            return
        eta = (tot_iter - it - 1) * dt_iter
        line = (
            f"it {it}/{tot_iter} | fps {fps:,.0f} | rew {mean_rew:.2f} | "
            f"len {mean_len:.0f} | vloss {scalars['Loss/value_function']:.3f} | "
            f"lr {scalars['Loss/learning_rate']:.1e} | "
            f"std {scalars['Policy/mean_noise_std']:.2f} | eta {eta/60:.1f}m"
        )
        print(line, flush=True)

    # ------------------------------------------------------------------ #

    def _honor_ckpt_dtype(self, recorded):
        """Checkpoints record the RESOLVED net compute dtype (ADVICE r4:
        `compute_dtype="auto"` is backend-dependent, so loading an
        f32-trained checkpoint on TPU would silently continue under bf16
        and eval would run a numerically different net than training).
        If the task config left the dtype on "auto" and the checkpoint
        disagrees with the local resolution, rebuild the net (and the
        jitted train iter) under the checkpoint's dtype; an explicit
        per-task pin wins but the mismatch is reported."""
        if not recorded:
            return  # pre-round-5 checkpoint: keep local resolution
        from ..algo.networks import resolve_compute_dtype

        current = np.dtype(resolve_compute_dtype(self.net.compute_dtype)).name
        if recorded == current:
            return
        if self.net.compute_dtype not in (None, "", "auto"):
            print(
                f"[runner] WARNING: checkpoint was trained with "
                f"compute_dtype={recorded} but policy.compute_dtype pins "
                f"{self.net.compute_dtype}; keeping the explicit pin.",
                flush=True,
            )
            return
        print(
            f"[runner] checkpoint records compute_dtype={recorded} "
            f"(local 'auto' resolves to {current}); honoring the checkpoint.",
            flush=True,
        )
        self.net = self.net.clone(compute_dtype=recorded)
        self._train_iter = jax.jit(
            make_train_iter(self.env, self.net, self.algo_cfg, self.num_envs),
            donate_argnums=(0, 1),
        )

    def save(self, path: str, include_env_state: bool = False):
        multi = jax.process_count() > 1
        if include_env_state and multi:
            # pod-safe env-state checkpointing (SURVEY §5 preemption goal):
            # every process writes ITS OWN env block — curriculum, DR
            # draws, histories — as <path>.envshard<rank>; a preempted pod
            # slice reassembles them on load. Collective: call on ALL
            # processes.
            from ..parallel.multihost import local_env_shard

            shard = {
                "env_state": serialization.to_state_dict(
                    local_env_shard(self.env_state)
                ),
                "obs": local_env_shard(self.obs),
                "priv_obs": local_env_shard(self.priv_obs),
                "process_count": jax.process_count(),
            }
            with open(f"{path}.envshard{jax.process_index()}", "wb") as f:
                f.write(serialization.msgpack_serialize(shard))
        if not self.is_main_process:
            return
        from ..algo.networks import resolve_compute_dtype

        payload = {
            "train_state": serialization.to_state_dict(
                jax.device_get(self.train_state)
            ),
            "iter": self.current_learning_iteration,
            # RESOLVED net compute dtype ("auto" is backend-dependent):
            # load() uses it so resuming/eval on a different backend keeps
            # the numerics the run was trained with (ADVICE r4).
            "compute_dtype": np.dtype(
                resolve_compute_dtype(self.net.compute_dtype)
            ).name,
        }
        if include_env_state and multi:
            payload["env_shards"] = jax.process_count()
        elif include_env_state:
            payload["env_state"] = serialization.to_state_dict(
                jax.device_get(self.env_state)
            )
            # the obs that correspond to that state, so the first resumed
            # rollout step is exactly on-policy
            payload["obs"] = jax.device_get(self.obs)
            payload["priv_obs"] = jax.device_get(self.priv_obs)
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    def load(self, path: str, load_optimizer: bool = True):
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        self._honor_ckpt_dtype(payload.get("compute_dtype"))
        ts = serialization.from_state_dict(
            jax.device_get(self.train_state), payload["train_state"]
        )
        if not load_optimizer:
            ts = ts.replace(
                opt_mu=self.train_state.opt_mu,
                opt_nu=self.train_state.opt_nu,
                opt_count=self.train_state.opt_count,
            )
        self.train_state = ts
        if len(self.mesh.devices.flat) > 1:
            self.train_state = replicate(self.train_state, self.mesh)
        self.current_learning_iteration = int(payload.get("iter", 0))
        # multi-process (pod) resume: reassemble per-process env shards
        # into the globally-sharded state — curriculum/DR/history state
        # survives preemption (SURVEY §5). Requires the same process count.
        if jax.process_count() > 1 and payload.get("env_shards"):
            from ..parallel.multihost import assemble_global, local_env_shard

            try:
                n_sh = int(payload["env_shards"])
                if n_sh != jax.process_count():
                    raise ValueError(
                        f"ckpt has {n_sh} env shards, "
                        f"running {jax.process_count()} processes"
                    )
                sp = f"{path}.envshard{jax.process_index()}"
                with open(sp, "rb") as f:
                    shard = serialization.msgpack_restore(f.read())
                tmpl = local_env_shard(self.env_state)
                local = serialization.from_state_dict(tmpl, shard["env_state"])
                leaves = jax.tree.leaves(local)
                per = self.num_envs // jax.process_count()
                if leaves and leaves[0].shape[:1] != (per,):
                    raise ValueError(
                        f"shard env batch {leaves[0].shape[0]} != "
                        f"local envs {per}"
                    )
                self.env_state = assemble_global(local, self.mesh)
                self.obs = assemble_global(
                    np.asarray(shard["obs"]), self.mesh
                )
                self.priv_obs = assemble_global(
                    np.asarray(shard["priv_obs"]), self.mesh
                )
            except (ValueError, KeyError, OSError) as e:
                print(f"[runner] env shards not restored: {e}")
            return payload.get("infos")
        # restore bundled env state (final checkpoints of single-process
        # runs) so curriculum/DR state survives resume; skipped when the
        # env shape changed (different num_envs)
        es = payload.get("env_state")
        if es is not None and jax.process_count() == 1:
            try:
                restored = serialization.from_state_dict(
                    jax.device_get(self.env_state), es
                )
                leaves = jax.tree.leaves(restored)
                if leaves and leaves[0].shape[:1] != (self.num_envs,):
                    raise ValueError(
                        f"ckpt env batch {leaves[0].shape[0]} != "
                        f"num_envs {self.num_envs}"
                    )
                self.env_state = jax.device_put(restored)
                if payload.get("obs") is not None:
                    self.obs = jnp.asarray(payload["obs"])
                    self.priv_obs = jnp.asarray(payload["priv_obs"])
            except (ValueError, KeyError) as e:
                print(f"[runner] env state in ckpt not restored: {e}")
        return payload.get("infos")

    def get_inference_policy(self):
        """Deterministic policy obs -> action mean (reference
        on_policy_runner.py:297-306)."""
        params = jax.device_get(self.train_state.params)

        @jax.jit
        def policy(obs):
            return self.net.apply(params, obs, method=ActorCritic.act_inference)

        return policy
