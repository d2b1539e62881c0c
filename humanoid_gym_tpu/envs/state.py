"""EnvState: the complete per-env state pytree.

Everything the reference keeps as mutable buffers on the env object
(reference legged_robot.py:434-516 _init_buffers, humanoid_env.py:76-81)
becomes explicit leaves here, so a step is a pure function
``(EnvState, action) -> EnvState`` under jit/vmap/shard_map, and checkpointing
the environment is just saving a pytree.

All leaves are per-env (unbatched here; the env vmaps over a leading axis).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..physics.step import PhysicsState


@struct.dataclass
class EnvState:
    phys: PhysicsState

    # episode bookkeeping (reference base_task.py:84-92)
    episode_length: jnp.ndarray  # () int32, steps since reset
    common_step: jnp.ndarray  # () int32, total policy steps (push timing)
    reset_buf: jnp.ndarray  # () bool — this step ended in reset
    time_out_buf: jnp.ndarray  # () bool — reset was a timeout

    # commands [vx, vy, vyaw, heading] (reference legged_robot.py:474)
    commands: jnp.ndarray  # (4,)

    # action pipeline (reference legged_robot.py:468-470)
    actions: jnp.ndarray  # (na,) current clipped actions
    last_actions: jnp.ndarray  # (na,)
    last_last_actions: jnp.ndarray  # (na,)
    last_dof_vel: jnp.ndarray  # (nj,)
    last_root_vel: jnp.ndarray  # (6,) [lin, ang] world

    # gait/reward carried state (reference legged_robot.py:476-477,
    # humanoid_env.py:78-79; mutated by reward terms — SURVEY §2.4 oddities)
    feet_air_time: jnp.ndarray  # (2,)
    last_contacts: jnp.ndarray  # (2,) bool
    feet_height: jnp.ndarray  # (2,)
    last_feet_z: jnp.ndarray  # (2,)
    ref_dof_pos: jnp.ndarray  # (nj,) reference gait target from last obs pass

    # push randomization (reference legged_robot.py:504-505)
    rand_push_force: jnp.ndarray  # (3,)
    rand_push_torque: jnp.ndarray  # (3,)

    # per-env shape friction as reported in privileged obs (reference
    # env_frictions, legged_robot.py:269; the solver uses the PhysX-style
    # pair average stored in phys.friction)
    env_friction: jnp.ndarray  # ()

    # frame-stacked histories as rolling arrays, oldest first
    # (reference legged_robot.py:509-516 deques)
    obs_history: jnp.ndarray  # (frame_stack, num_single_obs)
    critic_history: jnp.ndarray  # (c_frame_stack, single_num_privileged_obs)

    # base quantities cached at post-physics time (reference
    # legged_robot.py:132-136; stale-after-reset semantics preserved)
    base_lin_vel: jnp.ndarray  # (3,) body frame
    base_ang_vel: jnp.ndarray  # (3,) body frame
    base_euler: jnp.ndarray  # (3,) roll/pitch/yaw
    projected_gravity: jnp.ndarray  # (3,)

    # per-term reward episode sums (reference legged_robot.py:539-541)
    episode_sums: jnp.ndarray  # (n_reward_terms,)
    # total (post-clip) episode reward, for Train/mean_reward logging
    # (reference on_policy_runner.py:139-151 cur_reward_sum deques)
    episode_reward: jnp.ndarray  # ()

    # command curriculum: per-env lin_vel_x range (reference
    # legged_robot.py:422-431 keeps one global range; the pure per-env
    # variant expands each env's own range — equivalent in distribution,
    # documented divergence)
    cmd_vx_range: jnp.ndarray  # (2,)

    # terrain curriculum (reference legged_robot.py:683-708)
    terrain_level: jnp.ndarray  # () int32
    terrain_type: jnp.ndarray  # () int32
    env_origin: jnp.ndarray  # (3,)

    rng: jnp.ndarray  # per-env PRNG key
