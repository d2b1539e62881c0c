"""The 22 XBot-L reward terms as pure functions (single env; vmapped above).

Each term reproduces the math of the reference implementation
(reference humanoid/envs/custom/humanoid_env.py:272-540) exactly — including
the stateful terms (feet_air_time, feet_clearance) whose buffer mutations are
returned as explicit state updates instead of in-place writes
(SURVEY.md §2.4 "oddities": reward functions with state).

A term is ``fn(ctx: RewardCtx) -> ()`` scalar. The env multiplies by
``scale * dt`` (reference legged_robot.py:522-528) and accumulates episode
sums. Terms are gated by nonzero scale at build time, so disabled terms cost
nothing inside jit.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax.numpy as jnp


class RewardCtx(NamedTuple):
    # --- configuration scalars/vectors (closed over, static per build) ---
    dt: float
    default_dof_pos: jnp.ndarray  # (nj,)
    cycle_time: float
    target_joint_pos_scale: float
    target_feet_height: float
    base_height_target: float
    min_dist: float
    max_dist: float
    tracking_sigma: float
    max_contact_force: float
    sole_offset: float  # foot-frame origin height above the sole (0.05 for
    # XBot-L; the reference hardcodes it, humanoid_env.py:383,455)

    # --- dynamic quantities (this step, pre-reset) ---
    dof_pos: jnp.ndarray  # (nj,)
    dof_vel: jnp.ndarray  # (nj,)
    last_dof_vel: jnp.ndarray  # (nj,)
    actions: jnp.ndarray  # (na,)
    last_actions: jnp.ndarray  # (na,)
    last_last_actions: jnp.ndarray  # (na,)
    torques: jnp.ndarray  # (nj,)
    base_lin_vel: jnp.ndarray  # (3,) body frame
    base_ang_vel: jnp.ndarray  # (3,) body frame
    base_euler: jnp.ndarray  # (3,)
    projected_gravity: jnp.ndarray  # (3,)
    commands: jnp.ndarray  # (4,)
    root_z: jnp.ndarray  # ()
    root_vel: jnp.ndarray  # (6,) world [lin, ang]
    last_root_vel: jnp.ndarray  # (6,)
    feet_z: jnp.ndarray  # (2,) foot body frame origin height
    feet_vel_xy: jnp.ndarray  # (2,2) world xy velocity of feet
    feet_pos_xy: jnp.ndarray  # (2,2)
    knee_pos_xy: jnp.ndarray  # (2,2)
    feet_contact_force: jnp.ndarray  # (2,3)
    contact: jnp.ndarray  # (2,) bool: feet force z > 5 N
    stance_mask: jnp.ndarray  # (2,) gait-phase stance (phase at reward time)
    ref_dof_pos: jnp.ndarray  # (nj,) STALE: from previous obs pass
    collision_flags: jnp.ndarray  # (n_pen,) penalized-body contact indicator

    # --- stateful-term carries (pre-update values) ---
    feet_air_time: jnp.ndarray  # (2,)
    last_contacts: jnp.ndarray  # (2,) bool
    feet_height: jnp.ndarray  # (2,)
    last_feet_z: jnp.ndarray  # (2,)


class FeetStateUpdate(NamedTuple):
    feet_air_time: jnp.ndarray
    last_contacts: jnp.ndarray
    feet_height: jnp.ndarray
    last_feet_z: jnp.ndarray


def feet_state_update(ctx: RewardCtx) -> FeetStateUpdate:
    """The buffer mutations performed inside _reward_feet_air_time
    (humanoid_env.py:328-333) and _reward_feet_clearance (:455-466),
    applied unconditionally each step as in the reference (both terms have
    nonzero scales in the XBot config)."""
    contact_filt = ctx.contact | (ctx.stance_mask > 0.5) | ctx.last_contacts
    air = ctx.feet_air_time + ctx.dt
    air = air * (~contact_filt)

    feet_z = ctx.feet_z - ctx.sole_offset
    fh = ctx.feet_height + (feet_z - ctx.last_feet_z)
    fh = fh * (~ctx.contact)
    return FeetStateUpdate(
        feet_air_time=air,
        last_contacts=ctx.contact,
        feet_height=fh,
        last_feet_z=feet_z,
    )


# --------------------------- term implementations ---------------------------


def joint_pos(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:272-280 (uses stale ref_dof_pos — see env.py)."""
    d = jnp.linalg.norm(ctx.dof_pos - ctx.ref_dof_pos)
    return jnp.exp(-2.0 * d) - 0.2 * jnp.clip(d, 0.0, 0.5)


def _pair_distance_reward(dist, min_d, max_d):
    d_min = jnp.clip(dist - min_d, -0.5, 0.0)
    d_max = jnp.clip(dist - max_d, 0.0, 0.5)
    return (jnp.exp(-jnp.abs(d_min) * 100) + jnp.exp(-jnp.abs(d_max) * 100)) / 2.0


def feet_distance(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:282-292."""
    dist = jnp.linalg.norm(ctx.feet_pos_xy[0] - ctx.feet_pos_xy[1])
    return _pair_distance_reward(dist, ctx.min_dist, ctx.max_dist)


def knee_distance(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:295-305 (max distance halved for knees)."""
    dist = jnp.linalg.norm(ctx.knee_pos_xy[0] - ctx.knee_pos_xy[1])
    return _pair_distance_reward(dist, ctx.min_dist, ctx.max_dist / 2.0)


def foot_slip(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:308-318."""
    speed = jnp.linalg.norm(ctx.feet_vel_xy, axis=-1)
    return jnp.sum(jnp.sqrt(speed) * ctx.contact)


def feet_air_time(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:320-334 (value part; mutations in feet_state_update)."""
    contact_filt = ctx.contact | (ctx.stance_mask > 0.5) | ctx.last_contacts
    first_contact = (ctx.feet_air_time > 0.0) * contact_filt
    air = jnp.clip(ctx.feet_air_time + ctx.dt, 0.0, 0.5) * first_contact
    return jnp.sum(air)


def feet_contact_number(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:336-344."""
    match = ctx.contact == (ctx.stance_mask > 0.5)
    return jnp.mean(jnp.where(match, 1.0, -0.3))


def orientation(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:346-353."""
    quat_mismatch = jnp.exp(-jnp.sum(jnp.abs(ctx.base_euler[:2])) * 10.0)
    grav = jnp.exp(-jnp.linalg.norm(ctx.projected_gravity[:2]) * 20.0)
    return (quat_mismatch + grav) / 2.0


def feet_contact_forces(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:355-360."""
    f = jnp.linalg.norm(ctx.feet_contact_force, axis=-1)
    return jnp.sum(jnp.clip(f - ctx.max_contact_force, 0.0, 400.0))


def default_joint_pos(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:362-372."""
    diff = ctx.dof_pos - ctx.default_dof_pos
    yaw_roll = jnp.linalg.norm(diff[:2]) + jnp.linalg.norm(diff[6:8])
    yaw_roll = jnp.clip(yaw_roll - 0.1, 0.0, 50.0)
    return jnp.exp(-yaw_roll * 100.0) - 0.01 * jnp.linalg.norm(diff)


def base_height(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:374-384."""
    stance = ctx.stance_mask
    mean_feet_z = jnp.sum(ctx.feet_z * stance) / jnp.maximum(jnp.sum(stance), 1e-9)
    h = ctx.root_z - (mean_feet_z - ctx.sole_offset)
    return jnp.exp(-jnp.abs(h - ctx.base_height_target) * 100.0)


def base_acc(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:386-393."""
    acc = ctx.last_root_vel - ctx.root_vel
    return jnp.exp(-jnp.linalg.norm(acc) * 3.0)


def vel_mismatch_exp(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:396-406."""
    lin = jnp.exp(-jnp.square(ctx.base_lin_vel[2]) * 10.0)
    ang = jnp.exp(-jnp.linalg.norm(ctx.base_ang_vel[:2]) * 5.0)
    return (lin + ang) / 2.0


def track_vel_hard(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:408-425."""
    lin_err = jnp.linalg.norm(ctx.commands[:2] - ctx.base_lin_vel[:2])
    ang_err = jnp.abs(ctx.commands[2] - ctx.base_ang_vel[2])
    return (jnp.exp(-lin_err * 10.0) + jnp.exp(-ang_err * 10.0)) / 2.0 - 0.2 * (
        lin_err + ang_err
    )


def tracking_lin_vel(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:427-434."""
    err = jnp.sum(jnp.square(ctx.commands[:2] - ctx.base_lin_vel[:2]))
    return jnp.exp(-err * ctx.tracking_sigma)


def tracking_ang_vel(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:436-444."""
    err = jnp.square(ctx.commands[2] - ctx.base_ang_vel[2])
    return jnp.exp(-err * ctx.tracking_sigma)


def feet_clearance(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:446-467 (value uses post-increment feet_height)."""
    feet_z = ctx.feet_z - ctx.sole_offset
    fh = ctx.feet_height + (feet_z - ctx.last_feet_z)
    swing = 1.0 - ctx.stance_mask
    near = jnp.abs(fh - ctx.target_feet_height) < 0.01
    return jnp.sum(near * swing)


def low_speed(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:469-500."""
    v = ctx.base_lin_vel[0]
    c = ctx.commands[0]
    av, ac = jnp.abs(v), jnp.abs(c)
    too_low = av < 0.5 * ac
    too_high = av > 1.2 * ac
    desired = ~(too_low | too_high)
    sign_mismatch = jnp.sign(v) != jnp.sign(c)
    r = jnp.where(too_low, -1.0, 0.0)
    r = jnp.where(too_high, 0.0, r)
    r = jnp.where(desired, 1.2, r)
    r = jnp.where(sign_mismatch, -2.0, r)
    return r * (jnp.abs(c) > 0.1)


def torques(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:502-507."""
    return jnp.sum(jnp.square(ctx.torques))


def dof_vel(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:509-514."""
    return jnp.sum(jnp.square(ctx.dof_vel))


def dof_acc(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:516-521."""
    return jnp.sum(jnp.square((ctx.last_dof_vel - ctx.dof_vel) / ctx.dt))


def collision(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:523-528 (contact indicator on penalized bodies)."""
    return jnp.sum(ctx.collision_flags.astype(jnp.float32))


def action_smoothness(ctx: RewardCtx) -> jnp.ndarray:
    """humanoid_env.py:530-540."""
    t1 = jnp.sum(jnp.square(ctx.last_actions - ctx.actions))
    t2 = jnp.sum(
        jnp.square(ctx.actions + ctx.last_last_actions - 2.0 * ctx.last_actions)
    )
    t3 = 0.05 * jnp.sum(jnp.abs(ctx.actions))
    return t1 + t2 + t3


# Base-class terms kept for config portability (reference
# legged_robot_config.py:201-216 scales; zero in the XBot config).


def lin_vel_z(ctx: RewardCtx) -> jnp.ndarray:
    return jnp.square(ctx.base_lin_vel[2])


def ang_vel_xy(ctx: RewardCtx) -> jnp.ndarray:
    return jnp.sum(jnp.square(ctx.base_ang_vel[:2]))


def action_rate(ctx: RewardCtx) -> jnp.ndarray:
    return jnp.sum(jnp.square(ctx.last_actions - ctx.actions))


def stand_still(ctx: RewardCtx) -> jnp.ndarray:
    return jnp.sum(jnp.abs(ctx.dof_pos - ctx.default_dof_pos)) * (
        jnp.linalg.norm(ctx.commands[:2]) < 0.1
    )


REWARD_FUNCTIONS: Dict[str, Callable[[RewardCtx], jnp.ndarray]] = {
    "joint_pos": joint_pos,
    "feet_clearance": feet_clearance,
    "feet_contact_number": feet_contact_number,
    "feet_air_time": feet_air_time,
    "foot_slip": foot_slip,
    "feet_distance": feet_distance,
    "knee_distance": knee_distance,
    "feet_contact_forces": feet_contact_forces,
    "tracking_lin_vel": tracking_lin_vel,
    "tracking_ang_vel": tracking_ang_vel,
    "vel_mismatch_exp": vel_mismatch_exp,
    "low_speed": low_speed,
    "track_vel_hard": track_vel_hard,
    "default_joint_pos": default_joint_pos,
    "orientation": orientation,
    "base_height": base_height,
    "base_acc": base_acc,
    "action_smoothness": action_smoothness,
    "torques": torques,
    "dof_vel": dof_vel,
    "dof_acc": dof_acc,
    "collision": collision,
    "lin_vel_z": lin_vel_z,
    "ang_vel_xy": ang_vel_xy,
    "action_rate": action_rate,
    "stand_still": stand_still,
}
