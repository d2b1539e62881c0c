"""HumanoidEnv: the XBot-L locomotion environment as one pure step function.

Re-designs the reference env stack (humanoid/envs/base/legged_robot.py +
humanoid/envs/custom/humanoid_env.py) as an explicit-state functional program:

    state', transition = env.step(state, actions)      # batched, jittable

while reproducing the reference's per-step ordering *exactly* (SURVEY.md §2.4,
hard part 4 — auto-reset semantics):

  action pipeline (ref-action add, clip, delay mix, mult. noise;
    humanoid_env.py:189-197)
  -> decimation x 1 kHz PD physics (legged_robot.py:94-102)
  -> episode counters, base quantities (legged_robot.py:128-136)
  -> callback: command resample / heading / push (legged_robot.py:304-320)
  -> termination check (legged_robot.py:156-161)
  -> 22 reward terms + episode sums + only-positive clip
     (legged_robot.py:217-235, humanoid_env.py:272-540)
  -> masked auto-reset (legged_robot.py:163-215, humanoid_env.py:264-269)
  -> observations with frame stacking + noise (humanoid_env.py:200-262)
  -> last_* buffer rotation (legged_robot.py:147-151)

Deliberate, documented equivalences (not copies) of engine-level signals:
- termination/collision use geometric probe-point penetration of the base
  collision box instead of PhysX contact-force thresholds (the reference's
  >1 N base contact, legged_robot.py:159; our engine solves contact forces
  only at foot sole candidates).
- foot velocities are body-frame-origin velocities (Isaac's rigid-body state
  velocity views, humanoid_env.py:315).
- measure_heights obs append is NOT implemented: in the reference it is dead
  for XBot (measure_heights=False, humanoid_config.py:74) and buggy when on
  (stale obs_buf concat, humanoid_env.py:246-248 — SURVEY §2.4 oddities).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config.base import LeggedRobotCfg
from ..physics import spatial as S
from ..physics.kinematics import body_velocities, fk
from ..physics.model import RobotModel, build_model_from_urdf
from ..physics.step import PhysicsState, make_physics_step
from . import rewards as R
from .state import EnvState


@struct.dataclass
class Transition:
    obs: jnp.ndarray  # (num_observations,)
    privileged_obs: jnp.ndarray  # (num_privileged_obs,)
    reward: jnp.ndarray  # ()
    done: jnp.ndarray  # () bool
    time_out: jnp.ndarray  # () bool
    # logging contributions (summed over envs by the runner)
    ep_term_sums: jnp.ndarray  # (n_terms,) episode sums at reset / ep_len_s
    ep_reset_count: jnp.ndarray  # () int32
    ep_len_at_reset: jnp.ndarray  # () float
    ep_reward_at_reset: jnp.ndarray  # () float
    nonfinite: jnp.ndarray  # () int32 — env exploded and was auto-reset
    terrain_level: jnp.ndarray  # () float


def _match_gains(dof_names, table: dict, default: float = 0.0) -> np.ndarray:
    """Substring gain matching (reference legged_robot.py:487-501)."""
    out = np.full(len(dof_names), default, dtype=np.float32)
    for i, n in enumerate(dof_names):
        for key, val in table.items():
            if key in n:
                out[i] = val
    return out


class HumanoidEnv:
    """Builds the pure step/reset functions for one task configuration.

    Not a pytree: holds the model, config-derived constants, and compiled-in
    closures. All returned callables are batched over a leading env axis and
    safe under jit / shard_map.
    """

    def __init__(
        self,
        cfg: LeggedRobotCfg,
        model: Optional[RobotModel] = None,
        terrain_height_fn: Optional[Callable] = None,
        terrain_origins: Optional[np.ndarray] = None,
        num_envs: Optional[int] = None,
        terrain_map=None,
    ):
        self.cfg = cfg
        self.num_envs = num_envs or cfg.env.num_envs
        self.model = model or build_model_from_urdf(
            cfg.asset.file,
            dof_order=list(cfg.init_state.default_joint_angles.keys()),
            foot_name=cfg.asset.foot_name,
            knee_name=cfg.asset.knee_name,
            termination_names=tuple(cfg.asset.terminate_after_contacts_on),
            penalized_names=tuple(cfg.asset.penalize_contacts_on),
            armature=cfg.asset.armature,
            mesh_dir=cfg.asset.mesh_dir,
        )
        m = self.model
        self.num_actions = cfg.env.num_actions
        self.dt = cfg.dt  # policy dt

        # --- config-derived constants -------------------------------------
        self.default_dof_pos = jnp.asarray(
            [cfg.init_state.default_joint_angles[n] for n in m.dof_names],
            jnp.float32,
        )
        self.p_gains = jnp.asarray(_match_gains(m.dof_names, cfg.control.stiffness))
        self.d_gains = jnp.asarray(_match_gains(m.dof_names, cfg.control.damping))
        self.torque_limits = m.dof_effort * cfg.safety.torque_limit
        self.max_episode_length = int(math.ceil(cfg.env.episode_length_s / self.dt))
        self.resampling_interval = int(cfg.commands.resampling_time / self.dt)
        self.push_interval = int(math.ceil(cfg.domain_rand.push_interval_s / self.dt))

        # terrain
        self.custom_origins = cfg.terrain.mesh_type in ("heightfield", "trimesh")
        if terrain_height_fn is None:
            from ..terrain.terrain import flat_height_fn

            terrain_height_fn = flat_height_fn
        self.terrain_height_fn = terrain_height_fn
        self.terrain_map = terrain_map
        self.terrain_origins = (
            jnp.asarray(terrain_origins, jnp.float32)
            if terrain_origins is not None
            else None
        )
        self.max_terrain_level = cfg.terrain.num_rows

        # physics step closure (10x 1 kHz substeps per policy step)
        self._phys_step = make_physics_step(
            m,
            cfg.sim.dt,
            cfg.control.decimation,
            self.p_gains,
            self.d_gains,
            self.torque_limits,
            terrain_height_fn,
            solver_iterations=cfg.sim.solver.solver_iterations,
            solver=cfg.sim.solver.solver_type,
            unroll=cfg.sim.solver.substep_unroll,
            terrain_map=terrain_map,
        )

        # mega solver ships end-of-step feet/knee kinematics in
        # PhysicsState.fk_out (OUT_FK rows) — skip the XLA-side
        # fk()/body_velocities() per policy step (26% of the train
        # iteration, docs/ROUND3.md). Probe points all sit on the base for
        # XBot-L/S, so termination probes need only the base quat.
        self._kernel_fk = cfg.sim.solver.solver_type.startswith("mega")
        self._probe_on_base = all(int(b) == 0 for b in m.probe_point_body)
        # windowed 3-tap-min for the per-step probe height query: same
        # values as terrain_height_fn, one contiguous tile gather instead
        # of three pointwise grid gathers (~20 ms/iter each at 4096 envs)
        self._tile_height = None
        if terrain_map is not None:
            from ..terrain.terrain import flat_height_fn as _flat
            from ..terrain.terrain import make_tile_height_fn

            if terrain_height_fn is not _flat:
                # probes sit on the base within max||offset|| of its
                # origin, so a short-reach (small-row) tile family
                # suffices — half the gather bytes of the contact path's
                # 1.6 m window (terrain.make_tile_gather picks the tile)
                import numpy as _np

                offs = _np.asarray(m.probe_point_offset)
                preach = (
                    float(_np.linalg.norm(offs, axis=1).max()) + 0.25
                    if offs.size
                    else 0.65
                )
                self._tile_height = make_tile_height_fn(
                    terrain_map, reach_m=max(preach, 0.5)
                )

        # reward pipeline: nonzero scales, premultiplied by dt
        # (reference legged_robot.py:518-537)
        scales = cfg.rewards.scales.nonzero_terms()
        self.reward_names: Tuple[str, ...] = tuple(
            n for n in scales.keys() if n != "termination"
        )
        self.reward_scales = jnp.asarray(
            [scales[n] * self.dt for n in self.reward_names], jnp.float32
        )
        self.termination_scale = scales.get("termination", 0.0) * self.dt
        self._reward_fns = [R.REWARD_FUNCTIONS[n] for n in self.reward_names]
        self.n_reward_terms = len(self.reward_names)

        # noise vector (humanoid_env.py:166-186)
        ns, os_ = cfg.noise.noise_scales, cfg.normalization.obs_scales
        nv = np.zeros(cfg.env.num_single_obs, np.float32)
        nv[5:17] = ns.dof_pos * os_.dof_pos
        nv[17:29] = ns.dof_vel * os_.dof_vel
        nv[41:44] = ns.ang_vel * os_.ang_vel
        nv[44:47] = ns.quat * os_.quat
        self.noise_scale_vec = jnp.asarray(nv)

        self.commands_scale = jnp.asarray(
            [os_.lin_vel, os_.lin_vel, os_.ang_vel], jnp.float32
        )
        self.feet_idx = jnp.asarray(m.feet_body_idx)
        self.knee_idx = jnp.asarray(m.knee_body_idx)

        # height measurement grid (legged_robot.py:743-757); sampled under
        # base yaw each step when terrain.measure_heights is on. Unlike the
        # reference (whose measured-heights obs path is dead + buggy for
        # XBot, humanoid_env.py:246-248), the correct opt-in here appends
        # clip((root_z - 0.5 - h)*scale) to the privileged frame.
        gx, gy = np.meshgrid(
            np.asarray(cfg.terrain.measured_points_x),
            np.asarray(cfg.terrain.measured_points_y),
            indexing="ij",
        )
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel()], axis=-1), jnp.float32
        )  # (P, 2)
        self.num_height_points = self.height_points.shape[0]
        self.measure_heights = (
            cfg.terrain.measure_heights
            and cfg.terrain.mesh_type in ("heightfield", "trimesh")
        )
        # probe->body grouping for termination/collision flags
        self._probe_body = np.asarray(m.probe_point_body)
        self._term_bodies = tuple(m.termination_body_idx)
        self._pen_bodies = tuple(m.penalized_body_idx)

        # batched public API
        self._vstep = jax.vmap(self._step_single)
        self.step = self._step_batch
        self.init_state = jax.vmap(self._init_single)  # (keys, env_idx) -> EnvState

    # ------------------------------------------------------------------ #

    def _sample_commands(self, key, old_commands, vx_range=None):
        """Resample commands (reference legged_robot.py:322-336)."""
        cr = self.cfg.commands.ranges
        k1, k2, k3 = jax.random.split(key, 3)
        if vx_range is None:
            vx = jax.random.uniform(
                k1, (), minval=cr.lin_vel_x[0], maxval=cr.lin_vel_x[1]
            )
        else:
            u = jax.random.uniform(k1, ())
            vx = vx_range[0] + u * (vx_range[1] - vx_range[0])
        vy = jax.random.uniform(k2, (), minval=cr.lin_vel_y[0], maxval=cr.lin_vel_y[1])
        if self.cfg.commands.heading_command:
            heading = jax.random.uniform(
                k3, (), minval=cr.heading[0], maxval=cr.heading[1]
            )
            cmd = jnp.stack([vx, vy, old_commands[2], heading])
        else:
            vyaw = jax.random.uniform(
                k3, (), minval=cr.ang_vel_yaw[0], maxval=cr.ang_vel_yaw[1]
            )
            cmd = jnp.stack([vx, vy, vyaw, old_commands[3]])
        keep = jnp.linalg.norm(cmd[:2]) > 0.2
        return cmd.at[:2].multiply(keep.astype(cmd.dtype))

    def _gait_phase(self, episode_length):
        """phase in cycles (humanoid_env.py:100-103)."""
        return episode_length.astype(jnp.float32) * self.dt / self.cfg.rewards.cycle_time

    def _stance_mask(self, phase):
        """(humanoid_env.py:105-118): left stance sin>=0, right sin<0,
        double support |sin|<0.1."""
        sin_pos = jnp.sin(2 * jnp.pi * phase)
        left = (sin_pos >= 0).astype(jnp.float32)
        right = (sin_pos < 0).astype(jnp.float32)
        mask = jnp.stack([left, right])
        return jnp.where(jnp.abs(sin_pos) < 0.1, 1.0, mask)

    def _ref_dof_pos(self, phase):
        """Reference gait targets (humanoid_env.py:121-142)."""
        sin_pos = jnp.sin(2 * jnp.pi * phase)
        s1 = self.cfg.rewards.target_joint_pos_scale
        s2 = 2 * s1
        sin_l = jnp.minimum(sin_pos, 0.0)  # left swing when sin<0
        sin_r = jnp.maximum(sin_pos, 0.0)
        ref = jnp.zeros(self.num_actions)
        ref = ref.at[2].set(sin_l * s1).at[3].set(sin_l * s2).at[4].set(sin_l * s1)
        ref = ref.at[8].set(sin_r * s1).at[9].set(sin_r * s2).at[10].set(sin_r * s1)
        return jnp.where(jnp.abs(sin_pos) < 0.1, 0.0, ref)

    def _probe_flags(self, phys, kfk=None, win_center=None):
        """Penetration flags per termination/penalized body (geometric
        equivalent of reference contact-force checks legged_robot.py:159,
        humanoid_env.py:528). When every probe body is the base (XBot-L/S),
        probe points need only the base pose — no FK; otherwise the caller
        passes the XLA fk() result.

        win_center (round 5): world xy to key the tile window on. The
        caller passes the PRE-step base xy — the same node the mega
        kernel's patch builder keys its window on — so XLA CSEs the two
        (BR, BC) gathers into one per step. Tap values are unchanged:
        probes lie within ~0.4 m of the base and the base moves < 2 cm
        per policy step, far inside the 1.6 m window guarantee (an env
        moving >1 m in 10 ms is exploded and auto-resets anyway)."""
        if len(self._probe_body) == 0:
            z = jnp.zeros(max(len(self._term_bodies), 1), bool)
            return z, z
        bidx = jnp.asarray(self._probe_body)
        if self._probe_on_base:
            pos = phys.qpos[:3] + S.quat_rotate(
                phys.qpos[3:7], self.model.probe_point_offset
            )
        else:
            if kfk is None:
                kfk = fk(self.model, phys.qpos)
            Rb = kfk.R[bidx]
            pb = kfk.p[bidx]
            pos = pb + jnp.einsum(
                "kij,kj->ki", Rb, self.model.probe_point_offset
            )
        if self._tile_height is not None:
            # same 3-tap-min values, one tile gather (probes are always
            # within the tile reach of the base)
            cx, cy = (
                (win_center[0], win_center[1])
                if win_center is not None
                else (phys.qpos[0], phys.qpos[1])
            )
            h = self._tile_height(cx, cy, pos[:, 0], pos[:, 1])
        else:
            h = self.terrain_height_fn(pos[:, 0], pos[:, 1])
        gap = pos[:, 2] - h
        pen = gap < 0.0
        term_flags = jnp.stack(
            [jnp.any(pen & (bidx == b)) for b in self._term_bodies]
        )
        pen_flags = jnp.stack([jnp.any(pen & (bidx == b)) for b in self._pen_bodies])
        return term_flags, pen_flags

    # ------------------------------------------------------------------ #

    def _reset_phys(self, key, env_origin) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fresh (qpos, qvel): default dofs + U(-0.1,0.1) jitter, init root
        pose at env origin (+-1 m xy jitter on custom origins)
        (reference legged_robot.py:359-397)."""
        kd, kxy = jax.random.split(key)
        m = self.model
        qj = self.default_dof_pos + jax.random.uniform(
            kd, (m.nj,), minval=-0.1, maxval=0.1
        )
        pos = jnp.asarray(self.cfg.init_state.pos) + env_origin
        if self.custom_origins:
            pos = pos.at[:2].add(jax.random.uniform(kxy, (2,), minval=-1.0, maxval=1.0))
        rot_xyzw = jnp.asarray(self.cfg.init_state.rot)
        quat = jnp.concatenate([rot_xyzw[3:4], rot_xyzw[:3]])  # -> wxyz
        qpos = jnp.concatenate([pos, quat, qj])
        qvel = jnp.concatenate(
            [
                jnp.asarray(self.cfg.init_state.lin_vel),
                jnp.asarray(self.cfg.init_state.ang_vel),
                jnp.zeros(m.nj),
            ]
        )
        return qpos, qvel

    def _init_single(self, key, env_idx) -> EnvState:
        """Initial per-env state: friction/base-mass DR sampled once
        (reference legged_robot.py:257-269,296-302), commands sampled."""
        m = self.model
        cfg = self.cfg
        (
            k_fric, k_bucket, k_mass, k_cmd, k_phys, k_lvl, k_cstiff,
            k_coff, k_motor, k_comp, k_slope, k_state,
        ) = jax.random.split(key, 12)

        if cfg.domain_rand.randomize_friction:
            lo, hi = cfg.domain_rand.friction_range
            # 256-bucket scheme as in the reference
            buckets = jax.random.uniform(k_fric, (256,), minval=lo, maxval=hi)
            shape_friction = buckets[jax.random.randint(k_bucket, (), 0, 256)]
        else:
            shape_friction = jnp.asarray(cfg.terrain.static_friction)
        # PhysX combines shape and ground friction by averaging (default
        # combine mode; plane friction from cfg.terrain.static_friction,
        # legged_robot.py:543-551) — the solver sees the effective pair value.
        friction = 0.5 * (shape_friction + cfg.terrain.static_friction)

        base_mass = m.body_mass[0]
        if cfg.domain_rand.randomize_base_mass:
            lo, hi = cfg.domain_rand.added_mass_range
            added = jax.random.uniform(k_mass, (), minval=lo, maxval=hi)
            mass_scale = (base_mass + added) / base_mass
        else:
            mass_scale = jnp.asarray(1.0)

        # terrain placement
        if self.custom_origins and self.terrain_origins is not None:
            max_init = cfg.terrain.max_init_terrain_level
            if not cfg.terrain.curriculum:
                max_init = cfg.terrain.num_rows - 1
            level = jax.random.randint(k_lvl, (), 0, max_init + 1)
            # even spread of terrain types over env index (legged_robot.py:694)
            ttype = (
                env_idx
                * cfg.terrain.num_cols
                // jnp.maximum(self.num_envs, 1)
            ).astype(jnp.int32)
            origin = self.terrain_origins[level, ttype]
        else:
            level = jnp.asarray(0, jnp.int32)
            ttype = jnp.asarray(0, jnp.int32)
            origin = jnp.zeros(3)

        if cfg.domain_rand.randomize_contact_stiffness:
            lo, hi = cfg.domain_rand.contact_stiffness_range
            # log-uniform: stiffness is a ratio quantity
            u = jax.random.uniform(k_cstiff, ())
            contact_stiffness = jnp.exp(
                jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo))
            )
        else:
            contact_stiffness = jnp.asarray(1.0)

        if cfg.domain_rand.randomize_contact_offset:
            lo, hi = cfg.domain_rand.contact_offset_range
            u = jax.random.uniform(k_coff, ())
            contact_offset = jnp.exp(
                jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo))
            )
        else:
            contact_offset = jnp.asarray(0.01)

        if cfg.domain_rand.randomize_contact_compliance:
            lo, hi = cfg.domain_rand.contact_compliance_range
            u = jax.random.uniform(k_comp, ())
            contact_compliance = jnp.exp(
                jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo))
            )
        else:
            contact_compliance = jnp.asarray(0.0)

        if cfg.domain_rand.randomize_motor_strength:
            lo, hi = cfg.domain_rand.motor_strength_range
            kp_scale, kd_scale = jax.random.uniform(
                k_motor, (2,), minval=lo, maxval=hi
            )
        else:
            kp_scale = jnp.asarray(1.0)
            kd_scale = jnp.asarray(1.0)

        if cfg.domain_rand.randomize_contact_slope:
            lo, hi = cfg.domain_rand.contact_slope_range
            slope_bias = jax.random.uniform(k_slope, (2,), minval=lo, maxval=hi)
        else:
            slope_bias = jnp.zeros(2)

        qpos, qvel = self._reset_phys(k_phys, origin)
        phys = PhysicsState(
            qpos=qpos,
            qvel=qvel,
            friction=friction,
            base_mass_scale=mass_scale,
            contact_stiffness=contact_stiffness,
            contact_offset=contact_offset,
            contact_compliance=contact_compliance,
            kp_scale=kp_scale,
            kd_scale=kd_scale,
            contact_forces=jnp.zeros((m.nbody, 3)),
            torques=jnp.zeros(m.nj),
            contact_lam=jnp.zeros(3 * m.ncon + m.nj),
            slope_bias=slope_bias,
            fk_out=jnp.zeros(14),
        )
        quat = qpos[3:7]
        na, nj = self.num_actions, m.nj
        commands = self._sample_commands(k_cmd, jnp.zeros(4))
        return EnvState(
            phys=phys,
            episode_length=jnp.asarray(0, jnp.int32),
            common_step=jnp.asarray(0, jnp.int32),
            reset_buf=jnp.asarray(True),
            time_out_buf=jnp.asarray(False),
            commands=commands,
            actions=jnp.zeros(na),
            last_actions=jnp.zeros(na),
            last_last_actions=jnp.zeros(na),
            last_dof_vel=jnp.zeros(nj),
            last_root_vel=jnp.zeros(6),
            feet_air_time=jnp.zeros(2),
            last_contacts=jnp.zeros(2, bool),
            feet_height=jnp.zeros(2),
            last_feet_z=jnp.full((2,), 0.05),
            ref_dof_pos=jnp.zeros(nj),
            rand_push_force=jnp.zeros(3),
            rand_push_torque=jnp.zeros(3),
            env_friction=shape_friction,
            obs_history=jnp.zeros((cfg.env.frame_stack, cfg.env.num_single_obs)),
            critic_history=jnp.zeros(
                (cfg.env.c_frame_stack, cfg.env.single_num_privileged_obs)
            ),
            base_lin_vel=jnp.zeros(3),
            base_ang_vel=jnp.zeros(3),
            base_euler=S.quat_to_euler_xyz(quat),
            projected_gravity=S.quat_rotate_inverse(quat, jnp.array([0.0, 0.0, -1.0])),
            episode_sums=jnp.zeros(self.n_reward_terms),
            episode_reward=jnp.asarray(0.0),
            cmd_vx_range=jnp.asarray(cfg.commands.ranges.lin_vel_x, jnp.float32),
            terrain_level=level,
            terrain_type=ttype,
            env_origin=origin,
            rng=k_state,
        )

    # ------------------------------------------------------------------ #

    def _step_single(self, state: EnvState, policy_action: jnp.ndarray):
        cfg = self.cfg
        m = self.model
        clip_a = cfg.normalization.clip_actions
        (
            rng, k_delay, k_an, k_pf, k_pt, k_cmd, k_obs, k_reset, k_rcmd, k_lvl
        ) = jax.random.split(state.rng, 10)

        # ---- XBot action pipeline (humanoid_env.py:189-197) ----
        a = policy_action
        if cfg.env.use_ref_actions:
            a = a + 2.0 * state.ref_dof_pos
        a = jnp.clip(a, -clip_a, clip_a)
        delay = jax.random.uniform(k_delay) * cfg.domain_rand.action_delay
        a = (1.0 - delay) * a + delay * state.actions
        a = a + cfg.domain_rand.action_noise * jax.random.normal(k_an, a.shape) * a
        actions = jnp.clip(a, -clip_a, clip_a)  # legged_robot.py:90-91

        # ---- physics (legged_robot.py:94-102) ----
        targets = actions * cfg.control.action_scale + self.default_dof_pos
        phys = self._phys_step(state.phys, targets)

        # ---- post-physics base quantities (legged_robot.py:128-136) ----
        # non-finite guard computed up front: an exploded env auto-resets and
        # its garbage must not leak into commands/rewards/observations
        finite = jnp.all(jnp.isfinite(phys.qpos)) & jnp.all(
            jnp.isfinite(phys.qvel)
        )
        episode_length = state.episode_length + 1
        common_step = state.common_step + 1
        quat = phys.qpos[3:7]
        base_lin_vel = S.quat_rotate_inverse(quat, phys.qvel[0:3])
        base_ang_vel = S.quat_rotate_inverse(quat, phys.qvel[3:6])
        projected_gravity = S.quat_rotate_inverse(quat, jnp.array([0.0, 0.0, -1.0]))
        base_euler = S.quat_to_euler_xyz(quat)

        # ---- callback: commands / heading / push (legged_robot.py:304-320) --
        resample = (episode_length % self.resampling_interval) == 0
        commands = jnp.where(
            resample,
            self._sample_commands(k_cmd, state.commands, state.cmd_vx_range),
            state.commands,
        )
        if cfg.commands.heading_command:
            fwd = S.quat_rotate(quat, jnp.array([1.0, 0.0, 0.0]))
            heading = jnp.arctan2(fwd[1], fwd[0])
            cmd_yaw = jnp.clip(0.5 * S.wrap_to_pi(commands[3] - heading), -1.0, 1.0)
            commands = commands.at[2].set(jnp.where(finite, cmd_yaw, 0.0))

        rand_push_force, rand_push_torque = state.rand_push_force, state.rand_push_torque
        if cfg.domain_rand.push_robots:
            do_push = (common_step % self.push_interval) == 0
            dr = cfg.domain_rand
            pf = jax.random.uniform(
                k_pf, (2,), minval=-dr.max_push_vel_xy, maxval=dr.max_push_vel_xy
            )
            pt = jax.random.uniform(
                k_pt, (3,), minval=-dr.max_push_ang_vel, maxval=dr.max_push_ang_vel
            )
            rand_push_force = jnp.where(
                do_push, jnp.concatenate([pf, jnp.zeros(1)]), rand_push_force
            )
            rand_push_torque = jnp.where(do_push, pt, rand_push_torque)
            qvel_pushed = phys.qvel.at[0:2].set(pf).at[3:6].set(pt)
            phys = phys.replace(qvel=jnp.where(do_push, qvel_pushed, phys.qvel))

        # ---- FK-derived quantities for rewards/termination ----
        if self._kernel_fk:
            # decoded from the mega kernel's end-of-step OUT_FK rows
            # (mega_kernel.py): positions base-relative, velocities world
            rel = phys.fk_out
            base_xy = phys.qpos[:2]
            feet_z = rel[4:6] + phys.qpos[2]
            feet_pos_xy = jnp.stack([rel[0:2], rel[2:4]], axis=1) + base_xy
            knee_pos_xy = jnp.stack([rel[6:8], rel[8:10]], axis=1) + base_xy
            feet_vel_xy = jnp.stack([rel[10:12], rel[12:14]], axis=1)
            kfk = None
        else:
            kfk = fk(m, phys.qpos)
            bv = body_velocities(m, phys.qpos, phys.qvel)
            feet_z = kfk.p[self.feet_idx, 2]
            feet_pos_xy = kfk.p[self.feet_idx, :2]
            knee_pos_xy = kfk.p[self.knee_idx, :2]
            feet_vel_xy = bv.v_origin[self.feet_idx, :2]
        feet_force = phys.contact_forces[self.feet_idx]
        contact = feet_force[:, 2] > 5.0
        term_flags, pen_flags = self._probe_flags(phys, kfk)

        # ---- termination (legged_robot.py:156-161) ----
        # (plus the non-finite auto-reset; the reference has no equivalent —
        # PhysX clamps internally)
        contact_term = jnp.any(term_flags) | ~finite
        time_out = episode_length > self.max_episode_length
        done = contact_term | time_out
        # scrub NaN-derived quantities so they cannot reach rewards/obs
        safe = lambda x, d=0.0: jnp.where(
            finite, jnp.nan_to_num(x, nan=d, posinf=d, neginf=d), jnp.full_like(x, d)
        )
        base_lin_vel = safe(base_lin_vel)
        base_ang_vel = safe(base_ang_vel)
        base_euler = safe(base_euler)
        projected_gravity = jnp.where(
            finite, projected_gravity, jnp.asarray([0.0, 0.0, -1.0])
        )

        # ---- rewards (legged_robot.py:217-235) ----
        phase_rew = self._gait_phase(episode_length)
        ctx = R.RewardCtx(
            dt=self.dt,
            default_dof_pos=self.default_dof_pos,
            cycle_time=cfg.rewards.cycle_time,
            target_joint_pos_scale=cfg.rewards.target_joint_pos_scale,
            target_feet_height=cfg.rewards.target_feet_height,
            base_height_target=cfg.rewards.base_height_target,
            min_dist=cfg.rewards.min_dist,
            max_dist=cfg.rewards.max_dist,
            tracking_sigma=cfg.rewards.tracking_sigma,
            max_contact_force=cfg.rewards.max_contact_force,
            sole_offset=cfg.rewards.sole_offset,
            dof_pos=phys.qpos[7:],
            dof_vel=phys.qvel[6:],
            last_dof_vel=state.last_dof_vel,
            actions=actions,
            last_actions=state.last_actions,
            last_last_actions=state.last_last_actions,
            torques=phys.torques,
            base_lin_vel=base_lin_vel,
            base_ang_vel=base_ang_vel,
            base_euler=base_euler,
            projected_gravity=projected_gravity,
            commands=commands,
            root_z=phys.qpos[2],
            root_vel=phys.qvel[0:6],
            last_root_vel=state.last_root_vel,
            feet_z=feet_z,
            feet_vel_xy=feet_vel_xy,
            feet_pos_xy=feet_pos_xy,
            knee_pos_xy=knee_pos_xy,
            feet_contact_force=feet_force,
            contact=contact,
            stance_mask=self._stance_mask(phase_rew),
            ref_dof_pos=state.ref_dof_pos,
            collision_flags=pen_flags,
            feet_air_time=state.feet_air_time,
            last_contacts=state.last_contacts,
            feet_height=state.feet_height,
            last_feet_z=state.last_feet_z,
        )
        term_values = jnp.stack([fn(ctx) for fn in self._reward_fns])
        term_values = jnp.where(finite, term_values, 0.0)
        scaled = term_values * self.reward_scales
        episode_sums = state.episode_sums + scaled
        reward = jnp.sum(scaled)
        if cfg.rewards.only_positive_rewards:
            reward = jnp.maximum(reward, 0.0)
        if self.termination_scale != 0.0:
            reward = reward + self.termination_scale * (done & ~time_out)

        fsu = R.feet_state_update(ctx)
        fsu = R.FeetStateUpdate(
            feet_air_time=jnp.where(finite, fsu.feet_air_time, 0.0),
            last_contacts=fsu.last_contacts & finite,
            feet_height=jnp.where(finite, fsu.feet_height, 0.0),
            last_feet_z=jnp.where(finite, fsu.last_feet_z, 0.05),
        )

        # ---- masked auto-reset (legged_robot.py:163-215) ----
        # terrain curriculum (legged_robot.py:400-420)
        level, ttype, env_origin = state.terrain_level, state.terrain_type, state.env_origin
        if cfg.terrain.curriculum and self.terrain_origins is not None:
            dist = jnp.linalg.norm(phys.qpos[:2] - env_origin[:2])
            need = (
                jnp.linalg.norm(commands[:2]) * cfg.env.episode_length_s * 0.5
            )
            if getattr(cfg.terrain, "curriculum_mode", "distance") == "survival":
                # survival promotion (EXTENSION, config/base.py note): the
                # reference's distance rule equilibrates at the amplitude
                # the policy can WALK 2.5 m on; the deployment footing gap
                # demands SURVIVING deeper amplitude (docs/ROUND3.md)
                move_up = time_out & (dist >= need)
                move_down = (~time_out) & (
                    state.episode_length < self.max_episode_length // 2
                )
            else:
                move_up = dist > cfg.terrain.terrain_length / 2
                move_down = (dist < need) & ~move_up
            new_level = level + move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
            rand_level = jax.random.randint(k_lvl, (), 0, self.max_terrain_level)
            new_level = jnp.where(
                new_level >= self.max_terrain_level,
                rand_level,
                jnp.maximum(new_level, 0),
            )
            level = jnp.where(done, new_level, level)
            env_origin = jnp.where(
                done, self.terrain_origins[level, ttype], env_origin
            )

        # command curriculum (legged_robot.py:179-180,422-431) is GLOBAL:
        # one shared lin_vel_x range widened from the mean tracking reward
        # over resetting envs. That cross-env reduction cannot live in this
        # per-env (vmapped) function — it is applied in the `_step_batch`
        # epilogue below; here the range is just carried through.
        cmd_vx_range = state.cmd_vx_range

        qpos_r, qvel_r = self._reset_phys(k_reset, env_origin)
        phys = phys.replace(
            qpos=jnp.where(done, qpos_r, phys.qpos),
            qvel=jnp.where(done, qvel_r, phys.qvel),
            # the warm-start carry belongs to the previous configuration —
            # a crash's impulses must not seed the new episode's first solve
            contact_lam=jnp.where(
                done, jnp.zeros_like(phys.contact_lam), phys.contact_lam
            ),
        )
        commands = jnp.where(
            done, self._sample_commands(k_rcmd, commands, cmd_vx_range), commands
        )
        zero_if_done = lambda x: jnp.where(done, jnp.zeros_like(x), x)
        actions_post = zero_if_done(actions)
        last_actions = zero_if_done(state.last_actions)
        last_last_actions = zero_if_done(state.last_last_actions)
        feet_air_time = zero_if_done(fsu.feet_air_time)
        episode_length = jnp.where(done, 0, episode_length)
        obs_history = zero_if_done(state.obs_history)
        critic_history = zero_if_done(state.critic_history)
        # logging contributions at reset (legged_robot.py:199-202)
        ep_term_sums = jnp.where(
            done, episode_sums / cfg.env.episode_length_s, jnp.zeros_like(episode_sums)
        )
        ep_len_at_reset = jnp.where(done, state.episode_length + 1, 0).astype(
            jnp.float32
        )
        episode_reward = state.episode_reward + reward
        ep_reward_at_reset = jnp.where(done, episode_reward, 0.0)
        episode_reward = jnp.where(done, 0.0, episode_reward)
        episode_sums = zero_if_done(episode_sums)
        # gravity-fix recompute for reset envs (legged_robot.py:212-215);
        # base lin/ang vel deliberately stay stale (reference behavior).
        quat_post = phys.qpos[3:7]
        base_euler = jnp.where(done, S.quat_to_euler_xyz(quat_post), base_euler)
        projected_gravity = jnp.where(
            done,
            S.quat_rotate_inverse(quat_post, jnp.array([0.0, 0.0, -1.0])),
            projected_gravity,
        )

        # ---- observations (humanoid_env.py:200-262) ----
        phase = self._gait_phase(episode_length)
        sin_pos = jnp.sin(2 * jnp.pi * phase)
        cos_pos = jnp.cos(2 * jnp.pi * phase)
        ref_dof_pos = self._ref_dof_pos(phase)
        stance_mask_obs = self._stance_mask(phase)
        os_ = cfg.normalization.obs_scales
        command_input = jnp.concatenate(
            [sin_pos[None], cos_pos[None], commands[:3] * self.commands_scale]
        )
        dof_pos = phys.qpos[7:]
        dof_vel = phys.qvel[6:]
        q = (dof_pos - self.default_dof_pos) * os_.dof_pos
        dq = dof_vel * os_.dof_vel

        single_obs = jnp.concatenate(
            [
                command_input,  # 5
                q,  # 12
                dq,  # 12
                actions_post,  # 12
                base_ang_vel * os_.ang_vel,  # 3
                base_euler * os_.quat,  # 3
            ]
        )
        single_priv = jnp.concatenate(
            [
                command_input,  # 5
                q,  # 12
                dq,  # 12
                actions_post,  # 12
                dof_pos - ref_dof_pos,  # 12
                base_lin_vel * os_.lin_vel,  # 3
                base_ang_vel * os_.ang_vel,  # 3
                base_euler * os_.quat,  # 3
                rand_push_force[:2],  # 2
                rand_push_torque,  # 3
                state.env_friction[None],  # 1
                (m.body_mass[0] * phys.base_mass_scale)[None] / 30.0,  # 1
                stance_mask_obs,  # 2
                contact.astype(jnp.float32),  # 2
            ]
        )
        if self.measure_heights:
            # yaw-rotated sample grid around the base (legged_robot.py:759-795)
            pts = S.quat_apply_yaw(
                jnp.broadcast_to(quat_post, (self.num_height_points, 4)),
                jnp.concatenate(
                    [self.height_points, jnp.zeros((self.num_height_points, 1))],
                    axis=-1,
                ),
            )
            px = pts[:, 0] + phys.qpos[0]
            py = pts[:, 1] + phys.qpos[1]
            h = self.terrain_height_fn(px, py)
            h_obs = jnp.clip(
                phys.qpos[2] - 0.5 - h, -1.0, 1.0
            ) * os_.height_measurements
            single_priv = jnp.concatenate([single_priv, h_obs])
        assert single_obs.shape[0] == cfg.env.num_single_obs, (
            single_obs.shape, cfg.env.num_single_obs
        )
        assert single_priv.shape[0] == cfg.env.single_num_privileged_obs, (
            single_priv.shape, cfg.env.single_num_privileged_obs
        )
        if cfg.noise.add_noise:
            single_obs = single_obs + (
                jax.random.normal(k_obs, single_obs.shape)
                * self.noise_scale_vec
                * cfg.noise.noise_level
            )

        obs_history = jnp.roll(obs_history, -1, axis=0).at[-1].set(single_obs)
        critic_history = jnp.roll(critic_history, -1, axis=0).at[-1].set(single_priv)
        clip_o = cfg.normalization.clip_observations
        obs = jnp.clip(obs_history.reshape(-1), -clip_o, clip_o)
        priv_obs = jnp.clip(critic_history.reshape(-1), -clip_o, clip_o)

        # ---- last_* rotation (legged_robot.py:147-151, post-reset values) --
        new_state = EnvState(
            phys=phys,
            episode_length=episode_length,
            common_step=common_step,
            reset_buf=done,
            time_out_buf=time_out,
            commands=commands,
            actions=actions_post,
            last_actions=actions_post,
            last_last_actions=last_actions,
            last_dof_vel=dof_vel,
            last_root_vel=phys.qvel[0:6],
            feet_air_time=feet_air_time,
            last_contacts=fsu.last_contacts,
            feet_height=fsu.feet_height,
            last_feet_z=fsu.last_feet_z,
            ref_dof_pos=ref_dof_pos,
            rand_push_force=rand_push_force,
            rand_push_torque=rand_push_torque,
            env_friction=state.env_friction,
            obs_history=obs_history,
            critic_history=critic_history,
            base_lin_vel=base_lin_vel,
            base_ang_vel=base_ang_vel,
            base_euler=base_euler,
            projected_gravity=projected_gravity,
            episode_sums=episode_sums,
            episode_reward=episode_reward,
            cmd_vx_range=cmd_vx_range,
            terrain_level=level,
            terrain_type=ttype,
            env_origin=env_origin,
            rng=rng,
        )
        trans = Transition(
            obs=obs,
            privileged_obs=priv_obs,
            reward=reward,
            done=done,
            time_out=time_out,
            ep_term_sums=ep_term_sums,
            ep_reset_count=done.astype(jnp.int32),
            ep_len_at_reset=ep_len_at_reset,
            ep_reward_at_reset=ep_reward_at_reset,
            nonfinite=(~finite).astype(jnp.int32),
            terrain_level=level.astype(jnp.float32),
        )
        return new_state, trans

    # ------------------------------------------------------------------ #

    def _step_batch(self, state: EnvState, actions: jnp.ndarray):
        """Batched step: vmapped per-env step + global command curriculum.

        Reference `update_command_curriculum` (legged_robot.py:422-431)
        widens ONE global lin_vel_x range by +-0.5 (clipped to
        max_curriculum) when the mean tracking_lin_vel episode reward over
        the envs resetting this step exceeds 80% of its per-step maximum,
        gated to once per max_episode_length common steps. The mean is a
        cross-env reduction (a psum under env-axis sharding). Deviation
        note: the reference widens the range *before* the same-step command
        resample; here resetting envs sample from the pre-update range and
        the widened range applies from the next reset on (one-resample lag,
        gate fires at most once per episode length so the lag is one step).
        """
        new_state, trans = self._vstep(state, actions)
        if self.cfg.commands.curriculum and "tracking_lin_vel" in self.reward_names:
            ti = self.reward_names.index("tracking_lin_vel")
            track_scale = self.reward_scales[ti]
            n_reset = jnp.sum(trans.done)
            # ep_term_sums[:, ti] = episode_sums[ti]/episode_length_s at
            # reset (0 elsewhere); x dt recovers sums/max_episode_length.
            mean_track = (
                jnp.sum(trans.ep_term_sums[:, ti]) * self.dt
                / jnp.maximum(n_reset, 1)
            )
            check = (new_state.common_step[0] % self.max_episode_length) == 0
            good = (n_reset > 0) & check & (mean_track > 0.8 * track_scale)
            mc = self.cfg.commands.max_curriculum
            cur = new_state.cmd_vx_range  # (N, 2), globally synchronized
            grown = jnp.stack(
                [
                    jnp.clip(cur[:, 0] - 0.5, -mc, 0.0),
                    jnp.clip(cur[:, 1] + 0.5, 0.0, mc),
                ],
                axis=-1,
            )
            new_state = new_state.replace(
                cmd_vx_range=jnp.where(good, grown, cur)
            )
        return new_state, trans

    def reset_all(self, key):
        """Fresh batched state + first obs via a zero-action step
        (reference legged_robot.py:112-117 reset())."""
        keys = jax.random.split(key, self.num_envs)
        state = jax.jit(self.init_state)(keys, jnp.arange(self.num_envs))
        zero = jnp.zeros((self.num_envs, self.num_actions))
        state, trans = jax.jit(self.step)(state, zero)
        return state, trans.obs, trans.privileged_obs


def make_env(cfg: LeggedRobotCfg, num_envs: Optional[int] = None, **kw) -> HumanoidEnv:
    """Build an env, synthesizing terrain if the config asks for it."""
    if cfg.terrain.mesh_type in ("heightfield", "trimesh"):
        from ..terrain.terrain import TerrainMap, make_height_fn

        tmap = TerrainMap.build(cfg.terrain, np.random.default_rng(0))
        kw.setdefault("terrain_height_fn", make_height_fn(tmap))
        kw.setdefault("terrain_origins", tmap.env_origins)
        kw.setdefault("terrain_map", tmap)
    return HumanoidEnv(cfg, num_envs=num_envs, **kw)
