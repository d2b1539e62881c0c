"""Task registry: name -> (env builder, env cfg, train cfg).

Capability analog of the reference TaskRegistry
(humanoid/utils/task_registry.py:44-163) with the same registration pattern
(envs/__init__.py:42 registers "humanoid_ppo"), minus the eval()-based class
resolution (SURVEY §2.4 oddity — replaced by explicit callables).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional


class TaskSpec(NamedTuple):
    make_env_cfg: Callable  # () -> LeggedRobotCfg
    make_train_cfg: Callable  # () -> PPOCfg
    make_env_custom: Optional[Callable] = None  # (num_envs) -> env


_REGISTRY: Dict[str, TaskSpec] = {}


def register(name: str, make_env_cfg, make_train_cfg, make_env_custom=None) -> None:
    _REGISTRY[name] = TaskSpec(make_env_cfg, make_train_cfg, make_env_custom)


def get_task(name: str) -> TaskSpec:
    if name not in _REGISTRY:
        raise KeyError(f"unknown task {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def task_names():
    return sorted(_REGISTRY)


def make_env(name: str, num_envs: Optional[int] = None, cfg_overrides=None):
    """Build (env, env_cfg) for a registered task (task_registry.py:65-103)."""
    from .envs import make_env as _make

    spec = get_task(name)
    cfg = spec.make_env_cfg()
    if cfg_overrides:
        cfg_overrides(cfg)
    if num_envs is not None:
        cfg.env.num_envs = num_envs
    if spec.make_env_custom is not None:
        return spec.make_env_custom(cfg.env.num_envs, cfg_overrides), cfg
    return _make(cfg), cfg


def _register_builtin():
    from .config.xbotl import XBotLCfg, XBotLCfgPPO

    register("humanoid_ppo", XBotLCfg, XBotLCfgPPO)

    # BASELINE config ladder variants
    def small_flat():  # config[1]: 256 envs, flat, short horizon
        cfg = XBotLCfg()
        cfg.env.num_envs = 256
        cfg.env.episode_length_s = 12.0
        return cfg

    def small_flat_ppo():
        cfg = XBotLCfgPPO()
        cfg.runner.max_iterations = 500
        cfg.runner.experiment_name = "XBot_ppo_small"
        return cfg

    register("humanoid_ppo_small", small_flat, small_flat_ppo)

    def terrain():  # config[3]: trimesh curriculum + push + full DR
        cfg = XBotLCfg()
        cfg.terrain.mesh_type = "trimesh"
        cfg.terrain.curriculum = True
        return cfg

    def terrain_ppo():
        cfg = XBotLCfgPPO()
        cfg.runner.experiment_name = "XBot_ppo_terrain"
        return cfg

    register("humanoid_ppo_terrain", terrain, terrain_ppo)

    def robust():  # full recipe + contact-model DR (transfer mitigation):
        # round-1/2 finding — late checkpoints overfit engine-specific
        # contact detail and lose zero-shot MuJoCo transfer. Recipe v3
        # (stiffness [0.5,2] + contact-offset jitter + per-env CFM
        # compliance; docs/ROUND2.md) keeps ckpt 1400-2600 mostly 13-16/16
        # MuJoCo survivals vs round-1's 0/16 past ckpt 600. No recipe made
        # EVERY late ckpt safe — pair with robustness-curve ckpt selection.
        cfg = XBotLCfg()
        cfg.domain_rand.randomize_contact_stiffness = True
        cfg.domain_rand.randomize_contact_offset = True
        cfg.domain_rand.randomize_contact_compliance = True
        return cfg

    def robust_ppo():
        cfg = XBotLCfgPPO()
        cfg.runner.experiment_name = "XBot_ppo_robust"
        return cfg

    register("humanoid_ppo_robust", robust, robust_ppo)

    def terrain_robust():  # production config: terrain curriculum + the
        # contact-model DR transfer recipe (docs/ROUND2.md) together
        cfg = terrain()
        cfg.domain_rand.randomize_contact_stiffness = True
        cfg.domain_rand.randomize_contact_offset = True
        cfg.domain_rand.randomize_contact_compliance = True
        cfg.domain_rand.randomize_contact_slope = True
        # v2 (round 5, VERDICT #5): the v1 recipe (distance curriculum, no
        # speed teeth) had a KNOWN late-window transfer collapse — 16/16
        # flat MuJoCo through ckpt 2800, then 0/16 at 2900-3001 while
        # in-engine reward stayed healthy (docs/ROUND4.md). Apply the two
        # ingredients that made humanoid_joint_deploy selection-free:
        # survival-based curriculum promotion and sharp speed-tracking
        # teeth (standing still at cmd>0 costs reward, so late training
        # cannot drift into engine-detail exploitation at depth).
        cfg.terrain.curriculum_mode = "survival"
        cfg.rewards.scales.low_speed = 0.6
        cfg.rewards.scales.track_vel_hard = 1.0
        return cfg

    def terrain_robust_ppo():
        cfg = XBotLCfgPPO()
        cfg.runner.experiment_name = "XBot_ppo_terrain_robust"
        return cfg

    register("humanoid_ppo_terrain_robust", terrain_robust, terrain_robust_ppo)

    def _apply_rubble(cfg):  # deployment-matched coarse unevenness +
        # contact DR: trains the balance/footing family the MuJoCo sim2sim
        # terrain (uneven.png, 1 m cells up to 0.35 m) actually demands —
        # the reference humanoid menu tops out at +-0.07 m roughness and
        # its graduates fall on that hfield (docs/ROUND2.md).
        cfg.terrain.mesh_type = "trimesh"
        cfg.terrain.curriculum = True
        cfg.terrain.style = "rubble"
        cfg.terrain.terrain_proportions = [0.2]  # 20% gentle, 80% rubble
        # climbable curriculum (v2 after the v1 run stalled at level ~1):
        # the reference XBot terrain cfg's finer level ladder
        # (humanoid_config.py:81-83: 20 rows, init spread 10) + a shorter
        # promotion distance (terrain_length/2 = 2.5 m — the frozen
        # update_terrain_curriculum formula, smaller patches), and an
        # amplitude floor so even level-0 rubble envs see 8 cm cells.
        cfg.terrain.num_rows = 20
        cfg.terrain.max_init_terrain_level = 10
        cfg.terrain.terrain_length = 5.0
        cfg.terrain.rubble_base = 0.08
        cfg.terrain.rubble_span = 0.27
        cfg.domain_rand.randomize_contact_stiffness = True
        cfg.domain_rand.randomize_contact_offset = True
        cfg.domain_rand.randomize_contact_compliance = True
        # slope analog of the contact-model DR: policies must not exploit
        # exact slope-contact detail (docs/ROUND2.md footing forensics)
        cfg.domain_rand.randomize_contact_slope = True

    def rubble():
        cfg = XBotLCfg()
        _apply_rubble(cfg)
        return cfg

    def rubble_ppo():
        cfg = XBotLCfgPPO()
        cfg.runner.experiment_name = "XBot_ppo_rubble"
        return cfg

    register("humanoid_ppo_rubble", rubble, rubble_ppo)

    def deploy():  # train DIRECTLY on the deployment heightfield: random
        # windows of the MuJoCo sim2sim terrain (uneven.png) bilinearly
        # upsampled to the training grid, amplitude ramped by the terrain
        # curriculum, plus contact-model DR. With the sloped contact
        # frames this is the closest in-engine replica of the footing the
        # zero-shot transfer check demands.
        cfg = rubble()
        cfg.terrain.style = "deploy"
        return cfg

    def deploy_ppo():
        cfg = XBotLCfgPPO()
        cfg.runner.experiment_name = "XBot_ppo_deploy"
        return cfg

    register("humanoid_ppo_deploy", deploy, deploy_ppo)

    from .config.xbots import XBotSCfg, XBotSCfgPPO

    register("humanoid_s_ppo", XBotSCfg, XBotSCfgPPO)

    # joint XBot-L + XBot-S batch under one policy (BASELINE config[4])
    def joint_env(num_envs, cfg_overrides=None):
        from .envs.joint import make_joint_xbot_env

        half = num_envs // 2
        return make_joint_xbot_env(num_envs - half, half, cfg_overrides)

    def joint_ppo():
        cfg = XBotLCfgPPO()
        cfg.runner.experiment_name = "XBot_joint_ppo"
        # DWL-style estimator head supervised on the newest privileged
        # frame's base linear velocity (slice 199:202 of the 219 critic
        # input) — trained for real in the joint run (BASELINE config[4])
        cfg.policy.estimator_dim = 3
        cfg.algorithm.estimator_coef = 1.0
        return cfg

    register("humanoid_joint_ppo", XBotLCfg, joint_ppo, make_env_custom=joint_env)

    # joint XBot-L + XBot-S on the DEPLOYMENT heightfield: round-2 found
    # (a) multi-morphology training is the strongest late-transfer
    # regularizer (joint_v1 robustness curve recovers to 16/16 with zero
    # contact DR — docs/ROUND2.md) and (b) the footing gap is
    # engine-detail exploitation on slopes; this recipe combines both
    # remedies with the upgraded sloped-frame/bilinear contact model.
    def _apply_joint_deploy_v2(cfg):
        _apply_rubble(cfg)
        cfg.terrain.style = "deploy"
        # v2 (round 3): the v1 run tracked 0.97 of max in-engine but its
        # MuJoCo hfield progress stalled at spawns whose local amplitude
        # exceeded the trained exposure — the curriculum plateaued at
        # level ~6/20 (~46% of the deployment's 0.35 m). Spread envs
        # across ALL levels from iter 0 (demotion sorts the ladder), lift
        # the amplitude floor to 34% so even level-0 envs train real
        # footing, and strengthen pushes toward the effective disturbance
        # rough ground delivers (the hfield knocks the base around far
        # harder than flat training's +-0.2 m/s).
        cfg.terrain.max_init_terrain_level = 20
        cfg.terrain.rubble_base = 0.12
        cfg.domain_rand.max_push_vel_xy = 0.3
        cfg.domain_rand.max_push_ang_vel = 0.6
        # v3: survival-based promotion (config/base.py curriculum_mode).
        # The v2 run walked the hfield at reference-beating distance
        # (2.15 m @ckpt1200) but its distance-rule curriculum equilibrated
        # at ~0.17 m amplitude — survival on the 0.35 m deployment cells
        # was never trained, and hfield survival plateaued at 11-13/24.
        cfg.terrain.curriculum_mode = "survival"
        # v4: sharper speed-tracking teeth. The v3 run nailed survival
        # (18-20/24, reference-level) but its gait turned cautious — hfield
        # mean progress 0.96 m vs the reference's 1.53 m, with cmd-0.4
        # rollouts stalling below the 50%-tracking gate. The smooth
        # exp(-5·err²) tracking term barely distinguishes 50% tracking from
        # 100%; the sharp terms are `low_speed` (hard −1.0 below half the
        # commanded speed, +1.2 in-band — humanoid_env.py:469-500) and
        # `track_vel_hard` (exp(-10·err) + linear −0.2·err). Raise both so
        # standing still at cmd>0 costs reward even at deep terrain levels.
        cfg.rewards.scales.low_speed = 0.6
        cfg.rewards.scales.track_vel_hard = 1.0
        # v5 (round-5 controlled finding): XBot-S keeps the UNSCALED
        # terrain in JOINT training. Giving the S half Froude-scaled
        # (morphology-consistent) terrain degraded the SHARED policy's
        # hfield transfer in every clean run — L standings 77/71/51
        # survived (seeds default/7/3, froude on) vs 91 without it; a
        # bitwise A/B (3 identical train iterations, identical rollout
        # hashes) proved round-5 code is otherwise numerically identical
        # to round 4, so the delta IS this knob. The S half's 1.37x
        # relative amplitude acts as load-bearing hard-footing data for
        # the shared policy (docs/ROUND5.md). froude_scale stays the
        # XBotSCfg default for STANDALONE S tasks (humanoid_s_ppo).
        cfg.terrain.froude_scale = 1.0
        cfg.terrain.deploy_mjcf = None

    def joint_deploy_env(num_envs, cfg_overrides=None):
        from .envs.joint import make_joint_xbot_env

        def ov(cfg):
            _apply_joint_deploy_v2(cfg)
            if cfg_overrides:
                cfg_overrides(cfg)

        half = num_envs // 2
        return make_joint_xbot_env(num_envs - half, half, ov)

    def joint_deploy_cfg():
        cfg = XBotLCfg()
        _apply_joint_deploy_v2(cfg)
        return cfg

    def joint_deploy_ppo():
        cfg = joint_ppo()
        cfg.runner.experiment_name = "XBot_joint_deploy"
        return cfg

    register(
        "humanoid_joint_deploy",
        joint_deploy_cfg,
        joint_deploy_ppo,
        make_env_custom=joint_deploy_env,
    )


_register_builtin()
