"""Golden tests for the env layer: obs layout, rewards, gait, resets.

The reference has no tests (SURVEY §4); these encode its numerical contract
(SURVEY §2.4) as deterministic assertions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_gym_tpu.config.xbotl import XBotLCfg
from humanoid_gym_tpu.envs import make_env
from humanoid_gym_tpu.envs import rewards as R


def _quiet_cfg(n=2):
    cfg = XBotLCfg()
    cfg.env.num_envs = n
    cfg.noise.add_noise = False
    cfg.domain_rand.randomize_friction = False
    cfg.domain_rand.randomize_base_mass = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.action_delay = 0.0
    cfg.domain_rand.action_noise = 0.0
    return cfg


@pytest.fixture(scope="module")
def quiet_env():
    cfg = _quiet_cfg()
    return make_env(cfg), cfg


@pytest.fixture(scope="module")
def stepped(quiet_env):
    env, cfg = quiet_env
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.env.num_envs)
    state = env.init_state(keys, jnp.arange(cfg.env.num_envs))
    step = jax.jit(env.step)
    actions = 0.1 * jnp.ones((cfg.env.num_envs, 12))
    states, trs = [state], []
    for _ in range(3):
        state, tr = step(state, actions)
        states.append(state)
        trs.append(tr)
    return env, cfg, states, trs, actions


def test_obs_layout(stepped):
    """Actor obs frame layout (humanoid_env.py:237-244): [cmd_input(5),
    q(12), dq(12), actions(12), ang_vel(3), euler(3)] stacked x15."""
    env, cfg, states, trs, actions = stepped
    state, tr = states[-1], trs[-1]
    obs = np.asarray(tr.obs).reshape(cfg.env.num_envs, 15, 47)
    newest = obs[:, -1, :]

    ep = np.asarray(state.episode_length, np.float64)
    phase = ep * env.dt / cfg.rewards.cycle_time
    np.testing.assert_allclose(newest[:, 0], np.sin(2 * np.pi * phase), atol=1e-5)
    np.testing.assert_allclose(newest[:, 1], np.cos(2 * np.pi * phase), atol=1e-5)
    cmd = np.asarray(state.commands)
    np.testing.assert_allclose(newest[:, 2], cmd[:, 0] * 2.0, atol=1e-5)
    np.testing.assert_allclose(newest[:, 3], cmd[:, 1] * 2.0, atol=1e-5)
    np.testing.assert_allclose(newest[:, 4], cmd[:, 2] * 1.0, atol=1e-5)
    q = np.asarray(state.phys.qpos[:, 7:]) - np.asarray(env.default_dof_pos)
    np.testing.assert_allclose(newest[:, 5:17], q, atol=1e-5)
    dq = np.asarray(state.phys.qvel[:, 6:]) * 0.05
    np.testing.assert_allclose(newest[:, 17:29], dq, atol=1e-5)
    np.testing.assert_allclose(newest[:, 29:41], np.asarray(state.actions), atol=1e-5)
    np.testing.assert_allclose(
        newest[:, 41:44], np.asarray(state.base_ang_vel), atol=1e-5
    )
    np.testing.assert_allclose(newest[:, 44:47], np.asarray(state.base_euler), atol=1e-5)

    # frame stacking: after 3 steps, frames 0..11 are zero, 12..14 nonzero
    assert np.all(obs[:, :12, :] == 0)
    assert np.any(obs[:, 12, :] != 0)


def test_priv_obs_layout(stepped):
    """Privileged obs frame (humanoid_env.py:219-235), 73 dims, stacked x3."""
    env, cfg, states, trs, actions = stepped
    state, tr = states[-1], trs[-1]
    priv = np.asarray(tr.privileged_obs).reshape(cfg.env.num_envs, 3, 73)
    newest = priv[:, -1, :]
    # diff slice = dof_pos - ref_dof_pos
    diff = np.asarray(state.phys.qpos[:, 7:]) - np.asarray(state.ref_dof_pos)
    np.testing.assert_allclose(newest[:, 41:53], diff, atol=1e-5)
    # base lin vel x2
    np.testing.assert_allclose(
        newest[:, 53:56], 2.0 * np.asarray(state.base_lin_vel), atol=1e-5
    )
    # layout: cmd(0:5) q(5:17) dq(17:29) act(29:41) diff(41:53) linvel(53:56)
    # angvel(56:59) euler(59:62) push_f(62:64) push_t(64:67) fric(67)
    # mass(68) stance(69:71) contact(71:73)
    np.testing.assert_allclose(newest[:, 67], np.asarray(state.env_friction), atol=1e-5)
    base_mass = float(env.model.body_mass[0])
    np.testing.assert_allclose(newest[:, 68], base_mass / 30.0, rtol=1e-4)
    # stance mask sums >= 1
    assert np.all(newest[:, 69:71].sum(-1) >= 1.0 - 1e-6)


def test_ref_gait_and_stance(quiet_env):
    """Reference gait targets and stance mask (humanoid_env.py:105-142)."""
    env, cfg = quiet_env
    # phase=0.25 cycle -> sin=1: right leg swings (sin_r=1), left stance
    ref = np.asarray(env._ref_dof_pos(jnp.asarray(0.25)))
    s1 = cfg.rewards.target_joint_pos_scale
    np.testing.assert_allclose(ref[[8, 9, 10]], [s1, 2 * s1, s1], atol=1e-6)
    np.testing.assert_allclose(ref[[2, 3, 4]], 0.0, atol=1e-6)
    stance = np.asarray(env._stance_mask(jnp.asarray(0.25)))
    np.testing.assert_allclose(stance, [1.0, 0.0])
    # double support at phase ~0 (|sin|<0.1)
    stance0 = np.asarray(env._stance_mask(jnp.asarray(0.0)))
    np.testing.assert_allclose(stance0, [1.0, 1.0])
    ref0 = np.asarray(env._ref_dof_pos(jnp.asarray(0.0)))
    np.testing.assert_allclose(ref0, 0.0, atol=1e-6)


def test_termination_and_reset(quiet_env):
    """Timeout reset: histories zeroed, episode_length back to 0, dof jitter
    within +-0.1 (legged_robot.py:156-215, humanoid_env.py:264-269)."""
    env, cfg = quiet_env
    n = cfg.env.num_envs
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    state = env.init_state(keys, jnp.arange(n))
    step = jax.jit(env.step)
    state, _ = step(state, jnp.zeros((n, 12)))
    # force timeout on env 0
    ep = state.episode_length.at[0].set(env.max_episode_length)
    state = state.replace(episode_length=ep)
    state, tr = step(state, 0.3 * jnp.ones((n, 12)))
    assert bool(tr.done[0]) and bool(tr.time_out[0])
    assert not bool(tr.done[1])
    assert int(state.episode_length[0]) == 0
    # obs history: all but newest frame zeroed for env 0
    hist = np.asarray(state.obs_history)
    assert np.all(hist[0, :-1, :] == 0)
    # actions zeroed (reference reset_idx)
    assert np.all(np.asarray(state.actions[0]) == 0)
    # dof pos back near default
    qj = np.asarray(state.phys.qpos[0, 7:])
    assert np.all(np.abs(qj - np.asarray(env.default_dof_pos)) <= 0.1 + 1e-5)
    # episode stats logged
    assert int(tr.ep_reset_count[0]) == 1
    assert float(tr.ep_len_at_reset[0]) > 0


def test_action_pipeline_clip(quiet_env):
    """Actions clipped to +-18 (humanoid_config.py:226-227)."""
    env, cfg = quiet_env
    n = cfg.env.num_envs
    keys = jax.random.split(jax.random.PRNGKey(2), n)
    state = env.init_state(keys, jnp.arange(n))
    state, tr = jax.jit(env.step)(state, 100.0 * jnp.ones((n, 12)))
    assert np.all(np.abs(np.asarray(state.actions)) <= 18.0)


# ------------------------- reward term golden tests ------------------------ #


def _ctx(**over):
    base = dict(
        dt=0.01,
        default_dof_pos=jnp.zeros(12),
        cycle_time=0.64,
        target_joint_pos_scale=0.17,
        target_feet_height=0.06,
        base_height_target=0.89,
        min_dist=0.2,
        max_dist=0.5,
        tracking_sigma=5.0,
        max_contact_force=700.0,
        sole_offset=0.05,
        dof_pos=jnp.zeros(12),
        dof_vel=jnp.zeros(12),
        last_dof_vel=jnp.zeros(12),
        actions=jnp.zeros(12),
        last_actions=jnp.zeros(12),
        last_last_actions=jnp.zeros(12),
        torques=jnp.zeros(12),
        base_lin_vel=jnp.zeros(3),
        base_ang_vel=jnp.zeros(3),
        base_euler=jnp.zeros(3),
        projected_gravity=jnp.asarray([0.0, 0.0, -1.0]),
        commands=jnp.zeros(4),
        root_z=jnp.asarray(0.95),
        root_vel=jnp.zeros(6),
        last_root_vel=jnp.zeros(6),
        feet_z=jnp.asarray([0.06, 0.06]),
        feet_vel_xy=jnp.zeros((2, 2)),
        feet_pos_xy=jnp.asarray([[0.0, 0.15], [0.0, -0.15]]),
        knee_pos_xy=jnp.asarray([[0.0, 0.12], [0.0, -0.12]]),
        feet_contact_force=jnp.zeros((2, 3)),
        contact=jnp.asarray([True, True]),
        stance_mask=jnp.asarray([1.0, 1.0]),
        ref_dof_pos=jnp.zeros(12),
        collision_flags=jnp.asarray([False]),
        feet_air_time=jnp.zeros(2),
        last_contacts=jnp.asarray([False, False]),
        feet_height=jnp.zeros(2),
        last_feet_z=jnp.asarray([0.01, 0.01]),
    )
    base.update(over)
    return R.RewardCtx(**base)


def test_reward_tracking():
    ctx = _ctx(
        commands=jnp.asarray([0.5, 0.0, 0.2, 0.0]),
        base_lin_vel=jnp.asarray([0.4, 0.1, 0.0]),
        base_ang_vel=jnp.asarray([0.0, 0.0, 0.1]),
    )
    err = (0.5 - 0.4) ** 2 + 0.1**2
    np.testing.assert_allclose(
        float(R.tracking_lin_vel(ctx)), np.exp(-err * 5.0), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(R.tracking_ang_vel(ctx)), np.exp(-0.01 * 5.0), rtol=1e-5
    )


def test_reward_low_speed_branches():
    mk = lambda v, c: _ctx(
        base_lin_vel=jnp.asarray([v, 0.0, 0.0]), commands=jnp.asarray([c, 0, 0, 0])
    )
    assert float(R.low_speed(mk(0.1, 0.5))) == -1.0  # too slow
    assert float(R.low_speed(mk(0.7, 0.5))) == 0.0  # too fast
    assert float(R.low_speed(mk(0.5, 0.5))) == pytest.approx(1.2)  # desired
    assert float(R.low_speed(mk(-0.3, 0.5))) == -2.0  # sign mismatch
    assert float(R.low_speed(mk(0.5, 0.05))) == 0.0  # tiny command gate


def test_reward_feet_air_time_first_contact():
    """Air time credited once at first contact, capped at 0.5 s."""
    ctx = _ctx(
        feet_air_time=jnp.asarray([0.3, 0.0]),
        contact=jnp.asarray([True, False]),
        stance_mask=jnp.asarray([0.0, 0.0]),
        last_contacts=jnp.asarray([False, False]),
    )
    # foot 0: air 0.3 + dt then lands -> credit 0.31; foot 1 stays airborne
    np.testing.assert_allclose(float(R.feet_air_time(ctx)), 0.31, rtol=1e-5)
    fsu = R.feet_state_update(ctx)
    np.testing.assert_allclose(np.asarray(fsu.feet_air_time), [0.0, 0.01], atol=1e-6)
    assert list(np.asarray(fsu.last_contacts)) == [True, False]


def test_reward_action_smoothness():
    ctx = _ctx(
        actions=jnp.ones(12),
        last_actions=0.5 * jnp.ones(12),
        last_last_actions=jnp.zeros(12),
    )
    t1 = 12 * 0.25
    t2 = 12 * 0.0  # 1 + 0 - 2*0.5 = 0
    t3 = 0.05 * 12
    np.testing.assert_allclose(float(R.action_smoothness(ctx)), t1 + t2 + t3, rtol=1e-5)


def test_reward_joint_pos_stale_ref():
    """joint_pos uses the ref pose from the previous obs pass."""
    ctx = _ctx(dof_pos=0.1 * jnp.ones(12), ref_dof_pos=jnp.zeros(12))
    d = np.linalg.norm(0.1 * np.ones(12))
    expect = np.exp(-2 * d) - 0.2 * np.clip(d, 0, 0.5)
    np.testing.assert_allclose(float(R.joint_pos(ctx)), expect, rtol=1e-5)


def test_nonfinite_env_auto_resets(quiet_env):
    """A numerically exploded env must flag done, zero its reward, produce
    finite observations, and not contaminate healthy envs."""
    env, cfg = quiet_env
    n = cfg.env.num_envs
    keys = jax.random.split(jax.random.PRNGKey(5), n)
    state = env.init_state(keys, jnp.arange(n))
    step = jax.jit(env.step)
    state, _ = step(state, jnp.zeros((n, 12)))
    # corrupt env 0
    qv = state.phys.qvel.at[0, 3].set(jnp.nan)
    state = state.replace(phys=state.phys.replace(qvel=qv))
    state, tr = step(state, jnp.zeros((n, 12)))
    assert bool(tr.done[0])
    assert int(tr.nonfinite[0]) == 1 and int(tr.nonfinite[1]) == 0
    assert np.isfinite(float(tr.reward[0]))
    assert np.all(np.isfinite(np.asarray(tr.obs)))
    assert np.all(np.isfinite(np.asarray(tr.privileged_obs)))
    # recovered state is finite
    assert np.all(np.isfinite(np.asarray(state.phys.qpos[0])))
    # healthy env unaffected
    assert not bool(tr.nonfinite[1])


def test_measured_heights_priv_obs():
    """Opt-in terrain height measurements appended to the privileged frame
    (correct version of the reference's dead measure_heights path)."""
    cfg = _quiet_cfg()
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.curriculum = False
    cfg.terrain.measure_heights = True
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.border_size = 5.0
    P = 17 * 11
    cfg.env.single_num_privileged_obs = 73 + P
    cfg.env.num_privileged_obs = 3 * (73 + P)
    env = make_env(cfg)
    keys = jax.random.split(jax.random.PRNGKey(3), cfg.env.num_envs)
    state = jax.jit(env.init_state)(keys, jnp.arange(cfg.env.num_envs))
    state, tr = jax.jit(env.step)(state, jnp.zeros((cfg.env.num_envs, 12)))
    assert tr.privileged_obs.shape == (cfg.env.num_envs, 3 * (73 + P))
    newest = np.asarray(tr.privileged_obs).reshape(cfg.env.num_envs, 3, -1)[:, -1, :]
    h = newest[:, 73:]
    assert h.shape[1] == P
    assert np.all(np.isfinite(h)) and np.all(np.abs(h) <= 5.0 + 1e-5)


def test_contact_stiffness_dr():
    """Contact-model DR: per-env Baumgarte scale sampled in range, default 1."""
    cfg = _quiet_cfg(4)
    cfg.domain_rand.randomize_contact_stiffness = True
    cfg.domain_rand.contact_stiffness_range = [0.5, 2.0]
    env = make_env(cfg)
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    state = jax.jit(env.init_state)(keys, jnp.arange(4))
    cs = np.asarray(state.phys.contact_stiffness)
    assert np.all(cs >= 0.5) and np.all(cs <= 2.0)
    assert len(np.unique(cs.round(6))) > 1  # actually randomized
    # default off -> exactly 1
    cfg2 = _quiet_cfg(2)
    env2 = make_env(cfg2)
    st2 = jax.jit(env2.init_state)(jax.random.split(jax.random.PRNGKey(0), 2), jnp.arange(2))
    np.testing.assert_array_equal(np.asarray(st2.phys.contact_stiffness), 1.0)
    # steps fine with DR on
    state, tr = jax.jit(env.step)(state, jnp.zeros((4, 12)))
    assert np.all(np.isfinite(np.asarray(tr.obs)))


def test_command_curriculum_global():
    """Global command curriculum (reference legged_robot.py:422-431): one
    shared lin_vel_x range, widened +-0.5 from the mean tracking reward over
    resetting envs, gated to once per max_episode_length common steps."""
    cfg = _quiet_cfg(4)
    cfg.commands.curriculum = True
    cfg.commands.max_curriculum = 1.7
    env = make_env(cfg)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    state = jax.jit(env.init_state)(keys, jnp.arange(4))
    ti = env.reward_names.index("tracking_lin_vel")
    track_scale = float(env.reward_scales[ti])
    # craft a state about to reset at the gate step with perfect tracking
    L = env.max_episode_length
    es = jnp.zeros_like(state.episode_sums)
    es = es.at[:, ti].set(0.95 * track_scale * L)  # > 0.8 threshold
    state = state.replace(
        episode_sums=es,
        episode_length=jnp.full((4,), L, state.episode_length.dtype),
        common_step=jnp.full((4,), L - 1, state.common_step.dtype),
    )
    state2, tr = jax.jit(env.step)(state, jnp.zeros((4, 12)))
    assert bool(tr.done.all())  # everyone timed out
    rng = np.asarray(state2.cmd_vx_range)
    base = np.asarray(cfg.commands.ranges.lin_vel_x, np.float32)
    exp = np.array([max(base[0] - 0.5, -1.7), min(base[1] + 0.5, 1.7)])
    np.testing.assert_allclose(rng, np.broadcast_to(exp, rng.shape), atol=1e-6)
    # below threshold: range unchanged
    state3 = state.replace(
        episode_sums=jnp.zeros_like(state.episode_sums),
    )
    state4, _ = jax.jit(env.step)(state3, jnp.zeros((4, 12)))
    np.testing.assert_allclose(
        np.asarray(state4.cmd_vx_range),
        np.broadcast_to(base, rng.shape), atol=1e-6,
    )


def test_contact_offset_and_motor_dr():
    """Widened contact-model DR: per-env contact-offset jitter and
    motor-strength (kp/kd) scaling, sampled in range; defaults exact."""
    cfg = _quiet_cfg(4)
    cfg.domain_rand.randomize_contact_offset = True
    cfg.domain_rand.contact_offset_range = [0.004, 0.03]
    cfg.domain_rand.randomize_motor_strength = True
    cfg.domain_rand.motor_strength_range = [0.8, 1.2]
    env = make_env(cfg)
    st = jax.jit(env.init_state)(
        jax.random.split(jax.random.PRNGKey(13), 4), jnp.arange(4)
    )
    co = np.asarray(st.phys.contact_offset)
    ks = np.asarray(st.phys.kp_scale)
    ds = np.asarray(st.phys.kd_scale)
    assert np.all((co >= 0.004) & (co <= 0.03)) and len(np.unique(co)) > 1
    assert np.all((ks >= 0.8) & (ks <= 1.2)) and len(np.unique(ks)) > 1
    assert np.all((ds >= 0.8) & (ds <= 1.2))
    # defaults off -> exact nominal values
    env2 = make_env(_quiet_cfg(2))
    st2 = jax.jit(env2.init_state)(
        jax.random.split(jax.random.PRNGKey(0), 2), jnp.arange(2)
    )
    np.testing.assert_allclose(np.asarray(st2.phys.contact_offset), 0.01, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(st2.phys.kp_scale), 1.0)
    # steps stay finite with everything on
    st, tr = jax.jit(env.step)(st, jnp.zeros((4, 12)))
    assert np.all(np.isfinite(np.asarray(tr.obs)))
