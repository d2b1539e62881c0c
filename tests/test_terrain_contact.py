"""Sloped-terrain contact frames vs MuJoCo (trajectory oracle on an incline).

The heightfield contact resolves forces along the SURFACE normal with the
friction cone tilted accordingly (capability analog of PhysX trimesh
contact — the reference's terrain training path, legged_robot.py:543-586 —
and of MuJoCo's hfield prisms). The oracle: PD-hold the robot on a uniform
6-degree incline and compare against MuJoCo on a tilted plane with the
same slope and friction. With vertical-only normals (the pre-round-2 model)
the incline behaves like terraced flat ground — landing feet are never
decelerated along the slope and the downhill lean/drift dynamics diverge
from MuJoCo's.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from humanoid_gym_tpu.physics.mjcf_export import model_to_mjcf
from humanoid_gym_tpu.physics.step import default_state, make_physics_step
from humanoid_gym_tpu.terrain.terrain import TerrainMap, make_height_fn

KP = np.array([200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], float)
KD = np.full(12, 10.0)
SLOPE = 0.105  # tan(6 deg) — a passively standable incline for this robot


def _slope_map(slope=SLOPE):
    h_scale, v_scale = 0.1, 0.005
    n = 200  # 20 m x 20 m
    hf = np.zeros((n, n), np.int16)
    xs = np.arange(n) * h_scale
    hf[:] = (slope * xs / v_scale).astype(np.int16)[:, None]
    return TerrainMap(
        height_field=hf,
        horizontal_scale=h_scale,
        vertical_scale=v_scale,
        border_size=0.0,
        env_origins=np.zeros((1, 1, 3)),
        env_length=20.0,
        env_width=20.0,
        num_rows=1,
        num_cols=1,
    )


def _run_engine(model, n_steps, mu, x0=10.0):
    tmap = _slope_map()
    step = make_physics_step(
        model, 0.001, 1,
        jnp.asarray(KP, jnp.float32), jnp.asarray(KD),
        model.dof_effort * 0.85,
        make_height_fn(tmap),
        solver_iterations=16, solver="apgd", terrain_map=tmap,
    )
    st = default_state(
        model, jnp.asarray([x0, 10.0, SLOPE * x0 + 0.92]),
        jnp.asarray([1.0, 0, 0, 0]),
    )
    st = st.replace(friction=jnp.asarray(mu))
    stepj = jax.jit(step)
    traj = []
    for _ in range(n_steps):
        st = stepj(st, jnp.zeros(12))
        traj.append(np.asarray(st.qpos))
    tr = np.stack(traj)
    tr[:, 0] -= x0
    tr[:, 1] -= 10.0
    tr[:, 2] -= SLOPE * x0
    return tr


def _run_mujoco(model, n_steps, mu):
    n = np.array([-SLOPE, 0.0, 1.0])
    n = n / np.linalg.norm(n)
    mj = mujoco.MjModel.from_xml_string(
        model_to_mjcf(
            model, with_contacts=True, friction=mu, joint_damping=KD,
            plane_zaxis=n,
        )
    )
    d = mujoco.MjData(mj)
    d.qpos[2] = 0.92
    d.qpos[3] = 1.0
    mujoco.mj_forward(mj, d)
    tl = np.asarray(model.dof_effort) * 0.85
    traj = []
    for _ in range(n_steps):
        qj = d.qpos[7:]
        tau = np.clip(KP * (0.0 - qj), -tl, tl)
        d.qfrc_applied[6:] = tau
        mujoco.mj_step(mj, d)
        traj.append(d.qpos.copy())
    return np.stack(traj)


def test_incline_trajectory_matches_mujoco(xbot_model):
    """0.4 s PD-hold on the 6-degree incline: slope-relative height and the
    downhill lean/drift must track MuJoCo's tilted plane."""
    n = 400
    ours = _run_engine(xbot_model, n, 0.7)
    theirs = _run_mujoco(xbot_model, n, 0.7)

    # neither falls; both feel the slope (ankle-compliance downhill drift)
    assert ours[-1, 2] > 0.7 and theirs[-1, 2] > 0.7
    assert ours[-1, 0] < -0.005 and theirs[-1, 0] < -0.005
    # base trajectory within behavioral tolerances (different solvers AND a
    # 3-tap-min terraced heightfield vs an exact plane)
    np.testing.assert_allclose(ours[:, 2], theirs[:, 2], atol=0.045)
    np.testing.assert_allclose(ours[:, 0], theirs[:, 0], atol=0.03)
    np.testing.assert_allclose(ours[-1, 7:], theirs[-1, 7:], atol=0.12)


def test_incline_static_support(xbot_model):
    """Settled on the incline, the WORLD contact force balances gravity
    (vertical), while the solver resolved it along the tilted normal."""
    tmap = _slope_map()
    step = make_physics_step(
        xbot_model, 0.001, 10,
        jnp.asarray(KP, jnp.float32), jnp.asarray(KD),
        xbot_model.dof_effort * 0.85,
        make_height_fn(tmap),
        solver_iterations=16, solver="apgd", terrain_map=tmap,
    )
    st = default_state(
        xbot_model, jnp.asarray([10.0, 10.0, SLOPE * 10.0 + 0.92]),
        jnp.asarray([1.0, 0, 0, 0]),
    )
    stepj = jax.jit(step)
    for _ in range(40):
        st = stepj(st, jnp.zeros(12))
    f = np.asarray(st.contact_forces).sum(axis=0)
    assert f[2] > 300.0, f
    assert abs(f[0]) < 0.3 * f[2], f
