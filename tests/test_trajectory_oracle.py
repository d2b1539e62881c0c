"""Trajectory-level contact oracle: the JAX engine vs MuJoCo over a PD-hold
rollout with contacts (SURVEY §7 build step 3: bounded divergence on the same
initial state). MuJoCo gets geoms at the EXACT 16 sole candidate points, the
same PD torques at 1 kHz, the same friction — different solvers (our APGD CCP
vs MuJoCo's), so tolerances are behavioral, not bitwise.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from humanoid_gym_tpu.physics.mjcf_export import model_to_mjcf
from humanoid_gym_tpu.physics.step import default_state, make_physics_step
from humanoid_gym_tpu.terrain.terrain import flat_height_fn

KP = np.array([200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], float)
KD = np.full(12, 10.0)


def _run_engine(model, n_steps, z0, mu):
    step = make_physics_step(
        model,
        0.001,
        1,
        jnp.asarray(KP, jnp.float32),
        jnp.asarray(KD),
        model.dof_effort * 0.85,
        flat_height_fn,
        solver_iterations=16,
        solver="apgd",
    )
    st = default_state(model, jnp.asarray([0.0, 0.0, z0]), jnp.asarray([1.0, 0, 0, 0]))
    st = st.replace(friction=jnp.asarray(mu))
    stepj = jax.jit(step)
    traj = []
    for _ in range(n_steps):
        st = stepj(st, jnp.zeros(12))
        traj.append(np.asarray(st.qpos))
    return np.stack(traj)


def _run_mujoco(model, n_steps, z0, mu):
    # kd goes into joint damping so MuJoCo integrates it implicitly — the
    # same treatment our engine uses (dynamics.py Mtilde); explicit kd via
    # qfrc_applied is unstable on the near-massless ankle bodies at 1 kHz.
    mj = mujoco.MjModel.from_xml_string(
        model_to_mjcf(model, with_contacts=True, friction=mu, joint_damping=KD)
    )
    d = mujoco.MjData(mj)
    d.qpos[2] = z0
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


def test_pd_hold_trajectory_close(xbot_model):
    """0.4 s standing settle from z=0.95: base height and joint trajectories
    must track MuJoCo within behavioral tolerances; neither may fall."""
    n = 400
    ours = _run_engine(xbot_model, n, 0.95, 0.7)
    theirs = _run_mujoco(xbot_model, n, 0.95, 0.7)

    # both settle, neither falls
    assert ours[-1, 2] > 0.7 and theirs[-1, 2] > 0.7
    # base height trajectory within 4 cm throughout
    np.testing.assert_allclose(ours[:, 2], theirs[:, 2], atol=0.04)
    # lateral drift small in both
    assert np.all(np.abs(ours[:, :2]) < 0.05)
    assert np.all(np.abs(theirs[:, :2]) < 0.05)
    # joint angles close at the end of the settle
    np.testing.assert_allclose(ours[-1, 7:], theirs[-1, 7:], atol=0.08)
    # orientation stays upright (quat w close to 1)
    assert ours[-1, 3] > 0.99 and theirs[-1, 3] > 0.99
