"""Oracle tests: the JAX engine's kinematics/dynamics vs MuJoCo ground truth
on identical model parameters (SURVEY.md §4: MuJoCo is the reference's own
cross-validation engine, sim2sim.py:98-101).

Convention bridge: MuJoCo free-joint qvel is [v_world, omega_BODY, qdot];
the engine uses [v_world, omega_WORLD, qdot]. T = blockdiag(I3, R, I12) maps
mj velocities to engine velocities; M_mj = T^T M_eng T, h_mj = T^T h_eng.
"""

import mujoco
import numpy as np
import jax.numpy as jnp
import pytest

from humanoid_gym_tpu.physics import kinematics as K
from humanoid_gym_tpu.physics import dynamics as D
from tests.conftest import random_state


def _mk_T(R):
    T = np.eye(18)
    T[3:6, 3:6] = R
    return T


def _set_mj(mj, pos, quat, qj, qvel_eng=None):
    data = mujoco.MjData(mj)
    data.qpos[:3] = pos
    data.qpos[3:7] = quat
    data.qpos[7:] = qj
    if qvel_eng is not None:
        R = np.zeros(9)
        mujoco.mju_quat2Mat(R, quat)
        R = R.reshape(3, 3)
        data.qvel[:3] = qvel_eng[:3]
        data.qvel[3:6] = R.T @ qvel_eng[3:6]  # world -> body angular
        data.qvel[6:] = qvel_eng[6:]
    mujoco.mj_forward(mj, data)
    return data


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fk_matches_mujoco(xbot_model, mj_oracle, seed):
    rng = np.random.default_rng(seed)
    pos, quat, qj, _ = random_state(rng)
    data = _set_mj(mj_oracle, pos, quat, qj)
    kin = K.fk(xbot_model, jnp.concatenate([jnp.array(pos), jnp.array(quat), jnp.array(qj)]))
    for i, name in enumerate(xbot_model.body_names):
        bid = mujoco.mj_name2id(mj_oracle, mujoco.mjtObj.mjOBJ_BODY, name)
        np.testing.assert_allclose(np.array(kin.p[i]), data.xpos[bid], atol=2e-6)
        np.testing.assert_allclose(
            np.array(kin.R[i]), data.xmat[bid].reshape(3, 3), atol=2e-6
        )
        np.testing.assert_allclose(np.array(kin.com[i]), data.xipos[bid], atol=2e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_body_velocities_match_mujoco(xbot_model, mj_oracle, seed):
    rng = np.random.default_rng(seed)
    pos, quat, qj, qvel = random_state(rng)
    data = _set_mj(mj_oracle, pos, quat, qj, qvel)
    qpos = jnp.concatenate([jnp.array(pos), jnp.array(quat), jnp.array(qj)])
    bv = K.body_velocities(xbot_model, qpos, jnp.array(qvel))
    for i, name in enumerate(xbot_model.body_names):
        bid = mujoco.mj_name2id(mj_oracle, mujoco.mjtObj.mjOBJ_BODY, name)
        # mjData.cvel: (rot(3), lin(3)) at the body *com-frame* origin
        # (xipos), world axes.
        vel = np.zeros(6)
        mujoco.mj_objectVelocity(mj_oracle, data, mujoco.mjtObj.mjOBJ_BODY.value, bid, vel, 0)
        np.testing.assert_allclose(np.array(bv.omega[i]), vel[:3], atol=1e-5)
        np.testing.assert_allclose(np.array(bv.v_com[i]), vel[3:], atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mass_matrix_matches_mujoco(xbot_model, mj_oracle, seed):
    rng = np.random.default_rng(seed)
    pos, quat, qj, _ = random_state(rng)
    data = _set_mj(mj_oracle, pos, quat, qj)
    Mmj = np.zeros((18, 18))
    mujoco.mj_fullM(mj_oracle, data, Mmj)

    qpos = jnp.concatenate([jnp.array(pos), jnp.array(quat), jnp.array(qj)])
    kin = K.fk(xbot_model, qpos)
    mask = K.ancestor_mask(xbot_model)
    M = np.array(D.mass_matrix(xbot_model, kin, mask, jnp.ones(13)))

    Rm = np.zeros(9)
    mujoco.mju_quat2Mat(Rm, quat)
    T = _mk_T(Rm.reshape(3, 3))
    M_as_mj = T.T @ M @ T
    np.testing.assert_allclose(M_as_mj, Mmj, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bias_forces_explicit_matches_ad(xbot_model, seed):
    """The explicit propagation (hot path) must equal the AD derivation."""
    rng = np.random.default_rng(seed + 100)
    pos, quat, qj, qvel = random_state(rng)
    qpos = jnp.concatenate([jnp.array(pos), jnp.array(quat), jnp.array(qj)])
    kin = K.fk(xbot_model, qpos)
    mask = K.ancestor_mask(xbot_model)
    h_ad = np.array(
        D.bias_forces(xbot_model, qpos, jnp.array(qvel), kin, mask, jnp.ones(13))
    )
    h_ex = np.array(
        D.bias_forces_explicit(
            xbot_model, qpos, jnp.array(qvel), kin, mask, jnp.ones(13)
        )
    )
    np.testing.assert_allclose(h_ex, h_ad, atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bias_forces_match_mujoco(xbot_model, mj_oracle, seed):
    rng = np.random.default_rng(seed)
    pos, quat, qj, qvel = random_state(rng)
    data = _set_mj(mj_oracle, pos, quat, qj, qvel)
    qpos = jnp.concatenate([jnp.array(pos), jnp.array(quat), jnp.array(qj)])
    kin = K.fk(xbot_model, qpos)
    mask = K.ancestor_mask(xbot_model)
    h = np.array(
        D.bias_forces(xbot_model, qpos, jnp.array(qvel), kin, mask, jnp.ones(13))
    )
    Rm = np.zeros(9)
    mujoco.mju_quat2Mat(Rm, quat)
    T = _mk_T(Rm.reshape(3, 3))
    h_as_mj = T.T @ h
    np.testing.assert_allclose(h_as_mj, data.qfrc_bias, atol=2e-3, rtol=1e-3)


def test_free_fall_acceleration(xbot_model):
    """Contact-free forward dynamics must produce qacc ~= g for a free robot."""
    qpos = jnp.concatenate(
        [jnp.array([0.0, 0.0, 2.0]), jnp.array([1.0, 0, 0, 0]), jnp.zeros(12)]
    )
    qvel = jnp.zeros(18)
    kin = K.fk(xbot_model, qpos)
    mask = K.ancestor_mask(xbot_model)
    M = D.mass_matrix(xbot_model, kin, mask, jnp.ones(13))
    h = D.bias_forces(xbot_model, qpos, qvel, kin, mask, jnp.ones(13))
    qacc = np.array(jnp.linalg.solve(M, -h))
    np.testing.assert_allclose(qacc[0:3], [0, 0, -9.81], atol=1e-4)
