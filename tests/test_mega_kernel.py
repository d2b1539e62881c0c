"""Mega-kernel equivalence: the single-launch full-physics Pallas kernel
(FK + bias + CRBA + contact rows + fused solve + integration, all
decimation substeps on-chip) must reproduce the standard XLA `apgd` path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KP = jnp.asarray(
    [200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32
)
KD = jnp.full(12, 10.0)


def _states(m, n, seed=0):
    from humanoid_gym_tpu.physics.step import default_state

    rng = np.random.default_rng(seed)
    st = default_state(m, jnp.asarray([0.0, 0.0, 0.9]), jnp.asarray([1.0, 0, 0, 0]))
    stb = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), st)
    qj = rng.uniform(-0.1, 0.1, (n, 12))
    qpos = np.array(stb.qpos)
    qpos[:, 7:] = qj
    qpos[:, 2] += rng.uniform(-0.02, 0.02, n)
    qvel = rng.normal(size=(n, 18)) * 0.2
    return stb.replace(
        qpos=jnp.asarray(qpos, jnp.float32),
        qvel=jnp.asarray(qvel, jnp.float32),
        friction=jnp.asarray(rng.uniform(0.3, 1.2, n), jnp.float32),
        base_mass_scale=jnp.asarray(rng.uniform(0.9, 1.1, n), jnp.float32),
        contact_stiffness=jnp.asarray(rng.uniform(0.7, 1.5, n), jnp.float32),
        contact_offset=jnp.asarray(rng.uniform(0.004, 0.025, n), jnp.float32),
        contact_compliance=jnp.asarray(rng.uniform(0.0, 0.2, n), jnp.float32),
        kp_scale=jnp.asarray(rng.uniform(0.8, 1.2, n), jnp.float32),
        kd_scale=jnp.asarray(rng.uniform(0.8, 1.2, n), jnp.float32),
    )


def _run(m, solver, stb, targets, n_steps=5, decimation=10):
    from humanoid_gym_tpu.physics.step import make_physics_step
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    tl = m.dof_effort * 0.85
    step = make_physics_step(
        m, 0.001, decimation, KP, KD, tl, flat_height_fn,
        solver_iterations=24, solver=solver,
    )
    vstep = jax.jit(jax.vmap(step))
    for _ in range(n_steps):
        stb = vstep(stb, targets)
    return stb


@pytest.mark.slow
def test_mega_interpret_matches_apgd(xbot_model):
    """Batched mega kernel (interpret) vs XLA apgd over 5 policy steps
    (50 substeps) with per-env DR (friction, base mass, contact stiffness)."""
    m = xbot_model
    n = 4
    stb = _states(m, n)
    rng = np.random.default_rng(1)
    targets = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 12)), jnp.float32)

    ref = _run(m, "apgd", stb, targets)
    meg = _run(m, "mega_interpret", stb, targets)

    np.testing.assert_allclose(np.asarray(meg.qpos), np.asarray(ref.qpos), atol=5e-4)
    np.testing.assert_allclose(np.asarray(meg.qvel), np.asarray(ref.qvel), atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(meg.torques), np.asarray(ref.torques), atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(meg.contact_forces), np.asarray(ref.contact_forces), atol=5.0
    )


def test_mega_fallback_single_env(xbot_model):
    """The unbatched call (oracle/play path) falls back to XLA and must also
    match the apgd step."""
    from humanoid_gym_tpu.physics.step import default_state, make_physics_step
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    tl = m.dof_effort * 0.85
    st = default_state(m, jnp.asarray([0.0, 0.0, 0.9]), jnp.asarray([1.0, 0, 0, 0]))
    tgt = jnp.asarray(np.random.default_rng(2).uniform(-0.1, 0.1, 12), jnp.float32)

    def run(solver):
        step = jax.jit(
            make_physics_step(
                m, 0.001, 10, KP, KD, tl, flat_height_fn,
                solver_iterations=24, solver=solver,
            )
        )
        s = st
        for _ in range(5):
            s = step(s, tgt)
        return s

    ref = run("apgd")
    meg = run("mega_interpret")  # single env -> XLA fallback
    np.testing.assert_allclose(np.asarray(meg.qpos), np.asarray(ref.qpos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(meg.qvel), np.asarray(ref.qvel), atol=5e-3)


@pytest.mark.slow
def test_mega_shard_map(xbot_model):
    """Mega kernel through shard_map over the 8-device mesh (the multi-chip
    dispatch path) matches the unsharded batched result."""
    from humanoid_gym_tpu.parallel.mesh import make_env_mesh, shard_env_axis
    from humanoid_gym_tpu.physics import pallas_solver as PS

    m = xbot_model
    n = 8
    stb = _states(m, n, seed=3)
    targets = jnp.zeros((n, 12), jnp.float32)

    out_ref = _run(m, "mega_interpret", stb, targets, n_steps=2)

    mesh = make_env_mesh()
    assert mesh.size == 8
    PS.set_solver_mesh(mesh)
    try:
        out_sm = _run(m, "mega_interpret", shard_env_axis(stb, mesh), targets, n_steps=2)
    finally:
        PS.set_solver_mesh(None)
    np.testing.assert_allclose(
        np.asarray(out_sm.qvel), np.asarray(out_ref.qvel), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sm.qpos), np.asarray(out_ref.qpos), atol=1e-6
    )


@pytest.mark.slow
def test_mega_terrain_matches_apgd():
    """Terrain variant: the in-kernel heightfield lookup (per-point 3x3
    min-grid patches, one-hot selected) must reproduce the XLA apgd path's
    terrain contact behavior through the full env step."""
    from humanoid_gym_tpu.config.xbotl import XBotLCfg
    from humanoid_gym_tpu.envs import make_env

    def cfg_for(solver):
        cfg = XBotLCfg()
        cfg.env.num_envs = 4
        cfg.terrain.mesh_type = "trimesh"
        cfg.terrain.curriculum = False
        cfg.terrain.num_rows = 2
        cfg.terrain.num_cols = 2
        cfg.terrain.border_size = 5.0
        cfg.noise.add_noise = False
        cfg.domain_rand.push_robots = False
        cfg.domain_rand.action_delay = 0.0
        cfg.domain_rand.action_noise = 0.0
        cfg.sim.solver.solver_type = solver
        return cfg

    def run(solver, n_steps=25):
        # 25 policy steps: touchdown happens ~step 14 (envs spawn with
        # clearance above the heightfield), settled support by 25
        env = make_env(cfg_for(solver))
        keys = jax.random.split(jax.random.PRNGKey(21), 4)
        st = jax.jit(env.init_state)(keys, jnp.arange(4))
        step = jax.jit(env.step)
        for _ in range(n_steps):
            st, tr = step(st, jnp.zeros((4, 12)))
        return st

    ref = run("apgd")
    meg = run("mega_interpret")
    np.testing.assert_allclose(
        np.asarray(meg.phys.qpos), np.asarray(ref.phys.qpos), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(meg.phys.qvel), np.asarray(ref.phys.qvel), atol=0.1
    )
    # feet actually touched terrain (contact forces support the robot)
    fz = np.asarray(meg.phys.contact_forces)[:, :, 2].sum(axis=1)
    assert np.all(fz > 100.0), fz


@pytest.mark.slow
def test_mega_translation_invariance(xbot_model):
    """Dynamics must be identical when the whole scene is shifted far from
    the world origin (regression: world-origin CRBA composites cancelled
    catastrophically in f32 past |xy| ~ 100 m and the solve went NaN)."""
    m = xbot_model
    n = 4
    stb = _states(m, n)
    rng = np.random.default_rng(2)
    targets = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 12)), jnp.float32)
    shift = jnp.asarray([137.0, 149.0], jnp.float32)
    stb_far = stb.replace(qpos=stb.qpos.at[:, 0:2].add(shift[None, :]))

    near = _run(m, "mega_interpret", stb, targets)
    far = _run(m, "mega_interpret", stb_far, targets)

    assert np.isfinite(np.asarray(far.qpos)).all()
    qfar = np.array(far.qpos)
    qfar[:, 0:2] -= np.asarray(shift)[None, :]
    # f32 position rows carry ~1e-4 absolute noise at 150 m magnitude; the
    # dynamics (velocities, forces) must be tight
    np.testing.assert_allclose(qfar, np.asarray(near.qpos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(far.qvel), np.asarray(near.qvel), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(far.contact_forces), np.asarray(near.contact_forces), atol=10.0
    )


@pytest.mark.slow
def test_mega_sublane_split_solve_matches(tmp_path):
    """HGT_MEGA_SUB=2 (sublane-env tiles + per-sublane-group SPLIT SOLVE,
    round 3) must reproduce the S=1 apgd trajectory. Runs in a subprocess
    because the tiling flag is read at module import."""
    import subprocess
    import sys as _sys

    code = """
import sys
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from humanoid_gym_tpu.physics import mega_kernel as mk
assert mk._SUB == 2 and mk.LS == (2, 128)
from humanoid_gym_tpu.physics.model import build_xbot_model
from test_mega_kernel import _states, _run
m = build_xbot_model()
stb = _states(m, 4)
rng = np.random.default_rng(1)
targets = jnp.asarray(rng.uniform(-0.2, 0.2, (4, 12)), jnp.float32)
ref = _run(m, 'apgd', stb, targets, n_steps=3)
meg = _run(m, 'mega_interpret', stb, targets, n_steps=3)
np.testing.assert_allclose(np.asarray(meg.qpos), np.asarray(ref.qpos), atol=5e-4)
np.testing.assert_allclose(np.asarray(meg.qvel), np.asarray(ref.qvel), atol=1e-2)
print('OK')
"""
    env = dict(os.environ, HGT_MEGA_SUB="2", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [_sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1500,
    )
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr[-2000:]


@pytest.mark.slow
def test_mega_fk_out_matches_xla_fk(xbot_model):
    """The kernel's end-of-step OUT_FK rows (feet p, knee xy base-relative;
    feet v_origin world-frame) must equal the XLA fk()/body_velocities()
    they replace in the env (envs/env.py FK-derived quantities)."""
    from humanoid_gym_tpu.physics.kinematics import body_velocities, fk

    m = xbot_model
    n = 4
    stb = _states(m, n, seed=3)
    rng = np.random.default_rng(4)
    targets = jnp.asarray(rng.uniform(-0.2, 0.2, (n, 12)), jnp.float32)
    meg = _run(m, "mega_interpret", stb, targets, n_steps=3)

    fidx = np.asarray(m.feet_body_idx)
    kidx = np.asarray(m.knee_body_idx)
    for e in range(n):
        k = fk(m, meg.qpos[e])
        bv = body_velocities(m, meg.qpos[e], meg.qvel[e])
        p_rel = np.asarray(k.p - meg.qpos[e, :3])
        want = np.concatenate(
            [
                p_rel[fidx, 0], p_rel[fidx, 1], p_rel[fidx, 2],
                p_rel[kidx, 0], p_rel[kidx, 1],
                np.asarray(bv.v_origin)[fidx, 0],
                np.asarray(bv.v_origin)[fidx, 1],
            ]
        )
        np.testing.assert_allclose(
            np.asarray(meg.fk_out[e]), want, atol=2e-4,
            err_msg=f"env {e}: kernel OUT_FK rows != XLA fk/body_velocities",
        )


def test_terrain_patches_windowed_taps_exact():
    """The windowed-tap terrain_patches (one per-env dynamic-slice + exact
    one-hot einsums — round 3, replaces 11 pointwise grid gathers measured
    at ~40 ms/iter each) must be BIT-IDENTICAL to direct grid taps for
    every in-reach query."""
    from humanoid_gym_tpu.config.xbotl import XBotLCfg
    from humanoid_gym_tpu.envs import make_env

    cfg = XBotLCfg()
    cfg.env.num_envs = 8
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.curriculum = False
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.border_size = 5.0
    cfg.sim.solver.solver_type = "mega_interpret"
    env = make_env(cfg)
    tp = env._phys_step.terrain_patches
    assert tp is not None

    keys = jax.random.split(jax.random.PRNGKey(5), 8)
    st = jax.jit(env.init_state)(keys, jnp.arange(8))
    qpos = st.phys.qpos
    sbias = jnp.zeros((8, 2))
    got = np.asarray(jax.jit(tp)(qpos, sbias))

    # reference: direct gathers with the documented row layout
    from humanoid_gym_tpu.terrain.terrain import make_grad_fn

    tmap = env.terrain_map
    K = 16
    from humanoid_gym_tpu.physics.kinematics import fk

    hf = np.asarray(tmap.height_field, np.float32) * tmap.vertical_scale
    border, inv_h = tmap.border_size, 1.0 / tmap.horizontal_scale
    nrow, ncol = hf.shape
    m = env.model
    cbody = np.asarray(m.contact_point_body)
    coff = np.asarray(m.contact_point_offset)
    grad_fn = make_grad_fn(tmap)
    for e in range(8):
        k = fk(m, qpos[e])
        pos = np.asarray(k.p)[cbody] + np.einsum(
            "kij,kj->ki", np.asarray(k.R)[cbody], coff
        )
        gxf = np.clip((pos[:, 0] + border) * inv_h, 0.0, nrow - 1.001)
        gyf = np.clip((pos[:, 1] + border) * inv_h, 0.0, ncol - 1.001)
        px, py = gxf.astype(np.int32), gyf.astype(np.int32)
        ox = np.clip(px - 1, 0, nrow - 3)
        oy = np.clip(py - 1, 0, ncol - 3)
        want_patch = np.concatenate(
            [hf[ox + i, oy + j] for i in range(3) for j in range(3)]
        )
        np.testing.assert_array_equal(got[e, : 9 * K], want_patch)
        np.testing.assert_array_equal(got[e, 9 * K : 9 * K + K], ox.astype(np.float32))
        np.testing.assert_array_equal(
            got[e, 9 * K + K : 9 * K + 2 * K], oy.astype(np.float32)
        )
        # gradients: same taps and formula, but XLA contracts the in-jit
        # multiply-adds into FMAs (the old pointwise-gather path was in-jit
        # too) — compare to the eager reference at 1 ulp-scale tolerance
        gx, gy = grad_fn(pos[:, 0], pos[:, 1])
        np.testing.assert_allclose(
            got[e, 9 * K + 2 * K : 9 * K + 3 * K], np.asarray(gx),
            rtol=1e-6, atol=5e-6,
        )
        np.testing.assert_allclose(
            got[e, 9 * K + 3 * K : 9 * K + 4 * K], np.asarray(gy),
            rtol=1e-6, atol=5e-6,
        )


def test_contact_xy_batched_matches_fk(xbot_model):
    """The specialized leg-chain batched contact-XY (round 4, replaces the
    vmap(fk) path in the terrain patch builder) must match the generic
    FK-based computation."""
    from humanoid_gym_tpu.physics import mega_kernel as mk
    from humanoid_gym_tpu.physics.kinematics import f32_matmul, fk

    m = xbot_model
    sm = mk._StaticModel(m, KP, KD, np.asarray(m.dof_effort) * 0.85)
    fn = jax.jit(mk.make_contact_xy_batched(sm, m))

    rng = np.random.default_rng(3)
    n = 64
    qpos = np.zeros((n, 19), np.float32)
    qpos[:, :3] = rng.normal(size=(n, 3)) * np.array([5.0, 5.0, 0.1]) + [0, 0, 0.9]
    quat = rng.normal(size=(n, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    qpos[:, 3:7] = quat
    qpos[:, 7:] = rng.uniform(-0.6, 0.6, (n, 12))
    qpos = jnp.asarray(qpos)

    cbody = jnp.asarray(m.contact_point_body)
    coff = m.contact_point_offset

    @f32_matmul
    def ref_one(qp):
        k = fk(m, qp)
        pos = k.p[cbody] + jnp.einsum("kij,kj->ki", k.R[cbody], coff)
        return pos[:, :2]

    ref = jax.jit(jax.vmap(ref_one))(qpos)
    got = fn(qpos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
