"""Contact solver tests: APGD (TPU-native) vs PGS (oracle) on random
problems, plus standing equilibrium through the full substep pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_gym_tpu.physics.contact import apgd_solve, pgs_solve


def _random_problem(rng, n_points=4, nlim=3):
    """SPD Delassus + random free velocity with some penetrating contacts."""
    nrow = 3 * n_points + nlim
    B = rng.normal(size=(nrow, nrow))
    A = B @ B.T / nrow + 0.5 * np.eye(nrow)
    u0 = rng.normal(size=nrow) * 2.0
    lo = rng.uniform(-0.5, 0.5, n_points)  # mixed active/inactive rows
    sign = np.where(rng.normal(size=nlim) > 0, 1.0, -1.0)
    lb = rng.uniform(-1e9, 0.1, nlim)
    return (
        jnp.asarray(A),
        jnp.asarray(u0),
        jnp.asarray(lo),
        jnp.asarray(sign),
        jnp.asarray(lb),
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_frictionless_complementarity(seed):
    """mu=0: the problem is a plain LCP where both solvers must satisfy
    complementarity exactly and agree with each other."""
    rng = np.random.default_rng(seed)
    A, u0, lo, sign, lb = _random_problem(rng)
    mu = jnp.asarray(0.0)
    n_points = lo.shape[0]

    lam_pgs = pgs_solve(A, u0, n_points, lo, sign, lb, mu, iterations=300)
    lam_apgd = apgd_solve(A, u0, n_points, lo, sign, lb, mu, iterations=600)

    for lam in (lam_pgs, lam_apgd):
        u = np.asarray(A @ lam + u0)
        for k in range(n_points):
            nrm = 3 * k + 2
            ln = float(lam[nrm])
            assert ln >= -1e-6
            assert u[nrm] >= float(lo[k]) - 2e-3
            if ln > 1e-3:
                assert u[nrm] <= float(lo[k]) + 2e-2
    # unique LCP solution -> normal impulses agree
    idx = np.arange(n_points) * 3 + 2
    np.testing.assert_allclose(
        np.asarray(lam_apgd)[idx], np.asarray(lam_pgs)[idx], rtol=0.05, atol=2e-2
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_frictional_agreement_on_robot(xbot_model, seed):
    """On *physically structured* problems (the actual robot resting/moving on
    a plane) PGS and APGD resolve to nearly the same post-contact velocity.
    (On adversarial dense random systems the VI and CCP relaxations genuinely
    differ — that gap is a model property, not a solver bug.)"""
    import jax

    from humanoid_gym_tpu.physics.contact import resolve_contacts
    from humanoid_gym_tpu.physics.dynamics import compute_dynamics
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    rng = np.random.default_rng(seed)
    qj = rng.uniform(-0.1, 0.1, 12)
    qpos = jnp.concatenate(
        [jnp.asarray([0.0, 0.0, 0.858]), jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(qj)]
    )
    qvel = jnp.asarray(rng.normal(size=18) * 0.3)
    dyn = compute_dynamics(m, qpos, qvel, 0.001, jnp.full(12, 10.0), jnp.ones(13))
    v_free = qvel + jnp.asarray(rng.normal(size=18) * 0.01)
    mu = jnp.asarray(0.7)

    r_pgs = resolve_contacts(
        m, dyn, qpos, v_free, flat_height_fn, 0.001, mu, iterations=100, solver="pgs"
    )
    r_apgd = resolve_contacts(
        m, dyn, qpos, v_free, flat_height_fn, 0.001, mu, iterations=200, solver="apgd"
    )
    np.testing.assert_allclose(
        np.asarray(r_apgd.qvel_new), np.asarray(r_pgs.qvel_new), atol=0.05
    )
    # total normal impulse close
    fz_pgs = float(jnp.sum(r_pgs.impulses[:, 2]))
    fz_apgd = float(jnp.sum(r_apgd.impulses[:, 2]))
    assert fz_apgd == pytest.approx(fz_pgs, rel=0.1, abs=1e-3)


def test_apgd_friction_cone_respected():
    rng = np.random.default_rng(9)
    A, u0, lo, sign, lb = _random_problem(rng)
    mu = jnp.asarray(0.5)
    lam = np.asarray(apgd_solve(A, u0, lo.shape[0], lo, sign, lb, mu, 300))
    for k in range(lo.shape[0]):
        t = lam[3 * k : 3 * k + 2]
        n = lam[3 * k + 2]
        assert np.linalg.norm(t) <= 0.5 * n + 1e-5
    # limit rows signed correctly
    lim = lam[3 * lo.shape[0] :]
    assert np.all(lim * np.asarray(sign) >= -1e-6)


def test_standing_equilibrium_apgd(xbot_model):
    """Full substep with APGD: robot standing at default pose must be held
    by contact forces ~ weight after settling."""
    from humanoid_gym_tpu.physics.step import default_state, make_physics_step
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    kp = jnp.asarray([200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32)
    kd = jnp.full(12, 10.0)
    tl = m.dof_effort * 0.85
    step = make_physics_step(
        m, 0.001, 10, kp, kd, tl, flat_height_fn, solver_iterations=24, solver="apgd"
    )
    st = default_state(m, jnp.asarray([0.0, 0.0, 0.95]), jnp.asarray([1.0, 0, 0, 0]))
    stepj = jax.jit(step)
    for _ in range(30):  # 0.3 s
        st = stepj(st, jnp.zeros(12))
    total_fz = float(jnp.sum(st.contact_forces[:, 2]))
    weight = float(jnp.sum(m.body_mass)) * 9.81
    assert total_fz == pytest.approx(weight, rel=0.25), (total_fz, weight)
    # still upright
    assert float(st.qpos[2]) > 0.6


@pytest.mark.slow
def test_pallas_apgd_matches_xla(xbot_model):
    """The Pallas kernel (interpret mode on CPU) must match the XLA APGD
    loop on a batch of real robot contact problems."""
    import jax

    from humanoid_gym_tpu.physics.contact import resolve_contacts
    from humanoid_gym_tpu.physics.dynamics import compute_dynamics
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    rng = np.random.default_rng(3)
    N = 4
    qpos = []
    qvel = []
    for _ in range(N):
        qj = rng.uniform(-0.1, 0.1, 12)
        qpos.append(
            np.concatenate([[0.0, 0.0, 0.85 + 0.02 * rng.normal()], [1, 0, 0, 0], qj])
        )
        qvel.append(rng.normal(size=18) * 0.3)
    qpos = jnp.asarray(np.stack(qpos), jnp.float32)
    qvel = jnp.asarray(np.stack(qvel), jnp.float32)
    mu = jnp.full((N,), 0.7)

    def solve(qp, qv, mu_i, solver):
        dyn = compute_dynamics(m, qp, qv, 0.001, jnp.full(12, 10.0), jnp.ones(13))
        return resolve_contacts(
            m, dyn, qp, qv, flat_height_fn, 0.001, mu_i,
            iterations=50, solver=solver,
        ).qvel_new

    v_xla = jax.vmap(lambda a, b, c: solve(a, b, c, "apgd"))(qpos, qvel, mu)
    v_pls = jax.vmap(lambda a, b, c: solve(a, b, c, "apgd_pallas_interpret"))(
        qpos, qvel, mu
    )
    np.testing.assert_allclose(np.asarray(v_pls), np.asarray(v_xla), atol=2e-4)


@pytest.mark.slow
def test_fused_pallas_matches_standard(xbot_model):
    """The fused cholesky+contact kernel (interpret mode) must reproduce the
    standard apgd path through a full physics step."""
    from humanoid_gym_tpu.physics.step import default_state, make_physics_step
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    kp = jnp.asarray(
        [200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32
    )
    kd = jnp.full(12, 10.0)
    tl = m.dof_effort * 0.85

    def run(solver, n_steps=20):
        step = make_physics_step(
            m, 0.001, 1, kp, kd, tl, flat_height_fn,
            solver_iterations=30, solver=solver,
        )
        st = default_state(
            m, jnp.asarray([0.0, 0.0, 0.9]), jnp.asarray([1.0, 0, 0, 0])
        )
        vstep = jax.jit(jax.vmap(step, in_axes=(0, None)))
        stb = jax.tree.map(lambda x: jnp.broadcast_to(x, (3,) + x.shape), st)
        for _ in range(n_steps):
            stb = vstep(stb, jnp.zeros(12))
        return stb

    ref = run("apgd")
    fus = run("fused_pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(fus.qpos), np.asarray(ref.qpos), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fus.qvel), np.asarray(ref.qvel), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(fus.contact_forces), np.asarray(ref.contact_forces),
        atol=2.0,
    )


@pytest.mark.slow
def test_fused_pallas_shard_map(xbot_model):
    """Fused solver dispatched through shard_map over an 8-device mesh must
    match the unsharded result (the multi-chip dispatch path)."""
    import numpy as np

    from humanoid_gym_tpu.parallel.mesh import make_env_mesh, shard_env_axis
    from humanoid_gym_tpu.physics import pallas_solver as PS
    from humanoid_gym_tpu.physics.step import default_state, make_physics_step
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    kp = jnp.asarray(
        [200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32
    )
    kd = jnp.full(12, 10.0)
    tl = m.dof_effort * 0.85
    N = 8

    def build(mesh):
        PS.set_solver_mesh(mesh)
        try:
            step = make_physics_step(
                m, 0.001, 1, kp, kd, tl, flat_height_fn,
                solver_iterations=20, solver="fused_pallas_interpret",
            )
            return jax.jit(jax.vmap(step, in_axes=(0, None)))
        finally:
            PS.set_solver_mesh(None)

    st = default_state(m, jnp.asarray([0.0, 0.0, 0.9]), jnp.asarray([1.0, 0, 0, 0]))
    stb = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), st)

    ref_step = build(None)
    out_ref = ref_step(stb, jnp.zeros(12))

    mesh = make_env_mesh()
    assert mesh.size == 8
    PS.set_solver_mesh(mesh)
    try:
        step_sm = make_physics_step(
            m, 0.001, 1, kp, kd, tl, flat_height_fn,
            solver_iterations=20, solver="fused_pallas_interpret",
        )
        vstep = jax.jit(jax.vmap(step_sm, in_axes=(0, None)))
        stb_sh = shard_env_axis(stb, mesh)
        out_sm = vstep(stb_sh, jnp.zeros(12))
    finally:
        PS.set_solver_mesh(None)

    np.testing.assert_allclose(
        np.asarray(out_sm.qvel), np.asarray(out_ref.qvel), atol=1e-5
    )


def test_contact_compliance_softens(xbot_model):
    """CFM compliance: zero is exactly rigid (bit-compatible with the
    pre-compliance path); positive compliance reduces contact impulses and
    lets the robot settle lower (soft contact)."""
    from humanoid_gym_tpu.physics.step import default_state, make_physics_step
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    kp = jnp.asarray(
        [200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32
    )
    kd = jnp.full(12, 10.0)
    tl = m.dof_effort * 0.85
    step = jax.jit(
        make_physics_step(
            m, 0.001, 10, kp, kd, tl, flat_height_fn,
            solver_iterations=24, solver="apgd",
        )
    )
    st0 = default_state(m, jnp.asarray([0.0, 0.0, 0.93]), jnp.asarray([1.0, 0, 0, 0]))

    def settle(comp):
        s = st0.replace(contact_compliance=jnp.asarray(comp))
        for _ in range(40):
            s = step(s, jnp.zeros(12))
        return s

    rigid = settle(0.0)
    soft = settle(0.5)
    fz_r = float(jnp.sum(rigid.contact_forces[:, 2]))
    fz_s = float(jnp.sum(soft.contact_forces[:, 2]))
    # both support the robot, but the soft contact admits deeper penetration
    assert fz_r > 300.0 and fz_s > 200.0
    pen_r = float(rigid.qpos[2])
    pen_s = float(soft.qpos[2])
    assert pen_s < pen_r  # compliant envs settle measurably lower
    assert pen_r - pen_s > 1e-4


@pytest.mark.slow
def test_warm_start_accuracy(xbot_model):
    """The APGD warm start (PhysicsState.contact_lam, carried across
    substeps and policy steps) must beat the round-2 cold start: at equal
    iterations the warm solve is strictly more accurate, and warm@8 beats
    cold@16 (the basis for the solver_iterations=8 production default,
    config/base.py PhysxLikeSolverCfg)."""
    from humanoid_gym_tpu.physics.step import default_state, make_physics_step
    from humanoid_gym_tpu.terrain.terrain import flat_height_fn

    m = xbot_model
    kp = jnp.asarray(
        [200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32
    )
    kd = jnp.full(12, 10.0)
    tl = m.dof_effort * 0.85

    def mk(iters):
        return jax.jit(
            jax.vmap(
                make_physics_step(
                    m, 0.001, 10, kp, kd, tl, flat_height_fn,
                    solver_iterations=iters, solver="apgd",
                )
            )
        )

    rng = np.random.default_rng(0)
    n = 8
    st = default_state(m, jnp.asarray([0.0, 0.0, 0.95]), jnp.asarray([1.0, 0, 0, 0]))
    stb = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), st)
    qpos = np.array(stb.qpos)
    qpos[:, 7:] = rng.uniform(-0.1, 0.1, (n, 12))
    stb = stb.replace(qpos=jnp.asarray(qpos, jnp.float32))

    # settle into a dynamic contact-rich state with a converged solver
    ref = mk(200)
    s = stb
    for i in range(20):
        s = ref(s, 0.3 * jnp.sin(0.05 * i) * jnp.ones((n, 12)))
    tgt = 0.3 * jnp.sin(0.05 * 20) * jnp.ones((n, 12))
    gold = ref(s, tgt)

    s_cold = s.replace(contact_lam=jnp.zeros_like(s.contact_lam))
    err = lambda out: float(jnp.abs(out.qvel - gold.qvel).max())
    warm4 = err(mk(4)(s, tgt))
    warm8 = err(mk(8)(s, tgt))
    cold8 = err(mk(8)(s_cold, tgt))
    cold16 = err(mk(16)(s_cold, tgt))
    assert warm8 < cold8, (warm8, cold8)
    assert warm8 < cold16, (warm8, cold16)
    # basis for the round-3 production default solver_iterations=4: the
    # warm start converges persistent stance contacts within the first few
    # iterations, so warm@4 still beats the round-2 shipped cold@16
    assert warm4 < cold16, (warm4, cold16)
