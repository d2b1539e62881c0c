"""The optimized mega-kernel solve stage (`_fused_core_opt`: in-place
sliced Cholesky, row-block triangular solve, factor-form APGD) must be
numerically equivalent to the dense `_fused_core` it replaced. Both share
the ||B B^T||_inf step bound, so at equal iteration counts the iterate
paths coincide up to f32 association order."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from humanoid_gym_tpu.physics.pallas_solver import (
    ENV_TILE, NV, NVP, ROWS, _fused_core, _fused_core_opt,
)

ITERS = 60


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(NV, NV)) * 0.3
    M = W @ W.T + np.eye(NV) * 2.0
    Mt = np.zeros((NVP, NVP, ENV_TILE), np.float32)
    for e in range(ENV_TILE):
        je = rng.normal(size=(NV, NV)) * 0.02
        Mt[:NV, :NV, e] = M + je @ je.T
    for k in range(NV, NVP):
        Mt[k, k, :] = 1.0
    Jt = np.zeros((NVP, ROWS, ENV_TILE), np.float32)
    Jt[:NV, :60, :] = rng.normal(size=(NV, 60, ENV_TILE)) * 0.5
    qvel = (rng.normal(size=(NVP, ENV_TILE)) * 0.3).astype(np.float32)
    qvel[NV:] = 0
    rhs = (rng.normal(size=(NVP, ENV_TILE)) * 0.05).astype(np.float32)
    rhs[NV:] = 0
    target = (rng.normal(size=(ROWS, ENV_TILE)) * 0.1).astype(np.float32)
    sign = np.ones((ROWS, ENV_TILE), np.float32)
    sign[48:60] = np.sign(rng.normal(size=(12, ENV_TILE))).astype(np.float32)
    mu = rng.uniform(0.3, 1.2, (1, ENV_TILE)).astype(np.float32)
    valid = np.zeros((ROWS, ENV_TILE), np.float32)
    valid[:60] = 1.0
    comp = rng.uniform(0.0, 0.2, (1, ENV_TILE)).astype(np.float32)
    return [jnp.asarray(x) for x in (Mt, Jt, qvel, rhs, target, sign, mu, valid, comp)]


def test_opt_core_matches_dense_core():
    args = _problem()
    outsh = [
        jax.ShapeDtypeStruct((NVP, ENV_TILE), jnp.float32),
        jax.ShapeDtypeStruct((ROWS, ENV_TILE), jnp.float32),
    ]

    def k_ref(Mt, Jt, qv, rhs, tg, sg, mu, vd, cp, o1, o2):
        qn, lam = _fused_core(
            Mt[...], Jt[...], qv[...], rhs[...], tg[...], sg[...],
            mu[...], vd[...], ITERS, compliance=cp[...][0],
        )
        o1[...] = qn
        o2[...] = lam

    def k_opt(Mt, Jt, qv, rhs, tg, sg, mu, vd, cp, o1, o2, L_s):
        qn, lam = _fused_core_opt(
            L_s, Mt[...], Jt[...], qv[...], rhs[...], tg[...], sg[...],
            mu[...], vd[...], ITERS, compliance=cp[...][0],
        )
        o1[...] = qn
        o2[...] = lam

    r1 = pl.pallas_call(k_ref, out_shape=outsh, interpret=True)(*args)
    r2 = pl.pallas_call(
        k_opt, out_shape=outsh, interpret=True,
        scratch_shapes=[pltpu.VMEM((NVP, NVP, ENV_TILE), jnp.float32)],
    )(*args)

    np.testing.assert_allclose(
        np.asarray(r1[0]), np.asarray(r2[0]), atol=2e-4
    )  # qvel_new
    np.testing.assert_allclose(np.asarray(r1[1]), np.asarray(r2[1]), atol=2e-3)


def _leg_problem(seed=1):
    """Two-chain structured problem in EXTERNAL order [base 0:6, L 6:12,
    R 12:18]: cross-leg M blocks exactly zero, J's leg rows supported only
    on the leg's own contact rows [0:24]/[24:48] and limit rows
    [48:54]/[54:60] — the structure the mega kernel's CRBA/contact
    assembly guarantees."""
    rng = np.random.default_rng(seed)
    Mt = np.zeros((NVP, NVP, ENV_TILE), np.float32)
    for e in range(ENV_TILE):
        W = rng.normal(size=(NV, NV)) * 0.3
        M = W @ W.T + np.eye(NV) * 2.0
        M[6:12, 12:18] = 0.0
        M[12:18, 6:12] = 0.0
        Mt[:NV, :NV, e] = M
    for k in range(NV, NVP):
        Mt[k, k, :] = 1.0
    Jt = np.zeros((NVP, ROWS, ENV_TILE), np.float32)
    Jt[:6, :60] = rng.normal(size=(6, 60, ENV_TILE)) * 0.5  # base: dense
    Jt[6:12, 0:24] = rng.normal(size=(6, 24, ENV_TILE)) * 0.5  # leg L
    Jt[6:12, 48:54] = rng.normal(size=(6, 6, ENV_TILE)) * 0.5
    Jt[12:18, 24:48] = rng.normal(size=(6, 24, ENV_TILE)) * 0.5  # leg R
    Jt[12:18, 54:60] = rng.normal(size=(6, 6, ENV_TILE)) * 0.5
    qvel = (rng.normal(size=(NVP, ENV_TILE)) * 0.3).astype(np.float32)
    qvel[NV:] = 0
    rhs = (rng.normal(size=(NVP, ENV_TILE)) * 0.05).astype(np.float32)
    rhs[NV:] = 0
    target = (rng.normal(size=(ROWS, ENV_TILE)) * 0.1).astype(np.float32)
    sign = np.ones((ROWS, ENV_TILE), np.float32)
    sign[48:60] = np.sign(rng.normal(size=(12, ENV_TILE))).astype(np.float32)
    mu = rng.uniform(0.3, 1.2, (1, ENV_TILE)).astype(np.float32)
    valid = np.zeros((ROWS, ENV_TILE), np.float32)
    valid[:60] = 1.0
    comp = rng.uniform(0.0, 0.2, (1, ENV_TILE)).astype(np.float32)
    return Mt, Jt, qvel, rhs, target, sign, mu, valid, comp


def test_leg_block_core_matches_dense_core():
    """leg_blocks=True (solver-internal order [L, R, base], static
    cross-leg skips, half-width leg windows) must match the dense core on
    a leg-structured problem, after the DOF permutation.

    The ||G||_inf step bound is basis-dependent (G = L^-1 W L^-T has the
    same spectrum in both orders but different row sums — measured ~3%
    apart, the internal order slightly tighter), so the two APGD iterate
    paths differ at finite iteration counts. Both converge to the same
    unique post-impulse VELOCITY (the primal is unique even where lambda
    is not), so the contract is compared at convergence."""
    Mt, Jt, qvel, rhs, target, sign, mu, valid, comp = _leg_problem()
    # external -> solver-internal row permutation
    perm = list(range(6, 18)) + list(range(0, 6)) + list(range(NV, NVP))
    Mt_p = Mt[perm][:, perm]
    Jt_p = Jt[perm]
    qvel_p = qvel[perm]
    rhs_p = rhs[perm]

    outsh = [
        jax.ShapeDtypeStruct((NVP, ENV_TILE), jnp.float32),
        jax.ShapeDtypeStruct((ROWS, ENV_TILE), jnp.float32),
    ]

    CONV_ITERS = 600

    def k_ref(Mt, Jt, qv, rhs, tg, sg, mu, vd, cp, o1, o2):
        qn, lam = _fused_core(
            Mt[...], Jt[...], qv[...], rhs[...], tg[...], sg[...],
            mu[...], vd[...], CONV_ITERS, compliance=cp[...][0],
        )
        o1[...] = qn
        o2[...] = lam

    def k_leg(Mt, Jt, qv, rhs, tg, sg, mu, vd, cp, o1, o2, L_s):
        qn, lam = _fused_core_opt(
            L_s, Mt[...], Jt[...], qv[...], rhs[...], tg[...], sg[...],
            mu[...], vd[...], CONV_ITERS, compliance=cp[...][0],
            leg_blocks=True,
        )
        o1[...] = qn
        o2[...] = lam

    ext = [jnp.asarray(x) for x in
           (Mt, Jt, qvel, rhs, target, sign, mu, valid, comp)]
    intl = [jnp.asarray(x) for x in
            (Mt_p, Jt_p, qvel_p, rhs_p, target, sign, mu, valid, comp)]
    r1 = pl.pallas_call(k_ref, out_shape=outsh, interpret=True)(*ext)
    r2 = pl.pallas_call(
        k_leg, out_shape=outsh, interpret=True,
        scratch_shapes=[pltpu.VMEM((NVP, NVP, ENV_TILE), jnp.float32)],
    )(*intl)

    qn_ref = np.asarray(r1[0])
    qn_leg = np.asarray(r2[0])[np.argsort(perm)]  # back to external order
    np.testing.assert_allclose(qn_ref, qn_leg, atol=5e-4)
