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
