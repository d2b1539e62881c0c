"""Lane-major full-physics mega-kernel: one Pallas launch per policy step.

Round-1 measurement (docs/PERFORMANCE.md): with the fused contact kernel the
remaining physics cost is the ~450-op XLA dispatch chain per 1 kHz substep
(FK, bias forces, CRBA, Jacobian assembly, marshalling) — latency-bound, not
FLOP-bound. This kernel moves the ENTIRE substep on-chip and runs all
`decimation` substeps per launch, so one policy step of physics is ONE
kernel dispatch + one marshalling transpose each way.

Layout: env-on-lanes. Every per-env scalar (a joint angle, a rotation-matrix
entry, a mass-matrix entry) is a (ENV_TILE,)-wide f32 vector; the
rigid-body math (FK down the tree, velocity/bias recursion, composite
moments) is straight-line "register" arithmetic on those vectors with all
model constants (joint frames, axes, inertias, gains) folded into the
instruction stream at trace time. The contact solve reuses the round-1
tiled `_fused_core` (cholesky + triangular solves + Delassus + APGD on
(row, env-lane) VMEM tiles).

Mass matrix: composite-rigid-body with moments about the WORLD ORIGIN
(m, s = Σ m·c, I_o = Σ I_com + m(|c|²E − ccᵀ)), so child→parent composite
accumulation is plain addition (no frame shifts). A DOF's screw about the
origin is S = (ω, v_o); the momentum it induces through composite C is
F = (m v_o + ω×s, I_o ω + s×v_o) and M[i,j] = S_j ∘ F_i = ω_j·τ + v_j·f,
with F computed from the DEEPER column's composite. Cross-leg blocks are
structurally zero and never touched.

Terrain: heightfield tasks run IN-KERNEL — each contact point carries a 3x3
patch of the precomputed 3-tap-min height grid plus the local slope,
gathered in XLA at policy-step start (an in-kernel per-lane heightfield
gather has no Mosaic lowering); contacts resolve along the sloped surface
normal (frames (t1, t2, n) from the slope, frozen across the decimation
window). The contact solve warm-starts from the previous substep's
impulses carried in the state rows. Physics capability replaced: Isaac Gym
PhysX `gym.simulate` decimation loop (reference legged_robot.py:94-102,
humanoid_config.py:131-147) including trimesh-style contact normals.
"""

from __future__ import annotations

import functools
import os
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .model import RobotModel
from .pallas_solver import (
    ENV_TILE, N_POINTS, NV, NVP, ROWS, _fused_core_opt,
)

# Sublane-env tiling: with HGT_MEGA_SUB = S > 1, each kernel tile carries
# S*128 environments laid out (S, 128) = (sublane, lane), so every
# per-env "scalar" op in the FK/CRBA/contact machinery fills S of the 8
# VPU sublanes instead of 1 — S x fewer issue slots on the scalar stage
# that dominates the kernel (docs/PERFORMANCE.md round-2 census: 10.5k of
# 13.2k eqns per substep are lane-scalars). VMEM per tile scales with S
# (~3.3 MB of scratch at S=1, ~19 MB live at S=2 once the solve stage's
# (NVP, NVP, S, 128) Cholesky scratch is counted).
#
# MEASURED (round 2, v5e, 4096 envs): S=2 compiles (with the raised
# vmem_limit below) but runs ~2x SLOWER than S=1 (280k vs 569k env
# steps/s) — past the 16 MB scoped budget Mosaic double-buffers through
# HBM and the kernel becomes bandwidth-bound instead of issue-bound.
# S=1 stays the default; the flag is kept for retuning on bigger-VMEM
# parts (or after shrinking the solve-stage scratch).
_SUB = max(1, int(os.environ.get("HGT_MEGA_SUB", "1")))
TILE_ENVS = _SUB * 128
# lane shape appended to every row dimension: rank-preserving at S=1
LS = (ENV_TILE,) if _SUB == 1 else (_SUB, 128)

# input/output row layouts (env-lane-major tiles)
NQ = 19
IN_QPOS = 0
IN_QVEL = 19
IN_TGT = 37
IN_FRIC = 49
IN_MS = 50
IN_CSTIFF = 51
IN_COFF = 52
IN_KPS = 53
IN_KDS = 54
IN_COMP = 55
IN_LAM = 56  # warm-start impulses from the previous policy step (60 rows)
IN_ROWS = 120  # 116 padded to sublane multiple

# terrain second input (when built with a heightfield): per contact point a
# 3x3 NODE patch of the raw height grid (meters) around the point's
# step-start node (tap-major rows) for BILINEAR in-kernel contact heights,
# the patch origin in grid units, and the step-start terrain slope
# (dh/dx, dh/dy) for sloped contact frames
IN2_PMIN = 0  # rows [(ii*3+jj)*K + kk]
IN2_OX = 9 * N_POINTS  # 144 + kk
IN2_OY = 10 * N_POINTS  # 160 + kk
IN2_GX = 11 * N_POINTS  # 176 + kk
IN2_GY = 12 * N_POINTS  # 192 + kk
IN2_ROWS = 208

# model-constant input tile (same block for every grid step): per-body rows
# for the STACKED body stage (pallas forbids captured array constants).
# Values are lane-replicated; each slice below reads as one (16,)+LS array.
C_MASS = 0  # 16 rows: body masses
C_INERTIA = 16  # 9 x 16 rows: body inertia tensors (row-major 3x3)
C_COFF = 160  # 3 x 16 rows: contact point offsets, component-major
C_KP = 208  # 12-row per-joint constants follow
C_KD = 220
C_TLIM = 232
C_LOW = 244
C_UP = 256
C_VLIM = 268
C_JFRIC = 280
C_JDAMP = 292
C_ROWS = 304


def _row_of_body(sm):
    """Stacked-stage body row order is PAIR-MAJOR (round 3 leg pairing):
    [base, L1, R1, L2, R2, ...] so depth-d pairs are contiguous 2-row
    slices. Returns row index per body [0, 1, 3, 5, ..., 2, 4, 6, ...]."""
    depth = sm.nj // 2
    rows = [0] * sm.nb
    for d in range(depth):
        rows[1 + d] = 1 + 2 * d  # left chain body
        rows[1 + depth + d] = 2 + 2 * d  # right chain body
    return rows


def _build_const_rows(sm) -> np.ndarray:
    arr = np.zeros((C_ROWS,), np.float32)
    rob = _row_of_body(sm)
    for b in range(sm.nb):
        arr[C_MASS + rob[b]] = sm.mass[b]
    for i in range(3):
        for j in range(3):
            base = C_INERTIA + (i * 3 + j) * 16
            for b in range(sm.nb):
                arr[base + rob[b]] = sm.inertia[b, i, j]
    K = len(sm.cbody)
    for comp in range(3):
        arr[C_COFF + comp * K : C_COFF + (comp + 1) * K] = sm.coff[:, comp]
    nj = sm.nj
    for base, vals in (
        (C_KP, sm.kp), (C_KD, sm.kd), (C_TLIM, sm.tlim), (C_LOW, sm.lower),
        (C_UP, sm.upper), (C_VLIM, sm.vel_limit), (C_JFRIC, sm.friction),
        (C_JDAMP, sm.damping),
    ):
        arr[base : base + nj] = vals
    return arr

OUT_QPOS = 0
OUT_QVEL = 19
OUT_LAM = 37  # 60 rows (48 contact + 12 limit), physical signs
OUT_TAU = 97
OUT_FF = 109  # 6 rows: per-foot WORLD-frame contact impulse sums (2 x xyz)
# 14 rows of END-OF-STEP chain kinematics (round 3): the env's XLA-side
# fk()/body_velocities() per policy step measured 26% of the train
# iteration (docs/ROUND3.md); the kernel re-runs its paired
# position/velocity recursion once on the final state instead. Layout
# (pair-major, components minor): [fLx,fRx, fLy,fRy, fLz,fRz,
# kLx,kRx, kLy,kRy, vLx,vRx, vLy,vRy] — feet/knee positions
# BASE-RELATIVE (FK seeded at the origin), feet v_origin world-frame
# (translation-invariant).
OUT_FK = 115
OUT_ROWS = 136

_NC3 = 3 * N_POINTS


# --------------------------------------------------------------------------- #
# trace-time "symbolic scalar" helpers: values are python floats (constants,
# folded at trace time), traced (ENV_TILE,) arrays, or None (exact zero).
# --------------------------------------------------------------------------- #

def _is_const(x):
    # np.ndarray consts are LEG-PAIRED constants, shape (2,) + (1,)*len(LS):
    # the left/right chain values of one mirror-symmetric model constant
    # (round-3 leg pairing). They fold at trace time like floats; a pair
    # that is all-zero folds to None, a uniform pair to a float.
    return x is None or isinstance(x, (int, float)) or isinstance(x, np.ndarray)


def _simp_const(r):
    """Normalize a trace-time constant: all-zero -> None, uniform -> float."""
    if isinstance(r, np.ndarray):
        if not r.any():
            return None
        f0 = r.flat[0]
        if (r == f0).all():
            return float(f0)
        return r
    return float(r) if r != 0.0 else None


def _mul(a, b):
    if a is None or b is None:
        return None
    if _is_const(a) and _is_const(b):
        return _simp_const(a * b if isinstance(a, np.ndarray)
                           or isinstance(b, np.ndarray) else float(a) * float(b))
    if _is_const(a):
        if isinstance(a, np.ndarray):
            if not a.any():
                return None
            if (a == 1.0).all():
                return b
            if (a == -1.0).all():
                return -b
            return _pair_arr(a) * b
        a = float(a)
        if a == 0.0:
            return None
        if a == 1.0:
            return b
        if a == -1.0:
            return -b
        return a * b
    if _is_const(b):
        return _mul(b, a)
    return a * b


def _add(*terms):
    live = [t for t in terms if t is not None]
    if not live:
        return None
    consts = [t for t in live if _is_const(t)]
    arrs = [t for t in live if not _is_const(t)]
    c = 0.0
    for t in consts:
        c = c + (t if isinstance(t, np.ndarray) else float(t))
    if not arrs:
        return _simp_const(c)
    acc = arrs[0]
    for t in arrs[1:]:
        acc = acc + t
    c = _simp_const(c)
    if c is not None:
        acc = acc + (_pair_arr(c) if isinstance(c, np.ndarray) else c)
    return acc


def _neg(a):
    if a is None:
        return None
    if isinstance(a, np.ndarray):
        return -a
    if _is_const(a):
        return -float(a)
    return -a


def _sub(a, b):
    return _add(a, _neg(b))


# 3-vectors as tuples of symbolic scalars
def v3(x=None, y=None, z=None):
    return (x, y, z)


def v_add(*vs):
    return tuple(_add(*[v[i] for v in vs]) for i in range(3))


def v_sub(a, b):
    return tuple(_sub(a[i], b[i]) for i in range(3))


def v_scale(v, s):
    return tuple(_mul(v[i], s) for i in range(3))


def v_dot(a, b):
    return _add(*[_mul(a[i], b[i]) for i in range(3)])


def v_cross(a, b):
    return (
        _sub(_mul(a[1], b[2]), _mul(a[2], b[1])),
        _sub(_mul(a[2], b[0]), _mul(a[0], b[2])),
        _sub(_mul(a[0], b[1]), _mul(a[1], b[0])),
    )


def const_v3(v):
    return (float(v[0]), float(v[1]), float(v[2]))


# 3x3 matrices as tuples of row tuples
def const_m3(m):
    return tuple(tuple(float(m[i][j]) for j in range(3)) for i in range(3))


# ---- leg pairing (round 3) -------------------------------------------------
# The XBot tree is two mirror-image 6-joint chains; FK/velocity/CRBA per-
# depth quantities are computed ONCE as (2,) + LS values carrying (left,
# right) on a leading axis, halving the lane-scalar op count of those
# stages. Mirror symmetry keeps the zero PATTERNS of the per-leg constants
# identical, so the symbolic-zero folding above survives pairing: a pair
# constant folds to None when both legs are zero and to a float when both
# are equal; otherwise it is a (2,) + (1,)*len(LS) numpy array that
# broadcasts against (2,) + LS traced values (and auto-pairs unpaired
# (LS)-shaped base quantities).

def _cpair(l, r):
    l, r = float(l), float(r)
    if l == r:
        return _simp_const(l) if l == 0.0 else l
    return np.asarray([l, r]).reshape((2,) + (1,) * len(LS))


# pallas forbids captured array constants, so a non-uniform pair constant
# that must meet a traced value materializes INSIDE the kernel as an
# iota-select, cached per (left, right) value for the current trace (the
# cache is reset at each kernel trace entry — see kernel() below)
_PAIR_CACHE: dict = {}


def _pair_arr(a: np.ndarray):
    key = (float(a.flat[0]), float(a.flat[1]))
    v = _PAIR_CACHE.get(key)
    if v is None:
        leg = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        v = jnp.where(leg == 0, key[0], key[1]).astype(jnp.float32)
        _PAIR_CACHE[key] = v
    return v


def const_v3_pair(vl, vr):
    return tuple(_cpair(vl[k], vr[k]) for k in range(3))


def const_m3_pair(ml, mr):
    return tuple(
        tuple(_cpair(ml[i][j], mr[i][j]) for j in range(3)) for i in range(3)
    )


def unpair(x, s):
    """Leg s of a paired symbolic scalar (None/float/np pair/traced)."""
    if x is None or isinstance(x, (int, float)):
        return x
    if isinstance(x, np.ndarray):
        return float(x.reshape(2, -1)[s, 0])
    if x.ndim == len(LS) + 1:
        return x[s]
    return x  # unpaired traced value shared by both legs


def unpair_v3(v, s):
    return tuple(unpair(v[k], s) for k in range(3))


def unpair_m3(m, s):
    return tuple(tuple(unpair(m[i][j], s) for j in range(3)) for i in range(3))


def m_mul(A, B):
    return tuple(
        tuple(_add(*[_mul(A[i][k], B[k][j]) for k in range(3)]) for j in range(3))
        for i in range(3)
    )


def m_vec(A, v):
    return tuple(_add(*[_mul(A[i][k], v[k]) for k in range(3)]) for i in range(3))


def mT_vec(A, v):
    return tuple(_add(*[_mul(A[k][i], v[k]) for k in range(3)]) for i in range(3))


def m_transpose(A):
    return tuple(tuple(A[j][i] for j in range(3)) for i in range(3))


# symmetric 3x3 as 6-tuple (xx, yy, zz, xy, xz, yz)
def sym_from_m3(A):
    return (A[0][0], A[1][1], A[2][2], A[0][1], A[0][2], A[1][2])


def sym_add(*ss):
    return tuple(_add(*[s[i] for s in ss]) for i in range(6))


def sym_vec(S, v):
    xx, yy, zz, xy, xz, yz = S
    return (
        _add(_mul(xx, v[0]), _mul(xy, v[1]), _mul(xz, v[2])),
        _add(_mul(xy, v[0]), _mul(yy, v[1]), _mul(yz, v[2])),
        _add(_mul(xz, v[0]), _mul(yz, v[1]), _mul(zz, v[2])),
    )


def _materialize(x, dtype=jnp.float32):
    """Symbolic scalar -> concrete (ENV_TILE,) array for stores."""
    if x is None:
        return jnp.zeros(LS, dtype)
    if _is_const(x):
        return jnp.full(LS, float(x), dtype)
    return x


def _mat_pair(x):
    """Paired symbolic value -> concrete (2,) + LS array for stores."""
    if x is None:
        return jnp.zeros((2,) + LS, jnp.float32)
    if isinstance(x, np.ndarray):
        return jnp.broadcast_to(_pair_arr(x), (2,) + LS)
    if isinstance(x, (int, float)):
        return jnp.full((2,) + LS, float(x), jnp.float32)
    if x.ndim == len(LS):
        return jnp.broadcast_to(x, (2,) + LS)
    return x


# --------------------------------------------------------------------------- #
# static model extraction (numpy, once per kernel build)
# --------------------------------------------------------------------------- #

class _StaticModel:
    def __init__(self, model: RobotModel, kp, kd, torque_limit):
        self.nb = model.nbody
        self.nj = model.nj
        self.parent = list(model.body_parent)
        self.joint_pos = np.asarray(model.joint_pos, np.float64)
        self.joint_rot = np.asarray(model.joint_rot, np.float64)
        self.joint_axis = np.asarray(model.joint_axis, np.float64)
        self.mass = np.asarray(model.body_mass, np.float64)
        self.com = np.asarray(model.body_com, np.float64)
        self.inertia = np.asarray(model.body_inertia, np.float64)
        self.damping = np.asarray(model.dof_damping, np.float64)
        self.friction = np.asarray(model.dof_friction, np.float64)
        self.armature = np.asarray(model.dof_armature, np.float64)
        self.lower = np.asarray(model.dof_lower, np.float64)
        self.upper = np.asarray(model.dof_upper, np.float64)
        self.vel_limit = np.asarray(model.dof_vel_limit, np.float64)
        self.kp = np.asarray(kp, np.float64)
        self.kd = np.asarray(kd, np.float64)
        self.tlim = np.asarray(torque_limit, np.float64)
        self.gravity = np.asarray(model.gravity, np.float64)
        self.cbody = list(model.contact_point_body)
        self.cruns = model.contact_point_runs()  # (body, start, end) runs
        self.feet = list(model.feet_body_idx)
        self.knee = list(model.knee_body_idx)
        self.coff = np.asarray(model.contact_point_offset, np.float64)
        # per-joint rotation-about-axis coefficient matrices:
        # Raxis(θ) = I + sinθ·K + (1−cosθ)·K² → entry = (I+K²) + K·s − K²·c
        self.ax_const = []
        self.ax_sin = []
        self.ax_cos = []
        for a in self.joint_axis:
            a = a / np.linalg.norm(a)
            K = np.array(
                [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]]
            )
            K2 = K @ K
            self.ax_const.append(np.eye(3) + K2)
            self.ax_sin.append(K)
            self.ax_cos.append(-K2)
        # ancestor joint list per body (root-first)
        self.anc = []
        for b in range(self.nb):
            chain = []
            cur = b
            while cur != 0:
                chain.append(cur - 1)  # joint i moves body i+1
                cur = self.parent[cur]
            self.anc.append(list(reversed(chain)))


def make_contact_xy_batched(sm: _StaticModel, model: RobotModel):
    """Batched world-frame contact-point XY, specialized to the two leg
    chains (round 4). The generic `vmap(fk)` path stacks (N, 13, 3, 3)
    rotation chains through gathers and layout copies — measured 60-90 ms
    of the terrain train iteration at 4096 envs — while the patch builder
    only needs the 16 contact points' xy. This walks each 6-joint chain
    with the kernel's symbolic constant-folding algebra on plain (N,)
    values (no body stacking, no index gathers), which XLA fuses into a
    handful of wide elementwise kernels. Same math as kinematics.fk
    (matmul-free, so no precision context is needed)."""
    depth = sm.nj // 2
    cpo = np.asarray(sm.coff)  # (K, 3)
    runs = sm.cruns

    def contact_xy(qpos):  # (N, nq) -> (N, K, 2) f32
        qpos = qpos.astype(jnp.float32)
        w, x, y, z = qpos[:, 3], qpos[:, 4], qpos[:, 5], qpos[:, 6]
        xx, yy, zz = x * x, y * y, z * z
        xy_, xz_, yz_ = x * y, x * z, y * z
        wx, wy, wz = w * x, w * y, w * z
        R0 = (
            (1 - 2 * (yy + zz), 2 * (xy_ - wz), 2 * (xz_ + wy)),
            (2 * (xy_ + wz), 1 - 2 * (xx + zz), 2 * (yz_ - wx)),
            (2 * (xz_ - wy), 2 * (yz_ + wx), 1 - 2 * (xx + yy)),
        )
        n = qpos.shape[0]
        cols = []
        for leg in range(2):
            Rc, pc = R0, v3()
            for d in range(depth):
                j = leg * depth + d
                Rj = m_mul(Rc, const_m3(sm.joint_rot[j]))
                pc = v_add(m_vec(Rc, const_v3(sm.joint_pos[j])), pc)
                qj = qpos[:, 7 + j]
                s_, c_ = jnp.sin(qj), jnp.cos(qj)
                Rax = tuple(
                    tuple(
                        _add(
                            float(sm.ax_const[j][r][c]),
                            _mul(float(sm.ax_sin[j][r][c]), s_),
                            _mul(float(sm.ax_cos[j][r][c]), c_),
                        )
                        for c in range(3)
                    )
                    for r in range(3)
                )
                Rc = m_mul(Rj, Rax)
            _, a, b_ = runs[leg]
            for k in range(a, b_):
                off = const_v3(cpo[k])
                cols.append(
                    tuple(
                        _add(v_dot(Rc[i], off), pc[i], qpos[:, i])
                        for i in range(2)
                    )
                )

        def mat(v):  # symbolic scalar -> (N,) array
            if v is None:
                return jnp.zeros((n,), jnp.float32)
            if isinstance(v, (int, float)):
                return jnp.full((n,), float(v), jnp.float32)
            return v

        X = jnp.stack([mat(cx) for cx, _ in cols], axis=1)
        Y = jnp.stack([mat(cy) for _, cy in cols], axis=1)
        return jnp.stack([X, Y], axis=-1)

    return contact_xy


# --------------------------------------------------------------------------- #
# the kernel
# --------------------------------------------------------------------------- #

def _build_mega_kernel(
    sm: _StaticModel,
    dt: float,
    decimation: int,
    iterations: int,
    contact_offset: float,
    max_depen_vel: float,
    lim_baumgarte: float,
    lim_max_depen: float,
    lim_margin: float,
    terrain=None,  # optional (border, inv_h, nrow, ncol) static floats
):
    nj = sm.nj
    nb = sm.nb
    K = len(sm.cbody)
    assert K == N_POINTS and nj == 12 and nb == 13
    # leg pairing (FK/velocity stages) requires the tree to be two chains
    # rooted at the base: left = bodies 1..6, right = 7..12
    assert sm.parent == [-1] + [0, 1, 2, 3, 4, 5] + [0, 7, 8, 9, 10, 11], (
        "mega kernel's leg-paired FK assumes two mirror 6-joint chains; "
        f"got parent={sm.parent}"
    )
    # end-of-step FK output rows (OUT_FK): feet are the chain tips, knees
    # sit mid-chain at the same depth in both legs
    assert tuple(sm.feet) == (nj // 2, nb - 1), sm.feet
    knee_depth = sm.knee[0] - 1
    assert sm.knee[1] - 1 - nj // 2 == knee_depth, sm.knee
    # the leg-block solve (pallas_solver leg_blocks) assumes foot-L contact
    # points occupy the first half of the point list and foot-R the second
    assert tuple(sm.cruns) == ((nj // 2, 0, K // 2), (nb - 1, K // 2, K)), (
        sm.cruns
    )
    # solver-internal DOF order [L joints 0:6, R joints 6:12, base 12:18]:
    # M/J/qvel/rhs rows are ASSEMBLED directly at the mapped index (free at
    # trace time) so the solve's Cholesky factor has no cross-leg fill-in
    if terrain is not None:
        terr_border, terr_inv_h, terr_nrow, terr_ncol = (
            float(terrain[0]), float(terrain[1]), float(terrain[2]), float(terrain[3])
        )

    def kernel(in_ref, *rest):
        """st_s rows: 0-18 qpos, 19-36 qvel, 37-96 lam, 97-108 tau."""
        _PAIR_CACHE.clear()  # per-trace iota-select cache (leg pairing)
        if terrain:
            in2_ref, inc_ref, out_ref, Mt_s, Jt_s, tgt_s, sign_s, st_s, L_s = rest
            in2 = in2_ref[0]  # (IN2_ROWS, 128)
        else:
            inc_ref, out_ref, Mt_s, Jt_s, tgt_s, sign_s, st_s, L_s = rest
        inp = in_ref[0]  # (IN_ROWS, 128)
        inc = inc_ref[0]  # (C_ROWS, 128) lane-replicated model constants
        mu = inp[IN_FRIC][None, :]  # (1, 128)
        ms = inp[IN_MS]  # base-mass scale
        cstiff = inp[IN_CSTIFF]
        coffset = inp[IN_COFF]  # contact activation distance
        kp_s = inp[IN_KPS]  # motor-strength scales
        kd_s = inp[IN_KDS]
        comp = inp[IN_COMP]  # contact compliance (CFM; 0 = rigid)
        # (PD targets are read as the stacked inp[IN_TGT:IN_TGT+nj] rows
        # inside the PD stage — no per-joint lane-scalar reads here.)

        # scratch init (static patterns built from iotas — Mosaic-safe)
        f32 = jnp.float32
        mr = jax.lax.broadcasted_iota(jnp.int32, (NVP, NVP) + LS, 0)
        mc = jax.lax.broadcasted_iota(jnp.int32, (NVP, NVP) + LS, 1)
        # padded Mtilde diagonal carries identity
        Mt_s[...] = jnp.where((mr == mc) & (mr >= NV), 1.0, 0.0).astype(f32)
        jv = jax.lax.broadcasted_iota(jnp.int32, (NVP, ROWS) + LS, 0)
        jr = jax.lax.broadcasted_iota(jnp.int32, (NVP, ROWS) + LS, 1)
        # base-translation columns of every contact row + limit identity
        # rows, at the SOLVER-INTERNAL row indices (joints 0:nj, base
        # translation nj:nj+3, base rotation nj+3:nj+6)
        base_tr = (
            (jv >= nj) & (jv < nj + 3) & (jr < _NC3)
            & (jr - (jr // 3) * 3 == jv - nj)
        )
        lim_id = (jv < nj) & (jr == jv + _NC3)
        Jt_s[...] = jnp.where(base_tr | lim_id, 1.0, 0.0).astype(f32)
        tgt_s[...] = jnp.zeros((ROWS,) + LS, f32)
        sign_s[...] = jnp.ones((ROWS,) + LS, f32)
        # state rows seeded with qpos/qvel and the WARM-START impulses from
        # the previous policy step (rows OUT_LAM..OUT_LAM+59) — every
        # substep's APGD starts from the last substep's lam
        st_s[...] = jnp.concatenate(
            [
                inp[:IN_TGT],
                inp[IN_LAM : IN_LAM + (OUT_TAU - OUT_LAM)],
                jnp.zeros((OUT_ROWS - OUT_TAU,) + LS, f32),
            ],
            axis=0,
        )

        rr = jax.lax.broadcasted_iota(jnp.int32, (ROWS,) + LS, 0)
        valid = (rr < (_NC3 + nj)).astype(f32)

        def chain_kin(quat, qj, vlin, omg0, dqj, with_bias):
            """Leg-paired FK + velocity recursion down the two mirror
            6-joint chains (kinematics.py fk / body_velocities math).
            Positions are BASE-RELATIVE: FK is seeded at the ORIGIN, which
            keeps the f32 CRBA / screw algebra translation-invariant
            (absolute world xy past ~100 m would make the m*c^2 composite
            terms swamp the ~1e-2 inertia entries and the Cholesky goes
            NaN from cancellation); pos0 is re-added only for the
            ground-height query.

            Each depth runs ONCE on (2,) + LS values — (left, right) on a
            leading axis — halving the stage's lane-scalar op count (left =
            joints 0..5 / bodies 1..6, right = 6..11 / 7..12, asserted at
            build). The base R0 stays (LS)-shaped and auto-pairs by
            broadcast at depth 0. alp/ao (bias accelerations) are computed
            only when with_bias — the post-loop FK-output pass needs just
            positions and v_origin."""
            w, x, y, z = quat
            xx, yy, zz = x * x, y * y, z * z
            xy, xz, yz = x * y, x * z, y * z
            wx, wy, wz = w * x, w * y, w * z
            R0 = (
                (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
                (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
                (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
            )
            depth = nj // 2
            R_pr, p_pr, axw_pr = [], [], []
            for d in range(depth):
                jl, jr = d, d + depth
                if d == 0:
                    Rp, pp = R0, v3()
                else:
                    Rp, pp = R_pr[d - 1], p_pr[d - 1]
                Rj = m_mul(Rp, const_m3_pair(sm.joint_rot[jl], sm.joint_rot[jr]))
                pj = v_add(
                    m_vec(Rp, const_v3_pair(sm.joint_pos[jl], sm.joint_pos[jr])),
                    pp,
                )
                a_w = m_vec(
                    Rj, const_v3_pair(sm.joint_axis[jl], sm.joint_axis[jr])
                )
                qj_p = jnp.stack([qj[jl], qj[jr]])
                s_i = jnp.sin(qj_p)
                c_i = jnp.cos(qj_p)
                Rax = tuple(
                    tuple(
                        _add(
                            _cpair(sm.ax_const[jl][r][c], sm.ax_const[jr][r][c]),
                            _mul(_cpair(sm.ax_sin[jl][r][c],
                                        sm.ax_sin[jr][r][c]), s_i),
                            _mul(_cpair(sm.ax_cos[jl][r][c],
                                        sm.ax_cos[jr][r][c]), c_i),
                        )
                        for c in range(3)
                    )
                    for r in range(3)
                )
                R_pr.append(m_mul(Rj, Rax))
                p_pr.append(pj)
                axw_pr.append(a_w)

            # velocity / bias-acceleration recursion (dynamics.py
            # bias_forces_explicit — same world-frame recursion)
            omg_pr, alp_pr, vo_pr, ao_pr = [], [], [], []
            for d in range(depth):
                jl, jr = d, d + depth
                if d == 0:
                    w_p, al_p, v_p, a_p, pp = omg0, v3(), vlin, v3(), v3()
                else:
                    w_p, al_p = omg_pr[d - 1], alp_pr[d - 1] if with_bias else None
                    v_p, a_p = vo_pr[d - 1], ao_pr[d - 1] if with_bias else None
                    pp = p_pr[d - 1]
                r = v_sub(p_pr[d], pp)
                wxr = v_cross(w_p, r)
                dqj_p = jnp.stack([dqj[jl], dqj[jr]])
                omg_pr.append(v_add(w_p, v_scale(axw_pr[d], dqj_p)))
                vo_pr.append(v_add(v_p, wxr))
                if with_bias:
                    alp_pr.append(
                        v_add(al_p, v_scale(v_cross(w_p, axw_pr[d]), dqj_p))
                    )
                    ao_pr.append(
                        v_add(a_p, v_cross(al_p, r), v_cross(w_p, wxr))
                    )
            return R0, R_pr, p_pr, axw_pr, omg_pr, alp_pr, vo_pr, ao_pr

        # sloped contact frames (t1, t2, n) with n = normalize(-dh/dx,
        # -dh/dy, 1) — PhysX-trimesh-normal capability analog. The slope
        # rows are LAUNCH constants (step-start gather), so the frames are
        # computed ONCE here instead of per substep (round 5: ~30 (K,)+LS
        # vector ops x 9 redundant substeps saved per launch).
        frames0 = None
        if terrain:
            _K = N_POINTS
            _gx = in2[IN2_GX : IN2_GX + _K]
            _gy = in2[IN2_GY : IN2_GY + _K]
            _n_inv = jax.lax.rsqrt(_gx * _gx + _gy * _gy + 1.0)
            _n_d = (-_gx * _n_inv, -_gy * _n_inv, _n_inv)
            _t1_inv = jax.lax.rsqrt(_n_d[2] * _n_d[2] + _n_d[0] * _n_d[0])
            _zK = jnp.zeros((_K,) + LS, f32)
            _t1_d = (_n_d[2] * _t1_inv, _zK, -_n_d[0] * _t1_inv)
            _t2_d = (  # n x t1 (t1_y = 0)
                _n_d[1] * _t1_d[2],
                _n_d[2] * _t1_d[0] - _n_d[0] * _t1_d[2],
                -_n_d[1] * _t1_d[0],
            )
            frames0 = (_n_d, _t1_d, _t2_d)

        def substep(_, carry):
            st = st_s[...]
            pos0 = (st[0], st[1], st[2])
            quat = (st[3], st[4], st[5], st[6])
            qj = [st[7 + j] for j in range(nj)]
            vlin = (st[19], st[20], st[21])
            omg0 = (st[22], st[23], st[24])
            dqj = [st[25 + j] for j in range(nj)]

            # ---- PD torques (legged_robot.py:340-356), motor-strength DR,
            # STACKED: all 12 joints as one (nj,)+LS row block ----
            qj_st = st[7 : 7 + nj]
            dqj_st = st[25 : 25 + nj]
            tgt_st = inp[IN_TGT : IN_TGT + nj]
            tl_row = inc[C_TLIM : C_TLIM + nj]
            tau_st = (
                kp_s * inc[C_KP : C_KP + nj] * (tgt_st - qj_st)
                - kd_s * inc[C_KD : C_KD + nj] * dqj_st
            )
            tau_st = jnp.clip(tau_st, -tl_row, tl_row)

            # ---- FK + velocity/bias recursion (LEG-PAIRED; chain_kin) ----
            depth = nj // 2
            (R0, R_pr, p_pr, axw_pr, omg_pr, alp_pr, vo_pr, ao_pr) = chain_kin(
                quat, qj, vlin, omg0, dqj, with_bias=True
            )

            # COM positions stay paired (consumed by the stacked body stage)
            com0 = m_vec(R0, const_v3(sm.com[0]))  # base at relative origin
            com_pr = [
                v_add(
                    p_pr[d],
                    m_vec(
                        R_pr[d],
                        const_v3_pair(sm.com[1 + d], sm.com[1 + depth + d]),
                    ),
                )
                for d in range(depth)
            ]

            # unpair ONLY what the contact stage consumes as singles: the
            # foot-body frames and each leg's per-joint axes/pivots.
            # Everything else (body stage, subtree accumulation, bias
            # vector, CRBA columns) stays paired.
            R = {0: R0}
            p = {0: v3()}
            axis_w, pivot_w = [None] * nj, [None] * nj
            for leg in range(2):
                fb = depth if leg == 0 else nb - 1  # leg tip bodies (6, 12)
                R[fb] = unpair_m3(R_pr[depth - 1], leg)
                p[fb] = unpair_v3(p_pr[depth - 1], leg)
                for d in range(depth):
                    axis_w[leg * depth + d] = unpair_v3(axw_pr[d], leg)
                    pivot_w[leg * depth + d] = unpair_v3(p_pr[d], leg)

            # ---- per-body forces & composite moments (STACKED, pair-major
            # body order) ----
            # Bodies live on the SUBLANE axis as one (NBP,) + LS array per
            # quantity, in PAIR-MAJOR row order [base, L1, R1, L2, R2, ...]
            # (round 3): rows are built straight from the leg-paired FK
            # values with one stack+reshape per component (no per-body
            # unpair), and depth-d subtree quantities extract back out as
            # contiguous (2,) + LS row slices. Model constants (masses,
            # inertia) are packed in the same order (_build_const_rows).
            NBP = 16
            f32_ = jnp.float32

            mat_pair = _mat_pair

            _pad_rows = jnp.zeros((NBP - 1 - 2 * depth,) + LS, f32_)

            def stk_pm(base_val, pairs):
                rows = jnp.stack([mat_pair(q) for q in pairs])  # (depth, 2)+LS
                return jnp.concatenate(
                    [
                        _materialize(base_val)[None],
                        rows.reshape((2 * depth,) + LS),
                        _pad_rows,
                    ],
                    axis=0,
                )

            def stk3_pm(base_tuple, pair_list):
                return tuple(
                    stk_pm(base_tuple[i], [q[i] for q in pair_list])
                    for i in range(3)
                )

            def cross_st(a, b):
                return (
                    a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0],
                )

            def symv_st(S, v):
                xx, yy, zz, xy, xz, yz = S
                return (
                    xx * v[0] + xy * v[1] + xz * v[2],
                    xy * v[0] + yy * v[1] + yz * v[2],
                    xz * v[0] + yz * v[1] + zz * v[2],
                )

            Rst = [
                [
                    stk_pm(R0[i][j], [R_pr[d][i][j] for d in range(depth)])
                    for j in range(3)
                ]
                for i in range(3)
            ]
            com_st = stk3_pm(com0, com_pr)
            p_st = stk3_pm(v3(), p_pr)
            omg_st = stk3_pm(omg0, omg_pr)
            alp_st = stk3_pm(v3(), alp_pr)
            ao_st = stk3_pm(v3(), ao_pr)

            brow = jax.lax.broadcasted_iota(jnp.int32, (NBP,) + LS, 0)
            ms_b = jnp.where(brow == 0, ms, 1.0)  # base-mass DR on row 0
            mass_st = inc[C_MASS : C_MASS + NBP] * ms_b

            Ib = [
                [
                    inc[C_INERTIA + (i * 3 + j) * NBP :
                        C_INERTIA + (i * 3 + j + 1) * NBP]
                    for j in range(3)
                ]
                for i in range(3)
            ]
            # world inertia I_w = R I_body R^T (base row scaled by ms)
            IR = [
                [
                    Rst[i][0] * Ib[0][j] + Rst[i][1] * Ib[1][j]
                    + Rst[i][2] * Ib[2][j]
                    for j in range(3)
                ]
                for i in range(3)
            ]

            def _iw(i, j):
                return (
                    IR[i][0] * Rst[j][0] + IR[i][1] * Rst[j][1]
                    + IR[i][2] * Rst[j][2]
                ) * ms_b

            Iw_st = (_iw(0, 0), _iw(1, 1), _iw(2, 2), _iw(0, 1), _iw(0, 2), _iw(1, 2))

            rc = tuple(com_st[i] - p_st[i] for i in range(3))
            wxrc = cross_st(omg_st, rc)
            axrc = cross_st(alp_st, rc)
            wxwxrc = cross_st(omg_st, wxrc)
            gvec = [float(x) for x in sm.gravity]
            a_com = tuple(ao_st[i] + axrc[i] + wxwxrc[i] for i in range(3))
            # f = m (a_com − g); τ_com = I_w α + ω × (I_w ω)
            f_st = tuple(
                mass_st * (a_com[i] - gvec[i] if gvec[i] != 0.0 else a_com[i])
                for i in range(3)
            )
            Iw_w = symv_st(Iw_st, omg_st)
            sia = symv_st(Iw_st, alp_st)
            wxIw = cross_st(omg_st, Iw_w)
            t_com = tuple(sia[i] + wxIw[i] for i in range(3))
            cxf = cross_st(com_st, f_st)
            tau_o_st = tuple(t_com[i] + cxf[i] for i in range(3))
            s_st = tuple(mass_st * com_st[i] for i in range(3))
            cc = (
                com_st[0] * com_st[0], com_st[1] * com_st[1],
                com_st[2] * com_st[2], com_st[0] * com_st[1],
                com_st[0] * com_st[2], com_st[1] * com_st[2],
            )
            c2 = cc[0] + cc[1] + cc[2]
            Io_st = (
                Iw_st[0] + mass_st * (c2 - cc[0]),
                Iw_st[1] + mass_st * (c2 - cc[1]),
                Iw_st[2] + mass_st * (c2 - cc[2]),
                Iw_st[3] - mass_st * cc[3],
                Iw_st[4] - mass_st * cc[4],
                Iw_st[5] - mass_st * cc[5],
            )

            # ---- subtree accumulation, PAIRED ----
            # Whole-robot totals (base subtree) are one sublane reduce per
            # quantity (pad rows are zero); per-depth subtree composites are
            # suffix sums of contiguous (2,) + LS pair rows down each chain.
            quants = list(f_st) + list(tau_o_st) + [mass_st] + list(s_st) \
                + list(Io_st)  # 16 stacked arrays
            tot = [jnp.sum(q, axis=0) for q in quants]
            F_tot, T_tot = tuple(tot[0:3]), tuple(tot[3:6])
            M_tot, S_tot, Io_tot = tot[6], tuple(tot[7:10]), tuple(tot[10:16])

            sub_pr = [None] * depth  # [d] -> list of 16 (2,)+LS subtree sums
            prev = None
            for d in reversed(range(depth)):
                cur = [q[1 + 2 * d : 3 + 2 * d] for q in quants]
                if prev is not None:
                    cur = [a + b for a, b in zip(cur, prev)]
                sub_pr[d] = cur
                prev = cur
            F_pr = [tuple(sub_pr[d][0:3]) for d in range(depth)]
            T_pr = [tuple(sub_pr[d][3:6]) for d in range(depth)]
            M_pr = [sub_pr[d][6] for d in range(depth)]
            S_pr = [tuple(sub_pr[d][7:10]) for d in range(depth)]
            Io_pr = [tuple(sub_pr[d][10:16]) for d in range(depth)]

            # ---- bias vector h (= J^T of accumulated forces), PAIRED ----
            h = [None] * NV
            h[0], h[1], h[2] = F_tot
            h[3], h[4], h[5] = T_tot  # base sits at the (relative) origin
            h_pr = [
                v_dot(
                    axw_pr[d],
                    v_sub(T_pr[d], v_cross(p_pr[d], F_pr[d])),
                )
                for d in range(depth)
            ]
            # joint-order (12,)+LS rows [L1..L6, R1..R6] via one stack along
            # a new axis-1 + reshape (leg-major flattening)
            h_j = jnp.stack(
                [mat_pair(x) for x in h_pr], axis=1
            ).reshape((nj,) + LS)

            # ---- mass matrix via composite screws, PAIRED joint columns --
            screws = []
            for kk in range(3):  # base translation
                e = [0.0] * 3
                e[kk] = 1.0
                screws.append((v3(), tuple(e)))
            for kk in range(3):  # base rotation (pivot = base origin)
                e = [0.0] * 3
                e[kk] = 1.0
                screws.append((tuple(e), v3()))  # pivot = base = origin
            screw_pr = [
                (axw_pr[d], v_cross(p_pr[d], axw_pr[d])) for d in range(depth)
            ]

            def momentum(comp_m, comp_s, comp_Io, S):
                w_s, v_s = S
                f = v_add(v_scale(v_s, comp_m), v_cross(w_s, comp_s))
                t = v_add(sym_vec(comp_Io, w_s), v_cross(comp_s, v_s))
                return f, t

            # NOTE on stacking (tried, reverted): batching the pair products
            # over columns — Mcol = Σ_k S_stack[k]·F_c[k] with ancestor
            # masks — COSTS more than the scalar loop: the constant base
            # screws make most base-block entries fold to component selects
            # (zero ops) under the symbolic-zero algebra, while the dense
            # column product pays 11 wide ops per column regardless.
            # Joint columns are instead LEG-PAIRED (round 3): one momentum +
            # pair-product evaluation per depth covers both legs' columns.
            def pair(S, F):
                w_s, v_s = S
                f, t = F
                return _add(v_dot(w_s, t), v_dot(v_s, f))

            # base 6x6 block from the whole-robot composite (solver rows
            # nj + c — base DOFs sit LAST in the solver-internal order)
            F_base = [
                momentum(M_tot, S_tot, Io_tot, screws[c]) for c in range(6)
            ]
            for c1 in range(6):
                for c2 in range(c1, 6):
                    mv = _materialize(pair(screws[c1], F_base[c2]))
                    Mt_s[nj + c1, nj + c2] = mv
                    if c1 != c2:
                        Mt_s[nj + c2, nj + c1] = mv
            # joint columns: momentum through the joint's subtree composite,
            # one PAIRED evaluation per depth; entries land in each leg's
            # quadrant via unpair. Solver rows: joint j lives at row j
            # (L 0:depth, R depth:nj)
            for d in range(depth):
                jl, jr = d, depth + d
                Fi = momentum(M_pr[d], S_pr[d], Io_pr[d], screw_pr[d])
                for c in range(6):  # base couplings
                    val = pair(screws[c], Fi)
                    for leg, col in ((0, jl), (1, jr)):
                        mv = _materialize(unpair(val, leg))
                        Mt_s[nj + c, col] = mv
                        Mt_s[col, nj + c] = mv
                for a in range(d + 1):  # ancestor joints (includes d itself)
                    val = pair(screw_pr[a], Fi)
                    if a == d:
                        # diagonal: + armature + dt·(kd·kd_s + damping)
                        val = _add(
                            val,
                            _mul(
                                _mul(
                                    dt,
                                    _cpair(sm.kd[d], sm.kd[depth + d]),
                                ),
                                kd_s,
                            ),
                            _cpair(
                                sm.armature[d] + dt * sm.damping[d],
                                sm.armature[depth + d]
                                + dt * sm.damping[depth + d],
                            ),
                        )
                        for leg, col in ((0, jl), (1, jr)):
                            Mt_s[col, col] = _materialize(unpair(val, leg))
                    else:
                        for leg, (ra, cb) in (
                            (0, (a, jl)),
                            (1, (depth + a, jr)),
                        ):
                            mv = _materialize(unpair(val, leg))
                            Mt_s[ra, cb] = mv
                            Mt_s[cb, ra] = mv

            # ---- contact candidate rows, STACKED over points ----
            # Points live on the sublane axis as (K,)+LS arrays (the model's
            # contact points are contiguous runs per foot body). Interleaved
            # (x, y, z) row storage is recovered with the stack+reshape
            # pattern the solver's projection already uses, so the global
            # ROWS layout is unchanged. ~1.6k lane-scalar eqns become ~300.
            inv_dt = 1.0 / dt
            bmg = 0.2 * cstiff  # contact Baumgarte scale (contact-model DR)
            groups = sm.cruns  # contiguous (body, start, end) point runs

            # X = R_f @ coff + p_f per group, concatenated to (K,)+LS
            Xc = []
            for i in range(3):
                parts = []
                for fb, a, b_ in groups:
                    acc = None
                    for j in range(3):
                        cr = inc[C_COFF + j * K + a : C_COFF + j * K + b_]
                        term = cr * _materialize(R[fb][i][j])
                        acc = term if acc is None else acc + term
                    parts.append(acc + _materialize(p[fb][i]))
                Xc.append(jnp.concatenate(parts, axis=0))

            zK = jnp.zeros((K,) + LS, f32)

            def inter3(a, b, c):  # per-point (x, y, z) -> interleaved rows
                return jnp.stack([a, b, c], axis=1).reshape((_NC3,) + LS)

            def cross_pt(a, b):  # 3-tuples of (K,)+LS (or scalar) values
                return (
                    a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0],
                )

            Xz_abs = Xc[2] + pos0[2]
            if terrain:
                # BILINEAR heightfield lookup from the per-point 3x3 raw
                # node patches (component-major rows; the 2-cell window
                # tracks the point's step-start node +-1 — a foot leaving
                # it within 10 ms clamps to the window edge). Bilinear =
                # the continuous surface MuJoCo/PhysX feet feel; the
                # reference's 3-tap-min floor lookup stays the OBSERVATION
                # contract but as contact geometry it terraces every slope.
                fx = jnp.clip(
                    (Xc[0] + pos0[0] + terr_border) * terr_inv_h,
                    0.0, terr_nrow - 1.001,
                )
                fy = jnp.clip(
                    (Xc[1] + pos0[1] + terr_border) * terr_inv_h,
                    0.0, terr_ncol - 1.001,
                )
                u = jnp.clip(fx - in2[IN2_OX : IN2_OX + K], 0.0, 1.999)
                v = jnp.clip(fy - in2[IN2_OY : IN2_OY + K], 0.0, 1.999)
                iu = jnp.floor(u)
                iv = jnp.floor(v)
                fu = u - iu
                fv = v - iv
                ohv0 = jnp.where(iv == 0.0, 1.0, 0.0)
                ohv1 = 1.0 - ohv0

                def prow(a, b):  # node (a, b) of the 3x3 patch
                    return in2[
                        IN2_PMIN + (a * 3 + b) * K :
                        IN2_PMIN + (a * 3 + b + 1) * K
                    ]

                hy = []
                for a in range(3):
                    lo = ohv0 * prow(a, 0) + ohv1 * prow(a, 1)
                    hi = ohv0 * prow(a, 1) + ohv1 * prow(a, 2)
                    hy.append((1.0 - fv) * lo + fv * hi)
                ohu0 = jnp.where(iu == 0.0, 1.0, 0.0)
                ohu1 = 1.0 - ohu0
                h_lo = ohu0 * hy[0] + ohu1 * hy[1]
                h_hi = ohu0 * hy[1] + ohu1 * hy[2]
                ground = (1.0 - fu) * h_lo + fu * h_hi
                phi = Xz_abs - ground
                # sloped contact frames: hoisted before the decimation
                # loop (slope rows are launch-constant) — see frames0
                n_d, t1_d, t2_d = frames0
                phi = phi * n_d[2]
            else:
                phi = Xz_abs  # flat plane: ground height 0, identity frames
                t1_d = t2_d = n_d = None
            b_pen = jnp.minimum(bmg * (-phi) * inv_dt, max_depen_vel)
            b_gap = -phi * inv_dt
            lo = jnp.where(phi <= 0.0, b_pen, b_gap)
            lo = jnp.where(phi > coffset, -1e9, lo)
            tgt_s[0:_NC3] = inter3(zK, zK, lo)
            d0, d1, d2 = Xc
            if terrain:
                # base translation columns: the direction components
                for c in range(3):
                    Jt_s[nj + c, 0:_NC3] = inter3(t1_d[c], t2_d[c], n_d[c])
                # base rotation columns: (X × d)[c] per direction
                xt1 = cross_pt(Xc, t1_d)
                xt2 = cross_pt(Xc, t2_d)
                xn = cross_pt(Xc, n_d)
                for c in range(3):
                    Jt_s[nj + 3 + c, 0:_NC3] = inter3(xt1[c], xt2[c], xn[c])
            else:
                # J rows: base rotation columns e_c × X (X base-relative);
                # base-translation entries keep the constant init pattern
                Jt_s[nj + 3, 0:_NC3] = inter3(zK, -d2, d1)
                Jt_s[nj + 4, 0:_NC3] = inter3(d2, zK, -d0)
                Jt_s[nj + 5, 0:_NC3] = inter3(-d1, d0, zK)
            # ancestor joint columns: a_j × (X − pivot_j), zero outside the
            # joint's own foot-point run; on terrain, projected onto the
            # point's (t1, t2, n) directions
            for fb, a, b_ in groups:
                Xg = [Xc[i][a:b_] for i in range(3)]
                zpre = jnp.zeros((a,) + LS, f32) if a else None
                zpost = jnp.zeros((K - b_,) + LS, f32) if K - b_ else None
                for j in sm.anc[fb]:
                    ax_w = [_materialize(axis_w[j][i]) for i in range(3)]
                    rx_ = [Xg[i] - _materialize(pivot_w[j][i]) for i in range(3)]
                    col = (
                        ax_w[1] * rx_[2] - ax_w[2] * rx_[1],
                        ax_w[2] * rx_[0] - ax_w[0] * rx_[2],
                        ax_w[0] * rx_[1] - ax_w[1] * rx_[0],
                    )
                    if terrain:
                        dirs = []
                        for dd in (t1_d, t2_d, n_d):
                            dirs.append(
                                col[0] * dd[0][a:b_]
                                + col[1] * dd[1][a:b_]
                                + col[2] * dd[2][a:b_]
                            )
                        col = dirs
                    full = [
                        jnp.concatenate(
                            [x for x in (zpre, col[i], zpost) if x is not None],
                            axis=0,
                        )
                        for i in range(3)
                    ]
                    Jt_s[j, 0:_NC3] = inter3(*full)

            # ---- joint-limit rows (contact.py joint_limit_bounds), STACKED --
            low = inc[C_LOW : C_LOW + nj]
            up = inc[C_UP : C_UP + nj]
            near_lower = qj_st < 0.5 * (low + up)
            sgn = jnp.where(near_lower, 1.0, -1.0)
            viol = jnp.where(near_lower, low - qj_st, qj_st - up)
            lb_pen = jnp.minimum(lim_baumgarte * viol * inv_dt, lim_max_depen)
            bb = jnp.where(viol >= 0.0, lb_pen, viol * inv_dt)
            bb = jnp.where(viol < -lim_margin, -1e9, bb)
            sign_s[_NC3 : _NC3 + nj] = sgn
            tgt_s[_NC3 : _NC3 + nj] = bb

            # ---- rhs = dt (S tau + tau_fric − h), STACKED joint block ----
            tf_st = (
                -inc[C_JFRIC : C_JFRIC + nj] * jnp.tanh(dqj_st / 0.05)
                - inc[C_JDAMP : C_JDAMP + nj] * dqj_st
            )
            rhs_t = jnp.concatenate(
                [
                    dt * (tau_st + tf_st - h_j),
                    jnp.stack([_materialize(_mul(-dt, h[v])) for v in range(6)]),
                    jnp.zeros((NVP - NV,) + LS, jnp.float32),
                ],
                axis=0,
            )

            # ---- fused solve on tiles (warm-started from the previous
            # substep's impulses carried in the state rows) ----
            qvel_t = jnp.concatenate(
                [
                    st[25:37],  # joint velocities (solver rows 0:nj)
                    st[19:25],  # base 6-DOF velocity (solver rows nj:NV)
                    jnp.zeros((NVP - NV,) + LS, jnp.float32),
                ],
                axis=0,
            )
            lam_prev = jnp.concatenate(
                [
                    st[OUT_LAM:OUT_TAU],
                    jnp.zeros((ROWS - (OUT_TAU - OUT_LAM),) + LS, jnp.float32),
                ],
                axis=0,
            )
            if _SUB == 1:
                qvel_new, lam = _fused_core_opt(
                    L_s, Mt_s[...], Jt_s[...], qvel_t, rhs_t,
                    tgt_s[...], sign_s[...], mu, valid, iterations,
                    compliance=comp, lam0=lam_prev, leg_blocks=True,
                )
            else:
                # SPLIT SOLVE (round 3): the round-2 S=2 experiment was 2x
                # slower because the solve stage's live values/scratch scale
                # with S past the 16 MB scoped-VMEM budget and Mosaic spills
                # through HBM (docs/PERFORMANCE.md). The scalar stage above
                # keeps the S-wide sublane-env layout (S x fewer issue
                # slots); the solve runs once per 128-lane sublane group at
                # the S=1 layout, reusing one S=1-shaped Cholesky scratch,
                # so its live footprint never grows with S.
                # keepdim slices (s:s+1): squeezing the sublane dim fails to
                # lower ("Unsupported output implicit dimension"); the solve
                # core is rank-agnostic, so each half runs at lane shape
                # (1, 128) — one vreg per row, same live footprint as (128,)
                qn_h, lam_h = [], []
                for s in range(_SUB):
                    sl = slice(s, s + 1)
                    q_s, l_s = _fused_core_opt(
                        L_s,
                        Mt_s[:, :, sl], Jt_s[:, :, sl],
                        qvel_t[:, sl], rhs_t[:, sl],
                        tgt_s[:, sl], sign_s[:, sl],
                        mu[:, sl], valid[:, sl], iterations,
                        compliance=comp[sl], lam0=lam_prev[:, sl],
                        leg_blocks=True,
                    )
                    qn_h.append(q_s)
                    lam_h.append(l_s)
                qvel_new = jnp.concatenate(qn_h, axis=1)
                lam = jnp.concatenate(lam_h, axis=1)

            # ---- velocity limits + semi-implicit integration (step.py) ----
            # qvel_new comes back in solver order: joints 0:nj, base nj:NV
            vx, vy, vz = qvel_new[nj], qvel_new[nj + 1], qvel_new[nj + 2]
            wx_n, wy_n, wz_n = (
                qvel_new[nj + 3], qvel_new[nj + 4], qvel_new[nj + 5]
            )
            vlim = inc[C_VLIM : C_VLIM + nj]
            vj_st = jnp.clip(qvel_new[0:nj], -vlim, vlim)
            # quaternion exponential-map update (spatial.py quat_integrate)
            ax, ay, az = wx_n * dt, wy_n * dt, wz_n * dt
            theta = jnp.sqrt(ax * ax + ay * ay + az * az)
            half = 0.5 * theta
            kfac = jnp.where(
                theta > 1e-9, jnp.sin(half) / jnp.maximum(theta, 1e-12), 0.5
            )
            dw = jnp.cos(half)
            dx, dy, dz = ax * kfac, ay * kfac, az * kfac
            qw, qx, qy, qz = quat
            nw = dw * qw - dx * qx - dy * qy - dz * qz
            nx = dw * qx + dx * qw + dy * qz - dz * qy
            ny = dw * qy - dx * qz + dy * qw + dz * qx
            nz = dw * qz + dx * qy - dy * qx + dz * qw
            qn = jax.lax.rsqrt(nw * nw + nx * nx + ny * ny + nz * nz)

            # ---- per-foot WORLD-frame contact impulse sums (consumed by
            # the env's stance detection / contact-force penalty) ----
            ltri = lam[:_NC3].reshape((K, 3) + LS)
            if terrain:
                f_w = tuple(
                    ltri[:, 0] * t1_d[c] + ltri[:, 1] * t2_d[c]
                    + ltri[:, 2] * n_d[c]
                    for c in range(3)
                )
            else:
                f_w = (ltri[:, 0], ltri[:, 1], ltri[:, 2])
            ff_rows = jnp.stack(
                [
                    jnp.sum(f_w[c][a:b_], axis=0)
                    for fb, a, b_ in groups
                    for c in range(3)
                ]
            )

            head = jnp.stack(
                [
                    st[0] + dt * vx, st[1] + dt * vy, st[2] + dt * vz,
                    nw * qn, nx * qn, ny * qn, nz * qn,
                ]
            )
            st_new = jnp.concatenate(
                [
                    head,
                    qj_st + dt * vj_st,
                    qvel_new[nj : nj + 6],
                    vj_st,
                    lam[:60],
                    tau_st,
                    ff_rows,
                    jnp.zeros((OUT_ROWS - OUT_FF - 6,) + LS, jnp.float32),
                ],
                axis=0,
            )
            st_s[...] = st_new
            return carry

        jax.lax.fori_loop(0, decimation, substep, 0)

        # ---- end-of-step FK outputs (OUT_FK rows; see the layout note at
        # the constant). One extra position/velocity recursion on the FINAL
        # state replaces the env's per-policy-step XLA fk() +
        # body_velocities() — measured at 26% of the train iteration
        # (docs/ROUND3.md round-3 decomposition).
        # pair-constant iota-selects created while tracing the fori_loop
        # BODY are loop-scoped — reusing them out here captures them as
        # kernel constants (pallas rejects those); re-materialize fresh
        _PAIR_CACHE.clear()
        stf = st_s[...]
        quat_f = (stf[3], stf[4], stf[5], stf[6])
        qj_f = [stf[7 + j] for j in range(nj)]
        vlin_f = (stf[19], stf[20], stf[21])
        omg_f = (stf[22], stf[23], stf[24])
        dqj_f = [stf[25 + j] for j in range(nj)]
        _, _, p_f, _, _, _, vo_f, _ = chain_kin(
            quat_f, qj_f, vlin_f, omg_f, dqj_f, with_bias=False
        )
        dtip = nj // 2 - 1
        fk_rows = jnp.concatenate(
            [
                _mat_pair(p_f[dtip][0]), _mat_pair(p_f[dtip][1]),
                _mat_pair(p_f[dtip][2]),
                _mat_pair(p_f[knee_depth][0]), _mat_pair(p_f[knee_depth][1]),
                _mat_pair(vo_f[dtip][0]), _mat_pair(vo_f[dtip][1]),
            ],
            axis=0,
        )
        out_ref[0] = jnp.concatenate(
            [
                stf[:OUT_FK],
                fk_rows,
                jnp.zeros((OUT_ROWS - OUT_FK - 14,) + LS, jnp.float32),
            ],
            axis=0,
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm", "dt", "decimation", "iterations", "contact_offset",
        "max_depen_vel", "interpret", "terrain",
    ),
)
def _mega_call(
    packed: jnp.ndarray,  # (N, IN_ROWS-ish real rows)
    packed2,  # (N, 176) terrain patches or None
    sm,
    dt: float,
    decimation: int,
    iterations: int,
    contact_offset: float,
    max_depen_vel: float,
    interpret: bool,
    terrain=None,
):
    N = packed.shape[0]
    kernel = _build_mega_kernel(
        sm, dt, decimation, iterations, contact_offset, max_depen_vel,
        lim_baumgarte=0.2, lim_max_depen=2.0, lim_margin=0.05,
        terrain=terrain,
    )
    n_pad = (-N) % TILE_ENVS
    Np = N + n_pad
    T = Np // TILE_ENVS
    xp = jnp.pad(packed, ((0, n_pad), (0, IN_ROWS - packed.shape[1])))
    # keep padded envs' quaternions unit so FK math stays finite
    if n_pad:
        xp = xp.at[N:, 3].set(1.0)

    def to_tiles(x, rows):
        # (Np, rows) -> (T, rows) + LS   [env axis onto (sublane,) lanes]
        if _SUB == 1:
            return jnp.moveaxis(x.reshape(T, ENV_TILE, rows), 1, -1)
        return jnp.transpose(
            x.reshape(T, _SUB, 128, rows), (0, 3, 1, 2)
        )

    tiles = to_tiles(xp, IN_ROWS)

    spec_in = lambda rows: pl.BlockSpec(
        (1, rows) + LS,
        (lambda i: (i, 0, 0)) if _SUB == 1 else (lambda i: (i, 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    in_specs = [spec_in(IN_ROWS)]
    args = [tiles]
    if terrain is not None:
        xp2 = jnp.pad(packed2, ((0, n_pad), (0, IN2_ROWS - packed2.shape[1])))
        args.append(to_tiles(xp2, IN2_ROWS))
        in_specs.append(spec_in(IN2_ROWS))

    # model constants: lane-replicated rows, ONE block shared by every grid
    # step (index_map pinned to 0) — pallas forbids captured array constants
    cvals = jnp.asarray(
        np.broadcast_to(
            _build_const_rows(sm).reshape((1, C_ROWS) + (1,) * len(LS)),
            (1, C_ROWS) + LS,
        )
    )
    args.append(cvals)
    in_specs.append(
        pl.BlockSpec(
            (1, C_ROWS) + LS,
            (lambda i: (0, 0, 0)) if _SUB == 1 else (lambda i: (0, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        )
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, OUT_ROWS) + LS, jnp.float32),
        grid=(T,),
        in_specs=in_specs,
        out_specs=spec_in(OUT_ROWS),
        scratch_shapes=[
            pltpu.VMEM((NVP, NVP) + LS, jnp.float32),  # Mt
            pltpu.VMEM((NVP, ROWS) + LS, jnp.float32),  # Jt
            pltpu.VMEM((ROWS,) + LS, jnp.float32),  # target
            pltpu.VMEM((ROWS,) + LS, jnp.float32),  # sign
            pltpu.VMEM((OUT_ROWS,) + LS, jnp.float32),  # state
            # Cholesky L: ALWAYS one 128-lane group wide — at S>1 the solve
            # runs once per sublane group (split solve, lane shape (1, 128))
            # and reuses this scratch, so solve VMEM does not scale with S
            pltpu.VMEM(
                (NVP, NVP) + ((ENV_TILE,) if _SUB == 1 else (1, 128)),
                jnp.float32,
            ),  # Cholesky L
        ],
        # sublane-env input/state tiles still exceed the default 16 MB
        # scoped-vmem budget at large S; keep headroom (the split solve
        # removes the dominant S-scaled term, the solve-stage live values)
        compiler_params=(
            None if _SUB == 1
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        ),
        interpret=interpret,
    )(*args)
    if _SUB == 1:
        return jnp.moveaxis(out, -1, 1).reshape(Np, OUT_ROWS)[:N]
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(Np, OUT_ROWS)[:N]


def make_mega_step_batched(
    model: RobotModel,
    dt: float,
    decimation: int,
    kp,
    kd,
    torque_limit,
    iterations: int,
    contact_offset: float = 0.01,
    max_depen_vel: float = 1.0,
    interpret: bool = False,
    mesh=None,
    terrain_map=None,
):
    """Whole-policy-step physics with a custom vmap rule.

    Single-env call falls back to the XLA path (identical math, used by
    oracle tests and CPU play); under jax.vmap the batch dispatches ONE
    mega-kernel launch for all `decimation` substeps. With `mesh`, the
    batched call runs under shard_map over the env axis (bare pallas_call
    has no GSPMD rule).

    Signature: (qpos, qvel, friction, base_mass_scale, contact_stiffness,
    contact_offset, kp_scale, kd_scale, contact_compliance,
    lam0 (60,) warm-start impulses, targets) ->
    (qpos_new, qvel_new, lam (60,), tau (nj,),
     ff (6,) per-foot world-frame contact impulse sums,
     fk14 (14,) end-of-step feet/knee kinematics — OUT_FK layout).
    """
    from jax.custom_batching import custom_vmap

    sm = _StaticModel(model, kp, kd, torque_limit)
    kp_j = jnp.asarray(kp)
    kd_j = jnp.asarray(kd)
    tlim_j = jnp.asarray(torque_limit)
    nj = model.nj

    if terrain_map is not None:
        # RAW height grid in meters (bilinear contact surface; the 3-tap-min
        # floor lookup remains the env's OBSERVATION contract)
        hf = np.asarray(terrain_map.height_field, np.float32)
        t_border = float(terrain_map.border_size)
        t_inv_h = 1.0 / float(terrain_map.horizontal_scale)
        t_nrow, t_ncol = hf.shape
        terr = (t_border, t_inv_h, float(t_nrow), float(t_ncol))
        cbody = jnp.asarray(model.contact_point_body)
        coff = model.contact_point_offset
        from .kinematics import f32_matmul, fk

        @f32_matmul
        def _contact_xy(qp):
            k = fk(model, qp)
            pos = k.p[cbody] + jnp.einsum("kij,kj->ki", k.R[cbody], coff)
            return pos[:, :2]

        # Per-env node WINDOW for all terrain taps. Pointwise gathers from
        # the full grid measured ~40 ms/iter EACH at 4096 envs (11 of them:
        # 9 patch taps + 2 gradient tap rows — docs/ROUND3.md), and a
        # vmapped dynamic-slice window is no better (XLA lowers it to 4096
        # strided row-chunk DMA sets per step, ~5 ms). Instead the grid is
        # pre-blocked into CONTIGUOUS (BR, BC) tiles at 4 row offsets
        # (stride 12) x 2 column offsets (stride 64): any +-reach span fits
        # entirely inside ONE tile of the right offset copy, so each env
        # gathers a single contiguous 24 KB chunk, and every tap is an
        # exact one-hot einsum (Precision.HIGHEST: a single 1.0 x h term
        # per row, so tap values are bit-identical to direct gathers).
        # Beyond-reach queries (exploded envs, auto-reset anyway) clamp to
        # the window edge instead of the grid edge.
        from ..terrain.terrain import make_tile_gather

        _win_fn, (_RN, BR, BC) = make_tile_gather(terrain_map, reach_m=1.6)
        WR, WC = BR, BC
        # HIGH (3-pass bf16) is exact on the raw integer tile — see
        # terrain.make_tile_gather; HIGHEST (6-pass f32) doubled the cost
        _hi = jax.lax.Precision.HIGH

        # specialized leg-chain contact XY (round 4): replaces the
        # vmap(fk)-based path, whose (N, 13, 3, 3) stacking/copies were
        # 60-90 ms of the terrain iteration (same math, elementwise)
        _contact_xy_b = make_contact_xy_batched(sm, model)

        _vs = float(terrain_map.vertical_scale)

        def terrain_patches(qpos, sbias):  # (N, nq), (N, 2) -> (N, IN2 rows)
            xy = _contact_xy_b(qpos)  # (N, K, 2)
            gxf = jnp.clip((xy[..., 0] + t_border) * t_inv_h, 0.0, t_nrow - 1.001)
            gyf = jnp.clip((xy[..., 1] + t_border) * t_inv_h, 0.0, t_ncol - 1.001)
            px = gxf.astype(jnp.int32)
            py = gyf.astype(jnp.int32)
            # 3x3 NODE window around the step-start node (2 bilinear cells)
            ox = jnp.clip(px - 1, 0, t_nrow - 3)
            oy = jnp.clip(py - 1, 0, t_ncol - 3)

            # single-tile window from the BASE node (same time point as
            # xy): window start s = stride-floor(max(base - reach, 0)) is
            # at most stride-1 below the span start, and the span is at
            # most 2*reach wide, so it fits the (BR, BC) tile of offset
            # copy (s % BR) / stride
            cbx = jnp.clip(
                (qpos[:, 0] + t_border) * t_inv_h, 0.0, t_nrow - 1.001
            ).astype(jnp.int32)
            cby = jnp.clip(
                (qpos[:, 1] + t_border) * t_inv_h, 0.0, t_ncol - 1.001
            ).astype(jnp.int32)
            win, bx, by = _win_fn(cbx, cby)  # (N, BR, BC), one chunk/env

            iw = jnp.arange(WR)
            ic = jnp.arange(WC)
            rx = jnp.clip(ox - bx[:, None], 0, WR - 3)
            ry = jnp.clip(oy - by[:, None], 0, WC - 3)
            # ONE stacked one-hot row selection for all five row sets —
            # the 3 patch offsets AND the 2 gradient-tap rows (round 5:
            # five (N,K,WR)x(N,WR,WC) batched matmuls were five separate
            # MXU dispatch chains; one (N,5K,WR) einsum is one). The raw
            # integer tile + Precision.HIGH selection is exact, and every
            # tap is scaled by vertical_scale AFTER selection — the same
            # f32 product a pre-scaled tile stored, so tap values remain
            # bit-identical to direct grid gathers (terrain.py
            # make_tile_gather).
            r0 = jnp.clip(px - bx[:, None], 0, WR - 2)
            c0 = jnp.clip(py - by[:, None], 0, WC - 2)
            rowOH = [
                (iw == (rx + i)[..., None]).astype(jnp.float32) for i in range(3)
            ]
            tmp = [
                jnp.einsum("nkw,nwv->nkv", rowOH[i], win, precision=_hi)
                for i in range(3)
            ]
            K = px.shape[1]
            colOH = [
                (ic == (ry + j)[..., None]).astype(jnp.float32) for j in range(3)
            ]
            # tap-major rows ((ii*3+jj)*K + kk) so the kernel's STACKED
            # lookup slices one contiguous (K,)+LS row block per tap
            patch = jnp.concatenate(
                [
                    jnp.sum(tmp[i] * colOH[j], axis=-1) * _vs
                    for i in range(3)
                    for j in range(3)
                ],
                axis=-1,
            )  # (N, 9*K)

            # step-start slope for the sloped contact frames — the SAME
            # bilinear-cell gradient formula as terrain.make_grad_fn (one
            # definition across every solver path; taps from the window),
            # plus the contact-slope DR bias
            rOH0 = (iw == r0[..., None]).astype(jnp.float32)
            rOH1 = (iw == (r0 + 1)[..., None]).astype(jnp.float32)
            t0 = jnp.einsum("nkw,nwv->nkv", rOH0, win, precision=_hi)
            t1 = jnp.einsum("nkw,nwv->nkv", rOH1, win, precision=_hi)
            cOH0 = (ic == c0[..., None]).astype(jnp.float32)
            cOH1 = (ic == (c0 + 1)[..., None]).astype(jnp.float32)
            h00 = jnp.sum(t0 * cOH0, axis=-1) * _vs
            h01 = jnp.sum(t0 * cOH1, axis=-1) * _vs
            h10 = jnp.sum(t1 * cOH0, axis=-1) * _vs
            h11 = jnp.sum(t1 * cOH1, axis=-1) * _vs
            fx = gxf - px
            fy = gyf - py
            gx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) * t_inv_h
            gy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) * t_inv_h
            gx = gx + sbias[:, 0:1]
            gy = gy + sbias[:, 1:2]
            return jnp.concatenate(
                [
                    patch,
                    ox.astype(jnp.float32),
                    oy.astype(jnp.float32),
                    gx,
                    gy,
                ],
                axis=1,
            )
    else:
        terr = None

    @custom_vmap
    def step(qpos, qvel, fric, bms, cstiff, coff, kps, kds, comp, lam0, sbias, targets):
        # single-env XLA fallback (same math as the kernel)
        from ..terrain.terrain import flat_height_fn
        from .contact import (
            apgd_solve, build_contact_setup, joint_limit_bounds,
        )
        from .dynamics import compute_dynamics
        from .kinematics import f32_matmul, fk
        from .linalg import solve_lower_unrolled, solve_upper_unrolled
        from .step import pd_torques

        kp_eff = kp_j * kps
        kd_eff = kd_j * kds
        if terrain_map is not None:
            from ..terrain.terrain import make_contact_height_fn

            height_fn = make_contact_height_fn(terrain_map)
        else:
            height_fn = flat_height_fn
        if terrain_map is not None:
            # policy-step-start contact frames, frozen across the decimation
            # window (the kernel gathers the slope once per launch)
            from ..terrain.terrain import make_grad_fn
            from .contact import terrain_contact_frames

            grad_fn = make_grad_fn(terrain_map)
            xy0 = _contact_xy(qpos)
            gx0, gy0 = grad_fn(xy0[:, 0], xy0[:, 1])
            frames0 = terrain_contact_frames(gx0 + sbias[0], gy0 + sbias[1])
        else:
            frames0 = None
        implicit_d = kd_eff + model.dof_damping
        mass_scale = jnp.ones(model.nbody).at[0].set(bms)
        foot_runs = [(a, b_) for _, a, b_ in model.contact_point_runs()]

        @f32_matmul
        def substep(carry, _):
            qpos_c, qvel_c, lam_c = carry
            tau = pd_torques(model, qpos_c, qvel_c, targets, kp_eff, kd_eff, tlim_j)
            dyn = compute_dynamics(model, qpos_c, qvel_c, dt, implicit_d, mass_scale)
            tau_fric = (
                -model.dof_friction * jnp.tanh(qvel_c[6:] / 0.05)
                - model.dof_damping * qvel_c[6:]
            )
            gen_force = jnp.concatenate(
                [jnp.zeros(6, tau.dtype), tau + tau_fric]
            )
            setup = build_contact_setup(
                model, dyn, height_fn, dt,
                contact_offset=coff, max_depen_vel=max_depen_vel,
                baumgarte=0.2 * cstiff, frames_override=frames0,
            )
            sign, lb = joint_limit_bounds(model, qpos_c, dt)
            L = dyn.Mtilde_chol
            rhs = dt * (gen_force - dyn.h)
            v_free = qvel_c + solve_upper_unrolled(
                L.T, solve_lower_unrolled(L, rhs)
            )
            B = solve_lower_unrolled(L, setup.J.T)
            A = B.T @ B
            nrow_ = A.shape[0]
            reg = comp * (jnp.trace(A) / nrow_)
            A = A + reg * jnp.eye(nrow_, dtype=A.dtype)
            u0 = setup.J @ v_free
            G = B @ B.T
            step_bound = jnp.max(jnp.sum(jnp.abs(G), axis=-1)) + reg
            lam = apgd_solve(
                A, u0, N_POINTS, setup.lo_bound, sign, lb, fric, iterations,
                step_bound=step_bound, lam0=lam_c,
            )
            qvel_new = v_free + solve_upper_unrolled(L.T, B @ lam)
            vj = jnp.clip(qvel_new[6:], -model.dof_vel_limit, model.dof_vel_limit)
            qvel_new = qvel_new.at[6:].set(vj)
            from . import spatial as S

            pos_new = qpos_c[0:3] + dt * qvel_new[0:3]
            quat_new = S.quat_integrate(qpos_c[3:7], qvel_new[3:6], dt)
            qj_new = qpos_c[7:] + dt * qvel_new[6:]
            qpos_new = jnp.concatenate([pos_new, quat_new, qj_new])
            # per-foot WORLD-frame impulse sums (matches the kernel's OUT_FF)
            imp = lam[: 3 * N_POINTS].reshape(N_POINTS, 3)
            if setup.frames is not None:
                imp = jnp.einsum("kd,kdc->kc", imp, setup.frames)
            ff = jnp.concatenate([jnp.sum(imp[a:b_], axis=0) for a, b_ in foot_runs])
            return (qpos_new, qvel_new, lam), (tau, ff)

        (qpos_n, qvel_n, lam_n), (taus, ffs) = jax.lax.scan(
            substep, (qpos, qvel, lam0), None, length=decimation
        )
        # end-of-step FK rows (matches the kernel's OUT_FK layout: feet p
        # and knee xy BASE-RELATIVE, feet v_origin world-frame)
        from .kinematics import body_velocities

        k_f = fk(model, qpos_n)
        bv_f = body_velocities(model, qpos_n, qvel_n)
        fidx = np.asarray(model.feet_body_idx)
        kidx = np.asarray(model.knee_body_idx)
        p_rel = k_f.p - qpos_n[:3]
        fk14 = jnp.concatenate(
            [
                p_rel[fidx, 0], p_rel[fidx, 1], p_rel[fidx, 2],
                p_rel[kidx, 0], p_rel[kidx, 1],
                bv_f.v_origin[fidx, 0], bv_f.v_origin[fidx, 1],
            ]
        )
        return qpos_n, qvel_n, lam_n, taus[-1], ffs[-1], fk14

    def batched(qpos, qvel, fric, bms, cstiff, coff, kps, kds, comp, lam0, sbias, targets):
        packed = jnp.concatenate(
            [qpos, qvel, targets, fric[:, None], bms[:, None], cstiff[:, None],
             coff[:, None], kps[:, None], kds[:, None], comp[:, None], lam0],
            axis=1,
        ).astype(jnp.float32)
        packed2 = terrain_patches(qpos, sbias) if terr is not None else None
        out = _mega_call(
            packed, packed2, sm, float(dt), int(decimation), int(iterations),
            float(contact_offset), float(max_depen_vel), bool(interpret),
            terrain=terr,
        )
        return (
            out[:, OUT_QPOS:OUT_QPOS + NQ],
            out[:, OUT_QVEL:OUT_QVEL + NV],
            out[:, OUT_LAM:OUT_LAM + _NC3 + nj],
            out[:, OUT_TAU:OUT_TAU + nj],
            out[:, OUT_FF:OUT_FF + 6],
            out[:, OUT_FK:OUT_FK + 14],
        )

    @step.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [
            x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))
            for x, b in zip(args, in_batched)
        ]
        # ambient solver mesh read at TRACE time (the runner sets it before
        # jitting the train step) — bare pallas_call has no GSPMD rule, so
        # sharded batches must run under shard_map over the env axis.
        from .pallas_solver import get_solver_mesh

        ambient = mesh if mesh is not None else get_solver_mesh()
        fn = batched
        if ambient is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            spec = P(ambient.axis_names[0])
            fn = shard_map(
                batched,
                mesh=ambient,
                in_specs=(spec,) * 12,
                out_specs=(spec,) * 6,
                check_vma=False,
            )
        out = fn(*args)
        return out, (True, True, True, True, True, True)

    if terr is not None:
        # exposed for tests: the windowed-tap path must stay bit-identical
        # to direct grid gathers (tests/test_mega_kernel.py)
        step.terrain_patches = terrain_patches
    return step
