"""Rotation / quaternion / rigid-transform primitives.

Quaternion convention: (w, x, y, z), unit norm, Hamilton product.
(The reference stack stores Isaac's (x, y, z, w) order — conversion happens
only at API boundaries, e.g. config init_state.rot and MuJoCo oracles.)

All functions are pure jnp, broadcast over leading batch dims, and safe under
jit/vmap/grad. Written fresh for this engine; capability analog of the
reference's isaacgym.torch_utils usage (legged_robot.py:132-136).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_identity(batch_shape=()) -> jnp.ndarray:
    q = jnp.zeros(batch_shape + (4,))
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (world = R(q) @ v_local)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis: (...,3) unit; angle: (...) radians."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_from_euler_zyx_rpy(rpy: jnp.ndarray) -> jnp.ndarray:
    """URDF-style fixed-axis roll-pitch-yaw -> quaternion.

    URDF rpy means R = Rz(yaw) @ Ry(pitch) @ Rx(roll).
    """
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_euler_xyz(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> intrinsic-xyz (roll, pitch, yaw), each wrapped to [-pi, pi].

    Matches the reference's observation convention (sim2sim.py:48-67 and
    legged_robot.py:50-55 get_euler_xyz + wrap).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    t0 = 2.0 * (w * x + y * z)
    t1 = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(t0, t1)
    t2 = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(t2)
    t3 = 2.0 * (w * z + x * y)
    t4 = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(t3, t4)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Integrate orientation by world-frame angular velocity over dt.

    Uses the exponential map: q' = exp(dt/2 · ω) ⊗ q, with a first-order safe
    small-angle branch handled by the sinc formulation (no division by zero).
    """
    ang = omega_world * dt
    theta = jnp.linalg.norm(ang, axis=-1, keepdims=True)
    half = 0.5 * theta
    # sinc-based: sin(θ/2)/θ is finite at 0 (=1/2)
    k = jnp.where(theta > 1e-9, jnp.sin(half) / jnp.maximum(theta, 1e-12), 0.5)
    dq = jnp.concatenate([jnp.cos(half), ang * k], axis=-1)
    return quat_normalize(quat_mul(dq, q))


def quat_derivative(q: jnp.ndarray, omega_world: jnp.ndarray) -> jnp.ndarray:
    """dq/dt = 0.5 · (0, ω_world) ⊗ q."""
    omega_q = jnp.concatenate(
        [jnp.zeros_like(omega_world[..., :1]), omega_world], axis=-1
    )
    return 0.5 * quat_mul(omega_q, q)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (reference: utils/math.py:39-44)."""
    yaw = quat_to_euler_xyz(q)[..., 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = c * v[..., 0] - s * v[..., 1]
    y = s * v[..., 0] + c * v[..., 1]
    return jnp.stack([x, y, v[..., 2]], axis=-1)


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angle to (-pi, pi] (reference: utils/math.py:46-50)."""
    a = jnp.mod(angle + jnp.pi, 2 * jnp.pi)
    a = jnp.where(a < 0, a + 2 * jnp.pi, a)
    return a - jnp.pi


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix: skew(v) @ u = v × u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    )
    return m.reshape(v.shape[:-1] + (3, 3))
