"""Quaternion / SO(3) math for the TPU engine.

Conventions match the reference's data layout (SURVEY.md §2.3): quaternions are
stored **xyzw** (Isaac Gym root-state layout, ref mqe/envs/base/legged_robot.py:132),
rotations are world-from-body. Everything is batched: all ops accept leading
batch dimensions and are jit/vmap friendly.

Functional equivalents of isaacgym.torch_utils + mqe/utils/math.py
(ref mqe/utils/math.py:38-56), rebuilt in JAX.
"""
from __future__ import annotations

import jax.numpy as jnp

# xyzw component indices
_X, _Y, _Z, _W = 0, 1, 2, 3


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., _W].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-9)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, xyzw layout."""
    ax, ay, az, aw = a[..., _X], a[..., _Y], a[..., _Z], a[..., _W]
    bx, by, bz, bw = b[..., _X], b[..., _Y], b[..., _Z], b[..., _W]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body -> world for a body pose quat)."""
    qvec = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + w * t + jnp.cross(qvec, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by q^-1 (world -> body)."""
    qvec = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v - w * t + jnp.cross(qvec, t)


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(q, v)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix R such that R @ v_body = v_world."""
    x, y, z, w = q[..., _X], q[..., _Y], q[..., _Z], q[..., _W]
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


def quat_from_angle_axis(angle: jnp.ndarray, axis: jnp.ndarray) -> jnp.ndarray:
    """Unit-axis rotation quaternion, xyzw."""
    half = 0.5 * angle
    s = jnp.sin(half)
    xyz = axis * s[..., None]
    w = jnp.cos(half)[..., None]
    return jnp.concatenate([xyz, w], axis=-1)


def quat_from_euler_xyz(roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic XYZ euler -> quaternion (matches isaacgym.torch_utils)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def get_euler_xyz(q: jnp.ndarray):
    """Quaternion -> (roll, pitch, yaw), each wrapped to [0, 2*pi).

    Mirrors isaacgym.torch_utils.get_euler_xyz range semantics; callers that
    want (-pi, pi] subtract 2*pi above pi exactly like the reference does
    (ref mqe/envs/field/legged_robot_field.py:126-127).
    """
    qx, qy, qz, qw = q[..., _X], q[..., _Y], q[..., _Z], q[..., _W]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.copysign(jnp.pi / 2.0, sinp),
        jnp.arcsin(sinp.clip(-1.0, 1.0)),
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)

    two_pi = 2.0 * jnp.pi
    return roll % two_pi, pitch % two_pi, yaw % two_pi


def get_euler_xyz_wrapped(q: jnp.ndarray):
    """(roll, pitch, yaw) each in (-pi, pi]."""
    r, p, y = get_euler_xyz(q)
    return wrap_to_pi(r), wrap_to_pi(p), wrap_to_pi(y)


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi] (ref mqe/utils/math.py:45-49)."""
    wrapped = angle % (2.0 * jnp.pi)
    return jnp.where(wrapped > jnp.pi, wrapped - 2.0 * jnp.pi, wrapped)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (ref mqe/utils/math.py:38-43)."""
    yaw_q = yaw_quat(q)
    return quat_rotate(yaw_q, v)


def yaw_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Extract the yaw-only quaternion of q."""
    qz = q[..., _Z]
    qw = q[..., _W]
    norm = jnp.sqrt(qz * qz + qw * qw).clip(1e-9)
    zeros = jnp.zeros_like(qz)
    return jnp.stack([zeros, zeros, qz / norm, qw / norm], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate quaternion by world-frame angular velocity over dt (exp map)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    # small-angle-safe axis
    axis = omega_world / angle.clip(1e-9)
    dq = quat_from_angle_axis((angle * dt)[..., 0], axis)
    dq = jnp.where(angle < 1e-9, quat_identity(q.shape[:-1]), dq)
    return quat_normalize(quat_mul(dq, q))


def quat_box_minus(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector taking q2 to q1 (world frame), i.e. log(q1 * q2^-1)."""
    dq = quat_mul(q1, quat_conjugate(q2))
    dq = quat_normalize(dq)
    # enforce shortest path
    sign = jnp.sign(dq[..., 3:4])
    sign = jnp.where(sign == 0, 1.0, sign)
    dq = dq * sign
    xyz = dq[..., :3]
    w = dq[..., 3].clip(-1.0, 1.0)
    norm_xyz = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm_xyz[..., 0], w)
    return xyz / norm_xyz.clip(1e-9) * angle[..., None]


def normalize(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(eps)
