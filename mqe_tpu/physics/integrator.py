"""Semi-implicit Euler integration of articulated-body state.

Matches the reference sim cadence: dt=0.005s, 1 substep, 4 substeps per
control step (ref mqe/envs/base/legged_robot_config.py:211-213, control:121).
"""
from __future__ import annotations

import jax.numpy as jnp

from mqe_tpu.ops import quat as quat_ops
from mqe_tpu.physics.model import BodyModel


def integrate(
    model: BodyModel,
    base_pos,
    base_quat,
    base_lin_vel,
    base_ang_vel,
    q,
    qd,
    omega_dot_w,
    a_lin_w,
    qdd,
    dt,
    max_lin_vel: float = 100.0,
    max_ang_vel: float = 50.0,
):
    """One semi-implicit Euler step for one articulated body (vmap outside)."""
    base_ang_vel = base_ang_vel + dt * omega_dot_w
    base_lin_vel = base_lin_vel + dt * a_lin_w
    # velocity clamps mirror asset options max_*_velocity (go1_config.py:80-82)
    base_lin_vel = jnp.clip(base_lin_vel, -max_lin_vel, max_lin_vel)
    base_ang_vel = jnp.clip(base_ang_vel, -max_ang_vel, max_ang_vel)

    base_pos = base_pos + dt * base_lin_vel
    base_quat = quat_ops.quat_integrate(base_quat, base_ang_vel, dt)

    qd = qd + dt * qdd
    qd_lim = jnp.asarray(model.qd_limit, dtype=q.dtype)
    qd = jnp.clip(qd, -qd_lim, qd_lim)
    q = q + dt * qd

    # hard joint limits: clamp position, kill velocity into the limit
    lo = jnp.asarray(model.q_lower, dtype=q.dtype)
    hi = jnp.asarray(model.q_upper, dtype=q.dtype)
    at_lo = q < lo
    at_hi = q > hi
    q = jnp.clip(q, lo, hi)
    qd = jnp.where(at_lo & (qd < 0), 0.0, qd)
    qd = jnp.where(at_hi & (qd > 0), 0.0, qd)

    return base_pos, base_quat, base_lin_vel, base_ang_vel, q, qd
