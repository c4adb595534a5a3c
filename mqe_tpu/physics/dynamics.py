"""Floating-base Featherstone dynamics (FK + ABA) for one articulated body.

TPU-native replacement for the PhysX TGS articulation solver the reference
drives through `gym.simulate` (ref mqe/envs/go1/go1.py:53, legged_robot_config
:211-229). Exact generalized-coordinate dynamics: joints are hard constraints,
only contact is a soft (penalty) model — see contact.py.

Everything here is written for ONE body tree; batch with jax.vmap over
envs x agents. The body count (13 for go1) is static so all loops unroll at
trace time into a handful of small matmuls — XLA fuses them.
"""
from __future__ import annotations

import jax.numpy as jnp

from mqe_tpu.ops import quat as quat_ops
from mqe_tpu.physics import spatial
from mqe_tpu.physics.model import JOINT_PRISMATIC, BodyModel


def kinematics(model: BodyModel, base_pos, base_quat, q):
    """Forward kinematics.

    Args:
      base_pos: (3,), base_quat: (4,) xyzw, q: (nq,) joint positions.
    Returns:
      Rw: (nb, 3, 3) world-from-body rotations, pw: (nb, 3) body origins,
      X_up: list of (6,6) parent->child motion transforms (X_up[0] unused),
      S: (nb, 6) joint motion subspaces in child frame (S[0] unused),
      Rl: list of (3,3) child-in-parent rotations, pl: (nb,3) child-in-parent
      positions.
    """
    nb = model.nb
    Rw = [None] * nb
    pw = [None] * nb
    X_up = [None] * nb
    S = [jnp.zeros(6)] * nb
    Rl = [None] * nb
    pl = [None] * nb

    Rw[0] = quat_ops.quat_to_matrix(base_quat)
    pw[0] = base_pos

    jrot = jnp.asarray(model.joint_rot, dtype=base_pos.dtype)
    jpos = jnp.asarray(model.joint_pos, dtype=base_pos.dtype)
    jaxis = jnp.asarray(model.joint_axis, dtype=base_pos.dtype)

    for i in range(1, nb):
        par = int(model.parent[i])
        qi = q[i - 1]
        axis = jaxis[i]
        if int(model.joint_type[i]) == JOINT_PRISMATIC:
            Rj = jnp.eye(3, dtype=base_pos.dtype)
            pj = axis * qi
            S[i] = jnp.concatenate([jnp.zeros(3, dtype=base_pos.dtype), axis])
        else:  # revolute
            Rj = quat_ops.quat_to_matrix(quat_ops.quat_from_angle_axis(qi, axis))
            pj = jnp.zeros(3, dtype=base_pos.dtype)
            S[i] = jnp.concatenate([axis, jnp.zeros(3, dtype=base_pos.dtype)])
        # child pose in parent frame: joint frame then joint motion
        Rl[i] = jrot[i] @ Rj
        pl[i] = jpos[i] + jrot[i] @ pj
        X_up[i] = spatial.motion_transform(Rl[i], pl[i])
        Rw[i] = Rw[par] @ Rl[i]
        pw[i] = pw[par] + Rw[par] @ pl[i]

    return jnp.stack(Rw), jnp.stack(pw), X_up, S, Rl, pl


def body_velocities(model: BodyModel, Rw, X_up, S, base_lin_vel_w, base_ang_vel_w, qd):
    """Spatial velocity of each body, in its own frame and in world coords.

    Returns v_body: list[(6,)] body-frame spatial velocities (ABA input) and
    vw: (nb, 6) world-frame (omega_w, v_origin_w) per body.
    """
    nb = model.nb
    v = [None] * nb
    v[0] = jnp.concatenate([Rw[0].T @ base_ang_vel_w, Rw[0].T @ base_lin_vel_w])
    for i in range(1, nb):
        par = int(model.parent[i])
        v[i] = X_up[i] @ v[par] + S[i] * qd[i - 1]
    vw = []
    for i in range(nb):
        w_w = Rw[i] @ v[i][:3]
        vl_w = Rw[i] @ v[i][3:]
        vw.append(jnp.concatenate([w_w, vl_w]))
    return v, jnp.stack(vw)


def forward_dynamics(
    model: BodyModel,
    Ispat,
    base_pos,
    base_quat,
    base_lin_vel_w,
    base_ang_vel_w,
    q,
    qd,
    tau,
    f_ext_w,
    joint_damping=None,
):
    """Full pipeline: FK -> velocities -> ABA. Single robot; vmap outside.

    Returns (omega_dot_w(3), a_lin_w(3), qdd(nq,), aux) where aux carries the
    FK results for reuse (Rw, pw, vw).
    """
    nb = model.nb
    kin = kinematics(model, base_pos, base_quat, q)
    return forward_dynamics_kin(
        model, Ispat, kin, base_lin_vel_w, base_ang_vel_w, qd, tau, f_ext_w,
        joint_damping=joint_damping,
    )


def forward_dynamics_kin(
    model: BodyModel,
    Ispat,
    kin,
    base_lin_vel_w,
    base_ang_vel_w,
    qd,
    tau,
    f_ext_w,
    joint_damping=None,
):
    """forward_dynamics with precomputed kinematics() output (avoids FK twice
    when contact already needed body poses)."""
    nb = model.nb
    Rw, pw, X_up, S, _, _ = kin
    q = base_lin_vel_w  # dtype carrier only
    v, vw = body_velocities(model, Rw, X_up, S, base_lin_vel_w, base_ang_vel_w, qd)

    # external wrench world -> body frames
    f_ext = []
    for i in range(nb):
        f_ext.append(
            jnp.concatenate([Rw[i].T @ f_ext_w[i, :3], Rw[i].T @ f_ext_w[i, 3:]])
        )

    # joint-space damping folded into tau
    if joint_damping is None:
        joint_damping = jnp.asarray(model.joint_damping, dtype=q.dtype)
    tau_eff = tau - joint_damping * qd

    IA = [Ispat[i] for i in range(nb)]
    pA = [spatial.cross_force(v[i], Ispat[i] @ v[i]) - f_ext[i] for i in range(nb)]
    c = [None] * nb
    for i in range(1, nb):
        vJ = S[i] * qd[i - 1]
        c[i] = spatial.cross_motion(v[i], vJ)

    U = [None] * nb
    d = [None] * nb
    u = [None] * nb
    # inward pass (children before parents; bodies are topologically ordered)
    for i in range(nb - 1, 0, -1):
        par = int(model.parent[i])
        U[i] = IA[i] @ S[i]
        d[i] = S[i] @ U[i] + 1e-9
        u[i] = tau_eff[i - 1] - S[i] @ pA[i]
        Ia = IA[i] - jnp.outer(U[i], U[i]) / d[i]
        pa = pA[i] + Ia @ c[i] + U[i] * (u[i] / d[i])
        X = X_up[i]
        IA[par] = IA[par] + X.T @ Ia @ X
        pA[par] = pA[par] + X.T @ pa

    # root (unrolled SPD Cholesky — batched LU scalarizes on TPU)
    if model.root_free:
        a0 = spatial.solve_spd6(IA[0] + 1e-9 * jnp.eye(6, dtype=q.dtype), -pA[0])
    else:
        a0 = jnp.zeros(6, dtype=q.dtype)

    a = [None] * nb
    a[0] = a0
    qdd = [None] * (nb - 1)
    for i in range(1, nb):
        par = int(model.parent[i])
        ai = X_up[i] @ a[par] + c[i]
        qdd_i = (u[i] - U[i] @ ai) / d[i]
        a[i] = ai + S[i] * qdd_i
        qdd[i - 1] = qdd_i
    qdd = jnp.stack(qdd) if nb > 1 else jnp.zeros(0, dtype=q.dtype)

    # base spatial acceleration (body frame) -> world classical derivatives
    w_b, v_b = v[0][:3], v[0][3:]
    omega_dot_w = Rw[0] @ a0[:3]
    a_lin_w = Rw[0] @ (a0[3:] + jnp.cross(w_b, v_b))
    return omega_dot_w, a_lin_w, qdd, (Rw, pw, vw)


def total_momentum(model: BodyModel, Ispat, base_pos, base_quat, base_lin_vel_w, base_ang_vel_w, q, qd):
    """Total (angular-about-world-origin, linear) momentum of the tree.

    Used by tests: internal joint torques must conserve both in free space.
    """
    Rw, pw, X_up, S, _, _ = kinematics(model, base_pos, base_quat, q)
    v, _ = body_velocities(model, Rw, X_up, S, base_lin_vel_w, base_ang_vel_w, qd)
    h_ang = jnp.zeros(3, dtype=q.dtype if q.size else base_pos.dtype)
    h_lin = jnp.zeros(3, dtype=base_pos.dtype)
    for i in range(model.nb):
        h_b = Ispat[i] @ v[i]  # body-frame spatial momentum at body origin
        n_w = Rw[i] @ h_b[:3]
        f_w = Rw[i] @ h_b[3:]
        # shift moment to world origin: n_O = n_i + p_i x f
        h_ang = h_ang + n_w + jnp.cross(pw[i], f_w)
        h_lin = h_lin + f_w
    return h_ang, h_lin
