"""Leg-parallel Featherstone dynamics for star-of-chains topologies.

go1 is a trunk with 4 identical-depth chains (hip->thigh->calf). The generic
ABA in dynamics.py walks 12 bodies sequentially; here every tree DEPTH is one
batched step over all legs (chains), cutting the sequential op chain ~4x —
the main latency lever on TPU where per-op overhead dominates small-robot
dynamics (see BENCHLOG.md).

Drop-in equivalent of dynamics.forward_dynamics for models where
`star_layout(model)` is not None; tests assert exact agreement.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mqe_tpu.ops import quat as quat_ops
from mqe_tpu.physics import spatial
from mqe_tpu.physics.model import JOINT_PRISMATIC, BodyModel

_LAYOUT_CACHE: dict = {}


def star_layout(model: BodyModel):
    """Detect trunk + L identical-depth chains. Returns (L, D, bodies (L, D))
    with bodies[l, d] = body index, or None if not star-shaped."""
    key = id(model)
    if key in _LAYOUT_CACHE:
        return _LAYOUT_CACHE[key]
    nb = model.nb
    children = {i: [] for i in range(nb)}
    for i in range(1, nb):
        children[int(model.parent[i])].append(i)
    roots = children[0]
    chains = []
    ok = True
    for r in roots:
        chain = [r]
        cur = r
        while children[cur]:
            if len(children[cur]) != 1:
                ok = False
                break
            cur = children[cur][0]
            chain.append(cur)
        chains.append(chain)
    if not ok or not chains or len({len(c) for c in chains}) != 1 or len(chains) < 2:
        _LAYOUT_CACHE[key] = None
        return None
    layout = (len(chains), len(chains[0]), np.array(chains, dtype=np.int32))
    _LAYOUT_CACHE[key] = layout
    return layout


def forward_dynamics_star(
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
    """Leg-parallel FK + ABA. Same signature/returns as
    dynamics.forward_dynamics (single robot; vmap outside)."""
    L, D, bodies = star_layout(model)
    bidx = bodies  # (L, D) numpy
    dtype = base_pos.dtype

    jrot = jnp.asarray(model.joint_rot, dtype=dtype)[bidx]    # (L, D, 3, 3)
    jpos = jnp.asarray(model.joint_pos, dtype=dtype)[bidx]    # (L, D, 3)
    jaxis = jnp.asarray(model.joint_axis, dtype=dtype)[bidx]  # (L, D, 3)
    jtype = model.joint_type[bidx]                            # numpy (L, D)
    dof = bidx - 1                                            # joint index per body
    q_l = q[dof]                                              # (L, D)
    qd_l = qd[dof]

    # ---- FK over depth (trunk then D batched steps) ----
    R0 = quat_ops.quat_to_matrix(base_quat)
    Rw = [None] * D   # per depth: (L, 3, 3) world rotations
    pw = [None] * D   # (L, 3)
    Xup = [None] * D  # (L, 6, 6)
    S = [None] * D    # (L, 6)
    prismatic = jnp.asarray((jtype == JOINT_PRISMATIC), dtype=dtype)[..., None]  # (L, D, 1)

    Rw_par = jnp.broadcast_to(R0, (L, 3, 3))
    pw_par = jnp.broadcast_to(base_pos, (L, 3))
    for d in range(D):
        axis = jaxis[:, d]                                   # (L, 3)
        qi = q_l[:, d]
        pris = prismatic[:, d]                               # (L, 1)
        Rj_rev = quat_ops.quat_to_matrix(quat_ops.quat_from_angle_axis(qi, axis))
        Rj = jnp.where(pris[..., None] > 0, jnp.eye(3, dtype=dtype), Rj_rev)
        pj = pris * axis * qi[:, None]
        S_ang = axis * (1 - pris)
        S_lin = axis * pris
        S[d] = jnp.concatenate([S_ang, S_lin], axis=-1)      # (L, 6)
        Rl = jrot[:, d] @ Rj
        pl = jpos[:, d] + jnp.einsum("lij,lj->li", jrot[:, d], pj)
        Xup[d] = spatial.motion_transform(Rl, pl)
        Rw[d] = Rw_par @ Rl
        pw[d] = pw_par + jnp.einsum("lij,lj->li", Rw_par, pl)
        Rw_par, pw_par = Rw[d], pw[d]

    # ---- velocities ----
    v0 = jnp.concatenate([R0.T @ base_ang_vel_w, R0.T @ base_lin_vel_w])
    v = [None] * D
    v_par = jnp.broadcast_to(v0, (L, 6))
    for d in range(D):
        v[d] = jnp.einsum("lij,lj->li", Xup[d], v_par) + S[d] * qd_l[:, d : d + 1]
        v_par = v[d]

    # ---- external wrenches to body frames ----
    if joint_damping is None:
        joint_damping = jnp.asarray(model.joint_damping, dtype=dtype)
    tau_eff = (tau - joint_damping * qd)[dof]                 # (L, D)

    f_ext_l = f_ext_w[bidx]                                   # (L, D, 6)
    fe = [None] * D
    for d in range(D):
        n_b = jnp.einsum("lji,lj->li", Rw[d], f_ext_l[:, d, :3])
        f_b = jnp.einsum("lji,lj->li", Rw[d], f_ext_l[:, d, 3:])
        fe[d] = jnp.concatenate([n_b, f_b], axis=-1)
    fe0 = jnp.concatenate([R0.T @ f_ext_w[0, :3], R0.T @ f_ext_w[0, 3:]])

    I_l = Ispat[bidx]                                         # (L, D, 6, 6)
    IA = [I_l[:, d] for d in range(D)]
    pA = [
        spatial.cross_force(v[d], jnp.einsum("lij,lj->li", I_l[:, d], v[d])) - fe[d]
        for d in range(D)
    ]
    c = [spatial.cross_motion(v[d], S[d] * qd_l[:, d : d + 1]) for d in range(D)]

    IA0 = Ispat[0]
    pA0 = spatial.cross_force(v0, Ispat[0] @ v0) - fe0

    # ---- inward pass over depth ----
    U = [None] * D
    dnm = [None] * D
    u = [None] * D
    for d in range(D - 1, -1, -1):
        U[d] = jnp.einsum("lij,lj->li", IA[d], S[d])
        dnm[d] = jnp.einsum("li,li->l", S[d], U[d]) + 1e-9
        u[d] = tau_eff[:, d] - jnp.einsum("li,li->l", S[d], pA[d])
        Ia = IA[d] - U[d][:, :, None] * U[d][:, None, :] / dnm[d][:, None, None]
        pa = pA[d] + jnp.einsum("lij,lj->li", Ia, c[d]) + U[d] * (u[d] / dnm[d])[:, None]
        X = Xup[d]
        Xt = jnp.swapaxes(X, -1, -2)
        IA_up = Xt @ Ia @ X
        pa_up = jnp.einsum("lij,lj->li", Xt, pa)
        if d > 0:
            IA[d - 1] = IA[d - 1] + IA_up
            pA[d - 1] = pA[d - 1] + pa_up
        else:
            IA0 = IA0 + IA_up.sum(axis=0)
            pA0 = pA0 + pa_up.sum(axis=0)

    # ---- root ----
    if model.root_free:
        a0 = spatial.solve_spd6(IA0 + 1e-9 * jnp.eye(6, dtype=dtype), -pA0)
    else:
        a0 = jnp.zeros(6, dtype=dtype)

    # ---- outward pass ----
    qdd_l = [None] * D
    a_par = jnp.broadcast_to(a0, (L, 6))
    for d in range(D):
        ai = jnp.einsum("lij,lj->li", Xup[d], a_par) + c[d]
        qdd_d = (u[d] - jnp.einsum("li,li->l", U[d], ai)) / dnm[d]
        a_par = ai + S[d] * qdd_d[:, None]
        qdd_l[d] = qdd_d

    qdd = jnp.zeros_like(q)
    for d in range(D):
        qdd = qdd.at[dof[:, d]].set(qdd_l[d])

    w_b, v_b = v0[:3], v0[3:]
    omega_dot_w = R0 @ a0[:3]
    a_lin_w = R0 @ (a0[3:] + jnp.cross(w_b, v_b))

    # aux: full-tree world kinematics in body-index order (for scene reuse)
    Rw_full = jnp.zeros((model.nb, 3, 3), dtype=dtype).at[0].set(R0)
    pw_full = jnp.zeros((model.nb, 3), dtype=dtype).at[0].set(base_pos)
    vw_full = jnp.zeros((model.nb, 6), dtype=dtype).at[0].set(
        jnp.concatenate([R0 @ v0[:3], R0 @ v0[3:]])
    )
    for d in range(D):
        w_w = jnp.einsum("lij,lj->li", Rw[d], v[d][:, :3])
        vl_w = jnp.einsum("lij,lj->li", Rw[d], v[d][:, 3:])
        Rw_full = Rw_full.at[bidx[:, d]].set(Rw[d])
        pw_full = pw_full.at[bidx[:, d]].set(pw[d])
        vw_full = vw_full.at[bidx[:, d]].set(jnp.concatenate([w_w, vl_w], axis=-1))

    return omega_dot_w, a_lin_w, qdd, (Rw_full, pw_full, vw_full)
