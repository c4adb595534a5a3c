"""Composed multi-actor physics: robots + NPCs + terrain, one env (vmap over E).

TPU-native replacement for the reference's per-step native sequence
`set_dof_actuation_force_tensor -> simulate -> refresh_*` (ref
mqe/envs/go1/go1.py:48-58): a pure function
`substep(scene, terrain, state, tau, dr) -> (state, contacts)` that jit-fuses
actuation, contact generation, articulated dynamics and integration.

Actor layout parity (SURVEY.md §2.3): agents first, then NPCs; per-agent
quantities flattened by the env layer.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mqe_tpu.physics import contact as C
from mqe_tpu.physics import dynamics, integrator, spatial
from mqe_tpu.physics.model import (
    PRIM_BOX,
    PRIM_CYLINDER,
    PRIM_SPHERE,
    BodyModel,
    StaticGeoms,
)

MAX_ENV_BOXES = 16  # static wall boxes per env (terrain emits <= this)


@struct.dataclass
class ActorState:
    pos: jnp.ndarray       # (A, 3)
    quat: jnp.ndarray      # (A, 4) xyzw
    lin_vel: jnp.ndarray   # (A, 3) world
    ang_vel: jnp.ndarray   # (A, 3) world
    q: jnp.ndarray         # (A, nq)
    qd: jnp.ndarray        # (A, nq)


@struct.dataclass
class PhysState:
    agents: ActorState
    npcs: ActorState       # zero-A actor state when the task has no NPCs


@struct.dataclass
class Terrain:
    height: jnp.ndarray    # (X, Y) meters, shared across envs
    origin: jnp.ndarray    # (2,) world xy of cell (0, 0)
    scale: jnp.ndarray     # () meters per cell
    boxes: jnp.ndarray     # (MAX_ENV_BOXES, 7) per env: center(3) half(3) valid
    static_geoms: jnp.ndarray  # (G, 8) per env: kind,center(3),p0,p1,p2,valid


@struct.dataclass
class DomainRand:
    mu_scale: jnp.ndarray        # () friction multiplier
    payload: jnp.ndarray         # (A,) extra trunk mass
    com_shift: jnp.ndarray       # (A, 3) trunk com displacement
    motor_strength: jnp.ndarray  # (A, nq) torque multiplier (used by env layer)


@struct.dataclass
class Contacts:
    sphere_force: jnp.ndarray    # (A, ns, 3) world force on each agent sphere
    npc_sphere_force: jnp.ndarray  # (N, ns_npc, 3)
    feet_force: jnp.ndarray      # (A, 4, 3) aggregated per foot


# static geom row kinds
SG_BOX = 0.0
SG_CYL = 1.0


@dataclass(frozen=True)
class SceneModel:
    """Static scene description; hashable, closed over by jit."""

    robot: BodyModel
    num_agents: int
    npc: BodyModel | None = None
    num_npcs: int = 0
    npc_root_free: bool = True
    contact: C.ContactParams = C.DEFAULT_PARAMS
    self_collision: bool = True
    # SoA articulated dynamics (physics/soa.py) via substep_batch: batch on
    # the TPU lane axis. False falls back to vmap(substep) (AoS; used for A/B
    # and by single-env test harnesses).
    use_soa: bool = True
    # fused Pallas substep kernel (physics/pallas_step.py) for the SoA
    # dynamics: measured 4.7-7x over the XLA fusion pipeline on one
    # v5-lite chip (BENCHLOG round 4). None = auto (on for TPU backends,
    # off on CPU where interpret mode is orders of magnitude slower than
    # XLA and tests/goldens pin the XLA path).
    use_pallas: bool | None = None
    # ground height when the task heightfield is constant (all 13 predefined
    # tasks: ground is flat, obstacles are analytic boxes) -> analytic plane
    # contact, no bilinear gathers. None = sample the heightfield.
    flat_height: float | None = None

    # ---- derived (numpy, computed lazily via helpers) ----
    def foot_sphere_indices(self) -> np.ndarray:
        idx = [i for i, t in enumerate(self.robot.sph_tags) if "foot" in t]
        return np.array(idx, dtype=np.int32)

    def coarse_sphere_indices(self) -> np.ndarray:
        """Spheres used for agent-agent collision (trunk + head + hips)."""
        idx = [
            i
            for i, t in enumerate(self.robot.sph_tags)
            if ("trunk" in t or "collision_box" in t or "hip" in t)
        ]
        return np.array(idx, dtype=np.int32)


def _sphere_world(model: BodyModel, Rw, pw, vw):
    """World position & velocity of each collision sphere. Single actor.

    Rw: (nb,3,3), pw: (nb,3), vw: (nb,6). Returns (ns,3), (ns,3).
    """
    # gather-free: spheres-per-body via constant one-hot matmuls (TPU)
    Mt = jnp.asarray(_sphere_onehot(model), dtype=pw.dtype).T  # (ns, nb)
    Rb = (Mt @ Rw.reshape(model.nb, 9)).reshape(-1, 3, 3)
    pb = Mt @ pw
    x = pb + jnp.einsum("nij,nj->ni", Rb, jnp.asarray(model.sph_pos, dtype=pw.dtype))
    w = Mt @ vw[:, :3]
    v0 = Mt @ vw[:, 3:]
    v = v0 + jnp.cross(w, x - pb)
    return x, v


_SPH_ONEHOT_CACHE: dict = {}


def _sphere_onehot(model: BodyModel):
    """(nb, ns) constant 0/1 matrix mapping spheres to their bodies."""
    key = id(model)
    if key not in _SPH_ONEHOT_CACHE:
        m = np.zeros((model.nb, len(model.sph_tags)), dtype=np.float32)
        m[model.sph_body, np.arange(len(model.sph_tags))] = 1.0
        _SPH_ONEHOT_CACHE[key] = m
    return _SPH_ONEHOT_CACHE[key]


def _accumulate_wrench(model: BodyModel, pw, sph_x, force):
    """Per-sphere world forces -> per-body world wrench about body origin.

    pw: (nb,3); sph_x: (ns,3); force: (ns,3). Returns (nb,6).
    Scatter-free: one-hot matmul instead of segment_sum (TPU scatters are
    scalarized; this is a small MXU matmul).
    """
    M = jnp.asarray(_sphere_onehot(model), dtype=force.dtype)
    arm = sph_x - M.T @ pw
    torque = jnp.cross(arm, force)
    n = M @ torque
    f = M @ force
    return jnp.concatenate([n, f], axis=-1)


def _gravity_wrench(model: BodyModel, Rw, payload=None, com_shift=None, g=-9.81):
    """(nb,6) gravity wrench per body (world, about body origin)."""
    mass = jnp.asarray(model.mass, dtype=Rw.dtype)
    com = jnp.asarray(model.com, dtype=Rw.dtype)
    if payload is not None:
        mass = mass.at[0].add(payload)
    if com_shift is not None:
        com = com.at[0].add(com_shift)
    com_w = jnp.einsum("nij,nj->ni", Rw, com)
    f = jnp.zeros_like(com_w).at[:, 2].set(mass * g)
    n = jnp.cross(com_w, f)
    return jnp.concatenate([n, f], axis=-1)


def _spatial_inertias(model: BodyModel, payload, com_shift, dtype=jnp.float32):
    """(nb,6,6) with DR-modified trunk inertia."""
    Ispat = jnp.asarray(model.spatial_inertia, dtype=dtype)
    m0 = jnp.asarray(model.mass[0], dtype=dtype) + payload
    com0 = jnp.asarray(model.com[0], dtype=dtype) + com_shift
    I0 = spatial.spatial_inertia(m0, com0, jnp.asarray(model.inertia[0], dtype=dtype))
    return Ispat.at[0].set(I0)


def _terrain_and_box_force(
    pos, vel, radius, terrain: Terrain, params, mu_scale, flat_height=None,
):
    """Force on spheres from heightfield + env wall boxes + static geoms.

    pos/vel: (ns,3); radius: (ns,). Returns (ns,3).
    """
    if flat_height is not None:
        f = C.sphere_plane(pos, vel, radius, flat_height, params, mu_scale)
    else:
        f = C.sphere_heightfield(
            pos, vel, radius, terrain.height, terrain.origin, terrain.scale, params, mu_scale
        )
    # env wall boxes: (B,7)
    bc = terrain.boxes[:, 0:3]
    bh = terrain.boxes[:, 3:6]
    bvalid = terrain.boxes[:, 6]
    fb = C.sphere_box(
        pos[:, None, :], vel[:, None, :], radius[:, None],
        bc[None, :, :], bh[None, :, :], params, mu_scale,
    )
    f = f + (fb * bvalid[None, :, None]).sum(axis=1)
    # static geoms: (G,8) rows [kind, cx,cy,cz, p0,p1,p2, valid]
    sg = terrain.static_geoms
    if sg.shape[0] > 0:
        kind = sg[:, 0]
        center = sg[:, 1:4]
        p = sg[:, 4:7]
        valid = sg[:, 7]
        f_box = C.sphere_box(
            pos[:, None, :], vel[:, None, :], radius[:, None],
            center[None], p[None], params, mu_scale,
        )
        f_cyl = C.sphere_vertical_cylinder(
            pos[:, None, :], vel[:, None, :], radius[:, None],
            center[None], p[None, :, 0], p[None, :, 1], params, mu_scale,
        )
        fg = jnp.where((kind == SG_CYL)[None, :, None], f_cyl, f_box)
        f = f + (fg * valid[None, :, None]).sum(axis=1)
    return f


def _npc_prim_force(scene: SceneModel, sph_x, sph_v, sph_r, npc_Rw, npc_pw, npc_vw, params, mu_scale):
    """Agent spheres vs NPC collision primitives.

    sph_x/v: (S,3) flattened agent spheres; npc_* : (N, nb_n, ...) FK of NPCs.
    Returns (S,3) force on spheres and (N, nb_n, 6) reaction wrench on NPC
    bodies (world, about npc body origin).
    """
    npc = scene.npc
    N = scene.num_npcs
    S_ = sph_x.shape[0]
    f_sph = jnp.zeros_like(sph_x)
    wrench = jnp.zeros((N, npc.nb, 6), dtype=sph_x.dtype)
    prim_body = np.asarray(npc.prim_body)
    for pi in range(len(npc.prim_tags)):
        b = int(prim_body[pi])
        kind = int(npc.prim_kind[pi])
        ppos = jnp.asarray(npc.prim_pos[pi], dtype=sph_x.dtype)
        prot = jnp.asarray(npc.prim_rot[pi], dtype=sph_x.dtype)
        psize = np.asarray(npc.prim_size[pi])
        # world pose of prim frame, per npc instance
        Rb = npc_Rw[:, b]                      # (N,3,3)
        pb = npc_pw[:, b]                      # (N,3)
        Rp = Rb @ prot                         # (N,3,3)
        pp = pb + jnp.einsum("nij,j->ni", Rb, ppos)  # (N,3)
        # velocity of prim-local contact region: use sphere-center point vel of npc body
        w_n = npc_vw[:, b, :3]
        v_n0 = npc_vw[:, b, 3:]

        # transform spheres into prim frame: (S,N,3)
        rel = sph_x[:, None, :] - pp[None]
        x_local = jnp.einsum("nji,snj->sni", Rp, rel)  # R^T @ rel
        v_npc_at_x = v_n0[None] + jnp.cross(w_n[None], sph_x[:, None, :] - pb[None])
        v_rel = sph_v[:, None, :] - v_npc_at_x
        v_local = jnp.einsum("nji,snj->sni", Rp, v_rel)

        if kind == PRIM_SPHERE:
            f_local = C.sphere_sphere(
                x_local, v_local, sph_r[:, None], jnp.zeros_like(x_local),
                jnp.zeros_like(v_local), psize[0], params, mu_scale,
            )
        elif kind == PRIM_BOX:
            half = jnp.asarray(psize / 2.0, dtype=sph_x.dtype)
            f_local = C.sphere_box(
                x_local, v_local, sph_r[:, None], jnp.zeros(3, dtype=sph_x.dtype),
                half, params, mu_scale,
            )
        else:  # cylinder (axis = prim z)
            f_local = C.sphere_vertical_cylinder(
                x_local, v_local, sph_r[:, None], jnp.zeros(3, dtype=sph_x.dtype),
                psize[0], psize[1] / 2.0, params, mu_scale,
            )
        f_world = jnp.einsum("nij,snj->sni", Rp, f_local)  # (S,N,3)
        f_sph = f_sph + f_world.sum(axis=1)
        # reaction on npc body b
        react = -f_world                                  # (S,N,3)
        arm = sph_x[:, None, :] - pb[None]                # contact arm approx at sphere center
        n_react = jnp.cross(arm, react).sum(axis=0)       # (N,3)
        f_react = react.sum(axis=0)                       # (N,3)
        wrench = wrench.at[:, b, :3].add(n_react).at[:, b, 3:].add(f_react)
    return f_sph, wrench


def substep(
    scene: SceneModel,
    terrain: Terrain,
    state: PhysState,
    tau: jnp.ndarray,          # (A, nq) joint torques for agents
    npc_tau: jnp.ndarray,      # (N, nq_npc) torques for NPC joints (usually 0)
    dr: DomainRand,
    dt: float,
):
    """One physics substep for one env. vmap over the env axis outside.

    Returns (new_state, Contacts).
    """
    robot = scene.robot
    A = scene.num_agents
    params = scene.contact
    ag = state.agents

    # ---- agent kinematics ----
    def kin_one(pos, quat, q, lv, av, qd):
        kin = dynamics.kinematics(robot, pos, quat, q)
        Rw, pw, X_up, S, _, _ = kin
        v, vw = dynamics.body_velocities(robot, Rw, X_up, S, lv, av, qd)
        return Rw, pw, vw

    Rw, pw, vw = jax.vmap(kin_one)(ag.pos, ag.quat, ag.q, ag.lin_vel, ag.ang_vel, ag.qd)

    sph_x, sph_v = jax.vmap(lambda R, p, v: _sphere_world(robot, R, p, v))(Rw, pw, vw)
    ns = sph_x.shape[1]
    sph_r = jnp.asarray(robot.sph_radius, dtype=sph_x.dtype)

    # ---- NPC kinematics ----
    npc = scene.npc
    N = scene.num_npcs
    if N > 0:
        nc = state.npcs

        def nkin_one(pos, quat, q, lv, av, qd):
            kin = dynamics.kinematics(npc, pos, quat, q)
            nRw, npw, X_up, S, _, _ = kin
            v, nvw = dynamics.body_velocities(npc, nRw, X_up, S, lv, av, qd)
            return nRw, npw, nvw

        nRw, npw, nvw = jax.vmap(nkin_one)(nc.pos, nc.quat, nc.q, nc.lin_vel, nc.ang_vel, nc.qd)
        nsph_x, nsph_v = jax.vmap(lambda R, p, v: _sphere_world(npc, R, p, v))(nRw, npw, nvw)
        nsph_r = jnp.asarray(npc.sph_radius, dtype=sph_x.dtype)

    # ---- contact forces on agent spheres ----
    flat_x = sph_x.reshape(A * ns, 3)
    flat_v = sph_v.reshape(A * ns, 3)
    flat_r = jnp.tile(sph_r, (A,))
    force = _terrain_and_box_force(
        flat_x, flat_v, flat_r, terrain, params, dr.mu_scale,
        scene.flat_height,
    )

    npc_wrench = None
    npc_force_sph = None
    if N > 0:
        f_npc, npc_wrench = _npc_prim_force(
            scene, flat_x, flat_v, flat_r, nRw, npw, nvw, params, dr.mu_scale
        )
        force = force + f_npc
        # NPC spheres vs terrain/boxes
        nflat_x = nsph_x.reshape(N * len(npc.sph_tags), 3)
        nflat_v = nsph_v.reshape(N * len(npc.sph_tags), 3)
        nflat_r = jnp.tile(nsph_r, (N,))
        npc_force_sph = _terrain_and_box_force(
            nflat_x, nflat_v, nflat_r, terrain, params, dr.mu_scale,
            scene.flat_height,
        )
        # NPC-NPC sphere pairs (sheep flock bumping)
        if N > 1:
            px = nflat_x
            pv = nflat_v
            ff = C.sphere_sphere(
                px[:, None, :], pv[:, None, :], nflat_r[:, None],
                px[None, :, :], pv[None, :, :], nflat_r[None, :], params, dr.mu_scale,
            )
            # zero self and same-instance pairs
            inst = jnp.repeat(jnp.arange(N), len(npc.sph_tags))
            mask = (inst[:, None] != inst[None, :]).astype(ff.dtype)
            npc_force_sph = npc_force_sph + (ff * mask[..., None]).sum(axis=1)

    # ---- agent-agent collision (coarse spheres) ----
    if A > 1 and scene.self_collision:
        ci = jnp.asarray(scene.coarse_sphere_indices())
        cx = sph_x[:, ci]          # (A, nc, 3)
        cv = sph_v[:, ci]
        cr = sph_r[ci]
        AC = cx.reshape(-1, 3)
        ACv = cv.reshape(-1, 3)
        ACr = jnp.tile(cr, (A,))
        ff = C.sphere_sphere(
            AC[:, None, :], ACv[:, None, :], ACr[:, None],
            AC[None, :, :], ACv[None, :, :], ACr[None, :], params, dr.mu_scale,
        )
        inst = jnp.repeat(jnp.arange(A), ci.shape[0])
        mask = (inst[:, None] != inst[None, :]).astype(ff.dtype)
        fcoarse = (ff * mask[..., None]).sum(axis=1).reshape(A, ci.shape[0], 3)
        force = force.reshape(A, ns, 3).at[:, ci].add(fcoarse).reshape(A * ns, 3)

    force = force.reshape(A, ns, 3)

    # ---- agent dynamics ----
    from mqe_tpu.physics.star_dynamics import forward_dynamics_star, star_layout

    robot_fd = (
        forward_dynamics_star if star_layout(robot) is not None
        else dynamics.forward_dynamics
    )

    def dyn_one(pos, quat, lv, av, q, qd, f_sph, x_sph, tau_a, payload, com_shift, Rw_a, pw_a):
        Ispat = _spatial_inertias(robot, payload, com_shift, dtype=pos.dtype)
        wrench = _accumulate_wrench(robot, pw_a, x_sph, f_sph)
        wrench = wrench + _gravity_wrench(robot, Rw_a, payload, com_shift)
        wd, ad, qdd, _ = robot_fd(
            robot, Ispat, pos, quat, lv, av, q, qd, tau_a, wrench
        )
        return integrator.integrate(robot, pos, quat, lv, av, q, qd, wd, ad, qdd, dt)

    new_pos, new_quat, new_lv, new_av, new_q, new_qd = jax.vmap(dyn_one)(
        ag.pos, ag.quat, ag.lin_vel, ag.ang_vel, ag.q, ag.qd,
        force, sph_x, tau, dr.payload, dr.com_shift, Rw, pw,
    )
    new_agents = ActorState(new_pos, new_quat, new_lv, new_av, new_q, new_qd)

    # ---- NPC dynamics ----
    if N > 0:
        nsph_f = npc_force_sph.reshape(N, len(npc.sph_tags), 3)

        def npc_dyn_one(pos, quat, lv, av, q, qd, f_sph, x_sph, wrench_prim, npw_a, nRw_a, tau_n):
            Ispat = jnp.asarray(npc.spatial_inertia, dtype=pos.dtype)
            wrench = _accumulate_wrench(npc, npw_a, x_sph, f_sph)
            wrench = wrench + wrench_prim + _gravity_wrench(npc, nRw_a)
            wd, ad, qdd, _ = dynamics.forward_dynamics(
                npc, Ispat, pos, quat, lv, av, q, qd, tau_n, wrench
            )
            if not scene.npc_root_free:
                wd = jnp.zeros_like(wd)
                ad = jnp.zeros_like(ad)
            return integrator.integrate(npc, pos, quat, lv, av, q, qd, wd, ad, qdd, dt)

        npos, nquat, nlv, nav, nq, nqd = jax.vmap(npc_dyn_one)(
            nc.pos, nc.quat, nc.lin_vel, nc.ang_vel, nc.q, nc.qd,
            nsph_f, nsph_x, npc_wrench, npw, nRw, npc_tau,
        )
        new_npcs = ActorState(npos, nquat, nlv, nav, nq, nqd)
    else:
        new_npcs = state.npcs
        nsph_f = jnp.zeros((0, 0, 3), dtype=sph_x.dtype)

    # ---- contact summary ----
    fi = jnp.asarray(scene.foot_sphere_indices())
    feet_force = force[:, fi]
    contacts = Contacts(sphere_force=force, npc_sphere_force=nsph_f, feet_force=feet_force)
    return PhysState(agents=new_agents, npcs=new_npcs), contacts

def substep_batch(
    scene: SceneModel,
    terrain: Terrain,          # boxes/static_geoms carry a leading env axis
    state: PhysState,          # all actor arrays carry a leading env axis (E, ...)
    tau: jnp.ndarray,          # (E, A, nq)
    npc_tau: jnp.ndarray,      # (E, N, nq_npc)
    dr: DomainRand,            # env-batched
    dt: float,
):
    """One physics substep for the WHOLE env batch (TPU layout-native).

    Mathematically identical to vmap(substep) but articulated dynamics run in
    the SoA formulation (physics/soa.py): the flattened robot batch rides the
    TPU lane axis instead of the 3/6-wide trailing dims, which removes the
    AoS path's ~20x lane-utilization penalty (measured 6.9 ms -> sub-ms for
    ABA+integrate at 8192 robots on one v5-lite chip, BENCHLOG.md round 2).
    Contact (terrain gather, box tests, NPC primitives, agent-agent pairs)
    stays in the existing vmapped form - it is wide and gather-bound, which
    XLA already handles well.
    """
    from mqe_tpu.physics import soa

    robot = scene.robot
    A = scene.num_agents
    N = scene.num_npcs
    params = scene.contact
    ag = state.agents
    E = ag.pos.shape[0]
    ns = len(robot.sph_tags)

    def flat(x):
        return x.reshape((E * A,) + x.shape[2:])

    # ---- agent kinematics + spheres (SoA over E*A robots) ----
    sph_x_f, sph_v_f = soa.fk_spheres(
        robot, flat(ag.pos), flat(ag.quat), flat(ag.lin_vel), flat(ag.ang_vel),
        flat(ag.q), flat(ag.qd),
    )
    sph_x = sph_x_f.reshape(E, A, ns, 3)
    sph_v = sph_v_f.reshape(E, A, ns, 3)
    sph_r = jnp.asarray(robot.sph_radius, dtype=sph_x.dtype)

    # ---- NPC kinematics (SoA over E*N) ----
    npc = scene.npc
    if N > 0:
        nc = state.npcs
        ns_n = len(npc.sph_tags)

        def nflat(x):
            return x.reshape((E * N,) + x.shape[2:])

        nRw_f, npw_f, nvw_f, nsx_f, nsv_f = soa.fk_full(
            npc, nflat(nc.pos), nflat(nc.quat), nflat(nc.lin_vel),
            nflat(nc.ang_vel), nflat(nc.q), nflat(nc.qd),
        )
        nRw = nRw_f.reshape(E, N, npc.nb, 3, 3)
        npw = npw_f.reshape(E, N, npc.nb, 3)
        nvw = nvw_f.reshape(E, N, npc.nb, 6)
        nsph_x = nsx_f.reshape(E, N, ns_n, 3)
        nsph_v = nsv_f.reshape(E, N, ns_n, 3)
        nsph_r = jnp.asarray(npc.sph_radius, dtype=sph_x.dtype)

    # ---- contact forces (vmapped over envs; same code path as substep) ----
    def contact_one(sx, sv, boxes_e, sg_e, mu, *npc_args):
        t = Terrain(
            height=terrain.height, origin=terrain.origin, scale=terrain.scale,
            boxes=boxes_e, static_geoms=sg_e,
        )
        flat_x = sx.reshape(A * ns, 3)
        flat_v = sv.reshape(A * ns, 3)
        flat_r = jnp.tile(sph_r, (A,))
        force = _terrain_and_box_force(
            flat_x, flat_v, flat_r, t, params, mu, scene.flat_height
        )
        npc_wrench = jnp.zeros((N, npc.nb, 6), dtype=sx.dtype) if N else None
        nsph_f = None
        if N > 0:
            nRw_e, npw_e, nvw_e, nsx_e, nsv_e = npc_args
            f_npc, npc_wrench = _npc_prim_force(
                scene, flat_x, flat_v, flat_r, nRw_e, npw_e, nvw_e, params, mu
            )
            force = force + f_npc
            nfx = nsx_e.reshape(N * ns_n, 3)
            nfv = nsv_e.reshape(N * ns_n, 3)
            nfr = jnp.tile(nsph_r, (N,))
            nsph_f = _terrain_and_box_force(
                nfx, nfv, nfr, t, params, mu, scene.flat_height
            )
            if N > 1:
                ff = C.sphere_sphere(
                    nfx[:, None, :], nfv[:, None, :], nfr[:, None],
                    nfx[None, :, :], nfv[None, :, :], nfr[None, :], params, mu,
                )
                inst = jnp.repeat(jnp.arange(N), ns_n)
                mask = (inst[:, None] != inst[None, :]).astype(ff.dtype)
                nsph_f = nsph_f + (ff * mask[..., None]).sum(axis=1)
            nsph_f = nsph_f.reshape(N, ns_n, 3)
        if A > 1 and scene.self_collision:
            ci = jnp.asarray(scene.coarse_sphere_indices())
            cx = sx[:, ci].reshape(-1, 3)
            cv = sv[:, ci].reshape(-1, 3)
            cr = jnp.tile(sph_r[ci], (A,))
            ff = C.sphere_sphere(
                cx[:, None, :], cv[:, None, :], cr[:, None],
                cx[None, :, :], cv[None, :, :], cr[None, :], params, mu,
            )
            inst = jnp.repeat(jnp.arange(A), ci.shape[0])
            mask = (inst[:, None] != inst[None, :]).astype(ff.dtype)
            fcoarse = (ff * mask[..., None]).sum(axis=1).reshape(A, ci.shape[0], 3)
            force = force.reshape(A, ns, 3).at[:, ci].add(fcoarse).reshape(A * ns, 3)
        return force.reshape(A, ns, 3), npc_wrench, nsph_f

    npc_in = (nRw, npw, nvw, nsph_x, nsph_v) if N > 0 else ()
    force, npc_wrench, nsph_f = jax.vmap(contact_one)(
        sph_x, sph_v, terrain.boxes, terrain.static_geoms, dr.mu_scale, *npc_in
    )

    # ---- agent dynamics (SoA; fused Pallas kernel on TPU) ----
    use_pallas = scene.use_pallas
    if use_pallas is None:
        # MQE_TPU_USE_PALLAS=0/1 overrides the auto default (on for TPU
        # backends) — escape hatch for runtimes where the fused kernel
        # misbehaves (bench.py additionally A/Bs both paths at warmup).
        flag = os.environ.get("MQE_TPU_USE_PALLAS")
        if flag is not None:
            use_pallas = flag.lower() not in ("0", "false", "off", "")
        else:
            use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from mqe_tpu.physics.pallas_step import step_actor_pallas

        def dyn_step(mdl, *a, **kw):
            return step_actor_pallas(mdl, *a, tile_s=16, **kw)
    else:
        dyn_step = soa.step_actor

    np_, nq_, nlv, nav, nql, nqdl = dyn_step(
        robot,
        flat(ag.pos), flat(ag.quat), flat(ag.lin_vel), flat(ag.ang_vel),
        flat(ag.q), flat(ag.qd), flat(tau),
        force.reshape(E * A, ns, 3), sph_x_f,
        payload=dr.payload.reshape(E * A),
        com_shift=dr.com_shift.reshape(E * A, 3),
        dt=dt,
    )

    def unflat(x):
        return x.reshape((E, A) + x.shape[1:])

    new_agents = ActorState(
        unflat(np_), unflat(nq_), unflat(nlv), unflat(nav), unflat(nql), unflat(nqdl)
    )

    # ---- NPC dynamics (SoA) ----
    if N > 0:
        def nunflat(x):
            return x.reshape((E, N) + x.shape[1:])

        npos, nquat, nlv2, nav2, nq2, nqd2 = dyn_step(
            npc,
            nflat(nc.pos), nflat(nc.quat), nflat(nc.lin_vel), nflat(nc.ang_vel),
            nflat(nc.q), nflat(nc.qd), nflat(npc_tau),
            nsph_f.reshape(E * N, ns_n, 3), nsx_f,
            extra_wrench=npc_wrench.reshape(E * N, npc.nb, 6),
            dt=dt,
            root_free=scene.npc_root_free,
        )
        new_npcs = ActorState(
            nunflat(npos), nunflat(nquat), nunflat(nlv2), nunflat(nav2),
            nunflat(nq2), nunflat(nqd2),
        )
    else:
        new_npcs = state.npcs
        nsph_f = jnp.zeros((E, 0, 0, 3), dtype=sph_x.dtype)

    fi = jnp.asarray(scene.foot_sphere_indices())
    feet_force = force[:, :, fi]
    contacts = Contacts(sphere_force=force, npc_sphere_force=nsph_f, feet_force=feet_force)
    return PhysState(agents=new_agents, npcs=new_npcs), contacts
