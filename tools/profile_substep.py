"""Ablation timing of the scene.substep components at a given env count.

Times, per scene substep at batch E: full substep, agent FK+velocities,
sphere-world transforms, terrain+box contact force, agent forward dynamics
(ABA star) + integrate, NPC path. Identifies the HBM/compute hot spot that
bench_matrix.py sees at 4096 envs.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="go1gate")
    p.add_argument("--num-envs", type=int, default=4096)
    args = p.parse_args()

    from mqe_tpu.envs import make_mqe_env
    from mqe_tpu.physics import dynamics, integrator
    from mqe_tpu.physics import scene as S
    from mqe_tpu.physics.star_dynamics import forward_dynamics_star, star_layout

    wrap, _ = make_mqe_env(args.task, num_envs=args.num_envs, seed=0)
    env = wrap.env if hasattr(wrap, "env") else wrap
    ts, _ = env.reset(jax.random.PRNGKey(0))
    E, A = env.num_envs, env.num_agents
    robot = env.scene.robot
    scene = env.scene
    dt = env.sim_dt / env.subiters
    tau = jnp.zeros((E, A, robot.nq))
    npc_nq = env.npc.nq if (env.npc is not None and env.npc_has_collision) else 0
    npc_tau = jnp.zeros((E, scene.num_npcs, npc_nq))

    def terrain_of(i=None):
        boxes = env.env_boxes
        return S.Terrain(height=env.hf, origin=env.hf_origin, scale=env.hf_scale,
                         boxes=boxes, static_geoms=env.static_geoms)

    t_full = timeit(jax.jit(lambda st, tau: jax.vmap(
        lambda phys, tau_e, npc_tau_e, dr_e, boxes_e, sg_e: S.substep(
            scene,
            S.Terrain(height=env.hf, origin=env.hf_origin, scale=env.hf_scale,
                      boxes=boxes_e, static_geoms=sg_e),
            phys, tau_e, npc_tau_e, dr_e, dt)[0]
    )(st.phys, tau, npc_tau, st.dr, env.env_boxes, env.static_geoms)), ts, tau)

    ag = ts.phys.agents

    @jax.jit
    def kin(ag):
        def kin_one(pos, quat, q, lv, av, qd):
            Rw, pw, X_up, Ssub, _, _ = dynamics.kinematics(robot, pos, quat, q)
            v, vw = dynamics.body_velocities(robot, Rw, X_up, Ssub, lv, av, qd)
            return Rw, pw, vw

        return jax.vmap(jax.vmap(kin_one))(ag.pos, ag.quat, ag.q, ag.lin_vel, ag.ang_vel, ag.qd)

    Rw, pw, vw = kin(ag)

    @jax.jit
    def sph(Rw, pw, vw):
        return jax.vmap(jax.vmap(lambda R, p, v: S._sphere_world(robot, R, p, v)))(Rw, pw, vw)

    sph_x, sph_v = sph(Rw, pw, vw)
    ns = sph_x.shape[2]
    sph_r = jnp.tile(jnp.asarray(robot.sph_radius), (A,))

    @jax.jit
    def contact(sph_x, sph_v, dr):
        def one(x, v, mu, boxes, sg):
            t = S.Terrain(height=env.hf, origin=env.hf_origin, scale=env.hf_scale,
                          boxes=boxes, static_geoms=sg)
            return S._terrain_and_box_force(
                x.reshape(A * ns, 3), v.reshape(A * ns, 3), sph_r, t,
                scene.contact, mu, scene.flat_height)

        return jax.vmap(one)(sph_x, sph_v, dr.mu_scale, env.env_boxes, env.static_geoms)

    force = contact(sph_x, sph_v, ts.dr)

    robot_fd = (forward_dynamics_star if star_layout(robot) is not None
                else dynamics.forward_dynamics)

    @jax.jit
    def dyn(ag, force, sph_x, tau, dr, Rw, pw):
        f = force.reshape(E, A, ns, 3)

        def one(pos, quat, lv, av, q, qd, f_sph, x_sph, tau_a, payload, com_shift, Rw_a, pw_a):
            Ispat = S._spatial_inertias(robot, payload, com_shift, dtype=pos.dtype)
            wrench = S._accumulate_wrench(robot, pw_a, x_sph, f_sph)
            wrench = wrench + S._gravity_wrench(robot, Rw_a, payload, com_shift)
            wd, ad, qdd, _ = robot_fd(robot, Ispat, pos, quat, lv, av, q, qd, tau_a, wrench)
            return integrator.integrate(robot, pos, quat, lv, av, q, qd, wd, ad, qdd, dt)

        return jax.vmap(jax.vmap(one))(
            ag.pos, ag.quat, ag.lin_vel, ag.ang_vel, ag.q, ag.qd,
            f, sph_x, tau, dr.payload, dr.com_shift, Rw, pw)

    t_kin = timeit(kin, ag)
    t_sph = timeit(sph, Rw, pw, vw)
    t_con = timeit(contact, sph_x, sph_v, ts.dr)
    t_dyn = timeit(dyn, ag, force, sph_x, tau, ts.dr, Rw, pw)

    print(f"backend={jax.default_backend()} E={E} A={A} ns={ns} task={args.task} "
          f"subiters={env.subiters}")
    print(f"full substep        : {t_full*1e3:8.3f} ms")
    print(f"  agent FK+vel      : {t_kin*1e3:8.3f} ms")
    print(f"  sphere world      : {t_sph*1e3:8.3f} ms")
    print(f"  terrain+box force : {t_con*1e3:8.3f} ms  (n_boxes={env.env_boxes.shape[1]})")
    print(f"  ABA + integrate   : {t_dyn*1e3:8.3f} ms")
    print(f"  sum of parts      : {(t_kin+t_sph+t_con+t_dyn)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
