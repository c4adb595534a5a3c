"""Instrument one trot gait cycle: per-control-step foot states vs targets.

Records, for a single env under a constant command, each foot's gait index,
commanded target (hip frame), actual foot position (hip frame, from FK),
world-frame foot velocity and vertical contact force. Prints a compact table
to diagnose where the stance-sweep treadmill loses velocity (slip, lag,
touchdown braking, swing drag).

Usage: python tools/inspect_gait.py [--cpu] [--cmd 0.5] [--steps 50]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--cmd", type=float, default=0.5)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--settle", type=int, default=100)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mqe_tpu.learn.locomotion_env import LocomotionEnv, LocomotionTrainCfg
    from mqe_tpu.ops import quat as quat_ops
    from mqe_tpu.physics import scene as S
    from mqe_tpu.physics import soa

    class Cfg(LocomotionTrainCfg):
        class domain_rand(LocomotionTrainCfg.domain_rand):
            randomize_friction = False
            randomize_lag_timesteps = False
            init_base_pos_range = dict(x=[0.0, 0.0], y=[0.0, 0.0])
            init_base_vel_range = [0.0, 0.0]
            init_dof_pos_ratio_range = [1.0, 1.0]

    envw = LocomotionEnv(num_envs=1, seed=0, cfg=Cfg)
    env = envw.env
    model = env.robot
    fi = env.scene.foot_sphere_indices()

    ts, _ = envw.reset(jax.random.PRNGKey(0))
    cmds = jnp.asarray([[args.cmd, 0.0, 0.0]])
    ts = ts.replace(commands=cmds)

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def roll(ts, key, n):
        def body(carry, _):
            ts, key = carry
            key, k = jax.random.split(key)
            ts, _, _, _, _ = envw._step_impl(ts, jnp.zeros((1, 1, 12)), k)
            ts = ts.replace(commands=cmds)
            ag = ts.env.phys.agents
            sph_x, sph_v = soa.fk_spheres(
                model, ag.pos[:, 0], ag.quat[:, 0], ag.lin_vel[:, 0],
                ag.ang_vel[:, 0], ag.q[:, 0], ag.qd[:, 0],
            )
            rec = dict(
                gait=ts.env.gait_indices[:, 0],
                base_x=ag.pos[0, 0, 0],
                base_z=ag.pos[0, 0, 2],
                vx=ag.lin_vel[0, 0, 0],
                foot_x=sph_x[0, fi, 0],
                foot_z=sph_x[0, fi, 2],
                foot_vx=sph_v[0, fi, 0],
                q=ag.q[0, 0],
            )
            return (ts, key), rec

        (ts, key), recs = jax.lax.scan(body, (ts, key), None, length=n)
        return ts, key, recs

    key = jax.random.PRNGKey(1)
    for _ in range(max(1, args.settle // args.steps)):
        ts, key, _ = roll(ts, key, args.steps)
    ts, key, recs = roll(ts, key, args.steps)
    recs = {k: np.asarray(v) for k, v in recs.items()}

    print(f"cmd={args.cmd} | mean vx={recs['vx'].mean():.3f} "
          f"| base z={recs['base_z'].mean():.3f}")
    hdr = ("t gait base_vx | FR:x z vx | FL:x z vx | RR:x z vx | RL:x z vx")
    print(hdr)
    for t in range(args.steps):
        row = f"{t:3d} {recs['gait'][t,0]:.2f} {recs['vx'][t]:+.2f} |"
        for leg in range(4):
            row += (f" {recs['foot_x'][t,leg]-recs['base_x'][t]:+.3f}"
                    f" {recs['foot_z'][t,leg]:.3f}"
                    f" {recs['foot_vx'][t,leg]:+.2f} |")
        print(row)


if __name__ == "__main__":
    main()
